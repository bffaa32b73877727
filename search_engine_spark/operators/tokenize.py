"""Tokenization operator (SURVEY.md §2.2 T1-T7), Arrow-vectorized.

Reference semantics, replicated exactly (single "content" section,
weight 1.0, per the source-code corpus mapping — SURVEY.md T5/Q-quirk Q1):

  1. lowercase, tokenize with ``\\b[\\w']+\\b``
     (ref: Indexer/Tokenizer.java:79,102-116)
  2. validity gate on the RAW token: 2 <= len <= 45 and ``^[a-zA-Z]+$``
     (ref: Indexer/Tokenizer.java:22-23,118-123)
  3. stopword removal at index time only (ref: Tokenizer.java:83-99;
     query side does NOT filter — SURVEY quirk Q3)
  4. Porter-stem the surviving token (ref: Tokenizer.java:109-112)
  5. position = index within the VALID (post-filter, post-stem) token
     sequence of the section (ref: Tokenizer.java:235-241 — the loop index
     over ``words``, which is the filtered/stemmed list)
  6. weighted TF accumulate per stem; single section ⇒ tf == occurrence
     count × 1.0 (ref: Tokenizer.java:227-253)
  7. doc length = count of valid tokens (ref: Tokenizer.java:218-222,
     255-259 — the TF normalizer denominator)

The whole per-document pipeline runs inside ONE Arrow-batched pandas UDF
returning the per-doc term aggregation directly — i.e. the (doc, term)
grouping happens map-side with zero shuffle; only the per-term index build
shuffles. No per-row Python (input_hint requirement): the UDF processes
Arrow record batches; stemming is lru_cache-amortized over the vocabulary.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from search_engine_spark.config import DEFAULT, EngineConfig
from search_engine_spark.functions.porter import stem as porter_stem
from search_engine_spark.functions.stopwords import STOPWORDS

# Flat parallel arrays, NOT array<struct>: an Arrow list<struct> output
# column costs ~2x in the UDF serializer and ~9x in an unfused
# downstream explode (JVM Arrow->row materialization of tens of
# millions of nested structs) vs three flat list columns +
# explode(arrays_zip(...)), which Catalyst evaluates without building
# intermediate structs. Measured at 480k docs / local[32]: tokenize
# stage 9.4 s -> 6.5 s cold, uncached tokenize+explode 17.7 s -> 5.9 s,
# full build best-rep 20.8k -> 25.4k docs/s (the remaining build cost
# is the posting shuffle+codec reduce, untouched by this shape).
# token_structs() rebuilds the struct view for consumers that want it.
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.DoubleType())),
        T.StructField(
            "positions", T.ArrayType(T.ArrayType(T.IntegerType()))
        ),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


def token_structs(extra: tuple[str, ...] = ()) -> Column:
    """``array<struct<term, tf, positions[, ...extra]>>`` view over the
    flat token columns of ``tokenize_docs``/``tokenize_docs_sectioned``
    output — ``F.explode(token_structs())`` is the canonical way to get
    per-(doc, term) rows. arrays_zip keeps this JVM-side and is far
    cheaper than having the Arrow UDF emit list<struct> directly."""
    cols = [
        F.col("terms").alias("term"),
        F.col("tfs").alias("tf"),
        F.col("positions").alias("positions"),
    ]
    for name in extra:
        # plural flat column -> singular struct field (top_sections etc.)
        cols.insert(-1, F.col(name).alias(name.rstrip("s")))
    return F.arrays_zip(*cols)

_ALPHA = re.compile(r"^[a-zA-Z]+$")


def tokenize_valid(
    text: str,
    cfg: EngineConfig = DEFAULT,
    stopwords: frozenset[str] | None = None,
) -> list[str]:
    """T1-T4 for one string: the filtered, stemmed token sequence.

    Mirrors Tokenizer.tokenizeString(text, removeStopWords=True): filter on
    the raw token, then stem. Shared by the Spark UDF, the query parser
    (with different flags) and the pure-Python oracle.
    """
    sw = STOPWORDS if (stopwords is None and cfg.remove_stopwords) else (stopwords or frozenset())
    out = []
    for m in re.finditer(cfg.token_pattern, text.lower()):
        w = m.group()
        if (
            cfg.min_word_len <= len(w) <= cfg.max_word_len
            and _ALPHA.match(w)
            and (not cfg.remove_stopwords or w not in sw)
        ):
            out.append(porter_stem(w) if cfg.stem else w)
    return out


def aggregate_tokens(words: Iterable[str]) -> tuple[list, int]:
    """T6/T7 accumulate: (term, tf, positions) per stem + valid-token count.

    Single content section ⇒ weight 1.0 and positions are indexes into the
    valid-token sequence (ref: Tokenizer.java:235-241).
    """
    acc: dict[str, list] = {}
    n = 0
    for i, w in enumerate(words):
        ent = acc.get(w)
        if ent is None:
            acc[w] = [1.0, [i]]
        else:
            ent[0] += 1.0
            ent[1].append(i)
        n += 1
    tokens = [
        {"term": t, "tf": v[0], "positions": v[1]} for t, v in acc.items()
    ]
    return tokens, n


def make_tokenize_udf(cfg: EngineConfig = DEFAULT):
    """Arrow pandas UDF: content -> struct(tokens array, n_tokens)."""
    pattern = cfg.token_pattern
    min_len, max_len = cfg.min_word_len, cfg.max_word_len
    do_stem, do_stop = cfg.stem, cfg.remove_stopwords
    stopset = STOPWORDS if do_stop else frozenset()

    @pandas_udf(TOKENS_SCHEMA)
    def tokenize(content: pd.Series) -> pd.DataFrame:
        # findall (C loop) + str.isascii/isalpha (C checks, exact parity
        # with ^[a-zA-Z]+$ — pinned by tests) instead of a Python
        # finditer loop with a second regex per token
        findall = re.compile(pattern).findall
        stem = porter_stem
        t_col, f_col, p_col, n_col = [], [], [], []
        for text in content:
            if text is None:
                t_col.append([])
                f_col.append([])
                p_col.append([])
                n_col.append(0)
                continue
            if do_stem:
                words = [
                    stem(w)
                    for w in findall(text.lower())
                    if min_len <= len(w) <= max_len
                    and w.isascii()
                    and w.isalpha()
                    and (not do_stop or w not in stopset)
                ]
            else:
                words = [
                    w
                    for w in findall(text.lower())
                    if min_len <= len(w) <= max_len
                    and w.isascii()
                    and w.isalpha()
                    and (not do_stop or w not in stopset)
                ]
            # same first-occurrence accumulate as aggregate_tokens (the
            # oracle contract), emitted as parallel flat lists
            acc: dict[str, list] = {}
            for i, w in enumerate(words):
                ent = acc.get(w)
                if ent is None:
                    acc[w] = [1.0, [i]]
                else:
                    ent[0] += 1.0
                    ent[1].append(i)
            t_col.append(list(acc.keys()))
            f_col.append([v[0] for v in acc.values()])
            p_col.append([v[1] for v in acc.values()])
            n_col.append(len(words))
        return pd.DataFrame(
            {
                "terms": t_col,
                "tfs": f_col,
                "positions": p_col,
                "n_tokens": n_col,
            }
        )

    return tokenize


def tokenize_docs(
    df: DataFrame,
    text_col: str = "content",
    doc_id_col: str = "doc_id",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """(doc_id, ...) -> (doc_id, terms array<string>, tfs array<double>,
    positions array<array<int>>, n_tokens) — flat parallel arrays (see
    TOKENS_SCHEMA note); ``F.explode(token_structs())`` yields the
    per-(doc, term) rows. Map-side only — no shuffle."""
    udf = make_tokenize_udf(cfg)
    tk = df.select(
        F.col(doc_id_col).alias("doc_id"), udf(F.col(text_col)).alias("tk")
    )
    return tk.select("doc_id", "tk.*")


# --------------------------------------------------------------------------
# T5/T6: weighted multi-section tokenization (ref Tokenizer.java:26-33,
# 126-253). The corpus arrives as a table, so "sections" are typed columns
# (string = one element, array<string> = repeated elements of that section
# kind, e.g. many <p> texts). Semantics preserved from the reference:
#   * section weights title=5.0, h1..h6=4.0/3.0/2.5/2.0/1.8/1.5,
#     content=1.0 (Tokenizer.java:26-33)
#   * per-ELEMENT position restart: positions are indexes into each
#     element's own valid-token sequence (processText's loop,
#     Tokenizer.java:231-248) — a term in two <p>s gets two position lists
#     starting at their own 0
#   * per-term accumulate: count += section weight per occurrence; the
#     stored section label is the highest-weight section the term appeared
#     in (Tokenizer.java:239-247)
#   * quirk Q1 (double counting): the reference extracts p, div, li, span,
#     article/section element TEXT including nested children, so the same
#     words are counted once per enclosing element. A caller reproduces
#     this by putting the nested texts into the content array — the
#     tokenizer itself faithfully counts every element it is given.
#   * n_tokens quirk: the reference's totalTokens re-validates the
#     STEMMED words (countTokens runs isValidWord over tokenizeString's
#     output, Tokenizer.java:250-254) — a word whose stem collapses to a
#     stopword or below min length is indexed but NOT counted in the TF
#     denominator. Preserved bit-for-bit.
# --------------------------------------------------------------------------

SECTION_WEIGHTS = {
    "title": 5.0,
    "h1": 4.0,
    "h2": 3.0,
    "h3": 2.5,
    "h4": 2.0,
    "h5": 1.8,
    "h6": 1.5,
    "content": 1.0,
}

# flat parallel arrays for the same reason as TOKENS_SCHEMA;
# token_structs(extra=("top_sections", "importances")) rebuilds the
# struct view
SECTION_TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.DoubleType())),
        T.StructField("top_sections", T.ArrayType(T.StringType())),
        T.StructField("importances", T.ArrayType(T.DoubleType())),
        T.StructField(
            "positions", T.ArrayType(T.ArrayType(T.IntegerType()))
        ),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


def make_tokenize_sections_udf(cfg: EngineConfig = DEFAULT):
    """Arrow pandas UDF: array<struct<section,text>> ->
    struct(tokens array, n_tokens). ``tf`` is the RAW weighted count
    (Σ section_weight per occurrence); downstream ``tf / n_tokens``
    reproduces the reference's stored ``frequency`` (the normalization at
    Tokenizer.java:222-227)."""
    pattern = cfg.token_pattern
    min_len, max_len = cfg.min_word_len, cfg.max_word_len
    do_stem = cfg.stem
    stopset = STOPWORDS if cfg.remove_stopwords else frozenset()
    do_stop = cfg.remove_stopwords

    @pandas_udf(SECTION_TOKENS_SCHEMA)
    def tokenize(elements: pd.Series) -> pd.DataFrame:
        findall = re.compile(pattern).findall
        stem = porter_stem
        t_col, f_col, s_col, w_col, p_col, n_col = [], [], [], [], [], []
        for elems in elements:
            acc: dict[str, list] = {}  # term -> [count, top_sec, top_w, poss]
            total = 0
            for e in elems if elems is not None else []:
                text = e["text"]
                if not text:
                    continue
                sec = e["section"]
                w = SECTION_WEIGHTS.get(sec, SECTION_WEIGHTS["content"])
                words = [
                    (stem(t) if do_stem else t)
                    for t in findall(text.lower())
                    if min_len <= len(t) <= max_len
                    and t.isascii()
                    and t.isalpha()
                    and (not do_stop or t not in stopset)
                ]
                # countTokens quirk: totalTokens re-validates the STEMS
                total += sum(
                    1
                    for s in words
                    if min_len <= len(s) <= max_len
                    and s.isascii()
                    and s.isalpha()
                    and (not do_stop or s not in stopset)
                )
                for i, word in enumerate(words):
                    ent = acc.get(word)
                    if ent is None:
                        acc[word] = [w, sec, w, [i]]
                    else:
                        ent[0] += w
                        if w > ent[2]:
                            ent[1], ent[2] = sec, w
                        ent[3].append(i)
            t_col.append(list(acc.keys()))
            f_col.append([v[0] for v in acc.values()])
            s_col.append([v[1] for v in acc.values()])
            w_col.append([v[2] for v in acc.values()])
            p_col.append([v[3] for v in acc.values()])
            n_col.append(total)
        return pd.DataFrame(
            {
                "terms": t_col,
                "tfs": f_col,
                "top_sections": s_col,
                "importances": w_col,
                "positions": p_col,
                "n_tokens": n_col,
            }
        )

    return tokenize


def tokenize_docs_sectioned(
    df: DataFrame,
    sections: list[tuple[str, str]],
    doc_id_col: str = "doc_id",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Weighted multi-section tokenization over typed section columns.

    ``sections``: ordered (column, section_label) pairs; a string column
    is one element, an array<string> column is repeated elements of that
    section kind. Output: (doc_id, terms, tfs, top_sections, importances,
    positions, n_tokens) flat parallel arrays (see TOKENS_SCHEMA note);
    ``token_structs(extra=("top_sections", "importances"))`` rebuilds the
    struct view. Map-side only — the element flattening is JVM array
    algebra, the analysis is one Arrow UDF."""
    dtypes = dict(df.dtypes)

    def _tag(lbl):
        # (one-arg lambda: a two-arg lambda would make transform() bind
        # the element INDEX to the second parameter)
        return lambda t: F.struct(
            F.lit(lbl).alias("section"), t.alias("text")
        )

    parts = []
    for colname, label in sections:
        if dtypes[colname].startswith("array"):
            parts.append(
                F.transform(
                    F.coalesce(
                        F.col(colname),
                        F.array().cast("array<string>"),
                    ),
                    _tag(label),
                )
            )
        else:
            parts.append(
                F.array(
                    F.struct(
                        F.lit(label).alias("section"),
                        F.col(colname).alias("text"),
                    )
                )
            )
    combined = F.flatten(F.array(*parts))
    udf = make_tokenize_sections_udf(cfg)
    tk = df.select(
        F.col(doc_id_col).alias("doc_id"), udf(combined).alias("tk")
    )
    return tk.select("doc_id", "tk.*")


def simple_split_tokens(text_col: Column, min_len: int = 2) -> Column:
    """JVM-side whitespace tokenizer for SQL-oracle-checked operators:
    split on spaces, keep purely-alphabetic tokens of len >= min_len.
    Stays inside whole-stage codegen (no Python)."""
    toks = F.split(text_col, " ")
    return F.filter(
        toks,
        lambda t: (F.length(t) >= min_len) & t.rlike("^[a-z]+$"),
    )
