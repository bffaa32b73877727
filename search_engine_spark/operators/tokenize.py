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

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField(
            "tokens",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType()),
                        T.StructField("tf", T.DoubleType()),
                        T.StructField("positions", T.ArrayType(T.IntegerType())),
                    ]
                )
            ),
        ),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)

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
        toks_col, n_col = [], []
        for text in content:
            if text is None:
                toks_col.append([])
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
            tokens, n = aggregate_tokens(words)
            toks_col.append(tokens)
            n_col.append(n)
        return pd.DataFrame({"tokens": toks_col, "n_tokens": n_col})

    return tokenize


def tokenize_docs(
    df: DataFrame,
    text_col: str = "content",
    doc_id_col: str = "doc_id",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """(doc_id, ...) -> (doc_id, tokens array<struct<term,tf,positions>>,
    n_tokens). Map-side only — no shuffle."""
    udf = make_tokenize_udf(cfg)
    tk = df.select(
        F.col(doc_id_col).alias("doc_id"), udf(F.col(text_col)).alias("tk")
    )
    return tk.select(
        "doc_id",
        F.col("tk.tokens").alias("tokens"),
        F.col("tk.n_tokens").alias("n_tokens"),
    )


def simple_split_tokens(text_col: Column, min_len: int = 2) -> Column:
    """JVM-side whitespace tokenizer for SQL-oracle-checked operators:
    split on spaces, keep purely-alphabetic tokens of len >= min_len.
    Stays inside whole-stage codegen (no Python)."""
    toks = F.split(text_col, " ")
    return F.filter(
        toks,
        lambda t: (F.length(t) >= min_len) & t.rlike("^[a-z]+$"),
    )
