"""Tokenizer semantics (SURVEY.md §2.2 T1-T7) + Spark-vs-oracle parity."""

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.tokenize import (
    aggregate_tokens,
    tokenize_docs,
    tokenize_valid,
)

CFG = EngineConfig()

def _tok_dicts(r):
    """Struct view of the flat token arrays (rows from tokenize_docs)."""
    return [
        {"term": t, "tf": f, "positions": list(p)}
        for t, f, p in zip(r["terms"], r["tfs"], r["positions"])
    ]


def _sec_tok_dicts(r):
    """Struct view of the flat sectioned-token arrays."""
    return [
        {"term": t, "tf": f, "top_section": s, "importance": w,
         "positions": list(p)}
        for t, f, s, w, p in zip(
            r["terms"], r["tfs"], r["top_sections"], r["importances"],
            r["positions"],
        )
    ]



def test_validity_gates():
    # len<2, len>45, non-alpha, apostrophes, stopwords all filtered
    text = "a " + "x" * 46 + " don't x7 the and ok banana running"
    words = tokenize_valid(text, CFG)
    assert words == ["ok", "banana", "run"]


def test_positions_are_valid_token_indexes():
    # position = index in the filtered+stemmed sequence (Tokenizer.java:235)
    text = "the banana a recipe banana"
    words = tokenize_valid(text, CFG)
    assert words == ["banana", "recip", "banana"]
    tokens, n = aggregate_tokens(words)
    assert n == 3
    by_term = {t["term"]: t for t in tokens}
    assert by_term["banana"]["positions"] == [0, 2]
    assert by_term["banana"]["tf"] == 2.0
    assert by_term["recip"]["positions"] == [1]


def test_stopwords_index_side_only():
    # quirk Q3 asymmetry: index filters stopwords, query side does not
    from search_engine_spark.operators.parser import query_stems

    assert tokenize_valid("the and of", CFG) == []
    assert query_stems("the and of") == ["the", "and", "of"]


def test_spark_udf_matches_python(spark, corpus_df, corpus_rows):
    from tests.conftest import TEST_CFG

    got = {
        r["doc_id"]: (sorted((t["term"], t["tf"], tuple(t["positions"]))
                             for t in _tok_dicts(r)), r["n_tokens"])
        for r in tokenize_docs(corpus_df, cfg=TEST_CFG).collect()
    }
    for doc_id, content in corpus_rows:
        words = tokenize_valid(content, TEST_CFG)
        tokens, n = aggregate_tokens(words)
        want = (
            sorted((t["term"], t["tf"], tuple(t["positions"])) for t in tokens),
            n,
        )
        assert got[doc_id] == want, f"doc {doc_id} mismatch"


# ---------------------------------------------------------------------------
# T5/T6: weighted multi-section tokenization (Tokenizer.java:26-33,126-253)
# ---------------------------------------------------------------------------

def test_sectioned_tokenizer_matches_oracle(spark):
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.tokenize import tokenize_docs_sectioned
    from search_engine_spark.oracle import oracle_tokenize_sections

    cfg = EngineConfig()  # full analyzer: stem + stopwords
    rows = [
        # (doc_id, title, headings[], content[])
        (0, "Banana Recipes Guide",
         ["Cooking banana", "Banana storage"],
         ["the banana recipe needs ripe banana",
          # Q1 double count: nested element text repeated verbatim
          "the banana recipe needs ripe banana",
          # countTokens quirk: 'haves' stems to stopword 'have' -> indexed
          # under 'have' but NOT counted in totalTokens
          "haves banana"]),
        (1, None, [], ["plain content only words"]),
        (2, "Title Only", None, []),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, title: string, headings: array<string>, "
        "content: array<string>",
    )
    sections = [("title", "title"), ("headings", "h1"), ("content", "content")]
    got = {
        r.doc_id: r
        for r in tokenize_docs_sectioned(df, sections, cfg=cfg).collect()
    }

    for doc_id, title, headings, content in rows:
        elements = []
        if title is not None:
            elements.append(("title", title))
        for h in headings or []:
            elements.append(("h1", h))
        for c in content or []:
            elements.append(("content", c))
        want_acc, want_total = oracle_tokenize_sections(elements, cfg)
        r = got[doc_id]
        assert r.n_tokens == want_total, doc_id
        by_term = {t["term"]: t for t in _sec_tok_dicts(r)}
        assert set(by_term) == set(want_acc), doc_id
        for term, w in want_acc.items():
            t = by_term[term]
            assert abs(t["tf"] - w["count"]) < 1e-12, (doc_id, term)
            assert t["top_section"] == w["top_section"], (doc_id, term)
            assert abs(t["importance"] - w["importance"]) < 1e-12
            assert sorted(t["positions"]) == sorted(w["positions"])


def test_sectioned_reference_semantics_handcheck(spark):
    """Hand-computed check of every sectioned quirk on one document."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.tokenize import tokenize_docs_sectioned

    cfg = EngineConfig()
    df = spark.createDataFrame(
        [(0, "banana world", ["banana split"], ["banana bread haves", "banana bread haves"])],
        "doc_id: long, title: string, h1s: array<string>, content: array<string>",
    )
    out = tokenize_docs_sectioned(
        df, [("title", "title"), ("h1s", "h1"), ("content", "content")], cfg=cfg
    ).collect()[0]
    toks = {t["term"]: t for t in _sec_tok_dicts(out)}

    # banana: title(5.0) + h1(4.0) + 2x content(1.0) = 11.0
    assert abs(toks["banana"]["tf"] - 11.0) < 1e-12
    assert toks["banana"]["top_section"] == "title"
    assert abs(toks["banana"]["importance"] - 5.0) < 1e-12
    # per-ELEMENT position restart: banana is token 0 of all four elements
    assert toks["banana"]["positions"] == [0, 0, 0, 0]
    # bread: only content, twice (double-count quirk), position 1 each
    assert abs(toks["bread"]["tf"] - 2.0) < 1e-12
    assert toks["bread"]["top_section"] == "content"
    assert toks["bread"]["positions"] == [1, 1]
    # 'haves' stems to 'have' (stopword): indexed...
    assert "have" in toks and abs(toks["have"]["tf"] - 2.0) < 1e-12
    # ...but totalTokens re-validates stems: title 2 + h1 2 + per content
    # element (banana, bread, have->DROPPED) 2 each -> 8
    # (countTokens quirk, Tokenizer.java:250-254)
    assert out.n_tokens == 8


def test_sectioned_index_build_end_to_end(spark):
    """build_index(sections=...): tf_norm equals the reference's stored
    frequency (weighted count / quirky totalTokens)."""
    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index

    cfg = EngineConfig()
    df = spark.createDataFrame(
        [
            (0, "banana guide", ["banana recipe daily"]),
            (1, "other title", ["banana field notes"]),
        ],
        "doc_id: long, title: string, content: array<string>",
    )
    idx = build_index(
        df, cfg=cfg, sections=[("title", "title"), ("content", "content")]
    )
    rows = (
        idx.postings.select("term", F.explode("postings").alias("p"))
        .select("term", "p.doc_id", "p.tf", "p.tf_norm")
        .collect()
    )
    got = {(r.term, r.doc_id): (r.tf, r.tf_norm) for r in rows}
    # doc 0: banana = title 5.0 + content 1.0 = 6.0 over 5 valid tokens
    assert abs(got[("banana", 0)][0] - 6.0) < 1e-12
    assert abs(got[("banana", 0)][1] - 6.0 / 5.0) < 1e-12
    # doc 1: banana content-only
    assert abs(got[("banana", 1)][0] - 1.0) < 1e-12


def test_sectioned_tokenizer_property_vs_oracle(spark):
    """Property-based: random section structures (hypothesis) through the
    Spark UDF must match the independent pure-Python transcription."""
    from hypothesis import given, settings, strategies as st

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.tokenize import tokenize_docs_sectioned
    from search_engine_spark.oracle import oracle_tokenize_sections

    cfg = EngineConfig()
    word = st.sampled_from(
        ["banana", "recipe", "the", "a", "haves", "Doing", "x1y",
         "zz", "cooking", "storage", "it's", "UPPER"]
    )
    text = st.lists(word, min_size=0, max_size=8).map(" ".join)
    docs = st.lists(
        st.tuples(
            st.one_of(st.none(), text),                       # title
            st.lists(text, min_size=0, max_size=3),           # h2 elements
            st.lists(text, min_size=0, max_size=4),           # content
        ),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=15, deadline=None)
    @given(docs)
    def check(rows):
        data = [
            (i, t, hs, cs) for i, (t, hs, cs) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data,
            "doc_id: long, title: string, h2s: array<string>, "
            "content: array<string>",
        )
        got = {
            r.doc_id: r
            for r in tokenize_docs_sectioned(
                df,
                [("title", "title"), ("h2s", "h2"), ("content", "content")],
                cfg=cfg,
            ).collect()
        }
        for i, (t, hs, cs) in enumerate(rows):
            elements = []
            if t is not None:
                elements.append(("title", t))
            elements += [("h2", h) for h in hs]
            elements += [("content", c) for c in cs]
            want_acc, want_total = oracle_tokenize_sections(elements, cfg)
            r = got[i]
            assert r.n_tokens == want_total
            by_term = {tk["term"]: tk for tk in _sec_tok_dicts(r)}
            assert set(by_term) == set(want_acc)
            for term, w in want_acc.items():
                tk = by_term[term]
                assert abs(tk["tf"] - w["count"]) < 1e-12
                assert tk["top_section"] == w["top_section"]
                assert sorted(tk["positions"]) == sorted(w["positions"])

    check()
