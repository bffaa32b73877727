"""Tokenizer semantics (SURVEY.md §2.2 T1-T7) + Spark-vs-oracle parity."""

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.tokenize import (
    aggregate_tokens,
    tokenize_docs,
    tokenize_valid,
)

CFG = EngineConfig()


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
                             for t in r["tokens"]), r["n_tokens"])
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
