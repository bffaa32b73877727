"""Index build (SURVEY.md §2.3 A1-A5) vs the pure-Python oracle."""

import math

import numpy as np

from search_engine_spark.operators import codec
from search_engine_spark.operators.index_build import verify_sha256


def test_corpus_shape(corpus_df):
    assert corpus_df.columns == [
        "repo", "path", "commit", "lang", "content", "doc_id", "sha256",
    ]
    n = corpus_df.count()
    assert n == 200
    assert corpus_df.select("doc_id").distinct().count() == n


def test_corpus_deterministic_across_parallelism(spark):
    from search_engine_spark.sources.corpus import generate_corpus

    a = generate_corpus(spark, 50, seed=42, num_partitions=1).collect()
    b = generate_corpus(spark, 50, seed=42, num_partitions=7).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_corpus_start_id_slice_parity(spark):
    """A delta slice [N, N+d) generated with start_id is byte-identical
    to the same id range of a start-0 run (the O(d) delta path the 8M
    soak uses instead of generate-all-and-filter)."""
    from search_engine_spark.sources.corpus import generate_corpus

    full = {
        r["doc_id"]: r
        for r in generate_corpus(spark, 60, seed=42, num_partitions=3)
        .where("doc_id >= 40")
        .collect()
    }
    delta = {
        r["doc_id"]: r
        for r in generate_corpus(
            spark, 20, seed=42, num_partitions=3, start_id=40
        ).collect()
    }
    assert full == delta and set(delta) == set(range(40, 60))


def test_stats_match_oracle(spark_index, oracle_idx):
    assert spark_index.n_docs == oracle_idx.n_docs
    assert math.isclose(
        spark_index.avgdl,
        oracle_idx.avgdl,
        rel_tol=1e-9,
    )
    got_dl = {
        r["doc_id"]: r["doc_len"] for r in spark_index.doc_stats.collect()
    }
    assert got_dl == oracle_idx.doc_len


def test_df_idf_match_oracle(spark_index, oracle_idx):
    got = {
        r["term"]: (r["df"], r["idf"])
        for r in spark_index.term_stats.collect()
    }
    assert set(got) == set(oracle_idx.postings)
    for term, docs in oracle_idx.postings.items():
        df, idf = got[term]
        assert df == len(docs), term
        assert math.isclose(idf, oracle_idx.idf(term), rel_tol=1e-12), term


def test_postings_match_oracle(spark_index, oracle_idx):
    rows = spark_index.postings.collect()
    got: dict = {}
    for r in rows:
        # shard invariants
        ids = [p["doc_id"] for p in r["postings"]]
        assert ids == sorted(ids)
        assert r["n_postings"] == len(ids)
        assert r["min_doc_id"] == ids[0] and r["max_doc_id"] == ids[-1]
        # codec round-trip against the stored arrays
        assert np.array_equal(
            codec.delta_decode_ids(r["doc_ids_enc"]), np.asarray(ids)
        )
        tfs = codec.decode_tfs(r["tf_enc"])
        assert np.allclose(tfs, [p["tf"] for p in r["postings"]])
        pos = codec.decode_positions(r["pos_enc"], len(ids))
        assert pos == [list(p["positions"]) for p in r["postings"]]
        # block max
        # block_max is computed over the float32-ROUNDTRIPPED bm25 values
        # (so the WAND UB bounds what query-time decode actually sees);
        # it must dominate every decoded value and sit within float32
        # epsilon of the float64 max
        decoded_bm = codec.decode_tfs(r["bm25_tf_enc"]).astype("float64")
        assert max(r["block_max"]) == float(decoded_bm.max())
        assert abs(max(r["block_max"]) - r["max_bm25_tf"]) <= abs(
            r["max_bm25_tf"]
        ) * 1e-6
        for p in r["postings"]:
            got.setdefault(r["term"], {})[p["doc_id"]] = (
                p["tf"],
                list(p["positions"]),
            )
    assert set(got) == set(oracle_idx.postings)
    for term, docs in oracle_idx.postings.items():
        assert set(got[term]) == set(docs), term
        for doc_id, (tf, positions) in docs.items():
            gtf, gpos = got[term][doc_id]
            assert gtf == tf
            assert gpos == positions


def test_bm25_tf_precompute(spark_index, oracle_idx):
    from search_engine_spark.oracle import bm25_tf

    sample = spark_index.postings.limit(20).collect()
    for r in sample:
        for p in r["postings"]:
            dl = oracle_idx.doc_len[p["doc_id"]]
            want = bm25_tf(p["tf"], dl, oracle_idx)
            assert math.isclose(p["bm25_tf"], want, rel_tol=1e-9)


def test_sha256_invariant(corpus_df):
    assert verify_sha256(corpus_df, corpus_df.select("doc_id", "sha256")) == 0


def test_save_load_roundtrip(tmp_path, spark, spark_index):
    from search_engine_spark.operators.index_build import Index

    path = str(tmp_path / "idx")
    spark_index.save(path)
    loaded = Index.load(spark, path, cfg=spark_index.cfg)
    assert loaded.n_docs == spark_index.n_docs
    assert math.isclose(loaded.avgdl, spark_index.avgdl)
    assert loaded.postings.count() == spark_index.postings.count()
    assert loaded.term_stats.count() == spark_index.term_stats.count()


def test_load_restores_build_config(spark, tmp_path):
    """An index built with a non-default analyzer must query with THAT
    analyzer after a plain load (no cfg argument)."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import Index, build_index
    from search_engine_spark.operators.query import search
    from search_engine_spark.sources.corpus import generate_corpus

    cfg = EngineConfig(stem=False, remove_stopwords=False, docs_per_shard=64)
    corp = generate_corpus(spark, 120, seed=9)
    idx = build_index(corp, cfg=cfg)
    d = str(tmp_path / "nostem")
    idx.save(d)
    loaded = Index.load(spark, d)
    assert loaded.cfg.stem is False
    assert loaded.cfg.remove_stopwords is False
    assert loaded.cfg.docs_per_shard == 64
    want = [(r["doc_id"], round(r["score"], 6))
            for r in search(idx, "banana recipe", k=10).collect()]
    got = [(r["doc_id"], round(r["score"], 6))
           for r in search(loaded, "banana recipe", k=10).collect()]
    assert got == want


def test_save_cache_lifecycle(spark, tmp_path):
    """save() persists postings for the duration of the three artifact
    writes (term_stats/doc_stats share the build plan) but must release
    a cache it created and must NOT tear down a caller-managed one."""
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.sources.corpus import generate_corpus

    idx = build_index(generate_corpus(spark, 80, seed=3))
    lvl = idx.postings.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)
    idx.save(str(tmp_path / "own"))
    lvl = idx.postings.storageLevel
    assert not (lvl.useMemory or lvl.useDisk), "save leaked its own cache"

    idx.postings.persist()
    try:
        idx.save(str(tmp_path / "caller"))
        lvl = idx.postings.storageLevel
        assert lvl.useMemory or lvl.useDisk, "save tore down caller cache"
    finally:
        idx.postings.unpersist()
