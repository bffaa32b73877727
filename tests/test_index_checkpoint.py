"""Resumable checkpointed index build (operators/index_checkpoint.py):
batch manifests, crash/resume, fingerprint invalidation, and equivalence
with the one-shot build_index path."""

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import Index, build_index
from search_engine_spark.operators.index_checkpoint import ResumableIndexBuild
from search_engine_spark.operators.query import search
from search_engine_spark.sources.corpus import generate_corpus

CFG = EngineConfig(docs_per_shard=64, block_size=16)


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, 400, seed=5).cache()


def _query_results(idx, q="banana recipe hash"):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in search(idx, q, k=20).collect()
    ]


def test_resumable_equals_oneshot(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    b = ResumableIndexBuild(corpus, out, cfg=CFG, shards_per_batch=2)
    idx = b.run()
    assert idx is not None

    ref = build_index(corpus, cfg=CFG)
    # same global stats
    assert idx.n_docs == ref.n_docs
    assert abs(idx.avgdl - ref.avgdl) < 1e-9
    # same term_stats
    a = {
        (r["term"]): (r["df"], round(r["idf"], 9))
        for r in idx.term_stats.collect()
    }
    e = {
        (r["term"]): (r["df"], round(r["idf"], 9))
        for r in ref.term_stats.collect()
    }
    assert a == e
    # same query answers (loads from disk like a fresh process would)
    loaded = Index.load(spark, out, cfg=CFG)
    assert _query_results(loaded) == _query_results(ref)


def test_crash_resume_and_manifest(spark, corpus, tmp_path):
    out = str(tmp_path / "idx2")
    b = ResumableIndexBuild(corpus, out, cfg=CFG, shards_per_batch=2)
    n_batches = len(b.plan())
    assert n_batches >= 3

    # "crash" after one batch
    assert b.run(max_batches=1) is None
    assert len(b.read_manifest()) == 1
    assert len(b.pending()) == n_batches - 1

    # resume completes the rest
    idx = b.run()
    assert idx is not None
    manifests = b.read_manifest()
    assert len(manifests) == n_batches

    # lineage + metrics fields present and sane
    for m in manifests.values():
        assert m["n_docs"] > 0
        assert m["n_postings"] > 0
        assert m["wall_sec"] > 0
        assert m["bytes_postings_raw"] > 0
        assert m["fingerprint"].count(":") == 1
        lo, hi = m["doc_id_range"]
        assert hi - lo == 2 * CFG.docs_per_shard

    # build summary written
    summary = json.load(open(os.path.join(out, "build_summary.json")))
    assert summary["n_docs"] == 400
    assert summary["n_batches"] == n_batches

    # idempotent: nothing pending, second run() re-finalizes w/o rebuild
    assert b.pending() == []


def test_fingerprint_invalidation(spark, corpus, tmp_path):
    out = str(tmp_path / "idx3")
    b = ResumableIndexBuild(corpus, out, cfg=CFG, shards_per_batch=2)
    b.run()
    assert b.pending() == []

    # mutate the content of ONE doc in batch 0 → only batch 0 re-pends
    mutated = corpus.withColumn(
        "content",
        F.when(F.col("doc_id") == 3, F.lit("changed content"))
        .otherwise(F.col("content")),
    )
    b2 = ResumableIndexBuild(mutated, out, cfg=CFG, shards_per_batch=2)
    pend = b2.pending()
    assert [p["batch"] for p in pend] == [0]

    # config change invalidates everything
    b3 = ResumableIndexBuild(
        corpus, out, cfg=EngineConfig(docs_per_shard=64, stem=False),
        shards_per_batch=2,
    )
    assert len(b3.pending()) == len(b3.plan())


def test_store_arrays_change_invalidates_batches(spark, corpus_df, tmp_path):
    """Config-hash regression (round-1 advice): raw batches written under
    one store_arrays profile must NOT be reused by a resume under the
    other — a silent reuse left postings null and queries empty."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_checkpoint import (
        ResumableIndexBuild,
    )

    out = str(tmp_path / "idx")
    cfg_a = EngineConfig(docs_per_shard=64, store_arrays=True)
    b1 = ResumableIndexBuild(corpus_df, out, cfg=cfg_a)
    b1.run()
    assert b1.pending() == []

    # same layout knobs, flipped storage profile -> every batch pending
    cfg_b = EngineConfig(docs_per_shard=64, store_arrays=False)
    b2 = ResumableIndexBuild(corpus_df, out, cfg=cfg_b)
    assert len(b2.pending()) == len(b2.plan())

    # and after the rebuild the codec-only index actually answers queries
    from search_engine_spark.operators.index_build import Index
    from search_engine_spark.operators.query import search

    b2.run()
    idx = Index.load(spark, out)
    assert idx.cfg.store_arrays is False
    assert search(idx, "banana recipe", k=5).count() > 0


def test_finalize_block_max_is_float32_roundtripped(spark, corpus, tmp_path):
    """VERDICT r02 #1: finalize_from_raw must compute block_max /
    max_bm25_tf from the float32-ROUNDTRIPPED bm25 values (what WAND
    decodes and scores), not the float64 originals — a float64 max can
    under-bound the decoded score by ~6e-8 rel and break the WAND
    pruning proof. Pin exact equality with a recompute from the stored
    codec binaries, for both the resumable and the one-shot build."""
    import numpy as np

    from search_engine_spark.operators import codec
    from search_engine_spark.operators.index_build import build_index

    out = str(tmp_path / "idx_bmax")
    b = ResumableIndexBuild(corpus, out, cfg=CFG, shards_per_batch=2)
    resumable = b.run()
    oneshot = build_index(corpus, cfg=CFG)

    for idx in (resumable, oneshot):
        rows = idx.postings.select(
            "term", "shard", "bm25_tf_enc", "block_max", "max_bm25_tf"
        ).collect()
        assert rows
        for r in rows:
            bm32 = codec.decode_tfs(r["bm25_tf_enc"]).astype(np.float64)
            bs = idx.cfg.block_size
            expect = [
                float(bm32[i : i + bs].max())
                for i in range(0, bm32.size, bs)
            ]
            assert r["block_max"] == expect, (r["term"], r["shard"])
            assert r["max_bm25_tf"] == float(bm32.max())


def test_wand_over_resumable_index(spark, corpus, tmp_path):
    """search_wand over a checkpoint-resumed index must be
    rank-identical to the exhaustive search path — the invariant the
    roundtripped finalize_from_raw bounds exist to protect."""
    from search_engine_spark.operators.wand import search_wand

    cfg = EngineConfig(docs_per_shard=64, block_size=8)
    out = str(tmp_path / "idx_wand")
    b = ResumableIndexBuild(corpus, out, cfg=cfg, shards_per_batch=2)
    b.run(max_batches=1)  # crash boundary
    b.run()
    idx = Index.load(spark, out, cfg=cfg)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()

    for q in ["banana recipe", "spark", "banana recipe hash join"]:
        exp = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(idx, q, k=10).collect()
        ]
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_wand(idx, q, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-6, q
