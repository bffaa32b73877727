"""Structured-Streaming incremental index ingest: drain → finalize →
query equals the one-shot batch build; new arrivals produce exactly one
new checkpointed batch and the re-finalized index equals a full rebuild."""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import Index, build_index
from search_engine_spark.operators.query import search
from search_engine_spark.sources.corpus import generate_corpus
from search_engine_spark.streaming.incremental import StreamingIndexIngest

CFG = EngineConfig(docs_per_shard=64, block_size=16)


def _results(idx, q="banana recipe hash"):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in search(idx, q, k=20).collect()
    ]


def test_stream_ingest_then_incremental(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    out = str(tmp_path / "sidx")

    # wave 1: docs 0..199 arrive
    generate_corpus(spark, 200, seed=5).write.mode("append").parquet(
        corpus_dir
    )
    ingest = StreamingIndexIngest(spark, corpus_dir, out, cfg=CFG)
    n1 = ingest.process_available()
    assert n1 >= 1
    idx1 = ingest.finalize()
    ref1 = build_index(generate_corpus(spark, 200, seed=5), cfg=CFG)
    assert idx1.n_docs == 200
    assert _results(Index.load(spark, out, cfg=CFG)) == _results(ref1)

    # wave 2: docs 200..399 arrive — only the NEW files are processed
    generate_corpus(spark, 400, seed=5).where(
        F.col("doc_id") >= 200
    ).write.mode("append").parquet(corpus_dir)
    n2 = ingest.process_available()
    assert n2 == n1 + 1  # exactly one additional stream batch
    idx2 = ingest.finalize()
    ref2 = build_index(generate_corpus(spark, 400, seed=5), cfg=CFG)
    assert idx2.n_docs == 400
    assert abs(idx2.avgdl - ref2.avgdl) < 1e-9
    assert _results(Index.load(spark, out, cfg=CFG)) == _results(ref2)

    # draining again with nothing new is a no-op
    n3 = ingest.process_available()
    assert n3 == n2

    # lineage: manifests carry per-batch metrics
    import json

    mdir = os.path.join(out, "manifest")
    ms = [json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)]
    assert sum(m["n_docs"] for m in ms) == 400
    assert all(m["source"] == "stream" and m["wall_sec"] > 0 for m in ms)
