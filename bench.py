#!/usr/bin/env python
"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <headline>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., ...extras}

Headline value = end-to-end index-build wall time (the north rule's
build-throughput metric is reported alongside as docs_per_sec).

Extra keys (ignored by the driver, used for BENCH/BASELINE.md):
  docs_per_sec, query_p50/p95 over the BM25 query set, cores.

Scaling-efficiency mode (two parallelism levels on the SAME input):
  python bench.py --scaling     # runs N=8 and 4N=32 cores, reports
                                # efficiency = (T_N / T_4N) / 4
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _mk_spark(cores: int, shuffle_parts: int):
    from search_engine_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_parts,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            ),
        },
    )


QUERY_SET = [
    "hash join window",
    "scan AND batch",
    "scan OR batch",
    "scan NOT batch",
    '"hash join"',
    "partition shuffle broadcast spark",
    "stream",
]


def run_bench(cores: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import search

    spark = _mk_spark(cores, shuffle_parts=max(2 * cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # repartition once so build parallelism tracks core count, not the
        # input file's layout (one small parquet file = one partition)
        docs = docs.repartition(max(2 * cores, 8)).persist()
        n_docs = docs.count()

        cfg = EngineConfig(stem=False, remove_stopwords=False)
        timings: dict[str, float] = {}

        t0 = time.perf_counter()
        idx = build_index(docs, text_col="text", doc_id_col="doc_id", cfg=cfg)
        # force full materialization of every artifact
        idx.postings = idx.postings.persist()
        idx.postings.count()
        idx.term_stats = idx.term_stats.persist()
        idx.term_stats.count()
        build_sec = time.perf_counter() - t0
        timings["index_build"] = round(build_sec, 4)

        q_times = []
        for i, q in enumerate(QUERY_SET):
            t0 = time.perf_counter()
            search(idx, q, k=10).collect()
            dt = time.perf_counter() - t0
            q_times.append(dt)
            timings[f"q{i + 1}"] = round(dt, 4)

        # dedup + similarity headliners
        from search_engine_spark.operators.dedup import (
            exact_dedup,
            minhash_lsh_pairs,
        )
        from search_engine_spark.operators.similarity import cosine_topk

        t0 = time.perf_counter()
        exact_dedup(docs).count()
        timings["dedup_exact"] = round(time.perf_counter() - t0, 4)

        t0 = time.perf_counter()
        minhash_lsh_pairs(docs, num_hashes=4, threshold=0.8).count()
        timings["minhash_lsh"] = round(time.perf_counter() - t0, 4)

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qvec = [
            float(x)
            for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        t0 = time.perf_counter()
        cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()
        timings["ann_cosine"] = round(time.perf_counter() - t0, 4)

        qs = sorted(q_times)
        return {
            "cores": cores,
            "n_docs": n_docs,
            "build_sec": build_sec,
            "docs_per_sec": round(n_docs / build_sec, 2),
            "query_p50": round(statistics.median(q_times), 4),
            "query_p95": round(qs[max(0, int(len(qs) * 0.95) - 1)], 4),
            "timings": timings,
        }
    finally:
        spark.stop()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    if "--scaling" in sys.argv:
        lo = run_bench(max(cores // 4, 1), sf_dir)
        hi = run_bench(cores, sf_dir)
        eff = (lo["build_sec"] / hi["build_sec"]) / 4.0
        out = {
            "metric": "scaling_efficiency_Nx4N",
            "value": round(eff, 4),
            "unit": "ratio",
            "sf": sf,
            "n_cores": lo["cores"],
            "n4_cores": hi["cores"],
            "throughput_n": lo["docs_per_sec"],
            "throughput_4n": hi["docs_per_sec"],
            "build_sec_n": round(lo["build_sec"], 4),
            "build_sec_4n": round(hi["build_sec"], 4),
        }
        print(json.dumps(out))
        return

    r = run_bench(cores, sf_dir)
    out = {
        "metric": "index_build_plus_query_suite_sec",
        "value": round(
            r["build_sec"], 4
        ),
        "unit": "sec",
        "queries": r["timings"],
        "sf": sf,
        "cores": r["cores"],
        "n_docs": r["n_docs"],
        "docs_per_sec": r["docs_per_sec"],
        "query_p50_sec": r["query_p50"],
        "query_p95_sec": r["query_p95"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
