#!/usr/bin/env python
"""Merge-economics measurement: daily-delta incremental update
(build_index(delta) + merge_indexes) vs full rebuild at the same final
corpus size. Prints one JSON line; numbers quoted in BENCH.md.

  python tools/merge_bench.py [--docs 100000] [--delta-frac 0.05]
                              [--cores 32] [--out report.json]

Both paths are timed end-to-end INCLUDING the parquet write of the
final index (build is lazy; the save is the materialization barrier).
The main index for the incremental path is pre-built outside the timed
region — in production it already exists (yesterday's generation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--delta-frac", type=float, default=0.05)
    ap.add_argument("--cores", type=int, default=32)
    # default 4096 → ~25 shards at 100k docs, so the dirty-shard split
    # is visible at bench scale (the production default 65536 gives a
    # 2-shard toy universe where "dirty" means half the index)
    ap.add_argument("--docs-per-shard", type=int, default=4096)
    ap.add_argument(
        "--scatter",
        action="store_true",
        help="delta REPLACES every (1/delta_frac)-th doc instead of "
        "appending a tail range — the id-scattered upsert worst case "
        "where every shard goes dirty",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench import _mk_spark

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import Index, build_index
    from search_engine_spark.operators.merge import merge_indexes
    from search_engine_spark.sources.corpus import generate_corpus

    cfg = EngineConfig(docs_per_shard=args.docs_per_shard)
    spark = _mk_spark(args.cores, 128)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="merge_bench_")
    corpus_p = os.path.join(work, "corpus.parquet")
    generate_corpus(spark, args.docs, seed=42).write.mode(
        "overwrite"
    ).parquet(corpus_p)
    docs = spark.read.parquet(corpus_p)
    step = max(2, int(round(1.0 / args.delta_frac)))
    if args.scatter:
        # replace every step-th doc: same corpus size, every shard dirty
        delta_pred = F.col("doc_id") % step == 0
        main_docs = docs
        delta_docs = docs.filter(delta_pred)
    else:
        # append-new-ids design: the delta is a tail id range
        cut = int(args.docs * (1.0 - args.delta_frac))
        main_docs = docs.filter(F.col("doc_id") < cut)
        delta_docs = docs.filter(F.col("doc_id") >= cut)

    # pre-existing main index (yesterday's generation) — untimed
    main_path = os.path.join(work, "main_idx")
    build_index(main_docs, cfg=cfg).save(main_path)
    # each production run is its own application — drop the previous
    # build's internal persists (build_index caches its tokenized
    # corpus) so neither timed path inherits the other's memory
    # pressure
    spark.catalog.clearCache()

    # path A: full rebuild of the whole corpus
    t0 = time.perf_counter()
    build_index(docs, cfg=cfg).save(os.path.join(work, "full_idx"))
    t_full = time.perf_counter() - t0
    spark.catalog.clearCache()

    # path B: build the delta only, then merge into main
    t0 = time.perf_counter()
    delta_path = os.path.join(work, "delta_idx")
    build_index(delta_docs, cfg=cfg).save(delta_path)
    t_delta = time.perf_counter() - t0
    merged = merge_indexes(
        Index.load(spark, main_path), Index.load(spark, delta_path)
    )
    merged.save(os.path.join(work, "merged_idx"))
    t_incr = time.perf_counter() - t0
    t_merge = t_incr - t_delta

    # sanity: same corpus answered identically
    from search_engine_spark.operators.query import search

    q = "hash join window"
    full_idx = Index.load(spark, os.path.join(work, "full_idx"))
    merged_idx = Index.load(spark, os.path.join(work, "merged_idx"))
    a = [(r.doc_id, round(r.score, 6)) for r in search(full_idx, q, k=10).collect()]
    b = [(r.doc_id, round(r.score, 6)) for r in search(merged_idx, q, k=10).collect()]

    rep = {
        "docs": args.docs,
        "delta_docs": delta_docs.count(),
        "delta_frac": args.delta_frac,
        "cores": args.cores,
        "full_rebuild_sec": round(t_full, 2),
        "incremental_sec": round(t_incr, 2),
        "delta_build_sec": round(t_delta, 2),
        "merge_sec": round(t_merge, 2),
        "scatter": bool(args.scatter),
        "speedup": round(t_full / t_incr, 2),
        "rank_identical": a == b,
    }
    print(json.dumps(rep))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
