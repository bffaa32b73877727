#!/usr/bin/env python
"""spark-submit entry: continuous ingestion → LSM merge → published
generations (streaming/live_index.py).

Drains every corpus file currently in --input (Trigger.AvailableNow);
each non-empty micro-batch becomes a DELTA index, is upsert-merged into
the currently-published generation and published as the next immutable
generation under --root (serving readers follow the LATEST pointer and
refresh() across swaps). Re-running processes ONLY new arrivals — the
stream checkpoint under <root>/_stream_checkpoint remembers progress;
a crash-replayed batch is value-identical (right-wins upsert).

    spark-submit --py-files "$ZIP" jobs/live_index_job.py \\
        --input /path/to/corpus_parquet_dir \\
        --root  /path/to/index_root \\
        [--text-col content] [--doc-id-col doc_id] \\
        [--max-files-per-batch N] [--keep-generations K] [--no-stem]

Prints a one-line JSON report (generation published, docs served,
batches this run, wall seconds, generations pruned).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--max-files-per-batch", type=int, default=None)
    ap.add_argument(
        "--keep-generations", type=int, default=None,
        help="prune to the newest K generations after the drain",
    )
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--no-stopwords", action="store_true")
    ap.add_argument("--docs-per-shard", type=int, default=None)
    ap.add_argument(
        "--refresh-pagerank",
        action="store_true",
        help="after the drain, recompute PageRank over the full input "
        "corpus graph (--edges parquet of (src,dst), else the repo "
        "ring graph), WARM-STARTED from the previous generation's "
        "ranks, and publish it as the next generation",
    )
    ap.add_argument(
        "--edges", default=None,
        help="(src, dst) edge parquet for --refresh-pagerank",
    )
    ap.add_argument(
        "--vector-dim", type=int, default=None,
        help="also maintain a live ANN artifact at <root>/vector_index "
        "(hashed embeddings of this dim; upsert/CDC-delete aware)",
    )
    ap.add_argument("--vector-n-centroids", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("se-live-index").getOrCreate()

    from search_engine_spark.config import DEFAULT, EngineConfig
    from search_engine_spark.publish import prune_generations, read_latest
    from search_engine_spark.streaming.live_index import StreamingLiveIndex

    kw = {}
    if args.no_stem:
        kw["stem"] = False
    if args.no_stopwords:
        kw["remove_stopwords"] = False
    if args.docs_per_shard:
        kw["docs_per_shard"] = args.docs_per_shard
    cfg = EngineConfig(**kw) if kw else DEFAULT

    t0 = time.perf_counter()
    live = StreamingLiveIndex(
        spark,
        args.input,
        args.root,
        cfg=cfg,
        text_col=args.text_col,
        doc_id_col=args.doc_id_col,
        vector_dim=args.vector_dim,
        vector_n_centroids=args.vector_n_centroids,
    )
    gen = live.process_available(
        max_files_per_batch=args.max_files_per_batch
    )
    pr_stats: dict = {}
    if args.refresh_pagerank and gen >= 0:
        if args.edges:
            edges = spark.read.parquet(args.edges)
        else:
            from search_engine_spark.operators.pagerank import (
                repo_link_graph,
            )
            from search_engine_spark.publish import load_latest_index

            # the raw stream dir accumulates EVERY recrawled version
            # and CDC tombstone row — duplicate doc_ids would put
            # self-loops in the ring graph and tombstoned docs would
            # siphon rank mass. Restrict to one row per doc_id, and to
            # the PUBLISHED live set (the index knows which docs
            # survived compaction).
            corpus = spark.read.parquet(args.input).dropDuplicates(
                ["doc_id"]
            )
            idx = load_latest_index(spark, args.root)
            live_ids = (
                idx.docs if idx.docs is not None else idx.doc_stats
            ).select("doc_id")
            # plain semi-join: AQE broadcasts the id list when small
            edges = repo_link_graph(
                corpus.join(live_ids, "doc_id", "left_semi")
            )
        gen = live.refresh_pagerank(edges, stats=pr_stats)
    pruned = (
        prune_generations(args.root, keep=args.keep_generations)
        if args.keep_generations
        else []
    )
    ptr = read_latest(args.root) or {}
    print(
        json.dumps(
            {
                "generation": gen,
                "n_docs": ptr.get("n_docs"),
                "batches_this_run": live.batches_published,
                "pruned_generations": pruned,
                "pagerank_iterations": pr_stats.get("iterations"),
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
