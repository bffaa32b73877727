#!/usr/bin/env python
"""spark-submit entry: compute PageRank over the link graph and write the
ranks back onto the document table (G3, ref
Data/DataBaseManager.java:59-74's batched UPDATE ... SET page_rank).

    spark-submit --py-files "$ZIP" jobs/pagerank_job.py \\
        --docs   /path/to/documents_parquet \\
        [--edges /path/to/edges_parquet]        # (src, dst) rows
        [--links /path/to/links_parquet]        # (doc_id, extracted_link)
                                                # resolved against docs.url
        [--damping 0.85] [--epsilon 1e-5] [--max-iter 100] [--warm-start]

Edge source precedence: --edges > --links > the deterministic repo ring
graph derived from the corpus's ``repo`` column (SURVEY.md §7 Phase 3).
The write-back is a staged parquet rewrite with an atomic directory swap;
on Iceberg it is one MERGE INTO snapshot commit. Prints a one-line JSON
report (n_docs, n_edges, n_ranked, wall seconds).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--edges", default=None)
    ap.add_argument("--links", default=None)
    ap.add_argument("--damping", type=float, default=None)
    ap.add_argument("--epsilon", type=float, default=None)
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument(
        "--warm-start",
        action="store_true",
        help="warm-start the fixpoint from the docs table's existing "
        "page_rank column (incremental refresh after a delta merge); "
        "same fixpoint, fewer iterations",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("se-pagerank").getOrCreate()

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.pagerank import (
        edges_from_links,
        repo_link_graph,
        write_back_pagerank,
    )

    kw = {}
    if args.damping is not None:
        kw["pagerank_damping"] = args.damping
    if args.epsilon is not None:
        kw["pagerank_epsilon"] = args.epsilon
    if args.max_iter is not None:
        kw["pagerank_max_iter"] = args.max_iter
    cfg = EngineConfig(**kw)

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.docs)
    if args.edges:
        edges = spark.read.parquet(args.edges).select("src", "dst")
    elif args.links:
        from pyspark.sql import functions as F

        # edges_from_links resolves against (id, url); the corpus table
        # carries doc_id
        resolv = docs.select(
            F.col("doc_id").alias("id"), F.col("url").alias("url")
        )
        edges = edges_from_links(spark.read.parquet(args.links), resolv)
    else:
        edges = repo_link_graph(docs)
    n_edges = edges.count()
    stats: dict = {}
    n_ranked = write_back_pagerank(
        spark,
        args.docs,
        edges,
        cfg=cfg,
        warm_start=args.warm_start,
        stats=stats,
    )
    print(
        json.dumps(
            {
                "job": "pagerank_writeback",
                "n_docs": spark.read.parquet(args.docs).count(),
                "n_edges": n_edges,
                "n_ranked": n_ranked,
                "iterations": stats.get("iterations"),
                "warm_start": bool(args.warm_start),
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
