#!/usr/bin/env python
"""spark-submit entry: extract + normalize outgoing links and persist the
link-edge table (S6, the reference's ``extracted_links`` sink —
Crawler.java:404-407 DDL, :475-489 extraction).

    spark-submit --py-files "$ZIP" jobs/extract_links_job.py \\
        --docs /path/to/documents_parquet \\
        --output /path/to/links_parquet \\
        [--text-col text] [--max-links 10] \\
        [--resolve --url-col url]   # also write resolved (src, dst) edges
                                    # next to the raw table (<output>_edges)

The raw sink matches the reference's table shape
(doc_id, extracted_link); ``--resolve`` additionally joins the links
against the doc table's URL column into PageRank-ready (src, dst) edges
(DataBaseManager.java:37-57's join, done once at write time instead of
every ranker run). Prints a one-line JSON report.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--max-links", type=int, default=10)
    ap.add_argument("--resolve", action="store_true")
    ap.add_argument("--url-col", default="url")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("se-extract-links").getOrCreate()

    from search_engine_spark.operators.pagerank import edges_from_links
    from search_engine_spark.operators.urls import extract_links

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.docs)
    links = extract_links(
        docs, text_col=args.text_col, max_links=args.max_links
    ).withColumnRenamed("link", "extracted_link")
    links.write.mode("overwrite").parquet(args.output)
    links = spark.read.parquet(args.output)
    n_links = links.count()

    n_edges = None
    if args.resolve:
        resolv = docs.select(
            F.col("doc_id").alias("id"), F.col(args.url_col).alias("url")
        )
        edges = edges_from_links(links, resolv)
        edges.write.mode("overwrite").parquet(args.output + "_edges")
        n_edges = spark.read.parquet(args.output + "_edges").count()

    print(
        json.dumps(
            {
                "job": "extract_links",
                "n_docs": docs.count(),
                "n_links": n_links,
                "n_edges": n_edges,
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
