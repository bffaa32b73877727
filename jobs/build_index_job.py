#!/usr/bin/env python
"""spark-submit entry: build (or resume) the inverted index.

Deployment mode per the north rule::

    ZIP=$(python -c 'import sys; sys.path.insert(0,"<repo>"); \\
          from search_engine_spark.session import package_zip; print(package_zip())')
    spark-submit --py-files "$ZIP" jobs/build_index_job.py \\
        --input  /path/to/corpus_parquet_or_iceberg \\
        --output /path/to/index \\
        [--resumable] [--publish] [--text-col content] [--doc-id-col doc_id] \\
        [--docs-per-shard 65536] [--shards-per-batch 64] [--no-stem]

With --publish, --output is a publish ROOT (publish.py): the index is
written as an immutable gen=K snapshot and the LATEST pointer flips
atomically, so live readers (ServingIndex.load_latest / refresh) are
never exposed to a partial overwrite. Resumable mode keeps its
checkpoint workspace at <output>/_build across resumes and publishes
on finalize.

On a cluster, --input may be an Iceberg table ref (catalog.db.tbl) —
pass --iceberg to read via the table catalog instead of parquet paths.
The job prints a one-line JSON build report (n_docs, wall seconds,
docs/sec, and for resumable builds the per-batch manifest summary).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--iceberg", action="store_true")
    ap.add_argument("--resumable", action="store_true")
    ap.add_argument("--publish", action="store_true")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--docs-per-shard", type=int, default=None)
    ap.add_argument("--shards-per-batch", type=int, default=64)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--no-stopwords", action="store_true")
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument(
        "--no-verify-sha256",
        action="store_true",
        help="skip the per-row content-sha256 invariant check against "
        "the source table (on by default whenever the source carries a "
        "sha256 column — input_hint/north-rule contract)",
    )
    args = ap.parse_args()

    # Session comes from spark-submit's conf; only fill engine defaults.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("se-build-index").getOrCreate()

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.index_checkpoint import (
        ResumableIndexBuild,
    )

    kw = {}
    if args.docs_per_shard:
        kw["docs_per_shard"] = args.docs_per_shard
    cfg = EngineConfig(
        stem=not args.no_stem,
        remove_stopwords=not args.no_stopwords,
        **kw,
    )

    docs = (
        spark.read.format("iceberg").load(args.input)
        if args.iceberg
        else spark.read.parquet(args.input)
    )

    # per-row invariant (BASELINE.json input_hint): sha256(content) must
    # equal the source table's sha256 column. Enforced BEFORE the build
    # spends cluster time on corrupt input; one narrow pass, no shuffle
    # beyond the self-join on doc_id.
    sha_mismatches = None
    if not args.no_verify_sha256 and "sha256" in docs.columns:
        from search_engine_spark.operators.index_build import verify_sha256

        sha_mismatches = verify_sha256(
            docs.select(args.doc_id_col, args.text_col).withColumnRenamed(
                args.text_col, "content"
            ),
            docs.select(args.doc_id_col, "sha256"),
            id_col=args.doc_id_col,
        )
        if sha_mismatches:
            print(json.dumps({
                "error": "sha256_mismatch",
                "mismatching_rows": sha_mismatches,
            }))
            spark.stop()
            raise SystemExit(2)

    t0 = time.perf_counter()
    if args.resumable:
        import os

        work = (
            os.path.join(args.output, "_build")
            if args.publish
            else args.output
        )
        b = ResumableIndexBuild(
            docs,
            work,
            cfg=cfg,
            text_col=args.text_col,
            doc_id_col=args.doc_id_col,
            shards_per_batch=args.shards_per_batch,
        )
        idx = b.run(max_batches=args.max_batches)
        report = {
            "mode": "resumable",
            "finalized": idx is not None,
            "batches": len(b.read_manifest()),
            "pending": len(b.pending()),
        }
        if idx is not None:
            report.update(n_docs=idx.n_docs, avgdl=round(idx.avgdl, 3))
            if args.publish:
                from search_engine_spark.operators.index_build import Index
                from search_engine_spark.publish import publish_index

                # re-read the finalized layout so the snapshot is a
                # cheap file-level rewrite, not a plan recompute
                report["generation"] = publish_index(
                    Index.load(spark, work), args.output
                )
    else:
        idx = build_index(
            docs,
            text_col=args.text_col,
            doc_id_col=args.doc_id_col,
            cfg=cfg,
        )
        if args.publish:
            from search_engine_spark.publish import publish_index

            report = {"mode": "oneshot", "generation": publish_index(
                idx, args.output
            )}
        else:
            idx.save(args.output)
            report = {"mode": "oneshot"}
        report.update(n_docs=idx.n_docs, avgdl=round(idx.avgdl, 3))
    wall = time.perf_counter() - t0
    if sha_mismatches is not None:
        report["sha256_verified"] = True
    report["wall_sec"] = round(wall, 3)
    if report.get("n_docs"):
        report["docs_per_sec"] = round(report["n_docs"] / wall, 2)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
