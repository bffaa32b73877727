#!/usr/bin/env python
"""spark-submit entry: Structured-Streaming incremental index ingest.

Drains every corpus file currently in --input (Trigger.AvailableNow)
into checkpointed index batches under --output, then (unless
--no-finalize) compacts them into the queryable index layout. Re-running
the job later processes ONLY files that arrived since the last run (the
stream checkpoint under <output>/_stream_checkpoint remembers progress).

    ZIP=$(python -c 'import sys; sys.path.insert(0,"<repo>"); \\
          from search_engine_spark.session import package_zip; print(package_zip())')
    spark-submit --py-files "$ZIP" jobs/stream_ingest_job.py \\
        --input  /path/to/corpus_parquet_dir \\
        --output /path/to/index \\
        [--text-col content] [--doc-id-col doc_id] \\
        [--max-files-per-batch N] [--no-finalize] [--no-stem]

Prints a one-line JSON report (batches completed, docs indexed, wall
seconds, finalize stats).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--max-files-per-batch", type=int, default=None)
    ap.add_argument("--no-finalize", action="store_true")
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--no-stopwords", action="store_true")
    ap.add_argument("--docs-per-shard", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("se-stream-ingest").getOrCreate()

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.streaming.incremental import StreamingIndexIngest

    kw = {}
    if args.no_stem:
        kw["stem"] = False
    if args.no_stopwords:
        kw["remove_stopwords"] = False
    if args.docs_per_shard:
        kw["docs_per_shard"] = args.docs_per_shard
    cfg = EngineConfig(**kw)

    t0 = time.perf_counter()
    ingest = StreamingIndexIngest(
        spark,
        args.input,
        args.output,
        cfg=cfg,
        text_col=args.text_col,
        doc_id_col=args.doc_id_col,
    )
    n_batches = ingest.process_available(args.max_files_per_batch)
    report = {
        "job": "stream-ingest",
        "batches_total": n_batches,
        "ingest_sec": round(time.perf_counter() - t0, 3),
    }
    if not args.no_finalize:
        t1 = time.perf_counter()
        idx = ingest.finalize()
        report.update(
            {
                "finalize_sec": round(time.perf_counter() - t1, 3),
                "n_docs": idx.n_docs,
                "avgdl": round(idx.avgdl, 4),
            }
        )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
