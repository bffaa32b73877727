#!/usr/bin/env python
"""spark-submit entry: eval-set decontamination of a training corpus.

Deployment mode per the north rule::

    spark-submit --py-files "$ZIP" jobs/decontam_job.py \\
        --train /path/to/train_parquet --eval /path/to/eval_parquet \\
        --output /path/to/out_parquet \\
        [--mode filter|stats] [--n 13] [--min-hits 1] \\
        [--text-col content] [--doc-id-col doc_id] [--iceberg]

``--mode filter`` (default) writes the training table minus
contaminated docs; ``--mode stats`` writes (doc_id, n_shared) for every
contaminated doc instead (audit-before-drop). Prints a one-line JSON
report either way.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", required=True)
    ap.add_argument("--eval", dest="eval_path", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["filter", "stats"], default="filter")
    ap.add_argument("--n", type=int, default=13)
    ap.add_argument("--min-hits", type=int, default=1)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--iceberg", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("se-decontam").getOrCreate()

    def read(path: str):
        return (
            spark.read.format("iceberg").load(path)
            if args.iceberg
            else spark.read.parquet(path)
        )

    from search_engine_spark.operators.decontam import (
        contamination_stats,
        decontaminate,
    )

    train, ev = read(args.train), read(args.eval_path)
    kw = dict(text_col=args.text_col, id_col=args.doc_id_col, n=args.n)
    t0 = time.perf_counter()
    if args.mode == "stats":
        out = contamination_stats(train, ev, **kw)
        out.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        report = {"mode": "stats", "contaminated_docs": n_out}
    else:
        out = decontaminate(train, ev, min_hits=args.min_hits, **kw)
        out.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        n_train = train.count()
        report = {
            "mode": "filter",
            "train_docs": n_train,
            "kept_docs": n_out,
            "dropped_docs": n_train - n_out,
        }
    report.update(n=args.n, wall_sec=round(time.perf_counter() - t0, 3))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
