#!/usr/bin/env python
"""Scaling study for the multimodal featurize path (the north rule's
two-parallelism-level criterion applied to the media surface): run the
SAME featurize job — decode real AVI containers from a materialized
parquet media table and emit exact-moment features into a noop sink —
at several core counts in fresh Spark sessions, and report docs/s at
each plus step scaling efficiencies.

KEY FINDING this tool measures (see BENCH.md "media scaling"): a
mapInPandas decode stage runs a JVM task thread AND a Python worker
per task slot, so `local[C]` on a C-hardware-thread box schedules 2C
runnable threads. Throughput peaks at C = hw_threads/2 (local[16] on
this 32-thread VM) and DEGRADES at local[32] — on a real cluster,
size decode-stage task parallelism at vcores/2 (e.g. via
spark.task.cpus=2 or executor-core sizing); the plan itself is
embarrassingly parallel (zero Exchange, plan-asserted).

Each timing is best-of-N fresh reps (this VM shows intermittent
multi-minute slow windows — see BENCH.md micro-variance bands).

Usage: python tools/media_scaling.py [--n 480000] [--cores 2,8,16,32]
       [--reps 3]
Writes media_scaling.json next to the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEDIA_DIR = "/dev/shm/se_media_scaling" if os.path.isdir("/dev/shm") else \
    "/tmp/se_media_scaling"


def _mk_spark(cores: int):
    from search_engine_spark.session import get_spark

    extra = {
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "16g"
        ),
    }
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=max(2 * cores, 8),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def materialize(n: int, cores: int) -> None:
    from pyspark.sql import functions as F

    from search_engine_spark.operators.multimodal import attach_fake_avi

    spark = _mk_spark(cores)
    try:
        ids = spark.range(0, n).repartition(4 * cores).select(
            F.col("id").alias("doc_id")
        )
        attach_fake_avi(ids).write.mode("overwrite").parquet(MEDIA_DIR)
    finally:
        spark.stop()


def run_once(cores: int, n: int, reps: int) -> dict:
    from search_engine_spark.operators.multimodal import video_features

    spark = _mk_spark(cores)
    try:
        media = spark.read.parquet(MEDIA_DIR)
        # warm the Arrow workers so measured reps are steady-state
        video_features(media.limit(64)).write.format("noop").mode(
            "overwrite"
        ).save()
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            video_features(media).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 2))
        best = min(walls)
        return {
            "cores": cores,
            "n_docs": n,
            "wall_secs": walls,
            "best_sec": best,
            "docs_per_sec": round(n / best, 1),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=480_000)
    ap.add_argument("--cores", default="2,8,16,32")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "media_scaling.json"))
    args = ap.parse_args()

    core_list = [int(c) for c in args.cores.split(",")]
    materialize(args.n, max(core_list))
    try:
        results = [run_once(c, args.n, args.reps) for c in core_list]
    finally:
        shutil.rmtree(MEDIA_DIR, ignore_errors=True)
    report: dict = {
        "op": "video_features over materialized AVI parquet -> noop",
        "reps_policy": f"best of {args.reps} (intermittent VM slow "
                       "windows; see BENCH.md)",
        "runs": results,
    }
    for a, b in zip(results, results[1:]):
        ratio = b["cores"] / a["cores"]
        eff = (b["docs_per_sec"] / a["docs_per_sec"]) / ratio
        report[f"efficiency_{a['cores']}to{b['cores']}"] = round(eff, 3)
    print(json.dumps(report))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
