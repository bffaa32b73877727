#!/usr/bin/env python
"""Sustained continuous-ingestion throughput for the streaming → LSM →
publish loop (streaming/live_index.py).

Lands --waves deterministic corpus waves of --docs docs each into a
watched directory, drains each with StreamingLiveIndex (delta build +
merge_indexes + publish_index per micro-batch), and reports per-wave
wall plus sustained docs/s over the whole run. A serving handle
refreshes after every wave to prove the generation swap is picked up
mid-stream (the query check rides along).

Usage:
  python tools/stream_bench.py --waves 4 --docs 30000 [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--docs", type=int, default=30_000)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="/tmp/stream_bench.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.serving import ServingIndex
    from search_engine_spark.sources.corpus import generate_corpus
    from search_engine_spark.session import get_spark
    from search_engine_spark.streaming.live_index import StreamingLiveIndex

    extra = {"spark.ui.enabled": "false",
             "spark.driver.memory":
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark(app_name="stream-bench",
                      master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="se_stream_bench_")
    corpus_dir = os.path.join(work, "corpus")
    root = os.path.join(work, "root")
    total = args.waves * args.docs
    full = generate_corpus(spark, total, seed=42).persist()
    full.count()

    live = None
    waves = []
    srv = None
    t_run = time.perf_counter()
    try:
        for w in range(args.waves):
            lo, hi = w * args.docs, (w + 1) * args.docs
            full.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).write.mode("append").parquet(corpus_dir)
            if live is None:
                live = StreamingLiveIndex(
                    spark, corpus_dir, root, cfg=EngineConfig()
                )
            t0 = time.perf_counter()
            gen = live.process_available()
            wall = time.perf_counter() - t0
            if srv is None:
                srv = ServingIndex.load_latest(root)
            else:
                assert srv.refresh() is True, "serving missed the swap"
            assert srv.n_docs == hi, (srv.n_docs, hi)
            assert srv.search("banana recipe", k=5)
            waves.append({"wave": w, "gen": gen, "n_new": args.docs,
                          "wall_sec": round(wall, 2),
                          "docs_per_sec": round(args.docs / wall, 1)})
            print(json.dumps(waves[-1]), flush=True)
        run_wall = time.perf_counter() - t_run
        out = {
            "waves": args.waves, "docs_per_wave": args.docs,
            "total_docs": total, "cores": args.cores,
            "run_wall_sec": round(run_wall, 2),
            "sustained_docs_per_sec": round(total / run_wall, 1),
            "per_wave": waves,
        }
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({k: v for k, v in out.items()
                          if k != "per_wave"}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
