#!/usr/bin/env python
"""Zipf-skew build study (r03 verdict #8): demonstrate that the
(term, shard) posting layout bounds hot-term task skew BY CONSTRUCTION.

With ``remove_stopwords=False`` every document contains the hottest
terms ("the", "and", ...), so a layout that shuffles on TERM alone
would funnel each hot term's postings into one reducer task. The
engine's exchange key is (term, shard) — a hot term's postings split
across ceil(n_docs / docs_per_shard) rows — so no task can receive
more than one shard's slice of any term.

Evidence: run the full index build (stemming on, stopwords KEPT) at
two parallelism levels with the Spark event log enabled, then parse
per-task durations of the widest shuffle-read stage (the (term, shard)
exchange) and report max/median task time. A bounded ratio at both
levels = no straggler cliff under worst-case term skew.

Usage:
  python tools/skew_study.py --docs 480000 [--levels 8,32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_log(log_dir: str) -> list[dict]:
    """Per-stage task-duration stats from the newest event log."""
    paths = sorted(glob.glob(os.path.join(log_dir, "*")),
                   key=os.path.getmtime)
    newest = paths[-1]
    if os.path.isdir(newest):  # Spark's event-log v2 layout: a dir of
        files = sorted(        # events_* part files
            glob.glob(os.path.join(newest, "events_*")),
            key=os.path.getmtime,
        )
    else:
        files = [newest]
    stages: dict[tuple, dict] = {}
    for line in (ln for f in files for ln in open(f)):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            info = ev.get("Task Info") or {}
            dur = info.get("Finish Time", 0) - info.get(
                "Launch Time", 0
            )
            met = ev.get("Task Metrics") or {}
            sr = (met.get("Shuffle Read Metrics") or {})
            rb = sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0
            )
            st = stages.setdefault(
                key, {"durs": [], "shuffle_read": 0}
            )
            st["durs"].append(dur)
            st["shuffle_read"] += rb
        elif ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            key = (si["Stage ID"], si["Stage Attempt ID"])
            stages.setdefault(
                key, {"durs": [], "shuffle_read": 0}
            )["name"] = si.get("Name", "")
    out = []
    for (sid, _a), st in sorted(stages.items()):
        durs = sorted(st["durs"])
        if not durs:
            continue
        med = durs[len(durs) // 2]
        out.append({
            "stage": sid,
            "name": st.get("name", "")[:48],
            "n_tasks": len(durs),
            "median_ms": med,
            "max_ms": durs[-1],
            "straggler_ratio": round(durs[-1] / max(med, 1), 2),
            "shuffle_read_mb": round(st["shuffle_read"] / 2**20, 1),
        })
    return out


def run_level(cores: int, corpus_path: str, log_dir: str) -> dict:
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.session import get_spark

    extra = {
        "spark.ui.enabled": "false",
        "spark.driver.memory":
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{log_dir}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark(app_name=f"skew-{cores}",
                      master=f"local[{cores}]",
                      shuffle_partitions=128, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(corpus_path).repartition(128).persist()
        n = docs.count()
        cfg = EngineConfig(remove_stopwords=False)  # worst-case skew
        t0 = time.perf_counter()
        idx = build_index(docs, cfg=cfg)
        idx.postings.count()
        wall = time.perf_counter() - t0
        return {"cores": cores, "n_docs": n,
                "build_sec": round(wall, 2),
                "docs_per_sec": round(n / wall, 1)}
    finally:
        spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=480_000)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--out", default="/tmp/skew_study.json")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    # reuse the scaling corpus (same generator/seed/partitioning)
    sys.argv = [sys.argv[0]]
    import bench

    corpus = bench._scaling_corpus_path(args.docs)
    results = []
    for cores in levels:
        log_dir = tempfile.mkdtemp(prefix=f"se_skew_log_{cores}_")
        try:
            rec = run_level(cores, corpus, log_dir)
            stages = parse_event_log(log_dir)
            # the (term, shard) exchange = widest shuffle-READ stage
            wide = max(stages, key=lambda s: s["shuffle_read_mb"])
            rec["exchange_stage"] = wide
            top = sorted(stages, key=lambda s: -s["shuffle_read_mb"])[:4]
            rec["top_stages"] = top
            results.append(rec)
            print(json.dumps(
                {k: rec[k] for k in
                 ("cores", "build_sec", "docs_per_sec",
                  "exchange_stage")}), flush=True)
        finally:
            shutil.rmtree(log_dir, ignore_errors=True)
    with open(args.out, "w") as fh:
        json.dump({"docs": args.docs, "levels": results}, fh, indent=1)


if __name__ == "__main__":
    main()
