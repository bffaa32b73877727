#!/usr/bin/env python
"""Incremental-PageRank warm-start study: after a small graph delta
(the LSM merge / live-generation story), warm-starting the G2 fixpoint
from the previous generation's ranks reaches the SAME answer as a cold
run on the new graph in a fraction of the iterations — and each saved
iteration at scale is a full edge-table join + aggregate (the only
per-iteration shuffles in pagerank()).

Epsilon note: the reference's convergence test is an ABSOLUTE
max-delta <= 1e-5 (Ranker/PageRank.java:93-100) tuned for its ~6k-doc
corpus where 1/N ~ 1.7e-4. At N=240k ranks themselves are ~4e-6, so
the absolute bar is crossed almost immediately and iteration counts
stop measuring anything. This study keeps the reference's RELATIVE
strictness instead: eps = eps_scale / N with eps_scale = 0.06
(= 1e-5 * 6000, the reference's eps x its N).

Protocol (fresh local[--cores] session, deterministic corpus):
  1. cold ranks on the base graph of --docs files (repo ring graph)
  2. grow the corpus by --delta-frac (same seed: the first N rows are
     byte-identical, so this IS an append delta), rebuild edges
  3. cold run on the new graph vs warm run init from step 1's ranks
  4. assert max|warm - cold| <= 2*eps*d/(1-d) (stopping-rule bound),
     report iterations + wall for both

Usage:
  python tools/pr_warm_study.py --docs 240000 [--delta-frac 0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240_000)
    ap.add_argument("--delta-frac", type=float, default=0.01)
    ap.add_argument("--eps-scale", type=float, default=0.06)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="/tmp/pr_warm_study.json")
    args = ap.parse_args()

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.pagerank import (
        incremental_pagerank,
        pagerank,
        repo_link_graph,
    )
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.corpus import generate_corpus

    extra = {"spark.ui.enabled": "false",
             "spark.driver.memory":
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark(app_name="pr-warm-study",
                      master=f"local[{args.cores}]",
                      shuffle_partitions=2 * args.cores,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    n0 = args.docs
    n1 = int(round(n0 * (1.0 + args.delta_frac)))
    eps = args.eps_scale / n0
    d = 0.85
    cfg = EngineConfig(
        pagerank_local_threshold=0,  # force the iterative-DataFrame loop
        pagerank_epsilon=eps,
        pagerank_max_iter=500,
    )

    # same seed => the first n0 rows of the n1 corpus are identical:
    # the grown corpus IS base + append-delta
    full = generate_corpus(spark, n1, seed=42).persist()
    full.count()
    base = full.where(f"doc_id < {n0}")

    def run(label, edges, nodes, init=None):
        stats: dict = {}
        t = time.perf_counter()
        fn = pagerank if init is None else incremental_pagerank
        kw = {"cfg": cfg, "stats": stats}
        pr = (fn(edges, nodes, **kw) if init is None
              else fn(edges, nodes, init, **kw))
        pr = pr.persist()
        n_r = pr.count()
        wall = time.perf_counter() - t
        print(f"{label}: n={n_r} iters={stats['iterations']} "
              f"wall={wall:.1f}s", flush=True)
        return pr, {"label": label, "n": n_r, "wall_sec": round(wall, 2),
                    "iterations": stats["iterations"]}

    e0 = repo_link_graph(base).persist()
    e0.count()
    prev, r_base = run("cold_base", e0, base.select("doc_id"))

    e1 = repo_link_graph(full).persist()
    e1.count()
    cold, r_cold = run("cold_new", e1, full.select("doc_id"))
    warm, r_warm = run("warm_new", e1, full.select("doc_id"), init=prev)

    from pyspark.sql import functions as F

    gap = (
        cold.alias("c")
        .join(warm.alias("w"), "doc_id")
        .agg(F.max(F.abs(F.col("c.page_rank")
                         - F.col("w.page_rank"))).alias("m"))
        .collect()[0]["m"]
    )
    bound = 2 * eps * d / (1 - d)
    ok = gap is not None and gap <= bound
    report = {
        "study": "pagerank_warm_start",
        "n_base": n0, "n_new": n1, "delta_frac": args.delta_frac,
        "eps": eps, "cores": args.cores,
        "runs": [r_base, r_cold, r_warm],
        "iters_cold": r_cold["iterations"],
        "iters_warm": r_warm["iterations"],
        "iter_ratio": round(r_warm["iterations"]
                            / max(1, r_cold["iterations"]), 3),
        "wall_cold_sec": r_cold["wall_sec"],
        "wall_warm_sec": r_warm["wall_sec"],
        "max_abs_gap": gap, "gap_bound": bound, "same_fixpoint": ok,
    }
    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    if not ok:
        sys.exit(2)


if __name__ == "__main__":
    main()
