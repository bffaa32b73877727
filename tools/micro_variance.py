#!/usr/bin/env python
"""Fresh-process repeat study for the sub-10-second bench rows.

The r03 verdict flagged +34-56% movement on UNCHANGED dedup/ANN code
between rounds; the documented VM variance band is ±25-40% for sub-10s
measurements. This tool bounds that properly: it runs
``python bench.py --micro`` in N fresh subprocesses back-to-back
(the scaling-study methodology — a fresh JVM/Python pair per rep, so
no shuffle-reuse or JIT carryover correlates the reps) and reports
best / median / worst per row plus the spread ratio.

Usage:
  python tools/micro_variance.py --reps 5 [--out /tmp/micro_variance.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/micro_variance.json")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    runs = []
    for rep in range(args.reps):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf_dir)
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py"), "--micro"],
            capture_output=True, text=True, env=env, cwd=HERE,
        )
        line = [ln for ln in proc.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        rec = json.loads(line)
        runs.append(rec["micro"])
        print(f"rep {rep + 1}/{args.reps}: {json.dumps(rec['micro'])}",
              flush=True)

    rows = {}
    for key in runs[0]:
        vals = sorted(r[key] for r in runs)
        rows[key] = {
            "best": vals[0],
            "median": round(statistics.median(vals), 4),
            "worst": vals[-1],
            "spread_ratio": round(vals[-1] / vals[0], 2),
        }
    out = {"reps": args.reps, "sf_dir": args.sf_dir, "rows": rows,
           "runs": runs}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{'row':<16}{'best':>8}{'median':>8}{'worst':>8}{'spread':>8}")
    for k, v in rows.items():
        print(f"{k:<16}{v['best']:>8.3f}{v['median']:>8.3f}"
              f"{v['worst']:>8.3f}{v['spread_ratio']:>7.2f}x")


if __name__ == "__main__":
    main()
