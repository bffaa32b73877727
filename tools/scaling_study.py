#!/usr/bin/env python
"""Scaling study: index-build throughput at several parallelism levels,
each level in a FRESH process (python bench.py --scaling-one C), plus a
pure-CPU hardware-calibration run that measures how far this VM itself
scales from N to 4N busy processes (the ceiling no Spark job can beat).

Levels are interleaved across passes so slow drift in VM noise hits all
levels equally. Results accumulate in /tmp/scaling_study.json.

Usage: python tools/scaling_study.py [--levels 1,2,4,8,32] [--passes 2]

CAUTION (both bit this round): (1) the state file RESUMES — runs and
the hardware ceiling from a previous invocation (possibly previous-round
CODE) are kept and mixed into the summary; delete the --out file or use
a fresh path when the code under test changed. A loud note prints when
existing state is loaded. (2) at --docs 2000000 the 32-thread level
needs SPARK_GRAFT_DRIVER_MEM=48g (the 16g default OOMs in the cache
materialization).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/scaling_study.json"  # override with --out


def _burn(n: int) -> float:
    # pure-python + numpy mix, roughly like tokenize workload
    import numpy as np

    acc = 0.0
    for _ in range(n):
        a = np.random.default_rng(1).random(200_000)
        acc += float(np.sort(a)[:100].sum())
        acc += sum(hash(str(i)) % 7 for i in range(20_000))
    return acc


def hardware_ceiling(levels: list[int], work: int = 6) -> dict[str, float]:
    """Wall time to complete `cores * work` burn units with `cores`
    processes — perfect scaling keeps wall time constant; report
    throughput (units/sec) per level."""
    out = {}
    for cores in levels:
        t0 = time.perf_counter()
        with mp.Pool(cores) as p:
            p.map(_burn, [work] * cores)
        dt = time.perf_counter() - t0
        out[str(cores)] = round(cores * work / dt, 3)
    return out


def run_level(cores: int) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SCALING_REPS", "2")
    r = subprocess.run(
        [sys.executable, "bench.py", "--scaling-one", str(cores)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    print(f"level {cores} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
    return None


def main() -> None:
    global OUT
    levels = [1, 2, 4, 8, 32]
    passes = 2
    if "--levels" in sys.argv:
        levels = [
            int(x)
            for x in sys.argv[sys.argv.index("--levels") + 1].split(",")
        ]
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    if "--out" in sys.argv:
        OUT = sys.argv[sys.argv.index("--out") + 1]
    if "--docs" in sys.argv:
        os.environ["SPARK_GRAFT_SCALING_DOCS"] = sys.argv[
            sys.argv.index("--docs") + 1
        ]

    state: dict = {"hw_throughput": {}, "runs": []}
    if os.path.exists(OUT):
        state = json.load(open(OUT))
        print(
            f"RESUMING from {OUT}: {len(state.get('runs', []))} prior "
            "runs and the prior hw ceiling will be kept and mixed into "
            "the summary — delete the file first if the code under test "
            "changed",
            flush=True,
        )

    if not state["hw_throughput"]:
        state["hw_throughput"] = hardware_ceiling(sorted(set(levels)))
        json.dump(state, open(OUT, "w"), indent=1)
        print("hw ceiling:", state["hw_throughput"], flush=True)

    for p in range(passes):
        for cores in levels:
            r = run_level(cores)
            if r:
                r["pass"] = p
                state["runs"].append(r)
                json.dump(state, open(OUT, "w"), indent=1)
                print(json.dumps(r), flush=True)

    # summarize best (min) build_sec per (corpus size, level) — runs at
    # different --docs sizes accumulate in one file and must never be
    # compared across workloads (review finding)
    best: dict[tuple[int, int], float] = {}
    for r in state["runs"]:
        key = (r.get("n_docs", 0), r["cores"])
        for t in r.get("build_secs", [r["build_sec"]]):
            best[key] = min(best.get(key, 1e9), t)
    for nd in sorted({k[0] for k in best}):
        lv = {c: t for (d, c), t in best.items() if d == nd}
        print(f"[n_docs={nd}] best build_sec per level:", dict(sorted(lv.items())))
        for n in sorted(lv):
            if 4 * n in lv:
                eff = lv[n] / lv[4 * n] / 4.0
                hw = state["hw_throughput"]
                hw_eff = None
                if str(n) in hw and str(4 * n) in hw:
                    hw_eff = hw[str(4 * n)] / hw[str(n)] / 1.0
                print(
                    f"[n_docs={nd}] N={n} vs 4N={4 * n}: efficiency={eff:.3f}"
                    + (f" (hw ceiling throughput ratio {hw_eff:.3f}x)" if hw_eff else "")
                )


if __name__ == "__main__":
    main()
