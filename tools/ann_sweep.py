#!/usr/bin/env python
"""ANN recall-vs-cost sweep at cluster-relevant scale.

Generates a deterministic near-uniform embedding table (the measured
worst case for bucketed ANN — same regime as the driver's synthetic
embeddings), then measures wall time and recall@10 vs brute-force
cosine for:

  * ``pq_topk``   at candidate pools 50/100/200/400 (200 = the
    round-5 default: dominates 100 on both axes at 4.8M)
  * ``lsh_topk``  (n_planes=8) at hamming radii 3/4/5, PQ screen on
  * ``ivf_topk``  (C=32) at n_probe 8/16/23/26, PQ screen on
  * each bucketed op once more WITHOUT the PQ screen (full-precision
    probed scan) to isolate the screen's contribution

Writes one JSON object to --out (default /tmp/ann_sweep.json) and
prints a BENCH.md-ready table. Walls are per-query means over
--queries fresh query vectors on a warmed, persisted table — the
steady-state shape of an ANN service scan.

Usage:
  python tools/ann_sweep.py --n 480000 --dim 64 --queries 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_embeddings(spark, n: int, dim: int, parts: int = 64):
    """Deterministic near-uniform vectors: standard normals seeded by
    row-id block, via mapInPandas (no driver materialization)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_vecs = []
            for i in ids:
                rng = np.random.default_rng(10_000 + int(i))
                out_vecs.append(
                    rng.standard_normal(dim).astype(np.float32).tolist()
                )
            yield pd.DataFrame({"vec_id": ids, "embedding": out_vecs})

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=480_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default="/tmp/ann_sweep.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
        lsh_topk,
        pq_attach,
        pq_topk,
        train_pq,
    )
    from search_engine_spark.session import get_spark

    extra = {"spark.ui.enabled": "false",
             "spark.driver.memory":
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")}
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    spark = get_spark(app_name="ann-sweep", master=f"local[{args.cores}]",
                      shuffle_partitions=64, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    emb = make_embeddings(spark, args.n, args.dim).persist()
    emb.count()

    t0 = time.perf_counter()
    cb = train_pq(emb, dim=args.dim, ks=256, iters=8)
    train_pq_sec = time.perf_counter() - t0
    enc = pq_attach(emb, cb).persist()
    t0 = time.perf_counter()
    enc.count()
    encode_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    cents = kmeans_centroids(emb, dim=args.dim, n_centroids=32, iters=3)
    ivf_train_sec = time.perf_counter() - t0
    assigned = pq_attach(ivf_assign(emb, cents), cb).persist()
    assigned.count()

    from search_engine_spark.operators.similarity import (
        lsh_assign_buckets,
    )

    # pre-bucket ONCE (build-time shape); lsh_topk reuses the column
    enc_b = lsh_assign_buckets(enc, args.dim, n_planes=8).persist()
    enc_b.count()

    qrows = emb.where(F.col("vec_id") < args.queries).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in qrows]

    def ids(df):
        return [r["vec_id"] for r in df.collect()]

    # ground truth + brute wall
    truth = {}
    t0 = time.perf_counter()
    for vid, qv in queries:
        truth[vid] = set(ids(cosine_topk(emb, qv, k=10, exclude_ids=[vid])))
    brute_sec = (time.perf_counter() - t0) / len(queries)

    results = [{"algo": "brute", "params": {}, "wall_sec": round(brute_sec, 4),
                "recall": 1.0, "cost_ratio": 1.0}]

    def run(algo, params, fn):
        hits = tot = 0
        t0 = time.perf_counter()
        for vid, qv in queries:
            got = set(ids(fn(qv, vid)))
            hits += len(got & truth[vid])
            tot += len(truth[vid])
        wall = (time.perf_counter() - t0) / len(queries)
        row = {"algo": algo, "params": params,
               "wall_sec": round(wall, 4),
               "recall": round(hits / max(tot, 1), 3),
               "cost_ratio": round(wall / brute_sec, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    for pool in (50, 100, 200, 400):
        run("pq", {"pool": pool},
            lambda qv, vid, pool=pool: pq_topk(
                enc, cb, qv, k=10, pool=pool, exclude_ids=[vid]))
    for radius in (3, 4, 5):
        run("lsh+pq", {"planes": 8, "radius": radius},
            lambda qv, vid, r=radius: lsh_topk(
                enc_b, qv, dim=args.dim, k=10, n_planes=8, probe_radius=r,
                codebooks=cb, exclude_ids=[vid]))
    run("lsh_noscreen", {"planes": 8, "radius": 5},
        lambda qv, vid: lsh_topk(
            enc_b.drop(*cb.word_cols), qv, dim=args.dim, k=10,
            n_planes=8, probe_radius=5, exclude_ids=[vid]))
    for n_probe in (8, 16, 23, 26):
        run("ivf+pq", {"C": 32, "n_probe": n_probe},
            lambda qv, vid, np_=n_probe: ivf_topk(
                assigned, cents, qv, k=10, n_probe=np_, codebooks=cb,
                exclude_ids=[vid]))
    run("ivf_noscreen", {"C": 32, "n_probe": 23},
        lambda qv, vid: ivf_topk(
            assigned.drop("pq_w0", "pq_w1"), cents, qv, k=10, n_probe=23,
            exclude_ids=[vid]))

    out = {
        "n": args.n, "dim": args.dim, "cores": args.cores,
        "n_queries": len(queries),
        "train_pq_sec": round(train_pq_sec, 3),
        "encode_sec": round(encode_sec, 3),
        "ivf_train_sec": round(ivf_train_sec, 3),
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))
    spark.stop()


if __name__ == "__main__":
    main()
