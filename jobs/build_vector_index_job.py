#!/usr/bin/env python
"""spark-submit entry: build the persisted ANN artifact (VectorIndex).

    spark-submit --py-files "$ZIP" jobs/build_vector_index_job.py \\
        --input /path/to/parquet --output /path/to/vidx \\
        [--vec-col embedding --id-col vec_id]        # embeddings table
        [--hash-embed --text-col content --dim 64]   # ...or raw docs
        [--n-centroids 16] [--m M] [--kmeans-iters 3] [--pq-iters 8]

Two input shapes:
  * an embeddings table (default): ``--id-col``/``--vec-col`` name the
    id and ``array<float>`` columns;
  * a raw document table with ``--hash-embed``: the signed
    feature-hashed embedding (operators/embed.py) is computed first —
    model-free text -> vector, one narrow Arrow pass.

The artifact serves three consumers: VectorIndex.load (Spark ANN with
partition-pruned probes), vector_serving.VectorServing (~1.5 ms
interactive cell), and VectorServingRouter cluster-range fleets.
Prints one JSON line (n_vectors, dim, n_centroids, wall seconds).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument(
        "--hash-embed", action="store_true",
        help="input is a raw document table: compute the hashed "
        "embedding from --text-col first",
    )
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--dim", type=int, default=64,
                    help="embedding dim (only with --hash-embed; "
                    "otherwise inferred from the first row)")
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--m", type=int, default=None)
    ap.add_argument("--kmeans-iters", type=int, default=3)
    ap.add_argument("--pq-iters", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "se-build-vector-index"
    ).getOrCreate()

    from search_engine_spark.operators.vector_index import VectorIndex

    t0 = time.perf_counter()
    src = spark.read.parquet(args.input)
    if args.hash_embed:
        from search_engine_spark.operators.embed import hash_embed

        emb = hash_embed(
            src, dim=args.dim, text_col=args.text_col,
            id_col=args.id_col,
        ).withColumnRenamed(args.id_col, "vec_id")
        dim = args.dim
    else:
        emb = src.select(
            src[args.id_col].alias("vec_id"),
            src[args.vec_col].alias("embedding"),
        )
        dim = len(emb.first()["embedding"])

    vidx = VectorIndex.build(
        emb,
        dim=dim,
        n_centroids=args.n_centroids,
        m=args.m,
        kmeans_iters=args.kmeans_iters,
        pq_iters=args.pq_iters,
    )
    # count once (build leaves n_vectors unset) so save's meta write
    # reuses it and the report can print it
    vidx.n_vectors = vidx.vectors.count()
    vidx.save(args.output)
    print(
        json.dumps(
            {
                "n_vectors": vidx.n_vectors,
                "dim": dim,
                "n_centroids": args.n_centroids,
                "hash_embed": bool(args.hash_embed),
                "wall_sec": round(time.perf_counter() - t0, 2),
                "output": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
