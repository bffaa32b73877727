#!/usr/bin/env python
"""spark-submit entry: decode a binary media table and persist feature
vectors — the batch featurization step of a multimodal training-data
pipeline (the brief's first-class multimodal surface; the reference
engine has no media path — its only binary resource is the unused
``RES/models/en-token.bin``).

    spark-submit --py-files "$ZIP" jobs/featurize_media_job.py \\
        --media /path/to/media_parquet \\
        --output /path/to/features_parquet \\
        [--modality auto|image|audio|video] \\
        [--rows-per-batch 512] [--synthesize N]

Input: parquet with (doc_id: long, media: binary). ``--modality``
picks the typed featurizer (image = BMP/PNG 8 dims, audio = WAV 8
dims, video = AVI 10 dims — all exact-integer-moment vectors from the
REAL stdlib codecs); ``auto`` (default) uses the generic magic-
dispatched ``extract_features`` (real path for decodable containers,
deterministic stub for foreign formats) and zero-pads to a fixed dim
so mixed corpora land in one schema. ``--synthesize N`` generates an
N-row deterministic AVI corpus first (self-contained smoke runs).

Output feature vectors feed VectorIndex.build / cosine_topk directly
(the features->ANN composition is pinned in test_multimodal). Scale
shape: one column-pruned scan -> one MapInPandas, zero Exchange
(plan-asserted in test_plans.py) — decode parallelism is the
file-split parallelism. Prints a one-line JSON report.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--media", help="parquet with (doc_id, media)")
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--modality", default="auto",
        choices=["auto", "image", "audio", "video"],
    )
    ap.add_argument("--dim", type=int, default=16,
                    help="output dim for --modality auto")
    ap.add_argument("--rows-per-batch", type=int, default=512)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="generate an N-row deterministic AVI corpus "
                         "instead of reading --media")
    args = ap.parse_args()
    if not args.media and not args.synthesize:
        ap.error("one of --media / --synthesize is required")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("se-featurize-media").getOrCreate()

    from search_engine_spark.operators import multimodal as mm

    t0 = time.perf_counter()
    if args.synthesize:
        ids = spark.range(0, args.synthesize).select(
            F.col("id").alias("doc_id")
        )
        media = mm.attach_fake_avi(ids)
    else:
        media = spark.read.parquet(args.media)

    featurize = {
        "image": lambda df: mm.image_features(
            df, rows_per_batch=args.rows_per_batch
        ),
        "audio": lambda df: mm.audio_features(
            df, rows_per_batch=args.rows_per_batch
        ),
        "video": lambda df: mm.video_features(
            df, rows_per_batch=args.rows_per_batch
        ),
        "auto": lambda df: mm.extract_features(
            df, dim=args.dim, rows_per_batch=args.rows_per_batch
        ),
    }[args.modality]

    featurize(media).write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    n_rows = out.count()
    n_dims = len(out.select(F.explode("features")).limit(1).collect()) and \
        out.select(F.size("features").alias("d")).limit(1).collect()[0].d

    print(
        json.dumps(
            {
                "job": "featurize_media",
                "modality": args.modality,
                "n_rows": n_rows,
                "n_dims": n_dims,
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
