"""Multimodal (image/audio/video) column operators — Spark plumbing.

Design for a 100 TB training-data pipeline: media rides as an opaque
``binary`` column next to typed metadata (mime, width/height, duration),
exactly like Parquet/Iceberg store it in production. All engine-side
plumbing — schemas, partition sizing, Arrow batch shape, mapInPandas
signatures — is real and tested; only the *codec* innards (JPEG decode,
resampling) are stubbed behind ``_decode_*`` seams because this
container ships no image/audio libraries. Swap the seam for
PIL/torchaudio on a real cluster; nothing else changes.

Operators:
  * attach_fake_media   — deterministic synthetic binary payloads (seeded
                          per doc) so the pipeline is testable end-to-end
                          with no external data
  * media_stats         — per-row byte size, sha256, magic-sniffed kind
                          (pure JVM functions; no Python)
  * extract_features    — mapInPandas over Arrow batches: binary →
                          fixed-dim float feature vector (stub: seeded
                          hash-derived vector; real: CNN embedding)
  * resize_images       — mapInPandas: binary → binary (stub: truncated
                          payload + updated metadata; real: PIL resize)
  * sample_frames       — one row per sampled frame index with a byte
                          slice (real: keyframe extraction)

Scale notes:
  * Binary rows are large — ``rows_per_batch`` caps Arrow batch memory
    (batch_bytes ≈ rows_per_batch × payload). Set
    spark.sql.execution.arrow.maxRecordsPerBatch accordingly.
  * mapInPandas streams batches (iterator API): peak executor memory is
    one batch, not one partition.
  * All outputs keep doc_id so downstream joins stay co-partitioned.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"RIFF": "audio/wav",
}


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", payload_bytes: int = 256
) -> DataFrame:
    """Deterministic synthetic media column: payload = magic prefix +
    sha256-keystream of the doc id; dims derived from the id. Pure
    column expressions (sha2/repeat/substr) — executors never run
    Python here."""
    i = F.col(id_col).cast("long")
    magic = F.when(i % 3 == 0, F.lit(b"\xff\xd8\xff\xe0")).when(
        i % 3 == 1, F.lit(b"\x89PNG\r\n")
    ).otherwise(F.lit(b"RIFF\x00\x00"))
    # keystream: sha256(id) hex repeated to payload length → binary
    ks = F.repeat(
        F.sha2(i.cast("string").cast("binary"), 256),
        (payload_bytes // 32) + 1,
    )
    payload = F.concat(
        magic,
        F.substring(ks, 1, payload_bytes).cast("binary"),
    )
    return df.select(
        i.alias("doc_id"),
        payload.alias("media"),
        F.when(i % 3 == 0, "image/jpeg")
        .when(i % 3 == 1, "image/png")
        .otherwise("audio/wav")
        .alias("mime"),
        (32 + (i % 8) * 16).cast("int").alias("width"),
        (32 + (i % 5) * 16).cast("int").alias("height"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, sha256, kind): metadata scan — JVM-only
    expressions, no media decode, column-pruned to the binary column."""
    kind = F.lit("unknown")
    for magic, mime in _MAGIC.items():
        kind = F.when(
            F.substring(F.col("media"), 1, len(magic)) == F.lit(magic),
            F.lit(mime),
        ).otherwise(kind)
    return df.select(
        "doc_id",
        F.length("media").alias("n_bytes"),
        F.sha2(F.col("media"), 256).alias("sha256"),
        kind.alias("kind"),
    )


# --------------------------------------------------------------------------
# codec seams — STUBS (no image/audio libs in this container).
# Replace with PIL / torchaudio / ffmpeg on a real cluster.
# --------------------------------------------------------------------------

def _decode_features(payload: bytes, dim: int) -> np.ndarray:
    """STUB feature extractor: deterministic unit vector from the
    payload's sha256. A real deployment decodes the media and runs a
    model; the Spark-side contract (bytes in, float32[dim] out) is
    identical."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _decode_resize(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize: keeps the magic header and rehashes the body with
    the target dims (deterministic). Real impl: decode → resample →
    re-encode."""
    head = payload[:4]
    body = hashlib.sha256(payload + f":{w}x{h}".encode()).digest()
    return head + body


def extract_features(
    df: DataFrame, dim: int = FEATURE_DIM, rows_per_batch: int = 512
) -> DataFrame:
    """(doc_id, features: array<float>) via mapInPandas — Arrow-batched,
    iterator-streamed (peak memory = one batch of binaries, not a
    partition)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_features(p, dim).tolist() for p in pdf["media"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "features": feats}
            )

    return df.select("doc_id", "media").mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """binary→binary transform keeping schema: (doc_id, media, mime,
    width, height) with updated dims. Only image/* rows are transformed;
    audio passes through untouched (filter stays JVM-side)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            is_img = out["mime"].str.startswith("image/")
            out.loc[is_img, "media"] = out.loc[is_img, "media"].map(
                lambda p: _decode_resize(p, target_w, target_h)
            )
            out.loc[is_img, "width"] = target_w
            out.loc[is_img, "height"] = target_h
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """One row per sampled frame: (doc_id, frame_idx, frame_bytes).
    STUB slices the payload; real impl seeks keyframes. Output
    cardinality = rows × n_frames — the explode happens inside the UDF
    so a single Arrow batch in yields n_frames batches' worth out
    without materializing per-partition lists."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["media"]):
                step = max(len(payload) // n_frames, 1)
                for fi in range(n_frames):
                    rows.append(
                        (int(did), fi, payload[fi * step : (fi + 1) * step])
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes"]
            )

    return df.select("doc_id", "media").mapInPandas(run, schema=schema)
