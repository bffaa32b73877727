"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force cosine top-k, fully JVM-side
  (``zip_with`` + ``aggregate`` higher-order functions — no Python in the
  hot path). The correct baseline at any scale; O(N·d) per query.
* ``lsh_assign_buckets`` / ``lsh_topk`` — random-hyperplane LSH: each
  vector gets a ``n_planes``-bit signature; queries only score their own
  bucket (and optionally neighboring buckets by hamming radius 1). The
  scale path: bucket assignment is a one-pass narrow transform, the
  bucket column becomes a partition/cluster key, and a query touches
  1/2^n_planes of the data in expectation.

Hyperplanes are deterministic pseudo-random (seeded hash of
(plane, dim)), so signatures are reproducible across runs/engines with
no stored model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query_vec``.
    Deterministic tie-break (cos DESC, id ASC); plans as
    TakeOrderedAndProject — no global sort materialization."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = as_double_array(F.col(vec_col))
    df = embeddings.select(
        F.col(id_col).alias("vec_id"),
        (_dot(v, q) / (_norm(v) * _norm(q))).alias("cosine"),
    )
    if exclude_ids:
        df = df.where(~F.col("vec_id").isin(exclude_ids))
    return df.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1): derived
    from md5 so any engine can reproduce it."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:8]
    return (int(h, 16) / 0x7FFFFFFF) - 1.0


def lsh_assign_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``bucket`` column: sign-bit signature against ``n_planes``
    deterministic hyperplanes. Narrow (no shuffle)."""
    v = as_double_array(F.col(vec_col))
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(_plane_component(p, d)) for d in range(dim)]
        )
        bit = F.when(_dot(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return embeddings.withColumn("bucket", bucket).withColumnRenamed(
        id_col, "vec_id"
    ) if id_col != "vec_id" else embeddings.withColumn("bucket", bucket)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only the query's LSH bucket. At scale the bucketed
    table is written partitioned by ``bucket`` so this prunes to one
    partition; recall measured vs cosine_topk in tests."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qb = 0
    for p in range(n_planes):
        plane = np.asarray(
            [_plane_component(p, d) for d in range(dim)], dtype=np.float64
        )
        if float(q @ plane) >= 0:
            qb |= 1 << p
    bucketed = lsh_assign_buckets(embeddings, dim, n_planes, id_col, vec_col)
    return cosine_topk(
        bucketed.where(F.col("bucket") == qb),
        query_vec,
        k=k,
        id_col="vec_id",
        vec_col=vec_col,
    )
