"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force cosine top-k, fully JVM-side
  (``zip_with`` + ``aggregate`` higher-order functions — no Python in the
  hot path). The correct baseline at any scale; O(N·d) per query.
* ``kmeans_centroids`` / ``ivf_assign`` / ``ivf_topk`` — IVF
  (inverted-file) ANN: deterministic Lloyd training as DataFrame algebra,
  cluster-partitioned index table, n_probe-nearest-cluster query.
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

from pyspark.sql import Column, DataFrame, Window
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


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# --------------------------------------------------------------------------

def kmeans_centroids(
    emb: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd iterations over DataFrame ops: assignment is a
    JVM argmin over broadcast centroids; the update is one
    posexplode+groupBy mean. Centroids (n_centroids × dim doubles) live
    on the driver — at 100 TB the train set is a sample, the loop shape
    is identical. Init is seeded from evenly spaced rows (deterministic,
    no RNG)."""
    base = emb.select(as_double_array(F.col(vec_col)).alias("v")).persist()
    n = base.count()
    step = max(n // n_centroids, 1)
    init = (
        base.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.monotonically_increasing_id())
            ),
        )
        .where((F.col("rn") % step == 1) | (F.lit(step) == 1))
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r["v"]] for r in init]
    for _ in range(iters):
        assigned = _assign_clusters(base, cents, "v")
        rows = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in rows:
            new[r["cluster"]][r["pos"]] = float(r["m"])
        cents = new
    base.unpersist()
    return cents


def _assign_clusters(
    df: DataFrame, cents: list[list[float]], vec_col: str
) -> DataFrame:
    """cluster = argmin_c ||v - c||² as pure column algebra:
    ||v-c||² = ||v||² - 2·v·c + ||c||², and ||v||² is common to all
    clusters, so argmin over (||c||² - 2·v·c) suffices."""
    v = F.col(vec_col)
    best_id, best_val = F.lit(0), None
    for i, c in enumerate(cents):
        carr = F.array(*[F.lit(float(x)) for x in c])
        score = F.lit(sum(x * x for x in c)) - 2.0 * _dot(v, carr)
        if best_val is None:
            best_val = score
        else:
            cond = score < best_val
            best_id = F.when(cond, F.lit(i)).otherwise(best_id)
            best_val = F.when(cond, score).otherwise(best_val)
    return df.withColumn("cluster", best_id)


def ivf_assign(
    emb: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, cluster): the IVF index table. At scale this
    is written partitioned by ``cluster`` so a probe reads only the
    probed partitions (same pruning story as the LSH bucket layout)."""
    return _assign_clusters(
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias(vec_col),
            as_double_array(F.col(vec_col)).alias("_v"),
        ),
        cents,
        "_v",
    ).select("vec_id", vec_col, "cluster")


def ivf_topk(
    assigned: DataFrame,
    cents: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: rank centroids by distance to the query on the driver,
    brute-force cosine inside the ``n_probe`` nearest clusters only.
    Recall vs cosine_topk is pinned in tests."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    d2 = [
        float(((np.asarray(c) - q) ** 2).sum()) for c in cents
    ]
    probe = sorted(range(len(cents)), key=lambda i: d2[i])[:n_probe]
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    v = as_double_array(F.col(vec_col))
    return (
        assigned.where(F.col("cluster").isin(probe))
        .select(
            "vec_id",
            (_dot(v, qarr) / (_norm(v) * _norm(qarr))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
