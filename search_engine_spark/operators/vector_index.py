"""Persisted ANN index artifact (VectorIndex): the vector-search
counterpart of the text index's save/load lifecycle.

Layout under ``<path>/``:

  vectors/cluster=K/*.parquet   (vec_id, embedding, pq_w*, vec_norm)
                                — partitionBy(cluster), so an IVF probe
                                of P clusters is a PARTITION-PRUNED
                                read: only the probed directories are
                                scanned (plan-asserted in
                                tests/test_vector_index.py)
  meta/part-*.json              one row: dim / m / ks / centroids /
                                PQ codebooks / n_vectors

Query dispatch (``topk``):
  * ``exact=True``  — brute-force cosine over all rows == cosine_topk
    (the correctness dial; shares the driver gate's SQL oracle).
  * default         — IVF probe (adaptive ceil(0.7·C)) + PQ-ADC screen
    + exact rerank, the measured 0.8+ recall @ ~0.5× brute wall
    configuration (BENCH.md round-4 sweep).

At 100 TB each cluster directory is further split by parquet file; a
serving fleet assigns cluster ranges to nodes the same way the text
tier's ``ServingRouter`` assigns term ranges.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.similarity import (
    PQCodebooks,
    cosine_topk,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
    pq_attach,
    train_pq,
)
from search_engine_spark.session import local_df


class VectorIndex:
    def __init__(
        self,
        vectors: DataFrame,
        codebooks: PQCodebooks,
        cents: list[list[float]],
        dim: int,
        n_vectors: int | None = None,
        idf: list[float] | None = None,
    ):
        self.vectors = vectors          # vec_id, embedding, cluster, pq_w*
        self.codebooks = codebooks
        self.cents = cents
        self.dim = dim
        self.n_vectors = n_vectors
        # the bucket-IDF vector the corpus embeddings were built with
        # (embed.fit_bucket_idf), persisted so QUERY-side embedding
        # uses the same weighting — an IDF-weighted index served with
        # an unweighted query is asymmetric cosine, silently skewed
        self.idf = (
            [float(x) for x in idf] if idf is not None else None
        )

    # -- build --------------------------------------------------------------

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        dim: int,
        n_centroids: int = 16,
        m: int | None = None,
        ks: int = 256,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        kmeans_iters: int = 3,
        pq_iters: int = 8,
        idf: list[float] | None = None,
    ) -> "VectorIndex":
        """Train the coarse quantizer (deterministic Lloyd) and the PQ
        codebooks (driver-side on a hash-sample), assign + encode every
        row — two narrow Arrow passes over the corpus, no shuffle.
        Pass ``idf`` when ``emb`` was produced by
        ``hash_embed(idf=...)`` so text queries against the saved
        artifact embed with the same bucket weighting."""
        cents = kmeans_centroids(
            emb, dim=dim, n_centroids=n_centroids, iters=kmeans_iters,
            id_col=id_col, vec_col=vec_col,
        )
        cb = train_pq(
            emb, dim=dim, m=m, ks=ks, iters=pq_iters,
            id_col=id_col, vec_col=vec_col,
        )
        vec = pq_attach(
            ivf_assign(emb, cents, id_col=id_col, vec_col=vec_col), cb,
        )
        return cls(vec, cb, cents, dim, idf=idf)

    # -- incremental maintenance ---------------------------------------------

    def add_vectors(
        self,
        delta: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "VectorIndex":
        """New index over the UNION of this index's rows and ``delta``
        (new vec_id/embedding rows), encoded with the EXISTING coarse
        centroids and PQ codebooks — the standard IVF/PQ insert: no
        retraining, two narrow Arrow passes over the delta only. The
        exact dial stays brute-force-identical over the union by
        construction; approximate recall degrades only if the delta
        shifts the distribution the quantizers were trained on (after
        a large drift, rebuild — same judgement call as a text-index
        full rebuild vs LSM merge)."""
        enc = pq_attach(
            ivf_assign(delta, self.cents, id_col=id_col, vec_col=vec_col),
            self.codebooks,
        )
        return VectorIndex(
            self.vectors.unionByName(enc),
            self.codebooks,
            self.cents,
            self.dim,
            idf=self.idf,
        )

    @classmethod
    def append_to(
        cls,
        spark: SparkSession,
        path: str,
        delta: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "VectorIndex":
        """Append ``delta`` to a SAVED index without touching existing
        rows: encode with the saved centroids/codebooks and
        parquet-APPEND into the same ``vectors/cluster=K/`` layout —
        only the delta is written (new files inside the touched cluster
        directories; untouched clusters gain no bytes). Meta's
        n_vectors is updated. Returns the reloaded index."""
        base = cls.load(spark, path)
        enc = pq_attach(
            ivf_assign(delta, base.cents, id_col=id_col, vec_col=vec_col),
            base.codebooks,
        ).persist()  # count + write must not each re-run the encode
        try:
            n_delta = enc.count()
            enc.write.mode("append").partitionBy("cluster").parquet(
                os.path.join(path, "vectors")
            )
        finally:
            enc.unpersist()
        cls._write_meta(
            spark, path, base, n_vectors=base.n_vectors + n_delta
        )
        return cls.load(spark, path)

    @classmethod
    def remove_ids(
        cls,
        spark: SparkSession,
        path: str,
        ids: list[int],
        id_col: str = "vec_id",
    ) -> "VectorIndex":
        """Delete vectors from a SAVED index by id, rewriting ONLY the
        cluster partitions that contain them (CDC tombstone compaction,
        the `delete_docs` counterpart): the ids are looked up to find
        their clusters, and dynamic partition overwrite rewrites just
        those directories — at 100 TB a delete of k vectors touches at
        most k cluster partitions, never the whole index."""
        base = cls.load(spark, path)
        idf = local_df(
            spark, [(int(i),) for i in ids], f"{id_col} long"
        )
        hit = (
            base.vectors.join(F.broadcast(idf), id_col, "left_semi")
            .select("cluster")
            .distinct()
        )
        clusters = [int(r["cluster"]) for r in hit.collect()]
        if clusters:
            survivors = (
                base.vectors.where(F.col("cluster").isin(clusters))
                .join(F.broadcast(idf), id_col, "left_anti")
                # cut the file lineage: the write overwrites partitions
                # the plan would otherwise still be reading from
                .localCheckpoint()
            )
            if not survivors.head(1) and not base.vectors.where(
                ~F.col("cluster").isin(clusters)
            ).head(1):
                raise ValueError(
                    "remove_ids would delete EVERY vector — an empty "
                    "index is unreadable; delete the index directory "
                    "instead"
                )
            (
                survivors.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("cluster")
                .parquet(os.path.join(path, "vectors"))
            )
            # a fully-emptied cluster writes no partition, so dynamic
            # overwrite leaves its old files — drop those directories
            left = {
                int(r["cluster"])
                for r in survivors.select("cluster").distinct().collect()
            }
            for c in set(clusters) - left:
                import shutil

                d = os.path.join(path, "vectors", f"cluster={c}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
            # exact count: ids may contain unknown values
            new_n = spark.read.parquet(
                os.path.join(path, "vectors")
            ).count()
        else:
            new_n = base.n_vectors
        cls._write_meta(spark, path, base, n_vectors=new_n)
        return cls.load(spark, path)

    @staticmethod
    def _write_meta(
        spark: SparkSession, path: str, idx: "VectorIndex", n_vectors: int
    ) -> None:
        meta = {
            "dim": idx.dim,
            "cents": idx.cents,
            "codebooks": idx.codebooks.to_json(),
            "n_vectors": int(n_vectors),
            "idf": idx.idf,
        }
        local_df(
            spark, [(json.dumps(meta),)], "meta string"
        ).write.mode("overwrite").json(os.path.join(path, "meta"))

    # -- persistence ----------------------------------------------------------

    def save(self, path: str) -> "VectorIndex":
        spark = self.vectors.sparkSession
        self.vectors.write.mode("overwrite").partitionBy(
            "cluster"
        ).parquet(os.path.join(path, "vectors"))
        self._write_meta(
            spark,
            path,
            self,
            n_vectors=self.n_vectors
            if self.n_vectors is not None
            else self.vectors.count(),
        )
        return self

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "VectorIndex":
        meta_df = spark.read.json(os.path.join(path, "meta"))
        meta = json.loads(meta_df.first()["meta"])
        vec = spark.read.parquet(os.path.join(path, "vectors"))
        return cls(
            vec,
            PQCodebooks.from_json(meta["codebooks"]),
            [[float(x) for x in c] for c in meta["cents"]],
            int(meta["dim"]),
            n_vectors=int(meta["n_vectors"]),
            idf=meta.get("idf"),
        )

    # -- query ----------------------------------------------------------------

    def topk(
        self,
        query_vec: list[float],
        k: int = 10,
        n_probe: int | None = None,
        pool: int | None = None,
        exact: bool = False,
        exclude_ids: list[int] | None = None,
    ) -> DataFrame:
        """Top-k (vec_id, cosine). ``exact=True`` → brute force over
        every row (== ``cosine_topk``); default → IVF probe (adaptive)
        + PQ screen + exact rerank. On a SAVED index the probe's
        ``cluster isin(...)`` filter is a parquet PARTITION filter —
        unprobed cluster directories are never read."""
        if exact:
            return cosine_topk(
                self.vectors, query_vec, k=k, exclude_ids=exclude_ids,
            )
        return ivf_topk(
            self.vectors,
            self.cents,
            query_vec,
            k=k,
            n_probe=n_probe,
            codebooks=self.codebooks,
            pool=pool,
            exclude_ids=exclude_ids,
        )

    def topk_text(self, query_text: str, k: int = 10, **kw) -> DataFrame:
        """Free-text entry over a hashed-embedding index: embeds the
        query with the SAME bucket weighting the corpus was built with
        (the persisted ``idf`` vector, when present) and dispatches to
        ``topk``."""
        from search_engine_spark.operators.embed import embed_text

        return self.topk(
            embed_text(query_text, self.dim, idf=self.idf), k=k, **kw
        )
