"""Inverted-index build (SURVEY.md §2.3 A1-A5), Spark-first.

Replaces the reference's row-per-posting SQLite insert pipeline
(ref: Indexer/SQLiteSearcher.java:100-337 posting construction,
:339-403 IDF UPDATE pass) with:

  tokenize (map-side per-doc agg, zero shuffle)
    -> explode to (doc_id, term, tf, positions)          [narrow]
    -> shard = doc_id // docs_per_shard                  [narrow]
    -> groupBy(term, shard) collect_list+sort_array      [ONE shuffle,
       Tungsten hash aggregate — posting arrays never touch Python]
    -> scalar Arrow UDF over the columnar arrays for the codec only
    -> postings table: one row per (term, shard): sorted doc-id run,
       delta+varint codec, float32 tfs, block-max metadata for WAND
  plus df/idf/doc-length stats as separate small aggregates.

Scale design:
  * The ONLY wide exchange over the big data is the (term, shard)
    repartition. Sharding by fixed doc-id ranges (not hash-salting)
    bounds the hottest term's row to ``docs_per_shard`` postings —
    deterministic skew control (a term has at most one posting per doc,
    so a range of D docs yields <= D postings per shard) — and makes
    shards align ACROSS terms, so query-time multi-term merging
    (intersection, WAND) co-groups by shard with no re-shuffle.
  * IDF is never UPDATEd in place (the reference batches 10k UPDATEs,
    SQLiteSearcher.java:360-370); it lives in the small ``term_stats``
    table and joins at query time (broadcast for query term sets).
  * BM25 per-posting weight ``bm25_tf`` is precomputed at build time from
    (tf, doc_len, avgdl), so query-time scoring needs NO join against the
    (huge) doc_stats table — score = Σ idf · bm25_tf.
  * IDF base is log10 per reference parity (SQLite LOG is base-10 —
    SURVEY quirk Q2; ref SQLiteSearcher.java:362).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.config import DEFAULT, EngineConfig
from search_engine_spark.operators import codec
from search_engine_spark.operators.tokenize import (
    token_structs,
    tokenize_docs,
)

# Above this many documents an O(corpus) DataFrame cache stops being a
# shortcut and becomes the memory cliff: SQL-caching the full postings
# of the 8M-doc lifecycle soak (tools/soak.py) filled a 96g heap with
# columnar batches and OOMed the concurrent parquet vectored reads.
# Below the bound (every sf corpus, the 2M scaling study) the in-memory
# cache is the measured win; above it, merge persists only its O(delta)
# slice and save() falls back to a DISK_ONLY cache (bounded heap: batch
# builders are transient, storage goes to local disk).
PERSIST_FULL_MAX_DOCS = 2_000_000

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("shard", T.LongType()),
        T.StructField("n_postings", T.LongType()),
        T.StructField("min_doc_id", T.LongType()),
        T.StructField("max_doc_id", T.LongType()),
        T.StructField("max_bm25_tf", T.DoubleType()),
        T.StructField(
            "postings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("doc_id", T.LongType()),
                        T.StructField("tf", T.DoubleType()),
                        T.StructField("tf_norm", T.DoubleType()),
                        T.StructField("bm25_tf", T.DoubleType()),
                        T.StructField("positions", T.ArrayType(T.IntegerType())),
                    ]
                )
            ),
        ),
        T.StructField("doc_ids_enc", T.BinaryType()),
        T.StructField("tf_enc", T.BinaryType()),
        T.StructField("bm25_tf_enc", T.BinaryType()),
        T.StructField("pos_enc", T.BinaryType()),
        T.StructField("block_max", T.ArrayType(T.DoubleType())),
    ]
)


@dataclass
class Index:
    """Built index artifacts.

    postings:   (term, shard, n_postings, min/max_doc_id, postings[],
                 codec binaries, block_max[]) — one row per (term, shard)
    term_stats: (term, df, idf)           — idf = log10(N/df)
    doc_stats:  (doc_id, doc_len)
    docs:       source docs projection (doc_id, sha256, page_rank?) or None
    """

    postings: DataFrame
    term_stats: DataFrame
    doc_stats: DataFrame
    n_docs: int
    avgdl: float
    cfg: EngineConfig
    docs: DataFrame | None = None
    # local artifact directory when this index was save()d or load()ed —
    # lets per-query metadata lookups (_idf_map) read the tiny sorted
    # term_stats parquet with pyarrow instead of paying a Spark job.
    path: str | None = None
    # caches THIS index owns (merge/delete tails persist their output;
    # Spark's SQL CacheManager pins those until an explicit unpersist,
    # so a long-running loop that merges per micro-batch must release
    # each generation after publishing it — see release()).
    owned_caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist every cache this index (and the merge chain that
        produced it) registered. Call after the index is durably saved
        / published: a streaming loop that merges per micro-batch would
        otherwise pin one cached DataFrame per generation in the SQL
        CacheManager until executor storage fills."""
        for df in self.owned_caches:
            df.unpersist()
        self.owned_caches.clear()

    def save(self, path: str) -> None:
        # term_stats derives from the same postings plan the postings
        # write evaluates, so an uncached save re-runs the reduce side
        # of merge_postings (posting assembly + codec encode) for the
        # term_stats pass — shuffle-stage reuse skips only the map side.
        # Caching the (compressed, post-aggregation) postings instead is
        # cheaper: cold build-path save 15.7 s -> 10.3 s at 150k docs /
        # local[32]. merge_indexes already persists its output, so the
        # guard makes this a no-op there (never double-persist or tear
        # down a cache we did not create).
        lvl = self.postings.storageLevel
        own_cache = not (lvl.useMemory or lvl.useDisk)
        if own_cache:
            from pyspark import StorageLevel

            self.postings.persist(
                StorageLevel.MEMORY_AND_DISK
                if self.n_docs <= PERSIST_FULL_MAX_DOCS
                else StorageLevel.DISK_ONLY
            )
        try:
            # sortWithinPartitions(term) after range-repartition →
            # parquet row-group min/max stats make term lookups prune
            # files/row-groups.
            (
                self.postings.repartitionByRange("term", "shard")
                .sortWithinPartitions("term", "shard")
                .write.mode("overwrite")
                .parquet(os.path.join(path, "postings"))
            )
            # term-sorted layout: row-group min/max stats let the
            # pyarrow idf fast path (and any term-filtered scan) prune
            (
                self.term_stats.repartitionByRange("term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(os.path.join(path, "term_stats"))
            )
            self.doc_stats.write.mode("overwrite").parquet(
                os.path.join(path, "doc_stats")
            )
        finally:
            if own_cache:
                self.postings.unpersist()
        # the docs projection (doc_id, sha256?, page_rank?) must ride
        # with the index: without it a load()ed index silently loses
        # PageRank mixing (R1/R2) and the sha256 invariant anchor. Its
        # presence is recorded in meta (not probed from storage) so the
        # layout stays object-store-agnostic.
        if self.docs is not None:
            self.docs.write.mode("overwrite").parquet(
                os.path.join(path, "docs")
            )
        from dataclasses import asdict

        meta = {
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
            # full engine config rides with the index: an index built
            # with (say) stem=False queried through a stemming analyzer
            # silently returns wrong ranks — load() reconstructs the
            # build-time analyzer unless the caller overrides.
            "cfg": asdict(self.cfg),
            # legacy top-level fields kept for external readers
            "docs_per_shard": self.cfg.docs_per_shard,
            "bm25_k1": self.cfg.bm25_k1,
            "bm25_b": self.cfg.bm25_b,
            "has_docs": self.docs is not None,
        }
        self.path = path
        spark = self.postings.sparkSession
        # range(1)+lit keeps the one-row frame JVM-side. The obvious
        # createDataFrame([...]).coalesce(1) parallelizes the local row
        # into defaultParallelism mostly-empty Python-backed slices and
        # the coalesced task drains them SERIALLY — measured ~5 s for
        # this one row at local[32]; this form is ~0.2 s.
        (
            spark.range(1)
            .select(F.lit(json.dumps(meta)).alias("meta"))
            .coalesce(1)
            .write.mode("overwrite")
            .json(os.path.join(path, "meta"))
        )

    @staticmethod
    def load(
        spark: SparkSession, path: str, cfg: EngineConfig | None = None
    ) -> "Index":
        """Load a saved index. When ``cfg`` is omitted, the BUILD-time
        config stored in the index metadata is used — querying with a
        different analyzer than the one that built the index is a
        silent-wrong-results trap, so overriding is explicit-only."""
        import dataclasses

        meta_row = spark.read.json(os.path.join(path, "meta")).collect()[0]
        meta = json.loads(meta_row["meta"])
        if cfg is None:
            saved = meta.get("cfg")
            if saved:
                names = {f.name for f in dataclasses.fields(EngineConfig)}
                cfg = EngineConfig(
                    **{k: v for k, v in saved.items() if k in names}
                )
            else:
                cfg = DEFAULT
        docs = (
            spark.read.parquet(os.path.join(path, "docs"))
            if meta.get("has_docs")
            else None
        )
        return Index(
            postings=spark.read.parquet(os.path.join(path, "postings")),
            term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
            doc_stats=spark.read.parquet(os.path.join(path, "doc_stats")),
            n_docs=int(meta["n_docs"]),
            avgdl=float(meta["avgdl"]),
            cfg=cfg,
            docs=docs,
            path=path,
        )


_ENC_SCHEMA = T.StructType(
    [
        T.StructField("doc_ids_enc", T.BinaryType()),
        T.StructField("tf_enc", T.BinaryType()),
        T.StructField("bm25_tf_enc", T.BinaryType()),
        T.StructField("pos_enc", T.BinaryType()),
        T.StructField("block_max", T.ArrayType(T.DoubleType())),
    ]
)


def _make_codec_udf(cfg: EngineConfig):
    """Scalar Arrow UDF: per (term, shard) row, numpy-vectorized codec
    over already-columnar posting arrays. The per-posting work stays in
    numpy (delta/varint, float32 pack); Python only loops over ROWS."""
    block = cfg.block_size

    @F.pandas_udf(_ENC_SCHEMA)
    def encode(
        ids: pd.Series, tfs: pd.Series, bms: pd.Series, poss: pd.Series
    ) -> pd.DataFrame:
        out: dict[str, list] = {k.name: [] for k in _ENC_SCHEMA.fields}
        for i in range(len(ids)):
            a = np.asarray(ids.iloc[i], dtype=np.int64)
            t = np.asarray(tfs.iloc[i], dtype=np.float64)
            bm = np.asarray(bms.iloc[i], dtype=np.float64)
            nb = (a.size + block - 1) // block
            out["doc_ids_enc"].append(codec.delta_encode_ids(a))
            out["tf_enc"].append(codec.encode_tfs(t))
            bm_enc = codec.encode_tfs(bm)
            out["bm25_tf_enc"].append(bm_enc)
            out["pos_enc"].append(codec.encode_positions(list(poss.iloc[i])))
            # block_max over the float32-ROUNDTRIPPED values: WAND prunes
            # against decoded float32 scores, and float32 round-to-nearest
            # can exceed the float64 original by ~1e-7 rel — a float64 max
            # would under-bound and could drop a kth-score tie.
            bm32 = codec.decode_tfs(bm_enc).astype(np.float64)
            out["block_max"].append(
                [float(bm32[j * block : (j + 1) * block].max()) for j in range(nb)]
            )
        return pd.DataFrame(out)

    return encode


def merge_postings(per_term: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(doc_id, term, tf, tf_norm, bm25_tf, positions, shard) →
    POSTINGS_SCHEMA rows, one per (term, shard).

    The posting arrays are assembled entirely JVM-side
    (``sort_array(collect_list(struct(...)))`` — Tungsten hash
    aggregate; struct ordering is lexicographic by field, and doc_id is
    the first field, so the sort IS the doc-id sort). Python is entered
    only for the codec binaries, via a scalar Arrow UDF whose inputs are
    plain numeric arrays (field extraction ``postings.doc_id`` etc. is a
    narrow JVM transform) — no per-posting Python objects are ever
    built, which is what made the old applyInPandas builder the scaling
    bottleneck on fat Zipfian groups."""
    grouped = per_term.groupBy("term", "shard").agg(
        F.sort_array(
            F.collect_list(
                F.struct("doc_id", "tf", "tf_norm", "bm25_tf", "positions")
            )
        ).alias("postings")
    )
    arrays_col = (
        F.col("postings")
        if cfg.store_arrays
        else F.lit(None).cast(POSTINGS_SCHEMA["postings"].dataType)
    )
    cols = grouped.select(
        "term",
        "shard",
        F.size("postings").cast("long").alias("n_postings"),
        F.element_at(F.col("postings.doc_id"), 1).alias("min_doc_id"),
        F.element_at(F.col("postings.doc_id"), -1).alias("max_doc_id"),
        arrays_col.alias("postings"),
        F.col("postings.doc_id").alias("_ids"),
        F.col("postings.tf").alias("_tfs"),
        F.col("postings.bm25_tf").alias("_bms"),
        F.col("postings.positions").alias("_poss"),
    )
    enc = _make_codec_udf(cfg)("_ids", "_tfs", "_bms", "_poss")
    return cols.withColumn("_enc", enc).select(
        "term",
        "shard",
        "n_postings",
        "min_doc_id",
        "max_doc_id",
        # term-level WAND bound from the float32-roundtripped block maxima
        # (max of block_max == max over decoded values) — the raw float64
        # array_max could under-bound the decoded scores WAND compares
        # against, same hazard class as block_max itself.
        F.array_max(F.col("_enc.block_max")).alias("max_bm25_tf"),
        "postings",
        F.col("_enc.doc_ids_enc").alias("doc_ids_enc"),
        F.col("_enc.tf_enc").alias("tf_enc"),
        F.col("_enc.bm25_tf_enc").alias("bm25_tf_enc"),
        F.col("_enc.pos_enc").alias("pos_enc"),
        F.col("_enc.block_max").alias("block_max"),
    )


def build_index(
    docs: DataFrame,
    text_col: str = "content",
    doc_id_col: str = "doc_id",
    cfg: EngineConfig = DEFAULT,
    sections: list[tuple[str, str]] | None = None,
) -> Index:
    """Full index build. See module docstring for the plan shape.

    ``sections``: ordered (column, section_label) pairs switch on the
    weighted multi-section analyzer (T5/T6, ref Tokenizer.java:26-33,
    126-253) — ``tf`` becomes the section-weighted count and ``doc_len``
    the reference's re-validated totalTokens, so ``tf_norm`` equals the
    reference's stored ``frequency``. Omitted → the single-content-
    section analyzer (the source-code corpus mapping)."""
    if sections is not None:
        from search_engine_spark.operators.tokenize import (
            tokenize_docs_sectioned,
        )

        tok = tokenize_docs_sectioned(docs, sections, doc_id_col, cfg)
    else:
        tok = tokenize_docs(docs, text_col, doc_id_col, cfg)
    tok = tok.persist()

    doc_stats = tok.select(
        "doc_id", F.col("n_tokens").cast("long").alias("doc_len")
    )
    agg = doc_stats.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)

    k1, b = cfg.bm25_k1, cfg.bm25_b
    per_term = (
        tok.select(
            "doc_id",
            F.col("n_tokens").cast("double").alias("doc_len"),
            F.explode(token_structs()).alias("t"),
        )
        .select(
            "doc_id",
            "doc_len",
            F.col("t.term").alias("term"),
            F.col("t.tf").alias("tf"),
            F.col("t.positions").alias("positions"),
        )
        .withColumn(
            "tf_norm",
            F.when(F.col("doc_len") > 0, F.col("tf") / F.col("doc_len"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "bm25_tf",
            (F.col("tf") * (1.0 + k1))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(max(avgdl, 1e-12)))
            ),
        )
        .withColumn(
            "shard", (F.col("doc_id") / F.lit(cfg.docs_per_shard)).cast("long")
        )
    )

    # groupBy(term, shard) is the ONLY wide exchange over token-level data.
    postings = merge_postings(per_term, cfg)

    # df/idf derive from the (tiny) per-shard posting counts — one row per
    # (term, shard) — instead of a second full pass over the token rows.
    # A term has at most one posting per doc, so df == Σ_shards n_postings.
    term_stats = (
        postings.groupBy("term")
        .agg(F.sum("n_postings").alias("df"))
        .withColumn(
            "idf", F.log10(F.lit(float(n_docs)) / F.col("df"))
        )  # quirk Q2: log base 10, ref SQLiteSearcher.java:362
    )

    docs_proj_cols = [doc_id_col]
    if "sha256" in docs.columns:
        docs_proj_cols.append("sha256")
    if "page_rank" in docs.columns:
        docs_proj_cols.append("page_rank")
    docs_proj = docs.select(*docs_proj_cols).withColumnRenamed(
        doc_id_col, "doc_id"
    )

    return Index(
        postings=postings,
        term_stats=term_stats,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        cfg=cfg,
        docs=docs_proj,
        # tok feeds doc_stats AND postings lazily, so it cannot be
        # unpersisted here; hand it to the caller's release() instead
        # (a per-batch delta build in the streaming loop would
        # otherwise pin one token cache per micro-batch).
        owned_caches=[tok],
    )


def verify_sha256(docs: DataFrame, source: DataFrame, id_col: str = "doc_id") -> int:
    """Per-row invariant (BASELINE.json input_hint): sha256(content)
    equality against the source table. Returns the number of mismatching
    rows (0 == pass)."""
    lhs = docs.select(
        F.col(id_col), F.sha2(F.col("content"), 256).alias("h")
    )
    rhs = source.select(F.col(id_col), F.col("sha256").alias("h0"))
    return (
        lhs.join(rhs, id_col, "full")
        .where(
            F.col("h").isNull()
            | F.col("h0").isNull()
            | (F.col("h") != F.col("h0"))
        )
        .count()
    )
