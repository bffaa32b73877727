"""Structured-Streaming incremental index maintenance.

The reference claims "incremental updates" (ref: README.md:29) but its
indexer re-reads the whole document table and re-inserts postings on
every run (ref: Indexer/Indexer.java:42-45,
SQLiteSearcher.java:256-259). This module does it properly: a file-source
``readStream`` watches the corpus directory; each micro-batch tokenizes
ONLY the newly arrived files and appends one checkpointed batch in the
exact ``postings_raw / doc_stats_batches / manifest`` layout the
resumable batch builder writes (operators/index_checkpoint.py), so the
same ``finalize_from_raw`` pass produces the queryable index. Exactly-once
per batch comes from Structured Streaming's checkpoint (replayed batch
ids overwrite their own directories idempotently, and the manifest write
is atomic — same crash contract as the batch builder).

Scale notes:
  * Per micro-batch work is the batch builder's: one narrow tokenize
    pass + one (term, shard) exchange over the batch's tokens only.
  * Batches may touch overlapping shards (arrival order is arbitrary) —
    duplicate (term, shard) rows across batches are part of the layout
    contract; ``finalize_from_raw``'s df aggregation and query-side
    scoring handle them, and ``finalize`` (compaction) runs on whatever
    cadence ops chooses, exactly like an Iceberg table's
    append-then-compact lifecycle.
  * BM25 weights need corpus-global avgdl, so like the batch builder the
    stream stores ``bm25_tf = doc_len`` as a placeholder and finalize
    attaches real weights in one cogrouped-by-shard pass.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT, EngineConfig
from search_engine_spark.operators.index_build import Index
from search_engine_spark.operators.index_checkpoint import (
    _cfg_hash,
    finalize_from_raw,
    merge_postings,
    read_manifests,
)
from search_engine_spark.operators.tokenize import tokenize_docs, token_structs


class StreamingIndexIngest:
    """Incremental ingest: corpus parquet dir -> checkpointed index
    batches -> (on demand) finalized index.

    Usage::

        ingest = StreamingIndexIngest(spark, corpus_dir, out_dir)
        ingest.process_available()   # drain everything currently there
        idx = ingest.finalize()      # queryable Index
        # ...more files land in corpus_dir...
        ingest.process_available()   # index ONLY the new arrivals
        idx = ingest.finalize()
    """

    def __init__(
        self,
        spark: SparkSession,
        input_path: str,
        out: str,
        cfg: EngineConfig = DEFAULT,
        text_col: str = "content",
        doc_id_col: str = "doc_id",
        schema=None,
    ):
        self.spark = spark
        self.input_path = input_path
        self.out = out
        self.cfg = cfg
        self.text_col = text_col
        self.doc_id_col = doc_id_col
        self.schema = schema or spark.read.parquet(input_path).schema
        self.manifest_dir = os.path.join(out, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- micro-batch handler ------------------------------------------------

    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        key = int(batch_id)
        docs_b = batch_df.persist()
        if not docs_b.head(1):
            docs_b.unpersist()
            return

        tok = tokenize_docs(
            docs_b, self.text_col, self.doc_id_col, self.cfg
        ).persist()
        ds_path = os.path.join(
            self.out, "doc_stats_batches", f"batch=s{key}"
        )
        tok.select(
            "doc_id", F.col("n_tokens").cast("long").alias("doc_len")
        ).write.mode("overwrite").parquet(ds_path)

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
                F.when(
                    F.col("doc_len") > 0, F.col("tf") / F.col("doc_len")
                ).otherwise(F.lit(0.0)),
            )
            # avgdl is corpus-global — placeholder, finalize attaches bm25
            .withColumn("bm25_tf", F.col("doc_len"))
            .withColumn(
                "shard",
                (F.col("doc_id") / F.lit(self.cfg.docs_per_shard)).cast(
                    "long"
                ),
            )
        )
        raw_path = os.path.join(self.out, "postings_raw", f"batch=s{key}")
        merge_postings(per_term, self.cfg).write.mode("overwrite").parquet(
            raw_path
        )

        stats = (
            self.spark.read.parquet(raw_path)
            .agg(
                F.sum("n_postings").alias("np"),
                F.countDistinct("term").alias("nt"),
            )
            .collect()[0]
        )
        dl = (
            self.spark.read.parquet(ds_path)
            .agg(F.count("*").alias("n"), F.sum("doc_len").alias("s"))
            .collect()[0]
        )
        tok.unpersist()
        docs_b.unpersist()
        entry = {
            "batch": key,
            "source": "stream",
            "cfg_hash": _cfg_hash(self.cfg),
            "n_docs": int(dl["n"]),
            "sum_doc_len": int(dl["s"] or 0),
            "n_postings": int(stats["np"] or 0),
            "n_terms": int(stats["nt"] or 0),
            "wall_sec": round(time.perf_counter() - t0, 3),
        }
        path = os.path.join(self.manifest_dir, f"batch_{key}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entry, fh, indent=1)
        os.replace(tmp, path)  # atomic: manifest exists ⇒ batch complete

    # -- driving ------------------------------------------------------------

    def process_available(self, max_files_per_batch: int | None = None):
        """Drain all currently-available input files (Trigger.AvailableNow)
        through the micro-batch handler, then stop. Returns the number of
        completed stream batches so far (from the manifests)."""
        reader = self.spark.readStream.schema(self.schema)
        if max_files_per_batch:
            reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
        stream = reader.parquet(self.input_path)
        q = (
            stream.writeStream.foreachBatch(self._handle_batch)
            .option(
                "checkpointLocation",
                os.path.join(self.out, "_stream_checkpoint"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return len(read_manifests(self.manifest_dir))

    def finalize(self) -> Index:
        """Compact all stream batches into the queryable index layout
        (same pass as the batch builder's finalize)."""
        return finalize_from_raw(self.spark, self.out, self.cfg)
