"""Continuous ingestion → delta build → LSM merge → published
generations: the full serve-while-indexing loop.

The reference's "incremental update" story is a full rebuild into the
SQLite file it also serves from (ref: Indexer/Indexer.java:42-45,
SE/BackendManager.java queries concurrently under SQLite's writer
lock). This module is the distributed version with real increments:

  file-source ``readStream`` over the corpus directory
      └─ per micro-batch (foreachBatch):
           1. ``build_index`` over ONLY the new docs (the delta —
              tokenization runs once per document, ever)
           2. ``merge_indexes(published, delta)`` — right-wins upsert;
              only shards the delta touches are regrouped, clean
              shards are rescored in place (operators/merge.py)
           3. ``publish_index`` — the merged index becomes immutable
              generation K+1; the LATEST pointer flips atomically
      └─ serving tier (``ServingIndex.load_latest`` + ``refresh``)
         picks up each generation without ever racing the writer.

Exactly-once: Structured Streaming's checkpoint may REPLAY a batch
after a crash between the publish and the checkpoint commit. The loop
is replay-idempotent by construction — ``merge_indexes`` is a
right-wins upsert keyed on doc_id with exact global-stat recompute, so
re-merging the same delta into a generation that already contains it
is value-identical (pinned in tests/test_live_index.py). A replay
costs one redundant generation, never a wrong one.

Scale notes:
  * Per-batch cost is O(delta tokens) + O(dirty shards), not O(corpus):
    the merge never re-tokenizes and never rewrites clean shards'
    postings (see tools/merge_bench.py for the measured crossover).
  * Generations accumulate until ``prune_generations`` — run it from
    the same control loop on whatever cadence retention policy says.
  * For very high arrival rates, raise ``maxFilesPerTrigger`` (bigger
    deltas amortize the fixed merge/publish cost) — the sustained
    docs/s row in BENCH.md quotes the measured trade-off.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.config import DEFAULT, EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.merge import merge_indexes
from search_engine_spark.publish import (
    load_latest_index,
    publish_index,
    read_latest,
)


class StreamingLiveIndex:
    """Corpus parquet dir → queryable published generations.

    Usage::

        live = StreamingLiveIndex(spark, corpus_dir, index_root)
        live.process_available()        # every arrived file → gen(s)
        srv = ServingIndex.load_latest(index_root)
        # ...more files land...
        live.process_available()        # delta build + merge + publish
        srv.refresh()                   # serving swaps to the new gen
    """

    def __init__(
        self,
        spark: SparkSession,
        input_path: str,
        root: str,
        cfg: EngineConfig = DEFAULT,
        text_col: str = "content",
        doc_id_col: str = "doc_id",
        schema=None,
        checkpoint: str | None = None,
    ):
        self.spark = spark
        self.input_path = input_path
        self.root = root
        self.cfg = cfg
        self.text_col = text_col
        self.doc_id_col = doc_id_col
        self.schema = schema or spark.read.parquet(input_path).schema
        self.checkpoint = checkpoint or os.path.join(
            root, "_stream_checkpoint"
        )
        self.batches_published = 0

    #: optional CDC column: rows with ``deleted=true`` are TOMBSTONES —
    #: their doc_ids are compacted OUT of the published index (text
    #: content ignored); all other rows are upserts. Absent column =
    #: pure-append stream.
    deleted_col = "deleted"

    def _handle_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        docs_b = batch_df.persist()
        try:
            if not docs_b.head(1):
                return
            has_cdc = self.deleted_col in docs_b.columns
            alive = (
                docs_b.where(
                    ~F.coalesce(F.col(self.deleted_col), F.lit(False))
                )
                if has_cdc
                else docs_b
            )
            ptr = read_latest(self.root)
            current = (
                load_latest_index(self.spark, self.root)
                if ptr is not None
                else None
            )
            merged = current
            if alive.head(1):
                delta = build_index(
                    alive,
                    text_col=self.text_col,
                    doc_id_col=self.doc_id_col,
                    cfg=self.cfg,
                )
                merged = (
                    delta
                    if merged is None
                    else merge_indexes(merged, delta)
                )
            if has_cdc and merged is not None:
                dead = docs_b.where(
                    F.coalesce(F.col(self.deleted_col), F.lit(False))
                ).select(F.col(self.doc_id_col).alias("doc_id"))
                if dead.head(1):
                    from search_engine_spark.operators.merge import (
                        delete_docs,
                    )

                    merged = delete_docs(merged, dead)
            if merged is None:
                return
            publish_index(merged, self.root)
            self.batches_published += 1
        finally:
            docs_b.unpersist()

    def process_available(
        self, max_files_per_batch: int | None = None
    ) -> int:
        """Drain all currently-available input files
        (Trigger.AvailableNow), one published generation per non-empty
        micro-batch. Returns the currently-published generation number
        (or -1 if nothing has ever been published)."""
        reader = self.spark.readStream.schema(self.schema)
        if max_files_per_batch:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_batch
            )
        stream = reader.parquet(self.input_path)
        q = (
            stream.writeStream.foreachBatch(self._handle_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        ptr = read_latest(self.root)
        return ptr["generation"] if ptr else -1
