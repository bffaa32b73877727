"""Stateful streaming deduplication: first-occurrence-wins across
micro-batches via ``applyInPandasWithState``.

The batch ``exact_dedup`` (operators/dedup.py) answers "which docs are
duplicates" over a static corpus; an INGEST pipeline needs the streaming
form — drop every document whose content hash has been seen in ANY
earlier micro-batch. That requires per-key state that outlives a batch,
which is exactly Structured Streaming's arbitrary-stateful-processing
seam (``applyInPandasWithState``).

Shape:
  events (doc_id, text) --readStream-->
    withColumn(h, md5(text))
    groupBy(h).applyInPandasWithState(first_wins)   # state: seen flag
  --append--> unique docs only

Scale notes:
  * State is one boolean per distinct hash, hash-partitioned by the
    grouping key — the same layout the batch hash-groupBy uses, so skew
    behavior is identical (hot hashes are single keys either way).
  * Within one batch the winner is deterministic: min doc_id.
  * State never expires here (dedup is forever); a TTL deployment passes
    a GroupStateTimeout and drops state for hashes older than the
    retention window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

DOC_SCHEMA = "doc_id long, text string"
OUT_SCHEMA = "content_hash string, doc_id long, text string"
STATE_SCHEMA = "seen boolean"


def _first_wins(key, pdfs, state: GroupState):
    """Emit the first-ever row for this content hash; nothing if the
    hash was seen in an earlier batch."""
    if state.exists:
        # already emitted in a previous micro-batch — drain the iterator
        for _ in pdfs:
            pass
        return
        yield  # pragma: no cover  (keeps this a generator)
    best = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        row = pdf.loc[pdf["doc_id"].idxmin()]
        if best is None or row["doc_id"] < best["doc_id"]:
            best = row
    # mark the hash seen ONLY when a winner was emitted: an all-empty
    # chunk iterator must not permanently swallow the hash's first
    # occurrence in a later batch (ADVICE r02)
    if best is not None:
        state.update((True,))
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                "doc_id": [int(best["doc_id"])],
                "text": [best["text"]],
            }
        )


def dedup_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming DataFrame of first-occurrence rows
    (content_hash, doc_id, text)."""
    ev = spark.readStream.schema(DOC_SCHEMA).parquet(src_dir)
    hashed = ev.withColumn("content_hash", F.md5("text"))
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _first_wins,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_dedup(
    spark: SparkSession, src_dir: str, checkpoint_dir: str
) -> list:
    """Drain the backlog (availableNow) and return newly-emitted unique
    rows as a list of Row — resumable: the checkpoint carries both the
    source offsets and the seen-hash state, so a later call emits only
    hashes never seen before."""
    out: list = []

    def sink(batch_df: DataFrame, _bid: int) -> None:
        out.extend(batch_df.collect())

    q = (
        dedup_stream(spark, src_dir)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(out, key=lambda r: r["doc_id"])
