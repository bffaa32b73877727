"""Streaming popular-queries aggregation (U3 as a stream).

The reference reads its ``search_queries`` table with a 12-hour cutoff on
every suggestion request (Data/DataBaseManager.java:20-35) — a full-table
rescan per request. Here the query log is a STREAM: Structured Streaming
maintains the windowed counts incrementally with a watermark for late
events, and the suggestion layer reads the maintained table instead of
recounting.

  events (query, ts)  --readStream-->
    withWatermark(ts, late_allowance)
    groupBy(window(ts, window_size, slide), query).count()
  --update/foreachBatch--> popular-queries table

Scale notes:
  * State is bounded by the watermark: windows older than
    (max event time − late_allowance) are finalized and evicted, so the
    streaming state store holds O(active windows × distinct queries),
    not history.
  * The aggregation is a standard partial-agg shuffle on
    (window, query) — skew on hot queries is capped by map-side combine.
  * ``trigger(availableNow=True)`` drains a backlog batch-style; a live
    deployment uses a processing-time trigger with the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "query string, ts timestamp"


def popular_queries_stream(
    spark: SparkSession,
    src_dir: str,
    window_size: str = "12 hours",
    slide: str | None = None,
    late_allowance: str = "1 hour",
) -> DataFrame:
    """Streaming DataFrame of windowed query counts:
    (window_start, window_end, query, cnt). Write with
    ``outputMode("update")`` (or ``"append"`` for finalized windows
    only)."""
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
    win = (
        F.window("ts", window_size, slide)
        if slide
        else F.window("ts", window_size)
    )
    return (
        ev.withWatermark("ts", late_allowance)
        .groupBy(win.alias("w"), "query")
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "query",
            F.col("count").alias("cnt"),
        )
    )


def drain_popular_queries(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    window_size: str = "12 hours",
    slide: str | None = None,
    late_allowance: str = "1 hour",
) -> DataFrame:
    """Drain everything currently in ``src_dir`` (availableNow trigger)
    and return the materialized popular-queries counts as a batch
    DataFrame — the streaming-maintained equivalent of the reference's
    per-request rescan. Resumable: the checkpoint dir carries the state
    store, so a later call only processes NEW event files."""
    agg = popular_queries_stream(
        spark, src_dir, window_size, slide, late_allowance
    )
    state: dict = {}

    def sink(batch_df: DataFrame, _bid: int) -> None:
        for r in batch_df.collect():
            state[(r["window_start"], r["query"])] = (
                r["window_end"],
                r["cnt"],
            )

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        (ws, we, qry, int(cnt))
        for (ws, qry), (we, cnt) in sorted(state.items())
    ]
    return spark.createDataFrame(
        rows,
        "window_start timestamp, window_end timestamp, "
        "query string, cnt long",
    )


def top_queries(counts: DataFrame, k: int = 10) -> DataFrame:
    """Most-frequent queries in the LATEST window (the suggestion
    layer's read): cnt DESC, query ASC tie-break."""
    latest = counts.agg(F.max("window_start").alias("m")).collect()[0]["m"]
    return (
        counts.where(F.col("window_start") == latest)
        .orderBy(F.desc("cnt"), F.asc("query"))
        .limit(k)
        .select("query", "cnt")
    )
