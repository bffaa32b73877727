"""Streaming popular-queries window aggregation (U3 as a stream):
watermarked windowed counts vs a batch recomputation, plus
checkpoint-resume draining only new event files."""

from datetime import datetime

from pyspark.sql import functions as F


def _write_events(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, "query string, ts timestamp").coalesce(
        1
    ).write.mode(mode).parquet(path)


def test_popular_queries_stream_matches_batch(spark, tmp_path):
    from search_engine_spark.streaming.query_log import (
        drain_popular_queries,
        top_queries,
    )

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    t = lambda h, m=0: datetime(2026, 1, 1, h, m)

    batch1 = [
        ("hash join", t(1)),
        ("hash join", t(1, 30)),
        ("group by", t(2)),
        ("hash join", t(13)),   # second 12h window
        ("window fn", t(13, 5)),
    ]
    _write_events(spark, src, batch1)

    counts = drain_popular_queries(
        spark, src, ckpt, window_size="12 hours"
    )
    got = {
        (r.window_start, r.query): r.cnt for r in counts.collect()
    }
    want = {
        ((2026, 1, 1, 0), "hash join"): 2,
        ((2026, 1, 1, 0), "group by"): 1,
        ((2026, 1, 1, 12), "hash join"): 1,
        ((2026, 1, 1, 12), "window fn"): 1,
    }
    assert {
        ((k[0].year, k[0].month, k[0].day, k[0].hour), k[1]): v
        for k, v in got.items()
    } == want

    top = [(r.query, r.cnt) for r in top_queries(counts, k=2).collect()]
    assert top == [("hash join", 1), ("window fn", 1)]  # latest window

    # resume: a second drain with the SAME checkpoint sees only the new
    # file; the emitted updates carry the MERGED count for touched keys
    batch2 = [("hash join", t(13, 30)), ("hash join", t(13, 45))]
    _write_events(spark, src, batch2)
    upd = drain_popular_queries(spark, src, ckpt, window_size="12 hours")
    upd_rows = {
        ((r.window_start.hour), r.query): r.cnt for r in upd.collect()
    }
    # only the touched (window, query) pair is re-emitted, with the total
    assert upd_rows == {(12, "hash join"): 3}
