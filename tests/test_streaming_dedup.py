"""Stateful streaming dedup (applyInPandasWithState): first occurrence of
each content hash wins across micro-batches; checkpoint-resumed drains
only emit never-seen hashes."""


def _write(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_dedup_first_wins_across_batches(spark, tmp_path):
    from search_engine_spark.streaming.dedup_stream import drain_dedup

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")

    _write(spark, src, [
        (3, "alpha"), (0, "alpha"), (1, "beta"), (2, "gamma"), (4, "beta"),
    ])
    got = drain_dedup(spark, src, ckpt)
    # min doc_id wins within the batch
    assert [(r.doc_id, r.text) for r in got] == [
        (0, "alpha"), (1, "beta"), (2, "gamma"),
    ]

    # second batch: previously-seen hashes dropped by STATE, new one kept
    _write(spark, src, [(5, "alpha"), (6, "delta"), (7, "gamma")])
    got2 = drain_dedup(spark, src, ckpt)
    assert [(r.doc_id, r.text) for r in got2] == [(6, "delta")]

    # batch-side cross-check: the union of emitted rows equals batch
    # exact_dedup's keep set over everything written so far
    from search_engine_spark.operators.dedup import exact_dedup

    all_docs = spark.read.parquet(src)
    keep = {
        r.keep_id for r in exact_dedup(all_docs).collect()
    }
    emitted = {r.doc_id for r in got} | {r.doc_id for r in got2}
    assert emitted == keep
