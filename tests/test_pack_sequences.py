"""Sequence packing (textstats.pack_sequences): the distributed prefix
sum must equal a DuckDB window cumsum over the same ordering, and the
plan must not run a global single-partition window over document data."""

import duckdb
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    from search_engine_spark.sources.corpus import generate_corpus

    return generate_corpus(spark, 300, seed=19).select(
        "doc_id", "content"
    ).cache()


def test_pack_matches_duckdb_cumsum(spark, docs):
    from search_engine_spark.operators.textstats import pack_sequences

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["seq_first"], r["seq_last"]
        )
        for r in pack_sequences(docs, budget=512, text_col="content").collect()
    }
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.sql(
        """
        WITH t AS (
          SELECT doc_id,
            CASE WHEN length(trim(content)) > 0
                 THEN length(regexp_split_to_array(trim(content), '\\s+'))
                 ELSE 0 END AS n_tokens
          FROM documents
        ),
        c AS (
          SELECT doc_id, n_tokens,
            coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS start_offset
          FROM t
        )
        SELECT doc_id, n_tokens, start_offset,
          start_offset // 512 AS seq_first,
          (start_offset + greatest(n_tokens - 1, 0)) // 512 AS seq_last
        FROM c
        """
    ).fetchall()
    assert len(want) == len(got)
    for doc_id, n_tokens, start, sf, sl in want:
        assert got[doc_id] == (n_tokens, start, sf, sl), doc_id


def test_pack_covers_budget_invariants(spark, docs):
    from search_engine_spark.operators.textstats import pack_sequences

    rows = pack_sequences(docs, budget=128, text_col="content").collect()
    rows.sort(key=lambda r: r["doc_id"])
    # offsets are contiguous: each doc starts where the previous ended
    off = 0
    for r in rows:
        assert r["start_offset"] == off
        off += r["n_tokens"]
        assert r["seq_first"] <= r["seq_last"]
        # a doc spans ceil(n/budget)+1 sequences at most
        assert r["seq_last"] - r["seq_first"] <= r["n_tokens"] // 128 + 1


def test_pack_plan_is_distributed(spark, docs):
    """The document-scale window runs per range partition; the only
    single-partition exchange feeds the one-row-per-partition totals."""
    from search_engine_spark.operators.textstats import pack_sequences

    plan = (
        pack_sequences(docs, budget=512, text_col="content")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning(doc_id" in plan
    assert plan.count("Exchange SinglePartition") == 1
    tiny = plan.split("Exchange SinglePartition")[1]
    assert "pid" in tiny.split("Exchange")[0]


def test_pack_whitespace_edges(spark):
    """Leading/trailing newlines and whitespace-only docs must not count
    phantom tokens (review finding: Java split keeps boundary empties)."""
    from search_engine_spark.operators.textstats import pack_sequences

    df = spark.createDataFrame(
        [(1, "hello\n"), (2, "\n"), (3, "  a  b  "), (4, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"])
        for r in pack_sequences(df, budget=4).collect()
    }
    assert got[1] == (1, 0)
    assert got[2] == (0, 1)
    assert got[3] == (2, 1)
    assert got[4] == (0, 3)
