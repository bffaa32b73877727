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


def test_materialize_sequences_invariants(spark, docs):
    """Slice rows: every sequence except the last packs exactly
    ``budget`` tokens; a doc's slices are contiguous and cover
    [0, n_tokens); within a sequence the slices tile [0, budget)."""
    from search_engine_spark.operators.textstats import (
        materialize_sequences,
        pack_sequences,
    )

    budget = 512
    rows = materialize_sequences(
        docs, budget=budget, text_col="content"
    ).collect()
    packed = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=budget, text_col="content")
        .collect()
    }
    total_tokens = sum(p["n_tokens"] for p in packed.values())
    n_seqs = -(-total_tokens // budget)

    # per-sequence token accounting
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    assert set(by_seq) == set(range(n_seqs))
    for sid, slices in by_seq.items():
        width = sum(s["token_end"] - s["token_start"] for s in slices)
        if sid < n_seqs - 1:
            assert width == budget, sid
        else:
            assert width == total_tokens - budget * (n_seqs - 1)
        # slices tile the sequence: sorted by seq_pos, contiguous from 0
        slices.sort(key=lambda s: s["seq_pos"])
        pos = 0
        for s in slices:
            assert s["seq_pos"] == pos, sid
            pos += s["token_end"] - s["token_start"]

    # per-doc coverage: contiguous [0, n_tokens), no empty-doc rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, p in packed.items():
        if p["n_tokens"] == 0:
            assert did not in by_doc
            continue
        slices = sorted(by_doc[did], key=lambda s: s["token_start"])
        assert slices[0]["token_start"] == 0
        assert slices[-1]["token_end"] == p["n_tokens"]
        for a, b in zip(slices, slices[1:]):
            assert a["token_end"] == b["token_start"]
            assert b["seq_id"] == a["seq_id"] + 1  # doc spans split cuts


def test_materialize_matches_python_packing(spark):
    """Byte-level oracle: a driver-side greedy concatenate-and-cut of a
    tiny corpus must equal the distributed result row-for-row."""
    from search_engine_spark.operators.textstats import (
        materialize_sequences,
    )

    texts = ["a b c", "", "d e f g h", "i", "j k l m n o p q r s t"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    budget = 4
    got = sorted(
        (r["seq_id"], r["doc_id"], r["token_start"], r["token_end"],
         r["seq_pos"])
        for r in materialize_sequences(df, budget=budget).collect()
    )
    exp = []
    off = 0
    for did, t in enumerate(texts):
        n = len([w for w in t.split() if w])
        start, end = off, off + n
        off = end
        pos = start
        while pos < end:
            sid = pos // budget
            take = min(end, (sid + 1) * budget) - pos
            exp.append((sid, did, pos - start, pos - start + take,
                        pos - sid * budget))
            pos += take
    assert got == sorted(exp)


def test_emit_sequences_reassembles_stream(spark):
    """Sequences carry the ACTUAL tokens: concatenating them in seq_id
    order must reproduce the corpus token stream in doc_id order, with
    exactly `budget` tokens everywhere but the stream's tail."""
    from search_engine_spark.operators.textstats import emit_sequences

    rows = [
        (1, "a b c d e f g"),          # 7 tokens
        (2, ""),                        # contributes nothing
        (3, "h i"),                     # straddles with doc 1's tail
        (4, "  j   k \n l m n o p "),  # messy whitespace, 7 tokens
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["seq_id"]: r.asDict()
        for r in emit_sequences(docs, budget=5).collect()
    }
    stream = "a b c d e f g h i j k l m n o p".split()
    expect = [stream[i : i + 5] for i in range(0, len(stream), 5)]
    assert sorted(got) == list(range(len(expect)))
    for sid, toks in enumerate(expect):
        assert got[sid]["tokens"] == toks, sid
        assert got[sid]["n_tokens"] == len(toks)
    # doc straddle accounting: seq 1 = [f g | h i | j] spans docs 1,3,4
    assert got[1]["n_docs"] == 3


def test_emit_sequences_matches_python_oracle(spark):
    """Random corpus vs a pure-python pack of the same token stream."""
    import random

    from search_engine_spark.operators.textstats import emit_sequences

    rng = random.Random(77)
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    budget = 32
    stream = [t for _, text in rows for t in text.split() if t]
    expect = [
        stream[i : i + budget] for i in range(0, len(stream), budget)
    ]
    got = {
        r["seq_id"]: r["tokens"]
        for r in emit_sequences(docs, budget=budget).collect()
    }
    assert sorted(got) == list(range(len(expect)))
    for sid, toks in enumerate(expect):
        assert got[sid] == toks, sid
