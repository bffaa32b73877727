"""Substring-level exact dedup (dedup.duplicated_spans /
strip_duplicated_spans): Lee-et-al-2021-style duplicated L-gram span
detection with gaps-and-islands merging, vs a pure-Python oracle."""

from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    duplicated_spans,
    strip_duplicated_spans,
)


def _spans_oracle(docs, L, keep_first=True):
    """Pure-Python reimplementation: gram occurrence lists -> duplicated
    occurrences (minus the (min doc, min pos) keeper) -> merged spans."""
    occ = {}
    for did, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - L + 1):
            occ.setdefault(" ".join(toks[i : i + L]), []).append((did, i))
    hits = {}
    for gram, places in occ.items():
        if len(places) < 2:
            continue
        keeper = min(places)
        for p in places:
            if keep_first and p == keeper:
                continue
            hits.setdefault(p[0], []).append((p[1], p[1] + L))
    out = {}
    for did, ivals in hits.items():
        ivals.sort()
        merged = []
        for s, e in ivals:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        out[did] = [tuple(m) for m in merged]
    return out


DOCS = [
    (1, "alpha r0 r1 r2 r3 r4 r5 r6 r7 beta gamma"),
    (2, "x y r0 r1 r2 r3 r4 r5 r6 r7 z"),            # full copy of the run
    (3, "r2 r3 r4 r5 r6 junk r0 r1 r2 r3 r4 r5"),    # partial overlaps
    (4, "totally distinct words that never repeat anywhere at all ok"),
    (5, "alpha r0 r1 r2 r3 r4 r5 r6 r7 beta gamma"), # exact dup of doc 1
]


def test_spans_match_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for L in (4, 6):
        got = {}
        for r in duplicated_spans(df, min_len=L).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"])
            )
        got = {k: sorted(v) for k, v in got.items()}
        assert got == _spans_oracle(DOCS, L), L


def test_keep_first_false_reports_every_occurrence(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(
            df, min_len=6, keep_first=False
        ).collect()
    }
    exp = {
        (d, s, e)
        for d, sp in _spans_oracle(DOCS, 6, keep_first=False).items()
        for s, e in sp
    }
    assert got == exp


def test_strip_keeps_one_copy_corpus_wide(spark):
    """After stripping, a full re-scan finds NO duplicated grams left
    (one canonical copy of every repeated region survives), and docs
    without spans pass through byte-identical."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    L = 6
    stripped = strip_duplicated_spans(df, min_len=L)
    again = duplicated_spans(stripped, min_len=L).count()
    assert again == 0
    out = {r["doc_id"]: r["text"] for r in stripped.collect()}
    assert out[4] == DOCS[3][1]          # untouched doc byte-identical
    assert out[1] == DOCS[0][1]          # canonical copy survives whole
    assert "r4" not in out[5]            # the exact-dup doc lost the run


def test_short_repeats_below_L_ignored(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y z")],
        "doc_id long, text string",
    )
    assert duplicated_spans(df, min_len=4).count() == 0
    # at L=3 the shared 3-token prefix IS a duplicated span (in doc 2)
    rows = duplicated_spans(df, min_len=3).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in rows] \
        == [(2, 0, 3)]
