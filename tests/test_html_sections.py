"""Raw-HTML section splitting (operators/html.py): reference Jsoup
selector semantics incl. quirk Q1 — nested p/div/li/span/article/section
element texts double-count their descendants' words. Expected values are
HAND-COMPUTED per the reference's tokenizeDocument (Tokenizer.java:
126-225), then cross-checked through oracle_tokenize_sections."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.html import (
    extract_sections,
    split_html_sections,
    tokenize_docs_html,
)
from search_engine_spark.oracle import oracle_tokenize_sections

CFG = EngineConfig(stem=False, remove_stopwords=False)

NESTED = """
<html><head><title>Banana Guide</title>
<style>p { color: red }</style></head>
<body>
<h1>Intro</h1>
<div>outer <p>inner words</p> tail</div>
<ul><li>apple</li><li>banana <span>split</span></li></ul>
<article><section><p>deep</p></section></article>
<script>var ignored = "code";</script>
</body></html>
"""


def test_extract_sections_nested_double_count():
    sec = extract_sections(NESTED)
    assert sec["title"] == "Banana Guide"
    assert sec["h1"] == ["Intro"]
    assert sec["h2"] == []
    # content order: p's, then divs, then li's, then spans, then
    # article/section (Tokenizer.java:157-210); each element text
    # includes descendants -> "inner words" appears via its <p> AND the
    # enclosing <div>; "deep" appears via p, article AND section
    assert sec["content"] == [
        "inner words",          # p
        "deep",                 # p (inside article/section)
        "outer inner words tail",  # div (quirk Q1: includes the p)
        "apple",                # li
        "banana split",         # li (includes the span)
        "split",                # span
        "deep",                 # article (includes section > p)
        "deep",                 # section
    ]
    # script/style text is invisible (Jsoup DataNode semantics)
    flat = " ".join([sec["title"]] + sec["h1"] + sec["content"])
    assert "ignored" not in flat and "color" not in flat


def test_malformed_html_is_lenient():
    sec = extract_sections("<p>one<p>two</div><li>three")
    # html.parser stream model: unclosed <p> keeps nesting, unmatched
    # </div> is ignored — pinned behavior, not Jsoup's tree correction
    assert "one two three" in sec["content"][0]
    assert sec["title"] is None


def test_tokenize_docs_html_matches_hand_oracle(spark):
    """The full HTML path (split -> weighted sectioned analyzer) must
    equal oracle_tokenize_sections fed the hand-derived element list —
    quirk Q1 double-counts PRODUCED BY THE OPERATOR, not the caller."""
    df = spark.createDataFrame(
        [(1, NESTED)], "doc_id long, html string"
    )
    got = tokenize_docs_html(df, cfg=CFG).collect()[0]
    elements = [
        ("title", "Banana Guide"),
        ("h1", "Intro"),
        ("content", "inner words"),
        ("content", "deep"),
        ("content", "outer inner words tail"),
        ("content", "apple"),
        ("content", "banana split"),
        ("content", "split"),
        ("content", "deep"),
        ("content", "deep"),
    ]
    want_acc, want_total = oracle_tokenize_sections(elements, CFG)
    assert got["n_tokens"] == want_total
    toks = {
        t: {"term": t, "tf": f, "top_section": sec, "positions": list(p)}
        for t, f, sec, p in zip(
            got["terms"], got["tfs"], got["top_sections"], got["positions"]
        )
    }
    assert set(toks) == set(want_acc)
    for term, w in want_acc.items():
        t = toks[term]
        assert t["tf"] == pytest.approx(w["count"]), term
        assert t["top_section"] == w["top_section"], term
        assert sorted(t["positions"]) == sorted(w["positions"]), term
    # spot-check the quirk arithmetic: "inner" counts once for its <p>
    # and once for the enclosing <div> -> tf 2.0 at content weight
    assert toks["inner"]["tf"] == pytest.approx(2.0)
    # "deep" counts for p + article + section -> 3.0
    assert toks["deep"]["tf"] == pytest.approx(3.0)
    # "banana" in title (5.0) + li (1.0)
    assert toks["banana"]["tf"] == pytest.approx(6.0)
    assert toks["banana"]["top_section"] == "title"


def test_split_html_sections_plan_columns(spark):
    df = spark.createDataFrame(
        [(1, "<title>t</title><p>x</p>"), (2, None)],
        "doc_id long, html string",
    )
    out = split_html_sections(df)
    assert out.columns == [
        "doc_id", "title", "h1", "h2", "h3", "h4", "h5", "h6", "content"
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["title"] == "t" and rows[1]["content"] == ["x"]
    assert rows[2]["title"] is None and rows[2]["content"] == []


def test_html_end_to_end_index_and_search(spark):
    """HTML rows -> sectioned index -> search: title-weighted terms
    outrank content terms at equal occurrence counts."""
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import search

    rows = [
        (1, "<title>zebra quest</title><p>filler words here</p>"),
        (2, "<p>zebra quest filler words here</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    from search_engine_spark.operators.html import split_html_sections

    split = split_html_sections(df)
    sections = [("title", "title")] + [
        (f"h{i}", f"h{i}") for i in range(1, 7)
    ] + [("content", "content")]
    idx = build_index(split, cfg=CFG, sections=sections)
    got = [r["doc_id"] for r in search(idx, "zebra", k=2).collect()]
    assert got[0] == 1  # title weight 5.0 dominates
