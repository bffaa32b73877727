"""T5 front-end: raw-HTML section splitting (ref: SE Tokenizer.java
tokenizeDocument, 126-225 — Jsoup selectors over a parsed document).

The reference tokenizes an HTML page by selecting element GROUPS and
taking each element's full descendant text (Jsoup ``Element.text()``):

  * ``doc.title()``                      -> section "title" (one element)
  * ``doc.select("h1")`` .. ``h6``       -> sections "h1".."h6"
  * ``doc.select("p")``, ``div``, ``li``, ``span``,
    ``article, section``                 -> section "content"

Because ``text()`` includes nested children, a word inside
``<div><p>word</p></div>`` is counted once for the div element and once
for the p element — SURVEY quirk Q1. This operator REPRODUCES that
double-count (round-2 gap: the weighted analyzer took pre-split typed
columns and delegated Q1 to the caller).

Spark shape: one Arrow-batched pandas UDF per row-batch builds a
lightweight DOM with the stdlib ``html.parser`` (the Python-side
analogue of Jsoup — HTML is not XML, so the JVM ``xpath`` functions
would reject real pages) and emits typed section columns. Downstream
weighted analysis stays in ``tokenize_docs_sectioned`` — narrow,
map-side only, no shuffle.

Documented deviations from Jsoup (tests pin THIS behavior):
  * ``text()`` whitespace: element-child texts join with a single
    space, then runs of whitespace collapse. Jsoup concatenates inline
    elements without a space (``a<b>b</b>`` -> ``ab`` vs ``a b`` here);
    word-level tokenization makes this visible only for tightly-packed
    inline markup.
  * malformed HTML: unmatched end tags are ignored; unclosed elements
    stay open to end-of-document (html.parser's lenient stream model)
    rather than Jsoup's error-correcting tree builder.
``<script>``/``<style>`` subtrees are excluded, matching Jsoup (their
contents are DataNodes, invisible to ``text()``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from search_engine_spark.config import DEFAULT, EngineConfig

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_SKIP_TEXT = frozenset(("script", "style"))
_HEADERS = tuple(f"h{i}" for i in range(1, 7))
_CONTENT_GROUPS = (("p",), ("div",), ("li",), ("span",), ("article", "section"))

HTML_SECTIONS_SCHEMA = T.StructType(
    [T.StructField("title", T.StringType())]
    + [T.StructField(h, T.ArrayType(T.StringType())) for h in _HEADERS]
    + [T.StructField("content", T.ArrayType(T.StringType()))]
)


class _Node:
    __slots__ = ("tag", "children")

    def __init__(self, tag: str):
        self.tag = tag
        self.children: list = []  # str (text) | _Node


class _TreeParser(HTMLParser):
    """Lenient DOM builder: the minimal tree needed for per-element
    descendant-text extraction."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag)
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched end tag: ignored (lenient)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


_WS = re.compile(r"\s+")


def _element_text(node: _Node) -> str:
    """Descendant text of one element, Jsoup-``text()``-style: nested
    children included (quirk Q1 double-count arises because the caller
    asks for BOTH an ancestor and its descendant), script/style
    excluded, whitespace normalized."""
    parts: list[str] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in _SKIP_TEXT:
                walk(c)

    walk(node)
    return _WS.sub(" ", " ".join(parts)).strip()


# tag -> bucket key; the ("article", "section") selector group shares
# ONE bucket so its elements stay interleaved in document order, exactly
# like Jsoup's doc.select("article, section")
_TAG_TO_GROUP: dict[str, str] = {"title": "title"}
_TAG_TO_GROUP.update({h: h for h in _HEADERS})
for _group in _CONTENT_GROUPS:
    for _t in _group:
        _TAG_TO_GROUP[_t] = _group[0]


def _bucket_by_group(root: _Node) -> dict[str, list[_Node]]:
    """ONE preorder walk bucketing every selector group's elements in
    document order — the Jsoup ``doc.select(...)`` analogue for all
    groups at once (descendants of matches are also visited, so nested
    <div><div> yields both). A per-group walk would traverse the tree
    12× per document on the index-build hot path (review finding)."""
    buckets: dict[str, list[_Node]] = {
        g[0]: [] for g in _CONTENT_GROUPS
    }
    buckets["title"] = []
    for h in _HEADERS:
        buckets[h] = []

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                continue
            g = _TAG_TO_GROUP.get(c.tag)
            if g is not None:
                buckets[g].append(c)
            walk(c)

    walk(root)
    return buckets


def extract_sections(html: str) -> dict:
    """Pure-Python core (shared by the Spark UDF and tests): HTML ->
    {title, h1..h6, content} with the reference's element grouping and
    ordering (p's, then divs, then li's, then spans, then
    article/section — Tokenizer.java:157-210). One tree walk buckets
    all selectors."""
    p = _TreeParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass  # lenient: keep whatever tree was built
    buckets = _bucket_by_group(p.root)
    titles = buckets["title"]
    out: dict = {
        # Jsoup doc.title(): FIRST <title>, trimmed
        "title": _element_text(titles[0]) if titles else None
    }
    for h in _HEADERS:
        out[h] = [
            t
            for t in (_element_text(e) for e in buckets[h])
            if t  # reference skips empty element texts
        ]
    content: list[str] = []
    for group in _CONTENT_GROUPS:
        content.extend(
            t
            for t in (_element_text(e) for e in buckets[group[0]])
            if t
        )
    out["content"] = content
    return out


def _make_split_udf():
    @pandas_udf(HTML_SECTIONS_SCHEMA)
    def split(html: pd.Series) -> pd.DataFrame:
        cols: dict[str, list] = {
            f.name: [] for f in HTML_SECTIONS_SCHEMA.fields
        }
        for doc in html:
            sec = extract_sections(doc if doc is not None else "")
            for k, v in sec.items():
                cols[k].append(v)
        return pd.DataFrame(cols)

    return split


def split_html_sections(
    df: DataFrame, html_col: str = "html", doc_id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, html, ...) -> (doc_id, title, h1..h6 array<string>,
    content array<string>) — the typed-section shape
    ``tokenize_docs_sectioned`` consumes. Narrow map-side transform; at
    100 TB this pipelines with the analyzer in one stage."""
    udf = _make_split_udf()
    return df.select(
        F.col(doc_id_col).alias("doc_id"),
        udf(F.col(html_col)).alias("_sec"),
    ).select("doc_id", "_sec.*")


def tokenize_docs_html(
    df: DataFrame,
    html_col: str = "html",
    doc_id_col: str = "doc_id",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """Full reference T5 path over raw HTML rows: split sections
    (including quirk Q1's nested double-count), then the weighted
    sectioned analyzer. Output matches ``tokenize_docs_sectioned``."""
    from search_engine_spark.operators.tokenize import (
        tokenize_docs_sectioned,
    )

    split = split_html_sections(df, html_col=html_col, doc_id_col=doc_id_col)
    sections = (
        [("title", "title")]
        + [(h, h) for h in _HEADERS]
        + [("content", "content")]
    )
    return tokenize_docs_sectioned(split, sections, cfg=cfg)
