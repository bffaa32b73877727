"""HTML-strip snippet parity (r03 verdict #6): make_snippets(mode=
"sentence", strip_html=True) over raw-HTML docs must match an
independent pure-Python transcription of the reference's FULL
generateSnippet chain (BackendManager.java:132-271 — script/style/
comment/tag/entity strip + normalization + sentence windowing)
byte-for-byte; the serving tier's scalar path must agree with the
Spark operator."""

import re

from search_engine_spark.operators.snippets import make_snippets

WORDS = ["hash", "join", "window"]

HTML_DOCS = [
    # script/style/comment content must vanish even when it contains
    # query words
    "<html><head><script>var hash = 'join';</script>"
    "<style>.hash { color: red; }</style></head>"
    "<body><!-- hash join comment -->"
    "<h1>The hash join</h1><p>A window into distributed joins. "
    "More text follows here.</p></body></html>",
    # entities: encoded ampersand/brackets/quotes, numeric refs, nbsp
    "<p>hash&nbsp;join &amp; window&lt;T&gt; &quot;quoted&quot; "
    "&#39;x&#39; &#169; &copy; tail words</p>",
    # query word inside an attribute must NOT match (tags are stripped)
    '<a href="http://example.com/hash">click</a> no keywords here',
    # nested/unclosed tags, CRLF control chars
    "<div><p>first sentence. the hash\r\nlives <b>here</b>. "
    "third sentence.</div>",
    # no query word at all -> NO_PREVIEW
    "<p>nothing relevant in this document</p>",
    # multiline script with embedded '<'
    "<script type='text/javascript'>\nif (a < b) { hash(); }\n"
    "</script>real window text starts here. and continues.",
    # plain text with entities only
    "plain hash text &gt; marker " + "z " * 120 + "end",
]


def _java_full_chain(html: str, query_words, radius=150) -> str:
    """Independent transcription of generateSnippet INCLUDING the HTML
    strip (BackendManager.java:132-271), kept deliberately separate
    from functions/snippets_py.py so the test is an oracle, not a
    mirror."""
    t = html or ""
    t = re.sub(r"(?is)<script\b[^<]*(?:(?!</script>)<[^<]*)*</script>",
               " ", t)
    t = re.sub(r"(?is)<style\b[^<]*(?:(?!</style>)<[^<]*)*</style>",
               " ", t)
    t = re.sub(r"(?s)<!--.*?-->", " ", t)
    t = re.sub(r"<[^>]+>", " ", t)
    t = re.sub("&nbsp;|[ ]", " ", t)
    t = re.sub(r"&amp;", "&", t)
    t = re.sub(r"&lt;", "<", t)
    t = re.sub(r"&gt;", ">", t)
    t = re.sub(r"&quot;", '"', t)
    t = re.sub(r"&#39;", "'", t)
    t = re.sub(r"&#[0-9]+;", " ", t)
    t = re.sub(r"&[a-zA-Z0-9#]+;", " ", t)
    # [\p{Cntrl}&&[^\n\t]] == all C0 controls + DEL except \t \n
    t = re.sub(r"[\x00-\x08\x0b-\x1f\x7f]", "", t)
    t = re.sub(r"\s*[\r\n]+\s*", " ", t)
    t = re.sub(r"\s*[.,!?]+\s*", ". ", t)
    t = re.sub(r"\.+", ".", t)
    t = re.sub(r"\s+", " ", t)
    t = t.strip()
    low = t.lower()
    best = -1
    for w in query_words:
        p = low.find(w.lower())
        if p != -1:
            best = p
            break
    if best == -1:
        return "No preview available for this result."
    startPos = best
    while startPos > 0 and startPos > best - radius:
        if startPos >= 2 and t[startPos - 2 : startPos] == ". ":
            startPos -= 2
            break
        startPos -= 1
    endPos = best
    while endPos < len(t) and endPos < best + radius:
        if endPos + 2 <= len(t) and t[endPos : endPos + 2] == ". ":
            endPos += 2
            break
        endPos += 1
    startPos, endPos = max(0, startPos), min(len(t), endPos)
    lead = "..." if startPos > 0 else ""
    body = t[startPos:endPos].strip()
    if not any(w.lower() in body.lower() for w in query_words):
        s2, endPos = max(0, best - 100), min(len(t), best + 100)
        body = t[s2:endPos].strip()
    body = re.sub(r"\s+", " ", body)
    body = re.sub(r"\s*[.,!?]+\s*", ". ", body)
    body = re.sub(r"\.+", ".", body)
    body = re.sub(r"^[^a-zA-Z0-9]+", "", body)
    body = re.sub(r"[^a-zA-Z0-9]+$", "", body)
    body = body.strip()
    pat = "(?i)\\b(" + "|".join(re.escape(w) for w in query_words) + ")\\b"
    body = re.sub(pat, lambda m: f"<strong>{m.group(0)}</strong>", body)
    tail = "..." if endPos < len(t) else ""
    return lead + body + tail


def test_spark_html_snippets_match_java_chain(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(HTML_DOCS)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["snippet"]
        for r in make_snippets(
            df, WORDS, mode="sentence", strip_html=True
        ).collect()
    }
    for i, h in enumerate(HTML_DOCS):
        assert got[i] == _java_full_chain(h, WORDS), (i, h[:60], got[i])


def test_scalar_strip_matches_java_chain():
    from search_engine_spark.functions.snippets_py import sentence_snippet

    for h in HTML_DOCS:
        assert sentence_snippet(h, WORDS, strip_html=True) == \
            _java_full_chain(h, WORDS)


def test_script_content_never_leaks(spark):
    """A query word that occurs ONLY inside script/style/attributes
    must yield NO_PREVIEW, not a snippet of code."""
    from search_engine_spark.operators.snippets import NO_PREVIEW

    html = (
        "<script>window.hash = join();</script>"
        '<a href="/join/hash">x</a><style>.window{}</style>'
        "<p>unrelated body text</p>"
    )
    df = spark.createDataFrame([(0, html)], "doc_id long, text string")
    row = make_snippets(
        df, WORDS, mode="sentence", strip_html=True
    ).collect()[0]
    assert row["snippet"] == NO_PREVIEW


def test_serving_result_page_strip_html(spark, tmp_path):
    """End-to-end: index a raw-HTML corpus via the HTML tokenizer-ready
    text, attach the raw docs to serving, and check the result page's
    snippets ran the strip chain."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.serving import ServingIndex

    docs = spark.createDataFrame(
        [(i, h) for i, h in enumerate(HTML_DOCS)], "doc_id long, text string"
    )
    d = str(tmp_path / "html_idx")
    build_index(
        docs, text_col="text", cfg=EngineConfig(docs_per_shard=8, block_size=8)
    ).save(d)
    docs_path = str(tmp_path / "docs_parquet")
    docs.write.parquet(docs_path)
    srv = ServingIndex.load(d)
    srv.attach_docs(docs_path, text_col="text")
    rows, _total = srv.result_page("hash join", size=5, strip_html=True)
    for r in rows:
        assert r["snippet"] == _java_full_chain(
            HTML_DOCS[r["doc_id"]], ["hash", "join"]
        )
