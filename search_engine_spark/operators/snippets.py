"""Result-snippet generation (reference: BackendManager.java:121-276).

Two modes, both *pure JVM column algebra* (``locate`` / ``substring`` /
``regexp_replace`` — snippets for a 100 TB result page never leave
whole-stage codegen), both expressible in ANSI SQL for the DuckDB
oracle gate:

  * ``mode="char"`` (the round-1 simplification, kept for API
    stability): fixed ``width``-char window centred on the first hit,
    ``**word**`` highlight.
  * ``mode="sentence"`` (reference parity, BackendManager.java
    generateSnippet): normalize punctuation/whitespace the reference's
    way, pick the FIRST query word (in list order) that occurs, expand
    backward/forward to the nearest ``". "`` sentence bound within
    ±150 chars, re-window ±100 chars if the cut dropped every query
    word (the reference's containsQueryWord fallback — including its
    quirk that the leading ``"..."`` decision uses the PRE-fallback
    start), clean up, wrap hits in ``<strong>``, add ``"..."``
    ellipses, and emit ``"No preview available for this result."``
    when no query word occurs at all.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NO_PREVIEW = "No preview available for this result."

# The reference's HTML/entity strip chain (BackendManager.java:132-151,
# the steps BEFORE the text normalization) — verbatim Java regexes
# (Spark's regexp_replace IS java.util.regex, including the
# [\\p{Cntrl}&&[^\n\t]] character-class intersection in the last step).
_HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^<]*(?:(?!</script>)<[^<]*)*</script>", " "),
    (r"(?is)<style\b[^<]*(?:(?!</style>)<[^<]*)*</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    ("&nbsp;|[\u00A0]", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&#[0-9]+;", " "),
    (r"&[a-zA-Z0-9#]+;", " "),
    (r"[\p{Cntrl}&&[^\n\t]]", ""),
]


def strip_html_text(col: Column) -> Column:
    """Reference-exact HTML → text strip (scripts, styles, comments,
    tags, entities, control chars) as pure JVM column algebra — the
    pre-step ``generateSnippet`` runs before its normalization. Compose
    with ``make_snippets(..., strip_html=True)`` for raw-HTML corpora,
    or use standalone as a ``text_from_html`` column helper."""
    for pat, rep in _HTML_STRIP_STEPS:
        col = F.regexp_replace(col, pat, rep)
    return col


def _normalize_text(col: Column) -> Column:
    """The reference's post-HTML-strip text normalization
    (BackendManager.java:150-158, minus the HTML/entity steps — the
    corpus is plain text): drop control chars, newlines→space,
    punctuation runs→``". "``, dot runs→``"."``, collapse whitespace,
    trim."""
    c = F.regexp_replace(col, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    c = F.regexp_replace(c, "\\s*[\\r\\n]+\\s*", " ")
    c = F.regexp_replace(c, "\\s*[.,!?]+\\s*", ". ")
    c = F.regexp_replace(c, "\\.+", ".")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def _sentence_snippet(
    text_raw: Column, words: list[str], radius: int, fb_radius: int
) -> Column:
    """Column-algebra transcription of generateSnippet
    (BackendManager.java:160-271). All positions are 0-indexed in the
    comments; Spark string functions are 1-indexed."""
    text = _normalize_text(text_raw)
    low = F.lower(text)
    n = F.length(text)
    # bestPosition: FIRST word in list order with a hit (the reference
    # iterates queryWords and breaks on the first indexOf != -1)
    best1 = F.coalesce(
        *[F.when(F.locate(w, low) > 0, F.locate(w, low)) for w in words]
    )  # 1-based; null => no preview
    bp0 = best1 - 1

    # backward scan: last ". " at 0-idx q with q+2 in
    # (bp0-radius, bp0]; snippet starts AT the '.' (startPos -= 2)
    prefix = F.substring(text, 1, bp0)
    posr = F.locate(" .", F.reverse(prefix))  # 1-based in reversed
    q0 = F.when(posr > 0, bp0 - posr - 1)
    start0 = F.when(
        q0.isNotNull() & (q0 + 2 > bp0 - radius), q0
    ).otherwise(F.greatest(F.lit(0), bp0 - radius))

    # forward scan: first ". " at 0-idx e >= bp0 with e < bp0+radius;
    # snippet ends AFTER the ". " (endPos += 2). locate() takes no
    # Column start offset, so search the suffix and shift back.
    locf = F.locate(". ", F.substring(text, best1, n))
    e0 = F.when(locf > 0, locf - 1 + bp0)
    end0 = F.when(
        e0.isNotNull() & (e0 < bp0 + radius), e0 + 2
    ).otherwise(F.least(n, bp0 + radius))

    body = F.trim(F.substring(text, start0 + 1, end0 - start0))
    # containsQueryWord: plain substring test (not word-bounded)
    has_word = F.greatest(
        *[F.locate(w, F.lower(body)) for w in words]
    ) > 0 if len(words) > 1 else F.locate(words[0], F.lower(body)) > 0
    fb_start0 = F.greatest(F.lit(0), bp0 - fb_radius)
    fb_end0 = F.least(n, bp0 + fb_radius)
    body = F.when(has_word, body).otherwise(
        F.trim(F.substring(text, fb_start0 + 1, fb_end0 - fb_start0))
    )
    # reference quirk: the trailing "..." uses the (possibly fallback)
    # end, the LEADING "..." was already decided from the original start
    final_end = F.when(has_word, end0).otherwise(fb_end0)

    # cleanup chain (BackendManager.java:246-252)
    body = F.regexp_replace(body, "\\s+", " ")
    body = F.regexp_replace(body, "\\s*[.,!?]+\\s*", ". ")
    body = F.regexp_replace(body, "\\.+", ".")
    body = F.regexp_replace(body, "^[^a-zA-Z0-9]+", "")
    body = F.regexp_replace(body, "[^a-zA-Z0-9]+$", "")
    body = F.trim(body)
    # highlight: case-insensitive word-bounded <strong> wrap
    # escape metacharacters: a query word like "c++" must highlight
    # literally, not crash Java Pattern (review finding)
    pattern = (
        "(?i)\\b(" + "|".join(_re.escape(w) for w in words) + ")\\b"
    )
    body = F.regexp_replace(body, pattern, "<strong>$1</strong>")

    out = F.concat(
        F.when(start0 > 0, F.lit("...")).otherwise(F.lit("")),
        body,
        F.when(final_end < n, F.lit("...")).otherwise(F.lit("")),
    )
    return F.when(best1.isNull(), F.lit(NO_PREVIEW)).otherwise(out)


def make_snippets(
    docs: DataFrame,
    query_words: list[str],
    width: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "char",
    strip_html: bool = False,
) -> DataFrame:
    """(doc_id, snippet).

    ``mode="char"``: ``width``-char window starting ``width//2`` chars
    before the first (case-insensitive) query-word hit; all query-word
    occurrences inside the window wrapped in ``**``. Docs with no hit
    fall back to the document head.

    ``mode="sentence"``: reference-parity sentence-aligned snippet
    (see module docstring); ``width`` is the ±radius (reference: 150).

    ``strip_html=True`` runs the reference's exact script/style/tag/
    entity strip first (``strip_html_text``) — with mode="sentence"
    the full chain is byte-identical to generateSnippet on raw HTML
    (pinned in tests/test_snippet_html.py)."""
    words = [w.lower() for w in query_words if w]
    text_in = (
        strip_html_text(F.col(text_col)) if strip_html else F.col(text_col)
    )
    if mode == "sentence":
        return docs.select(
            F.col(id_col).alias("doc_id"),
            _sentence_snippet(
                text_in, words, radius=width, fb_radius=100
            ).alias("snippet"),
        )
    low = F.lower(text_in)
    # first hit = least non-zero locate() over the query words
    # (F.least skips NULLs, so absent words drop out)
    hits = [
        F.when(F.locate(w, low) > 0, F.locate(w, low)) for w in words
    ]
    first = hits[0] if len(hits) == 1 else F.least(*hits)
    start = F.greatest(F.lit(1), F.coalesce(first, F.lit(1)) - width // 2)
    window = F.substring(text_in, start, width)
    # escape metacharacters: a query word like "c++" must highlight
    # literally, not crash Java Pattern (review finding)
    pattern = (
        "(?i)\\b(" + "|".join(_re.escape(w) for w in words) + ")\\b"
    )
    snippet = F.regexp_replace(window, pattern, "**$1**")
    return docs.select(F.col(id_col).alias("doc_id"), snippet.alias("snippet"))
