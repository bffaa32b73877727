"""Result-snippet generation (reference: BackendManager.java:121-276).

The reference strips HTML with 15 chained regexes, finds the first
query-word hit, expands to sentence bounds ±150 chars, and wraps query
words in ``<strong>``. Our corpus is plain text (no HTML), so the
rebuild keeps the observable contract — first-hit-centred window of
``width`` chars with query words highlighted — as *pure JVM column
algebra* (``locate``/``substring``/``regexp_replace``): snippets for a
100 TB result page never leave whole-stage codegen, and the exact same
semantics are expressible in ANSI SQL for the DuckDB oracle gate.

Simplifications vs the reference (documented, deliberate): window is
char-fixed rather than sentence-aligned, and highlighting uses
``**word**`` markers instead of HTML tags (no markup in a text corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_snippets(
    docs: DataFrame,
    query_words: list[str],
    width: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, snippet): ``width``-char window starting ``width//2``
    chars before the first (case-insensitive) query-word hit; all
    query-word occurrences inside the window wrapped in ``**``.
    Docs with no hit fall back to the document head."""
    words = [w.lower() for w in query_words if w]
    low = F.lower(F.col(text_col))
    # first hit = least non-zero locate() over the query words
    # (F.least skips NULLs, so absent words drop out)
    hits = [
        F.when(F.locate(w, low) > 0, F.locate(w, low)) for w in words
    ]
    first = hits[0] if len(hits) == 1 else F.least(*hits)
    start = F.greatest(F.lit(1), F.coalesce(first, F.lit(1)) - width // 2)
    window = F.substring(F.col(text_col), start, width)
    pattern = "(?i)\\b(" + "|".join(words) + ")\\b"
    snippet = F.regexp_replace(window, pattern, "**$1**")
    return docs.select(F.col(id_col).alias("doc_id"), snippet.alias("snippet"))
