"""Pure-Python sentence-aligned snippet (reference:
BackendManager.java:160-271 generateSnippet) for the SERVING tier —
the same semantics `operators/snippets.py` expresses as Spark column
algebra for result pages built in bulk, here as the scalar function a
single serving node runs per result row (the reference computes
snippets per request the same way).

Semantics (shared with the Spark sentence mode, pinned equal by
tests/test_serving.py; the Spark mode itself is pinned byte-identical
to an independent Java transcription in tests/test_embed_dedup_snippets.py):
normalize punctuation/whitespace, first query word in LIST order,
expand to ". " sentence bounds within ±radius, ±fb_radius re-window if
the cut dropped every query word (leading "..." decided from the
PRE-fallback start — reference quirk), cleanup, case-insensitive
word-bounded <strong> highlight, "..." ellipses, NO_PREVIEW when no
query word occurs.
"""

from __future__ import annotations

import re as _re

NO_PREVIEW = "No preview available for this result."

_CTRL = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_NL = _re.compile(r"\s*[\r\n]+\s*")
_PUNCT = _re.compile(r"\s*[.,!?]+\s*")
_DOTS = _re.compile(r"\.+")
_WS = _re.compile(r"\s+")
_LEAD = _re.compile(r"^[^a-zA-Z0-9]+")
_TRAIL = _re.compile(r"[^a-zA-Z0-9]+$")


def _normalize(text: str) -> str:
    t = _CTRL.sub("", text or "")
    t = _NL.sub(" ", t)
    t = _PUNCT.sub(". ", t)
    t = _DOTS.sub(".", t)
    t = _WS.sub(" ", t)
    return t.strip()


# The reference's HTML/entity strip chain (BackendManager.java:132-151)
# — Python re has no [\p{Cntrl}&&[^\n\t]] intersection; the equivalent
# explicit class is [\x00-\x08\x0b-\x1f\x7f] (all C0 controls + DEL
# except \t and \n).
_HTML_STEPS = [
    (_re.compile(r"(?is)<script\b[^<]*(?:(?!</script>)<[^<]*)*</script>"),
     " "),
    (_re.compile(r"(?is)<style\b[^<]*(?:(?!</style>)<[^<]*)*</style>"),
     " "),
    (_re.compile(r"(?s)<!--.*?-->"), " "),
    (_re.compile(r"<[^>]+>"), " "),
    (_re.compile("&nbsp;|[ ]"), " "),
    (_re.compile(r"&amp;"), "&"),
    (_re.compile(r"&lt;"), "<"),
    (_re.compile(r"&gt;"), ">"),
    (_re.compile(r"&quot;"), '"'),
    (_re.compile(r"&#39;"), "'"),
    (_re.compile(r"&#[0-9]+;"), " "),
    (_re.compile(r"&[a-zA-Z0-9#]+;"), " "),
    (_re.compile(r"[\x00-\x08\x0b-\x1f\x7f]"), ""),
]


def strip_html_text(text: str) -> str:
    """Reference-exact HTML → text strip, scalar twin of
    ``operators.snippets.strip_html_text`` (pinned equal in
    tests/test_snippet_html.py)."""
    t = text or ""
    for pat, rep in _HTML_STEPS:
        t = pat.sub(rep, t)
    return t


def sentence_snippet(
    text: str,
    query_words: list[str],
    radius: int = 150,
    fb_radius: int = 100,
    strip_html: bool = False,
) -> str:
    words = [w.lower() for w in query_words if w]
    if strip_html:
        text = strip_html_text(text)
    t = _normalize(text)
    low = t.lower()
    best = -1
    for w in words:
        p = low.find(w)
        if p != -1:
            best = p
            break
    if best == -1:
        return NO_PREVIEW

    start = best
    while start > 0 and start > best - radius:
        if start >= 2 and t[start - 2 : start] == ". ":
            start -= 2
            break
        start -= 1
    end = best
    while end < len(t) and end < best + radius:
        if end + 2 <= len(t) and t[end : end + 2] == ". ":
            end += 2
            break
        end += 1
    start, end = max(0, start), min(len(t), end)
    lead = "..." if start > 0 else ""  # decided from the PRE-fallback start
    body = t[start:end].strip()
    if not any(w in body.lower() for w in words):
        start2, end = max(0, best - fb_radius), min(len(t), best + fb_radius)
        body = t[start2:end].strip()

    body = _WS.sub(" ", body)
    body = _PUNCT.sub(". ", body)
    body = _DOTS.sub(".", body)
    body = _LEAD.sub("", body)
    body = _TRAIL.sub("", body)
    body = body.strip()
    pat = _re.compile(
        "(?i)\\b(" + "|".join(_re.escape(w) for w in words) + ")\\b"
    )
    body = pat.sub(lambda m: f"<strong>{m.group(0)}</strong>", body)
    tail = "..." if end < len(t) else ""
    return lead + body + tail
