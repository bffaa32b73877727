"""Query parsing (SURVEY.md §2.4 Q1-Q3) — driver-side, quirk-faithful.

Shared by the Spark engine and the pure-Python oracle so both sides parse
identically by construction.
"""

from __future__ import annotations

from search_engine_spark.functions.porter import stem as porter_stem


def detect_operator(query: str):
    """Quirks Q1/Q9: at most ONE boolean operator, detection order
    OR, then AND, then NOT; split once (ref: QP.java:360-373).
    Returns (op|None, left, right|None)."""
    for op in (" OR ", " AND ", " NOT "):
        if op in query:
            left, right = query.split(op, 1)
            return op.strip(), left, right
    return None, query, None


def is_phrase(part: str) -> bool:
    """Quirk Q2 detect: leading+trailing quote (ref: QP.java:375-377)."""
    p = part.strip()
    return len(p) >= 2 and p.startswith('"') and p.endswith('"')


def strip_phrase(part: str) -> str:
    return part.strip()[1:-1]


def query_stems(query: str, stem: bool = True) -> list[str]:
    """Quirk Q3: whitespace split, lowercase, Porter stem — NO stopword or
    validity filtering on the query side (ref: QP.java:379-422).
    Order-preserving unique (phrase word order matters).

    ``stem=False`` for indexes built with an unstemmed config — the query
    side must mirror the index-side analyzer."""
    stems: list[str] = []
    for w in query.lower().split():
        s = porter_stem(w) if stem else w
        if s not in stems:
            stems.append(s)
    return stems
