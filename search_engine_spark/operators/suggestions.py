"""Suggestions (SURVEY.md §2.7 U1-U3).

U1 production path: prefix match over the distinct term vocabulary with
the reference's CASE ordering — exact match first, then query-log style
"prefix + space" entries, then everything else, alphabetical within a
class, LIMIT k (ref: BackendManager.java:408-446, SQL at 419-431).

U2's trie is intentionally NOT ported: over a DataFrame the same result
is the filter + orderBy below, and the vocabulary table is tiny relative
to postings (SURVEY.md §2.7 U2 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import Index


def prefix_suggest(index: Index, prefix: str, k: int = 5) -> DataFrame:
    """(term) suggestions for a prefix, reference-ordered."""
    p = prefix.lower()
    terms = index.term_stats.select("term").where(
        F.col("term").startswith(p)
    )
    rank_class = (
        F.when(F.col("term") == p, F.lit(1))
        .when(F.col("term").startswith(p + " "), F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        terms.withColumn("rank_class", rank_class)
        .orderBy("rank_class", "term")
        .limit(k)
        .select("term")
    )


def query_log_recent(
    query_log: DataFrame, hours: int = 12
) -> DataFrame:
    """U3: (query, count) rows newer than ``hours`` relative to the log's
    max timestamp (ref: DataBaseManager.java:20-35 uses wall-clock now;
    max-ts anchoring keeps the operator deterministic on static data)."""
    max_ts = query_log.agg(F.max("last_added").alias("m")).collect()[0]["m"]
    return query_log.where(
        F.col("last_added") > F.lit(max_ts) - F.expr(f"INTERVAL {hours} HOURS")
    ).select("query", "count")


class Trie:
    """U2 (ref Trie.java:15-72): prefix trie with the top-10-by-frequency
    list materialized at every node. Driver-side helper over the (small)
    distinct-term vocabulary — kept for API parity with the reference;
    the DataFrame path (``prefix_suggest``) is the production route.
    ``insert`` with a new frequency REPLACES the word's entry along the
    prefix path (reference updates frequency the same way).

    Parity notes (ADVICE r02): only CHILD nodes along the path carry
    top lists — like the reference's insert/updateTopSuggestions, the
    root is never noted, so ``suggest("")`` returns [] exactly as
    ``getTopSuggestions("")`` does. One documented deviation: ties sort
    (-freq, word) deterministically, where the reference's tie order is
    HashMap/insertion-order dependent (not reproducible by design)."""

    TOP_K = 10

    def __init__(self) -> None:
        self.children: dict[str, "Trie"] = {}
        self.word_end = False
        self.top: list[tuple[str, int]] = []

    def _note(self, word: str, freq: int) -> None:
        self.top = [(w, f) for w, f in self.top if w != word]
        self.top.append((word, freq))
        self.top.sort(key=lambda wf: (-wf[1], wf[0]))
        del self.top[self.TOP_K :]

    def insert(self, word: str, freq: int = 1) -> None:
        node = self
        for ch in word:
            node = node.children.setdefault(ch, Trie())
            node._note(word, freq)
        node.word_end = True

    def suggest(self, prefix: str) -> list[str]:
        node = self
        for ch in prefix:
            node = node.children.get(ch)
            if node is None:
                return []
        return [w for w, _ in node.top]


def trie_from_terms(
    term_stats: DataFrame, max_terms: int = 1_000_000
) -> Trie:
    """Build the U2 trie from the term_stats table (term, df): frequency
    = document frequency. The collect() is deliberate — the reference's
    trie is an in-memory structure — but it is BOUNDED: only the
    ``max_terms`` highest-df terms (df DESC, term ASC — deterministic)
    are collected, planned as TakeOrderedAndProject. A natural-language
    vocabulary is Zipf-bounded well under the default, so sf-scale
    builds see every term; a 100-TB code corpus's heavy-tailed
    identifier vocabulary (easily 10^8 distinct terms) gets the top
    1M — which already dominates every top-10-by-frequency answer the
    trie can return for prefixes whose hits reach the cut. Raise
    ``max_terms`` explicitly to trade driver memory for tail-prefix
    coverage; the fully-distributed path (``prefix_suggest``,
    ``fuzzy_suggest``) has no such bound."""
    t = Trie()
    rows = (
        term_stats.select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_terms)
        .collect()
    )
    for r in rows:
        t.insert(r["term"], int(r["df"]))
    return t


def fuzzy_suggest(
    index: Index, term: str, k: int = 10, max_dist: int = 2
) -> DataFrame:
    """(term, df, dist): "did you mean" spell correction — vocabulary
    terms within ``max_dist`` Levenshtein edits of the (lowercased)
    query term, ranked (dist ASC, df DESC, term ASC), top k.

    The reference's suggestion tier stops at prefix matching
    (BackendManager.java:408-446); edit-distance correction is the
    standard extension a query front-end needs for typos.

    Scale shape: a narrow scan of the vocabulary table (tiny relative
    to postings) with a cheap length-band prefilter
    |len(term) - len(q)| <= max_dist evaluated BEFORE the O(len^2)
    levenshtein, and TakeOrderedAndProject for the top-k — no shuffle,
    no UDF. At web scale the vocabulary is Zipf-bounded (tens of
    millions of rows), so even the full levenshtein scan is a
    second-class cost next to any postings touch; a production tier
    would keep this exact operator behind a deletes-index
    (SymSpell-style) only if the vocabulary scan ever dominated.
    """
    q = term.lower()
    return (
        index.term_stats.where(
            F.abs(F.length("term") - F.lit(len(q))) <= max_dist
        )
        .withColumn(
            "dist", F.levenshtein(F.col("term"), F.lit(q)).cast("int")
        )
        .where(F.col("dist") <= max_dist)
        .orderBy(F.col("dist"), F.col("df").desc(), F.col("term"))
        .limit(k)
        .select("term", "df", "dist")
    )
