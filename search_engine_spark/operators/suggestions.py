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
