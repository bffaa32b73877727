"""URL/link ETL operators (SURVEY.md §2.2 T8, T9).

Reference semantics:
  * T8 normalize — Crawler.java:491-529: lowercase scheme and host,
    strip the scheme's default port (:80 http / :443 https), strip ALL
    trailing slashes from the path (``/+$``) restoring ``/`` when the
    path becomes empty, and keep only query parameters whose key
    LOWERCASES to the whitelist (q, search, id, page, sort, category) —
    original param text preserved, exact-duplicate params removed
    (LinkedHashSet), original order kept.
  * T9 extract — Crawler.java:475-489: absolute http(s) links out of a
    document, collected into a HashSet with a break once size exceeds
    MAX_DEPTH_PER_DOMAIN=10 — i.e. the first 11 DISTINCT raw links in
    document order (the reference misuses a domain-depth knob as a
    per-doc cap, and the off-by-one is preserved).

Both are pure column expressions (regexp + array algebra): they run in
whole-stage codegen at 100 TB and are mirrored 1:1 in ANSI SQL for the
DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PARAM_WHITELIST = ["q", "search", "id", "page", "sort", "category"]

_URL_RE = r"^(?i)(https?)://([^/?#]+)([^?#]*)\??([^#]*)"


def normalize_url(url: Column) -> Column:
    """T8: canonical URL form, null for non-http(s) inputs."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).otherwise(F.regexp_replace(host, ":443$", ""))
    path = F.regexp_replace(F.regexp_extract(url, _URL_RE, 3), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _URL_RE, 4)
    kept = F.array_distinct(
        F.filter(
            F.split(query, "&"),
            lambda kv: F.lower(F.split(kv, "=").getItem(0)).isin(
                PARAM_WHITELIST
            ),
        )
    )
    qs = F.array_join(kept, "&")
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", out)


def extract_links(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_links: int = 10,
) -> DataFrame:
    """T9: (doc_id, link) — absolute http(s) URLs found in the text.
    Reference quirk: dedup happens BEFORE the cap (HashSet.add) and the
    loop breaks only when size EXCEEDS the cap, so up to ``max_links+1``
    distinct raw links survive, in document order
    (Crawler.java:475-489)."""
    links = F.slice(
        F.array_distinct(
            F.regexp_extract_all(
                F.col(text_col),
                F.lit(r"((?i)https?://[^\s\"'<>)\]]+)"),
                F.lit(1),
            )
        ),
        1,
        max_links + 1,
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"), F.explode(links).alias("raw")
        )
        .select("doc_id", normalize_url(F.col("raw")).alias("link"))
        .where(F.col("link").isNotNull())
    )
