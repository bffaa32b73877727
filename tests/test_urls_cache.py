"""T8 URL normalization, T9 link extraction, Q12 LRU query cache."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.urls import extract_links, normalize_url


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url: string")
    return [r.n for r in df.select(normalize_url(F.col("url")).alias("n")).collect()]


def test_normalize_url_reference_cases(spark):
    got = _norm(
        spark,
        [
            "HTTP://WWW.Example.COM:80/Path/To/Page/",
            "https://Example.com:443/a",
            "https://example.com:8080/a",          # non-default port kept
            "http://example.com/search?q=x&utm_source=t&page=3",
            "http://example.com/?nope=1",          # all params dropped
            "ftp://example.com/file",              # non-http → null
            "http://example.com",                  # no path → "/" restored
            "http://example.com/a///",             # ALL trailing slashes
            "http://example.com/s?ID=5&Q=x",       # keys matched lowercased
            "http://example.com/s?id=1&x=2&id=1",  # exact-dup param dropped
        ],
    )
    assert got == [
        "http://www.example.com/Path/To/Page",    # host lowered, path case kept
        "https://example.com/a",
        "https://example.com:8080/a",
        "http://example.com/search?q=x&page=3",   # whitelist, order kept
        "http://example.com/",
        None,
        "http://example.com/",
        "http://example.com/a",
        "http://example.com/s?ID=5&Q=x",          # original key case kept
        "http://example.com/s?id=1",
    ]


def test_extract_links_cap_and_normalize(spark):
    # 15 distinct links, each repeated twice: dedup happens BEFORE the cap
    # (HashSet.add) and the loop breaks only when size EXCEEDS 10, so 11
    # distinct links survive — the reference off-by-one, preserved
    many = " ".join(
        f"see http://Site.com:80/p{i}/ and http://Site.com:80/p{i}/"
        for i in range(15)
    )
    df = spark.createDataFrame(
        [(0, many), (1, "no links here"), (2, 'x "https://a.b/c?id=1&z=2" y')],
        "doc_id: long, text: string",
    )
    out = extract_links(df, max_links=10)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.link)
    assert len(by_doc[0]) == 11                    # cap+1 distinct (quirk)
    assert by_doc[0][0] == "http://site.com/p0"
    assert 1 not in by_doc
    assert by_doc[2] == ["https://a.b/c?id=1"]


def test_query_cache_lru(spark, spark_index):
    from search_engine_spark.operators.query import QueryCache

    qc = QueryCache(spark_index, maxsize=2)
    r1 = qc.search("banana recipe", k=3)
    r2 = qc.search("banana recipe", k=3)
    assert r1 == r2 and qc.hits == 1 and qc.misses == 1
    # hits hand back defensive copies — mutating a result must not
    # poison the cached entry
    r2.clear()
    assert qc.search("banana recipe", k=3) == r1 and qc.hits == 2
    qc.search("banana", k=3)
    qc.search("recipe", k=3)  # evicts "banana recipe" (maxsize=2)
    assert ("banana recipe", 3, "bm25") not in qc._d
    # re-query repopulates with identical results
    r3 = qc.search("banana recipe", k=3)
    assert [(x.doc_id, x.score) for x in r3] == [
        (x.doc_id, x.score) for x in r1
    ]


def test_trie_topk_and_update():
    from search_engine_spark.operators.suggestions import Trie

    t = Trie()
    for w, f in [("banana", 5), ("band", 9), ("bandit", 2), ("cat", 1)]:
        t.insert(w, f)
    assert t.suggest("ban") == ["band", "banana", "bandit"]
    assert t.suggest("bana") == ["banana"]
    assert t.suggest("zzz") == []
    t.insert("banana", 20)  # frequency update replaces, not duplicates
    assert t.suggest("ban") == ["banana", "band", "bandit"]


def test_trie_build_is_bounded_by_max_terms(spark, spark_index):
    """The driver-side trie collect is capped at the max_terms
    highest-df terms (a 100-TB identifier vocabulary would otherwise
    kill the driver); under the cap the build equals the unbounded
    one, and over an oversized synthetic vocabulary only the top
    max_terms rows land in the trie."""
    from search_engine_spark.operators.suggestions import trie_from_terms

    # (a huge limit is NOT "unbounded": TakeOrdered sizes its heap by
    # the limit — the same reason pq_topk's 1e6 dial skips the screen —
    # so the parity dial is simply a cap the vocabulary fits under)
    full = trie_from_terms(spark_index.term_stats)
    capped = trie_from_terms(spark_index.term_stats, max_terms=50_000)
    for p in ("b", "ba", "re", "s", ""):
        assert capped.suggest(p) == full.suggest(p)

    # oversized vocabulary: 5k synthetic terms, cap at 100 -> only the
    # 100 highest-df terms are inserted (df DESC, term ASC ties)
    vocab = spark.createDataFrame(
        [(f"t{i:05d}", (i * 7) % 500 + 1) for i in range(5_000)],
        "term string, df long",
    )
    t = trie_from_terms(vocab, max_terms=100)
    inserted = set()

    def walk(node):
        for w, _f in node.top:
            inserted.add(w)
        for ch in node.children.values():
            walk(ch)

    walk(t)
    rows = vocab.orderBy(F.desc("df"), F.asc("term")).limit(100).collect()
    want = {r["term"] for r in rows}
    # every inserted word is in the cut (the trie may drop low-freq
    # cut members from interior top-10 lists, never add outsiders)
    assert inserted <= want
    top = max(rows, key=lambda r: (r["df"], r["term"]))
    assert t.suggest(top["term"][:3])  # cut members are reachable


def test_total_count_and_metadata(spark, spark_index, corpus_df):
    from search_engine_spark.operators.query import (
        attach_doc_metadata,
        search,
        total_count,
    )

    n_and = total_count(spark_index, "banana AND recipe")
    n_or = total_count(spark_index, "banana OR recipe")
    n_banana = total_count(spark_index, "banana")
    assert 0 < n_and <= n_banana <= n_or

    res = search(spark_index, "banana", k=5)
    out = attach_doc_metadata(res, corpus_df.withColumnRenamed("doc_id", "doc_id"))
    rows = out.collect()
    assert len(rows) == 5
    assert "path" in out.columns and "repo" in out.columns
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_extract_links_job_cli(spark, tmp_path):
    """S6 job-level: raw (doc_id, extracted_link) sink + resolved
    (src, dst) edges via --resolve."""
    import json as _json
    import os
    import subprocess
    import sys

    docs_path = str(tmp_path / "docs")
    rows = [
        (i, f"see http://site.com/d{(i + 1) % 6} now", f"http://site.com/d{i}")
        for i in range(6)
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, url: string"
    ).write.parquet(docs_path)

    out = str(tmp_path / "links")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "/root/repo/jobs/extract_links_job.py",
         "--docs", docs_path, "--output", out, "--resolve"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_links"] == 6 and report["n_edges"] == 6

    links = spark.read.parquet(out)
    assert set(links.columns) == {"doc_id", "extracted_link"}
    edges = {(r.src, r.dst) for r in spark.read.parquet(out + "_edges").collect()}
    assert edges == {(i, (i + 1) % 6) for i in range(6)}


def test_trie_empty_prefix_and_root(spark_index=None):
    """ADVICE r02: the reference's Trie only notes CHILD nodes, so the
    empty prefix suggests nothing."""
    from search_engine_spark.operators.suggestions import Trie

    t = Trie()
    t.insert("spark", 5)
    t.insert("scan", 9)
    assert t.suggest("") == []
    assert t.suggest("s") == ["scan", "spark"]
    assert t.suggest("sp") == ["spark"]


def test_search_paged_validates_arguments():
    import pytest as _pytest

    from search_engine_spark.operators.query import search_paged

    with _pytest.raises(ValueError):
        search_paged(None, "q", page=-1, size=10)
    with _pytest.raises(ValueError):
        search_paged(None, "q", page=0, size=0)


def test_streaming_dedup_all_empty_chunks_do_not_poison_state():
    """ADVICE r02: an all-empty chunk iterator must not mark the hash
    seen — the true first occurrence in a later batch must still emit."""
    import pandas as pd

    from search_engine_spark.streaming.dedup_stream import _first_wins

    class _State:
        def __init__(self):
            self.exists = False
            self.updated = False

        def update(self, v):
            self.updated = True
            self.exists = True

    empty = pd.DataFrame({"doc_id": [], "text": []})
    st = _State()
    out = list(_first_wins(("h",), iter([empty]), st))
    assert out == [] and not st.updated

    # later batch with real rows: the first occurrence emits
    rows = pd.DataFrame({"doc_id": [7, 3], "text": ["a", "b"]})
    out = list(_first_wins(("h",), iter([rows]), st))
    assert len(out) == 1 and int(out[0]["doc_id"].iloc[0]) == 3
    assert st.updated
