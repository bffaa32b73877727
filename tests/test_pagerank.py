"""PageRank vs the numpy/pure-Python oracle (FIXTURES.md F3): dangling
node, 2-cycle, hub, isolated pair — damping 0.85, eps 1e-5, max-delta."""

import math

import pytest

from search_engine_spark.oracle import oracle_pagerank

# F3 graph: hub 0 -> {1,2,3}; 2-cycle 1<->2; 3 dangles; 4<->5 isolated pair;
# 6 isolated node (no edges at all)
EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 1), (4, 5), (5, 4)]
NODES = [0, 1, 2, 3, 4, 5, 6]


@pytest.fixture(scope="module")
def spark_ranks(spark):
    from search_engine_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(n,) for n in NODES], "doc_id long")
    return {
        r["doc_id"]: r["page_rank"]
        for r in pagerank(edges, nodes).collect()
    }


def test_matches_oracle(spark_ranks):
    want = oracle_pagerank(EDGES, NODES)
    assert set(spark_ranks) == set(want)
    for v in NODES:
        assert math.isclose(spark_ranks[v], want[v], abs_tol=5e-5), (
            v, spark_ranks[v], want[v]
        )


def test_rank_mass_conserved(spark_ranks):
    # with dangling redistribution total mass stays ~1
    assert math.isclose(sum(spark_ranks.values()), 1.0, abs_tol=1e-3)


def test_duplicate_edges_ignored(spark):
    from search_engine_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        EDGES + EDGES, "src long, dst long"
    )
    nodes = spark.createDataFrame([(n,) for n in NODES], "doc_id long")
    got = {r["doc_id"]: r["page_rank"] for r in pagerank(edges, nodes).collect()}
    want = oracle_pagerank(EDGES, NODES)
    for v in NODES:
        assert math.isclose(got[v], want[v], abs_tol=5e-5)


def test_repo_link_graph(corpus_df):
    from search_engine_spark.operators.pagerank import repo_link_graph

    edges = repo_link_graph(corpus_df)
    n_edges = edges.count()
    n_docs = corpus_df.count()
    n_repos = corpus_df.select("repo").distinct().count()
    # ring edges: n_docs - n_repos intra + (n_repos - 1) inter
    assert n_edges == n_docs - 1
    assert edges.select("src").distinct().count() <= n_docs


def test_end_to_end_rank_mix(spark, corpus_df, oracle_idx):
    """Combined 0.7·BM25 + 0.3·PR (R2) matches the oracle when both sides
    use the same page-rank values."""
    from tests.conftest import TEST_CFG
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.pagerank import pagerank, repo_link_graph
    from search_engine_spark.operators.query import search
    from search_engine_spark.oracle import oracle_build, oracle_search

    pr = pagerank(
        repo_link_graph(corpus_df), corpus_df.select("doc_id")
    )
    pr_map = {r["doc_id"]: r["page_rank"] for r in pr.collect()}
    oidx = oracle_build(
        [(d, c) for d, c in
         [(r["doc_id"], r["content"]) for r in
          corpus_df.select("doc_id", "content").collect()]],
        cfg=TEST_CFG,
        page_rank=pr_map,
    )
    idx = build_index(corpus_df, cfg=TEST_CFG)
    got = [
        (r["doc_id"], r["score"])
        for r in search(idx, "banana recipe", k=10, page_rank=pr).collect()
    ]
    want = oracle_search(oidx, "banana recipe", k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-6), (gd, gs, ws)


def test_distributed_path_matches_local(spark):
    """Force the iterative-DataFrame loop (threshold=0) and check it
    agrees with the driver-side numpy path to float tolerance."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(n,) for n in NODES], "doc_id long")
    dist_cfg = EngineConfig(pagerank_local_threshold=0)
    dist = {
        r["doc_id"]: r["page_rank"]
        for r in pagerank(edges, nodes, cfg=dist_cfg).collect()
    }
    loc = {
        r["doc_id"]: r["page_rank"]
        for r in pagerank(edges, nodes).collect()
    }
    assert set(dist) == set(loc)
    for k in dist:
        assert math.isclose(dist[k], loc[k], rel_tol=0, abs_tol=5e-5), k


def test_write_back_pagerank_merge(spark, tmp_path):
    """G3 (DataBaseManager.java:59-74): ranks computed from the link graph
    are persisted onto the docs table; unlinked docs keep page_rank 0.0;
    the swap is atomic (no .staging/.old leftovers). The rewritten table
    must match the independent numpy fixpoint."""
    import os

    from pyspark.sql import functions as F

    from search_engine_spark.operators.pagerank import write_back_pagerank
    from search_engine_spark.oracle import oracle_pagerank

    docs_path = str(tmp_path / "docs")
    rows = [(i, f"repo{i % 3}", f"content {i}") for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id: long, repo: string, content: string"
    ).write.parquet(docs_path)

    # ring within each repo; doc 29 left dangling by construction
    edge_rows = [(i, i + 3) for i in range(0, 24)]
    edges = spark.createDataFrame(edge_rows, "src: long, dst: long")

    n_ranked = write_back_pagerank(spark, docs_path, edges)
    assert n_ranked > 0

    out = spark.read.parquet(docs_path)
    assert "page_rank" in out.columns
    assert out.count() == 30
    got = {r.doc_id: r.page_rank for r in out.collect()}
    want = oracle_pagerank(edge_rows, list(range(30)))
    for d in range(30):
        assert abs(got[d] - want[d]) < 1e-6, d
    # original columns intact
    assert {"doc_id", "repo", "content", "page_rank"} == set(out.columns)
    # atomic swap left no staging debris
    parent = os.path.dirname(docs_path)
    assert not any(x.endswith((".staging", ".old")) for x in os.listdir(parent))

    # idempotent re-run (the job can be re-submitted)
    write_back_pagerank(spark, docs_path, edges)
    got2 = {r.doc_id: r.page_rank for r in spark.read.parquet(docs_path).collect()}
    for d in range(30):
        assert abs(got2[d] - got[d]) < 1e-12


def test_pagerank_job_cli(spark, tmp_path):
    """Job-level: jobs/pagerank_job.py main() over --docs with the repo
    ring graph fallback."""
    import subprocess
    import sys
    import json as _json
    import os

    docs_path = str(tmp_path / "docs")
    rows = [(i, f"repo{i % 2}", f"content {i}") for i in range(20)]
    spark.createDataFrame(
        rows, "doc_id: long, repo: string, content: string"
    ).write.parquet(docs_path)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "/root/repo/jobs/pagerank_job.py", "--docs", docs_path],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 20 and report["n_ranked"] > 0

    out = spark.read.parquet(docs_path)
    assert out.where("page_rank > 0").count() == report["n_ranked"]

    # second run with --warm-start: re-ranks from the column just
    # written — same ranks (same graph → already at the fixpoint, so it
    # converges in one iteration), not fewer docs
    before = {
        r["doc_id"]: r["page_rank"]
        for r in out.select("doc_id", "page_rank").collect()
    }
    proc2 = subprocess.run(
        [
            sys.executable,
            "/root/repo/jobs/pagerank_job.py",
            "--docs",
            docs_path,
            "--warm-start",
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    report2 = _json.loads(proc2.stdout.strip().splitlines()[-1])
    assert report2["warm_start"] is True
    assert report2["iterations"] == 1, report2
    assert report2["n_ranked"] == report["n_ranked"]
    after = {
        r["doc_id"]: r["page_rank"]
        for r in spark.read.parquet(docs_path)
        .select("doc_id", "page_rank")
        .collect()
    }
    for k, v in before.items():
        assert abs(after[k] - v) < 1.2e-4, (k, v, after[k])


def _random_graph(n_nodes: int, n_edges: int, seed: int):
    import random

    rng = random.Random(seed)
    edges = set()
    while len(edges) < n_edges:
        s, t = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if s != t:
            edges.add((s, t))
    return sorted(edges)


def test_warm_start_same_fixpoint_fewer_iterations(spark):
    """incremental_pagerank: after a small graph delta, warm-starting
    from the previous ranks reaches the SAME fixpoint as a cold run on
    the new graph (contraction argument) in strictly fewer iterations."""
    from search_engine_spark.operators.pagerank import (
        incremental_pagerank,
        pagerank,
    )

    n = 400
    base_edges = _random_graph(n, 1600, seed=7)
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    e0 = spark.createDataFrame(base_edges, "src long, dst long")
    prev = pagerank(e0, nodes)

    # delta: 1% new edges + one brand-new doc (id n) linked both ways
    delta = _random_graph(n, 16, seed=99) + [(0, n), (n, 1)]
    new_edges = sorted(set(base_edges) | set(delta))
    e1 = spark.createDataFrame(new_edges, "src long, dst long")
    nodes1 = spark.createDataFrame(
        [(i,) for i in range(n + 1)], "doc_id long"
    )

    cold_stats, warm_stats = {}, {}
    cold = {
        r["doc_id"]: r["page_rank"]
        for r in pagerank(e1, nodes1, stats=cold_stats).collect()
    }
    warm = {
        r["doc_id"]: r["page_rank"]
        for r in incremental_pagerank(
            e1, nodes1, prev, stats=warm_stats
        ).collect()
    }
    assert set(warm) == set(cold) and n in warm  # new doc got a rank
    for k in cold:
        assert math.isclose(warm[k], cold[k], abs_tol=5e-5), (
            k, warm[k], cold[k]
        )
    assert warm_stats["iterations"] < cold_stats["iterations"], (
        warm_stats, cold_stats
    )
    assert warm_stats["n"] == n + 1


def test_warm_start_distributed_path(spark):
    """The iterative-DataFrame loop honors init_ranks: warm-started from
    the exact fixpoint it converges immediately (1 iteration) to the
    same values; nodes missing from the init vector default to 1/N."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    nodes = spark.createDataFrame([(v,) for v in NODES], "doc_id long")
    dist_cfg = EngineConfig(pagerank_local_threshold=0)
    fix = pagerank(edges, nodes, cfg=dist_cfg).localCheckpoint()

    stats = {}
    again = {
        r["doc_id"]: r["page_rank"]
        for r in pagerank(
            edges, nodes, cfg=dist_cfg, init_ranks=fix, stats=stats
        ).collect()
    }
    want = {r["doc_id"]: r["page_rank"] for r in fix.collect()}
    assert stats["iterations"] == 1, stats
    for k in want:
        assert math.isclose(again[k], want[k], abs_tol=5e-5), k

    # init vector missing some nodes: still converges to the fixpoint.
    # Tolerance: the max-delta<=eps stopping rule leaves up to
    # eps*d/(1-d) ~ 5.7e-5 residual per run, and the two runs stop at
    # different points — bound the gap by twice that.
    partial = fix.where("doc_id <= 3")
    got = {
        r["doc_id"]: r["page_rank"]
        for r in pagerank(
            edges, nodes, cfg=dist_cfg, init_ranks=partial
        ).collect()
    }
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1.2e-4), k
