"""Block-max WAND (operators/wand.py): exactness vs brute force and
rank-identity vs the exhaustive query.search path."""

import numpy as np
import pytest

from search_engine_spark.operators import codec
from search_engine_spark.operators.wand import _topk, _wand_shard_topk


def _mk_term(rng, n_docs, density, idf, block_size):
    ids = np.sort(
        rng.choice(n_docs, size=max(1, int(n_docs * density)), replace=False)
    ).astype(np.int64)
    tfs = rng.uniform(0.1, 2.2, size=ids.size)
    bmax = [
        float(tfs[b : b + block_size].max())
        for b in range(0, ids.size, block_size)
    ]
    return {
        "doc_ids_enc": codec.delta_encode_ids(ids),
        "bm25_tf_enc": codec.encode_tfs(tfs),
        "block_max": bmax,
        "max_bm25_tf": float(tfs.max()),
        "idf": idf,
        "_ids": ids,
        "_tfs": codec.decode_tfs(codec.encode_tfs(tfs)).astype(np.float64),
    }


def _brute(terms, k):
    scores = {}
    for t in terms:
        for d, tf in zip(t["_ids"], t["_tfs"]):
            scores[int(d)] = scores.get(int(d), 0.0) + t["idf"] * float(tf)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [d for d, _ in ranked], [s for _, s in ranked]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("block_size", [4, 16])
def test_wand_shard_matches_brute_force(seed, block_size):
    rng = np.random.default_rng(seed)
    terms = [
        _mk_term(rng, 5000, d, idf, block_size)
        for d, idf in [(0.5, 0.2), (0.05, 1.5), (0.01, 2.2), (0.3, 0.6)]
    ]
    for k in (1, 10, 100):
        ids, rels, _prs, scores = _wand_shard_topk(terms, k, block_size)
        bid, brel = _brute(terms, k)
        assert list(ids) == bid
        np.testing.assert_allclose(rels, brel, rtol=1e-9)
        np.testing.assert_allclose(scores, brel, rtol=1e-9)


def test_wand_shard_single_term():
    rng = np.random.default_rng(7)
    t = _mk_term(rng, 1000, 0.2, 1.0, 8)
    ids, rels, _prs, _scores = _wand_shard_topk([t], 5, 8)
    bid, brel = _brute([t], 5)
    assert list(ids) == bid


@pytest.mark.parametrize("seed", [0, 5])
def test_wand_shard_with_pagerank_mix(seed):
    """Mixed 0.7·rel + 0.3·pr scoring: exact vs brute force — the
    per-shard max-pr term keeps the block UB valid."""
    rng = np.random.default_rng(seed)
    block_size = 8
    n_docs = 3000
    terms = [
        _mk_term(rng, n_docs, d, idf, block_size)
        for d, idf in [(0.4, 0.3), (0.03, 1.8), (0.2, 0.7)]
    ]
    pr_ids = np.arange(n_docs, dtype=np.int64)
    pr_vals = rng.uniform(0.0, 1.0, size=n_docs)
    w_rel, w_pr = 0.7, 0.3

    scores = {}
    for t in terms:
        for d, tf in zip(t["_ids"], t["_tfs"]):
            scores[int(d)] = scores.get(int(d), 0.0) + w_rel * t["idf"] * float(tf)
    for d in scores:
        scores[d] += w_pr * pr_vals[d]
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))

    for k in (1, 10, 50):
        ids, rels, prs, got = _wand_shard_topk(
            terms, k, block_size, w_rel=w_rel, w_pr=w_pr,
            pr_ids=pr_ids, pr_vals=pr_vals,
        )
        bid = [d for d, _ in ranked[:k]]
        brel = [s for _, s in ranked[:k]]
        assert list(ids) == bid
        np.testing.assert_allclose(got, brel, rtol=1e-9)
        np.testing.assert_allclose(prs, pr_vals[np.asarray(bid)], rtol=1e-12)


def test_topk_tie_break_by_doc_id():
    ids = np.array([9, 3, 5, 1, 7], dtype=np.int64)
    scores = np.array([1.0, 2.0, 1.0, 1.0, 2.0])
    out_ids, out_scores = _topk(ids, scores, 3)
    # ties at 2.0: ids 3,7; third slot: score 1.0 ties → lowest id 1
    assert list(out_ids) == [3, 7, 1]


def test_wand_rank_identity_vs_search(spark):
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import search
    from search_engine_spark.operators.wand import search_wand
    from search_engine_spark.sources.corpus import generate_corpus

    # small blocks + small shards so pruning AND multi-shard paths engage
    cfg = EngineConfig(docs_per_shard=64, block_size=8)
    docs = generate_corpus(spark, 400, seed=11).cache()
    idx = build_index(docs, cfg=cfg)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()

    for q in ["banana recipe", "spark", "banana recipe hash join", "zzz_absent"]:
        exp = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(idx, q, k=10).collect()
        ]
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_wand(idx, q, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-6, q


def test_wand_rank_identity_with_pagerank(spark):
    """The mixed 0.7·rel + 0.3·pagerank score through WAND must be
    rank-identical to the exhaustive search path (the round-1 punt)."""
    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import search
    from search_engine_spark.operators.wand import search_wand
    from search_engine_spark.sources.corpus import generate_corpus

    cfg = EngineConfig(docs_per_shard=64, block_size=8)
    docs = generate_corpus(spark, 400, seed=13).withColumn(
        "page_rank", (F.crc32(F.col("doc_id").cast("string")) % 1000) / 1000.0
    ).cache()
    idx = build_index(docs, cfg=cfg)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    pr = docs.select("doc_id", "page_rank")

    for q in ["banana recipe", "spark", "banana recipe hash join"]:
        exp = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(idx, q, k=10, page_rank=pr).collect()
        ]
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in search_wand(idx, q, k=10, page_rank=pr).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-6, q
