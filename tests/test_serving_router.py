"""Multi-shard serving router (serving.ServingRouter): 2-4 term-range
shards must be RANK-IDENTICAL to the single-node ServingIndex on the
full query set (boolean quirks and phrases included), shards must
actually hold disjoint term ranges, and fan-out latency must stay
within ~2x of single-shard."""

import time

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.serving import ServingIndex, ServingRouter
from search_engine_spark.sources.corpus import generate_corpus

QUERY_SET = [
    "banana",
    "banana recipe",
    "traveling",
    '"banana recipe"',
    "banana AND recipe",
    "banana OR recipe",
    "banana NOT recipe",
    '"banana recipe" AND spark',
    'spark OR "banana recipe"',
    "nosuchwordxyz",
    "partition shuffle broadcast",
]


@pytest.fixture(scope="module")
def saved(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("router_idx"))
    docs = generate_corpus(spark, 400, seed=11).cache()
    build_index(
        docs, cfg=EngineConfig(docs_per_shard=64, block_size=8)
    ).save(d)
    return d


@pytest.mark.parametrize("n_shards", [2, 4])
def test_router_rank_identical_to_single_node(saved, n_shards):
    single = ServingIndex.load(saved)
    router = ServingRouter.load(saved, n_shards=n_shards)
    assert len(router._shards) == n_shards
    # shards hold disjoint, jointly-exhaustive vocab ranges
    vocabs = [set(sh._idf) for sh in router._shards]
    for i in range(len(vocabs)):
        for j in range(i + 1, len(vocabs)):
            assert not (vocabs[i] & vocabs[j])
    assert set().union(*vocabs) == set(single._idf)
    # every shard loaded strictly less than the whole postings table
    assert all(
        len(sh._enc) < len(single._enc) for sh in router._shards
    )
    for mode in ("bm25", "tfidf"):
        for q in QUERY_SET:
            exp = single.search(q, k=10, mode=mode)
            got = router.search(q, k=10, mode=mode)
            assert got == exp, (n_shards, mode, q)


def test_router_paged_suggest_and_cache(saved):
    single = ServingIndex.load(saved)
    router = ServingRouter.load(saved, n_shards=3)
    rows_r, tot_r = router.search_paged("banana recipe", page=1, size=5)
    rows_s, tot_s = single.search_paged("banana recipe", page=1, size=5)
    assert (rows_r, tot_r) == (rows_s, tot_s)
    assert router.suggest("ba", k=8) == single.suggest("ba", k=8)
    first = router.cached_search("banana recipe", k=10)
    assert router.cached_search("banana recipe", k=10) == first
    assert router.cache_hits >= 1


def test_router_latency_within_2x(saved):
    single = ServingIndex.load(saved)
    router = ServingRouter.load(saved, n_shards=4)
    for srv in (single, router):  # warm decode caches
        for q in QUERY_SET:
            srv.search(q, k=10)

    def warm_ms(srv):
        t0 = time.perf_counter()
        for _ in range(5):
            for q in QUERY_SET:
                srv.search(q, k=10)
        return (time.perf_counter() - t0) * 1000 / (5 * len(QUERY_SET))

    ms_single, ms_router = warm_ms(single), warm_ms(router)
    # generous CI bound: same decode memos, one bisect per term extra
    assert ms_router < 2 * ms_single + 1.0, (ms_single, ms_router)
    assert ms_router < 50


def test_router_follows_published_generations(spark, tmp_path):
    """Fleet lifecycle: load_latest splits the published generation
    into shards; a new publish + refresh() re-splits — rank-identical
    to a fresh single node on the new corpus."""
    from search_engine_spark.publish import publish_index

    root = str(tmp_path / "router_root")
    cfg = EngineConfig(docs_per_shard=64, block_size=8)
    docs_a = generate_corpus(spark, 150, seed=7).cache()
    docs_b = generate_corpus(spark, 300, seed=7).cache()
    publish_index(build_index(docs_a, cfg=cfg), root)

    router = ServingRouter.load_latest(root, n_shards=3)
    assert router.generation == 0 and router.n_docs == 150
    assert router.refresh() is False
    router.cached_search("banana recipe", k=10)
    hits = router.cache_hits

    publish_index(build_index(docs_b, cfg=cfg), root)
    assert router.refresh() is True
    assert router.generation == 1 and router.n_docs == 300
    assert len(router._shards) == 3
    assert router.cache_hits == hits  # counters survive, caches don't
    single = ServingIndex.load_latest(root)
    for q in QUERY_SET:
        assert router.search(q, k=10) == single.search(q, k=10), q
