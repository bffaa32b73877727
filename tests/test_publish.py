"""Generation-pointer publishing (publish.py) + serving refresh:
serve-while-indexing without readers ever racing a writer."""

import json
import os

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import search
from search_engine_spark.publish import (
    latest_index_path,
    load_latest_index,
    prune_generations,
    publish_index,
    read_latest,
)
from search_engine_spark.serving import ServingIndex
from search_engine_spark.sources.corpus import generate_corpus

CFG = EngineConfig(docs_per_shard=64, block_size=8)


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    """A published root with two generations: gen0 = 150 docs,
    gen1 = 300 docs (superset corpus, same seed)."""
    d = str(tmp_path_factory.mktemp("pubroot"))
    docs_a = generate_corpus(spark, 150, seed=5).cache()
    docs_b = generate_corpus(spark, 300, seed=5).cache()
    idx_a = build_index(docs_a, cfg=CFG)
    idx_b = build_index(docs_b, cfg=CFG)
    g0 = publish_index(idx_a, d)
    return d, g0, idx_a, idx_b


def test_publish_and_load_latest(root, spark):
    d, g0, idx_a, _ = root
    assert g0 == 0
    ptr = read_latest(d)
    assert ptr["generation"] == 0 and ptr["n_docs"] == idx_a.n_docs
    assert latest_index_path(d) == os.path.join(d, "gen=0")
    loaded = load_latest_index(spark, d)
    assert loaded.n_docs == idx_a.n_docs


def test_refresh_swaps_to_new_generation(root, spark):
    d, _, idx_a, idx_b = root
    srv = ServingIndex.load_latest(d)
    assert srv.generation == 0
    assert srv.refresh() is False  # nothing new published

    before = srv.cached_search("banana recipe", k=10)
    assert srv.cached_search("banana recipe", k=10) == before  # cache hit
    srv.search('"banana recipe"', k=10)
    assert srv._phrase_cache  # phrase component cached (gen 0)
    hits = srv.cache_hits

    g1 = publish_index(idx_b, d)
    assert g1 == 1
    assert srv.refresh() is True
    assert srv.generation == 1
    assert srv.n_docs == idx_b.n_docs
    # counters survive the swap; the result and phrase caches do not —
    # gen-0 phrase candidates must not answer gen-1 queries
    assert srv.cache_hits == hits
    assert srv._phrase_cache == {}
    after = srv.cached_search("banana recipe", k=10)
    exp = [
        (r["doc_id"], r["score"])
        for r in search(idx_b, "banana recipe", k=10).collect()
    ]
    # serving scores the float32-decoded codec values; the in-memory
    # index scores float64 — rank-identical, scores within quantization
    assert [d_ for d_, _, _, _ in after] == [d_ for d_, _ in exp]
    for (_, _, _, gs), (_, es) in zip(after, exp):
        assert abs(gs - es) < 1e-5
    assert srv.refresh() is False  # already current


def test_old_generation_still_readable_after_publish(root):
    """A reader that has NOT refreshed keeps serving its immutable
    snapshot — the property the in-place overwrite layout lacks."""
    d, _, idx_a, _ = root
    old = ServingIndex.load(os.path.join(d, "gen=0"))
    assert old.n_docs == idx_a.n_docs
    assert old.search("banana", k=5)  # still answers


def test_orphan_generation_skipped(root, spark):
    """Crash mid-publish = gen dir exists, pointer not flipped. Readers
    stay on the old pointer; the next publish skips past the orphan."""
    d, _, _, idx_b = root
    cur = read_latest(d)["generation"]
    orphan = os.path.join(d, f"gen={cur + 1}")
    idx_b.save(orphan)  # simulate: snapshot written, LATEST never moved
    assert read_latest(d)["generation"] == cur  # readers unaffected
    nxt = publish_index(idx_b, d)
    assert nxt == cur + 2  # skipped the orphan number
    assert read_latest(d)["generation"] == nxt


def test_prune_keeps_newest_and_current(root):
    d, *_ = root
    gens_before = sorted(
        int(n.split("=")[1]) for n in os.listdir(d) if n.startswith("gen=")
    )
    dropped = prune_generations(d, keep=1)
    ptr = read_latest(d)
    left = sorted(
        int(n.split("=")[1]) for n in os.listdir(d) if n.startswith("gen=")
    )
    assert ptr["generation"] in left
    assert left == gens_before[-1:]
    assert dropped == gens_before[:-1]
    with pytest.raises(ValueError):
        prune_generations(d, keep=0)


def test_refresh_requires_root():
    srv = ServingIndex({}, {}, None, None, 0, 0.0, CFG)
    with pytest.raises(ValueError):
        srv.refresh()


def test_latest_pointer_is_atomic_json(root):
    d, *_ = root
    with open(os.path.join(d, "LATEST")) as fh:
        ptr = json.load(fh)
    assert {"generation", "path", "n_docs", "avgdl", "published_unix"} <= set(
        ptr
    )
    assert not os.path.exists(os.path.join(d, "LATEST.tmp"))


def test_refresh_rearms_auto_pagerank(spark, tmp_path):
    """Regression (ADVICE r03): refresh() used to carry the OLD
    generation's auto-armed PageRank map forward, so gen K's ranks
    shadowed gen K+1's docs forever. An auto-armed map must re-arm
    from the new generation; an explicit map must survive."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "pr_root")
    base = generate_corpus(spark, 150, seed=9).cache()
    idx0 = build_index(base.withColumn("page_rank", F.lit(0.1)), cfg=CFG)
    idx1 = build_index(base.withColumn("page_rank", F.lit(0.9)), cfg=CFG)
    publish_index(idx0, root)

    srv = ServingIndex.load_latest(root)
    assert srv._pr and not srv._pr_explicit
    assert abs(next(iter(srv._pr.values())) - 0.1) < 1e-9
    publish_index(idx1, root)
    assert srv.refresh() is True
    assert abs(next(iter(srv._pr.values())) - 0.9) < 1e-9

    srv2 = ServingIndex.load_latest(root, page_rank={0: 0.5})
    assert srv2._pr_explicit
    publish_index(idx0, root)
    assert srv2.refresh() is True
    assert srv2._pr == {0: 0.5} and srv2._pr_explicit
