"""Vector serving cell + router: rank identity to the Spark
VectorIndex path on both dials, cluster-range loading, latency floor."""

import time

import pytest

from search_engine_spark.operators.embed import embed_text, hash_embed
from search_engine_spark.operators.vector_index import VectorIndex
from search_engine_spark.vector_serving import (
    VectorServing,
    VectorServingRouter,
)

QUERIES = [
    "hash join partition pruning",
    "shuffle window aggregate",
    "scan batch filter",
]


@pytest.fixture(scope="module")
def saved_vidx(spark, tmp_path_factory):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()
    dim = len(emb.first()["embedding"])
    vidx = VectorIndex.build(emb, dim=dim, n_centroids=8, m=8)
    path = str(tmp_path_factory.mktemp("vidx") / "idx")
    vidx.save(path)
    emb.unpersist()
    return path, dim


@pytest.fixture(scope="module")
def spark_idx(spark, saved_vidx):
    path, _ = saved_vidx
    return VectorIndex.load(spark, path)


def _q(dim, i):
    return embed_text(QUERIES[i % len(QUERIES)], dim)


def test_exact_dial_rank_identical(spark_idx, saved_vidx):
    path, dim = saved_vidx
    srv = VectorServing.load(path)
    for i in range(3):
        q = _q(dim, i)
        want = [
            (r["vec_id"], r["cosine"])
            for r in spark_idx.topk(q, k=10, exact=True).collect()
        ]
        got = srv.topk(q, k=10, exact=True)
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-9)


def test_approx_dial_rank_identical(spark_idx, saved_vidx):
    path, dim = saved_vidx
    srv = VectorServing.load(path)
    for i in range(3):
        q = _q(dim, i)
        want = [r["vec_id"] for r in spark_idx.topk(q, k=10).collect()]
        got = [t[0] for t in srv.topk(q, k=10)]
        assert got == want


def test_exclude_ids_and_small_pool(spark_idx, saved_vidx):
    path, dim = saved_vidx
    srv = VectorServing.load(path)
    q = _q(dim, 0)
    full = srv.topk(q, k=5)
    drop = full[0][0]
    got = srv.topk(q, k=5, exclude_ids=[drop])
    assert drop not in [g[0] for g in got]
    want = [
        r["vec_id"]
        for r in spark_idx.topk(q, k=5, exclude_ids=[drop]).collect()
    ]
    assert [g[0] for g in got] == want


def test_cluster_range_cell_loads_only_its_range(saved_vidx):
    path, dim = saved_vidx
    all_clusters = VectorServing.load(path).clusters
    half = all_clusters[: len(all_clusters) // 2]
    cell = VectorServing.load(path, clusters=half)
    assert cell.clusters == sorted(half)
    got = cell.topk(_q(dim, 0), k=5, exact=True)
    assert got  # answers from its range only


def test_router_rank_identical_both_dials(saved_vidx):
    path, dim = saved_vidx
    single = VectorServing.load(path)
    for n_shards in (2, 3):
        router = VectorServingRouter.load(path, n_shards=n_shards)
        covered = sorted(c for s in router.shards for c in s.clusters)
        assert covered == single.clusters  # disjoint + complete
        for i in range(3):
            q = _q(dim, i)
            assert router.topk(q, k=10, exact=True) == single.topk(
                q, k=10, exact=True
            )
            assert router.topk(q, k=10) == single.topk(q, k=10)


def test_probe_prunes_cluster_loads(saved_vidx):
    path, dim = saved_vidx
    srv = VectorServing.load(path)
    srv.topk(_q(dim, 0), k=5, n_probe=2)
    assert len(srv._data) <= 2  # only probed directories were read


def test_text_entry_over_hashed_embedding_index(spark, tmp_path):
    """End-to-end text -> hashed embedding -> saved ANN index ->
    serving cell answers a free-text query."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    emb = hash_embed(docs, dim=64).withColumnRenamed("doc_id", "vec_id")
    vidx = VectorIndex.build(emb, dim=64, n_centroids=4, m=8)
    path = str(tmp_path / "hidx")
    vidx.save(path)
    srv = VectorServing.load(path)
    got = srv.topk_text("hash join partition pruning", k=5, exact=True)
    assert len(got) == 5 and got[0][1] > 0
    want = [
        (r["vec_id"], r["cosine"])
        for r in vidx.topk(
            embed_text("hash join partition pruning", 64), k=5, exact=True
        ).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]


def test_warm_latency_sub_10ms(saved_vidx):
    path, dim = saved_vidx
    srv = VectorServing.load(path)
    q = _q(dim, 0)
    srv.topk(q, k=10)  # warm the probed clusters
    t0 = time.perf_counter()
    for i in range(20):
        srv.topk(_q(dim, i % 3), k=10)
    per = (time.perf_counter() - t0) / 20
    assert per < 0.01, f"warm ANN query took {per * 1000:.2f} ms"


def test_hybrid_serving_matches_spark_hybrid(spark, tmp_path):
    """HybridServing (text cell + exact-dial ANN cell) returns the
    same fused ranking as the Spark hybrid_topk operator."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.operators.hybrid import hybrid_topk
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.serving import ServingIndex
    from search_engine_spark.vector_serving import HybridServing

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    cfg = EngineConfig(remove_stopwords=False, stem=False)
    idx = build_index(docs, text_col="text", cfg=cfg)
    tdir = str(tmp_path / "tidx")
    idx.save(tdir)

    emb = hash_embed(docs, dim=64).withColumnRenamed("doc_id", "vec_id")
    vdir = str(tmp_path / "vidx")
    VectorIndex.build(emb, dim=64, n_centroids=4, m=8).save(vdir)

    q = "hash join partition pruning"
    want = [
        (r["doc_id"], r["rrf_score"])
        for r in hybrid_topk(idx, docs, q, k=10, pool=50).collect()
    ]
    hs = HybridServing(
        ServingIndex.load(tdir),
        VectorServing.load(vdir),
        pool=50,
        exact_sem=True,
    )
    got = hs.search(q, k=10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=0)
    # the fast dial still answers (ANN pool) and stays plausible
    fast = HybridServing(
        ServingIndex.load(tdir), VectorServing.load(vdir), pool=50
    ).search(q, k=10)
    assert len(fast) == 10
    docs.unpersist()


def test_router_probe_everything_dial(saved_vidx):
    """n_probe >= n_centroids is the exact dial on the single cell AND
    the Spark path; the router must resolve it to brute force too."""
    path, dim = saved_vidx
    single = VectorServing.load(path)
    router = VectorServingRouter.load(path, n_shards=2)
    n_cents = single.cents.shape[0]
    for i in range(3):
        q = _q(dim, i)
        assert router.topk(q, k=10, n_probe=n_cents) == single.topk(
            q, k=10, n_probe=n_cents
        ) == single.topk(q, k=10, exact=True)


def test_hybrid_serving_fully_sharded(spark, tmp_path):
    """A sharded hybrid fleet — term-range text router + cluster-range
    vector router composition — still fuses rank-identically to the
    single-cell HybridServing."""
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.serving import ServingIndex, ServingRouter
    from search_engine_spark.vector_serving import HybridServing

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    tdir, vdir = str(tmp_path / "t"), str(tmp_path / "v")
    build_index(docs, text_col="text").save(tdir)
    emb = hash_embed(docs, dim=64).withColumnRenamed("doc_id", "vec_id")
    VectorIndex.build(emb, dim=64, n_centroids=4, m=8).save(vdir)

    single = HybridServing(
        ServingIndex.load(tdir), VectorServing.load(vdir), exact_sem=True
    )
    sharded = HybridServing(
        ServingRouter.load(tdir, n_shards=3),
        VectorServing.load(vdir),
        exact_sem=True,
    )
    for q in ["hash join partition pruning", "shuffle window aggregate"]:
        assert sharded.search(q, k=10) == single.search(q, k=10)
    docs.unpersist()
