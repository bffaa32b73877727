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


def test_huge_pool_dial_rank_identical(spark_idx, saved_vidx):
    """pool >= 1e6 skips the PQ screen but must still scan ONLY the
    probed clusters — exactly what the Spark path (ivf_topk ->
    pq_topk's huge-pool branch) does. Cell and router must both match
    it, including at a narrow probe where the dial visibly differs
    from all-cluster brute force."""
    path, dim = saved_vidx
    single = VectorServing.load(path)
    router = VectorServingRouter.load(path, n_shards=2)
    for i in range(3):
        q = _q(dim, i)
        for n_probe in (None, 2):
            want = [
                (r["vec_id"], r["cosine"])
                for r in spark_idx.topk(
                    q, k=10, pool=10_000_000, n_probe=n_probe
                ).collect()
            ]
            got = single.topk(q, k=10, pool=10_000_000, n_probe=n_probe)
            assert [g[0] for g in got] == [w[0] for w in want]
            for g, w in zip(got, want):
                assert g[1] == pytest.approx(w[1], rel=1e-9)
            assert router.topk(
                q, k=10, pool=10_000_000, n_probe=n_probe
            ) == got


def test_idf_vector_round_trips_through_the_artifact(spark, tmp_path):
    """An index built from IDF-weighted hashed embeddings persists the
    bucket-IDF vector; topk_text on BOTH the Spark artifact and the
    serving cell/router embeds the query with that SAME weighting (an
    unweighted query against a weighted corpus is asymmetric cosine)."""
    import numpy as np

    from search_engine_spark.operators.embed import fit_bucket_idf

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).cache()
    w = fit_bucket_idf(docs, dim=64)
    emb = hash_embed(docs, dim=64, idf=w).withColumnRenamed(
        "doc_id", "vec_id"
    )
    path = str(tmp_path / "widx")
    VectorIndex.build(
        emb, dim=64, n_centroids=4, m=8, idf=list(w)
    ).save(path)
    docs.unpersist()

    vidx = VectorIndex.load(spark, path)
    assert vidx.idf is not None
    assert np.allclose(np.asarray(vidx.idf), w)
    srv = VectorServing.load(path)
    assert srv.idf is not None and np.allclose(srv.idf, w)

    query = "hash join partition pruning"
    want = [
        (r["vec_id"], r["cosine"])
        for r in vidx.topk(
            embed_text(query, 64, idf=w), k=10, exact=True
        ).collect()
    ]
    got_spark = [
        (r["vec_id"], r["cosine"])
        for r in vidx.topk_text(query, k=10, exact=True).collect()
    ]
    assert got_spark == want
    got = srv.topk_text(query, k=10, exact=True)
    assert [g[0] for g in got] == [x[0] for x in want]
    for g, x in zip(got, want):
        assert g[1] == pytest.approx(x[1], rel=1e-9)
    router = VectorServingRouter.load(path, n_shards=2)
    assert router.topk_text(query, k=10, exact=True) == got
    # the weighting is not a no-op: the unweighted query ranks
    # differently somewhere in the top-10 (or scores differ)
    unweighted = srv.topk(embed_text(query, 64), k=10, exact=True)
    assert unweighted != got


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
