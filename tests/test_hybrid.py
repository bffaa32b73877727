"""RRF hybrid retrieval: fusion arithmetic vs a pure-python oracle,
pool discipline, end-to-end identity against recomputed pools."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.hybrid import (
    hybrid_topk,
    rank_pool,
    rrf_fuse,
)


def test_rank_pool_orders_and_caps(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.7)],
        ["doc_id", "s"],
    )
    got = {r["doc_id"]: r["rank"] for r in rank_pool(df, "s").collect()}
    # score DESC, id ASC: 2 and 3 tie on 0.9 -> id order
    assert got == {2: 1, 3: 2, 5: 3, 1: 4, 4: 5}
    capped = rank_pool(df, "s", pool=2).collect()
    assert {r["doc_id"] for r in capped} == {2, 3}


def test_rrf_fuse_matches_python_oracle(spark):
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"]
    )
    sem = spark.createDataFrame(
        [(12, 1), (13, 2), (10, 3)], ["doc_id", "rank"]
    )
    got = rrf_fuse([lex, sem], k=10).collect()
    want = {
        10: 1 / 61 + 1 / 63,
        11: 1 / 62,
        12: 1 / 63 + 1 / 61,
        13: 1 / 62,
    }
    order = sorted(want, key=lambda d: (-want[d], d))
    assert [r["doc_id"] for r in got] == order  # 10/12 tie -> id asc
    for r in got:
        assert r["rrf_score"] == pytest.approx(want[r["doc_id"]], abs=0)


def test_rrf_fuse_single_list_and_empty():
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_topk_matches_recomputed_pools(spark):
    """End-to-end: fuse(BM25 pool, semantic pool) == python RRF over
    the same two collected pools."""
    from search_engine_spark.operators.embed import semantic_topk
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import search

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    idx = build_index(docs, text_col="text")
    q = "hash join partition pruning"
    pool = 50

    got = hybrid_topk(idx, docs, q, k=10, pool=pool).collect()

    def ranks(rows, score):
        ordered = sorted(rows, key=lambda r: (-r[score], r["doc_id"]))
        return {r["doc_id"]: i + 1 for i, r in enumerate(ordered[:pool])}

    lex = ranks(search(idx, q, k=pool).collect(), "score")
    sem = ranks(semantic_topk(docs, q, k=pool).collect(), "cosine")
    fused = {}
    for d, r in lex.items():
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + r)
    for d, r in sem.items():
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + r)
    want = sorted(fused, key=lambda d: (-fused[d], d))[:10]
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert r["rrf_score"] == pytest.approx(fused[r["doc_id"]], abs=0)
    # a doc in BOTH pools at decent ranks must beat single-list tails
    both = [d for d in want if d in lex and d in sem]
    assert both, "fixture query should have lexical+semantic overlap"
    docs.unpersist()

def test_hybrid_reuse_paths_match_inline(spark, tmp_path):
    """hybrid_topk(emb=) and hybrid_topk(vindex=, exact dial) must
    fuse to the SAME order and scores as the inline-embed call — the
    repeated-query path pays one corpus embed, not Q."""
    from search_engine_spark.operators.embed import hash_embed
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.vector_index import VectorIndex

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    idx = build_index(docs, text_col="text")
    emb = hash_embed(docs, dim=64).cache()
    path = str(tmp_path / "vx")
    VectorIndex.build(
        emb.withColumnRenamed("doc_id", "vec_id"), dim=64,
        n_centroids=4, m=8,
    ).save(path)
    vindex = VectorIndex.load(spark, path)

    def rows(df):
        return [
            (r["doc_id"], round(r["rrf_score"], 12)) for r in df.collect()
        ]

    for q in ("hash join partition pruning", "window aggregate scan"):
        inline = rows(hybrid_topk(idx, docs, q, k=10, pool=50))
        assert rows(
            hybrid_topk(idx, docs, q, k=10, pool=50, emb=emb)
        ) == inline
        assert rows(
            hybrid_topk(idx, docs, q, k=10, pool=50, vindex=vindex)
        ) == inline
    emb.unpersist()
    docs.unpersist()
