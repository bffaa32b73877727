"""Feature-hashed embeddings: driver-twin identity, plan shape,
retrieval sanity, ANN-stack integration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.embed import (
    EMBED_DIM,
    embed_text,
    hash_embed,
    more_like_this,
    semantic_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark shuffle join partition spark join"),
        (2, "hash join partition pruning in spark"),
        (3, "cooking pasta tomato basil garlic dinner"),
        (4, "gardening roses soil watering sunlight"),
        (5, "spark shuffle join partition spark join extra"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_spark_matches_driver_twin(docs):
    got = hash_embed(docs, dim=32).join(
        docs.select("doc_id", "text"), "doc_id"
    ).collect()
    assert len(got) == 6
    for r in got:
        assert np.allclose(list(r["embedding"]), embed_text(r["text"], 32))


def test_unit_norm_and_zero_doc(docs):
    for r in hash_embed(docs, dim=32).join(docs, "doc_id").collect():
        n = float(np.linalg.norm(r["embedding"]))
        if r["text"]:
            assert abs(n - 1.0) < 1e-12
        else:
            assert n == 0.0


def test_dim_validation(docs):
    with pytest.raises(ValueError):
        hash_embed(docs, dim=0)
    with pytest.raises(ValueError):
        hash_embed(docs, dim=1 << 17)


def test_hash_embed_plan_is_narrow(docs):
    plan = (
        hash_embed(docs, dim=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # JVM hash + one Arrow scatter pass
    assert "ArrowEvalPython" in plan


def test_semantic_topk_ranks_related_docs(docs):
    out = semantic_topk(docs, "spark join shuffle", k=3).collect()
    assert [r["doc_id"] for r in out[:2]] in ([1, 5], [5, 1])
    assert out[0]["cosine"] > 0.5
    # off-topic docs score near zero / negative, never above on-topic
    all6 = semantic_topk(docs, "spark join shuffle", k=6).collect()
    scores = {r["doc_id"]: r["cosine"] for r in all6}
    assert max(scores[3], scores[4]) < min(scores[1], scores[2], scores[5])


def test_more_like_this_excludes_anchor(docs):
    out = more_like_this(docs, 1, k=3).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids
    assert ids[0] == 5  # near-duplicate text ranks first
    assert out[0]["cosine"] > 0.9
    with pytest.raises(KeyError):
        more_like_this(docs, 999)


def test_embedding_feeds_vector_index(spark):
    """The hashed column is a first-class citizen of the ANN stack:
    VectorIndex built over it returns the brute-force answer at the
    exact dial."""
    from search_engine_spark.operators.similarity import cosine_topk
    from search_engine_spark.operators.vector_index import VectorIndex

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = hash_embed(corpus, dim=EMBED_DIM).withColumnRenamed(
        "doc_id", "vec_id"
    ).cache()
    q = embed_text("hash join partition pruning", EMBED_DIM)
    brute = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    vidx = VectorIndex.build(emb, dim=EMBED_DIM, n_centroids=4, m=8)
    got = [
        r["vec_id"]
        for r in vidx.topk(q, k=5, n_probe=4, exact=True).collect()
    ]
    assert got == brute
    emb.unpersist()


def test_bucket_idf_matches_python_oracle(docs):
    import math

    import numpy as np

    from search_engine_spark.operators.embed import (
        _py_tokens,
        fit_bucket_idf,
    )

    dim = 32
    got = fit_bucket_idf(docs, dim=dim)
    rows = docs.select("text").collect()
    df = [0] * dim
    import hashlib

    for r in rows:
        seen = set()
        for t in _py_tokens(r["text"]):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            seen.add(h % dim)
        for b in seen:
            df[b] += 1
    want = [math.log((len(rows) + 1) / (d + 1)) for d in df]
    assert np.allclose(got, want)


def test_idf_weighted_spark_matches_driver_twin(docs):
    import numpy as np

    from search_engine_spark.operators.embed import fit_bucket_idf

    w = fit_bucket_idf(docs, dim=32)
    got = hash_embed(docs, dim=32, idf=w).join(
        docs.select("doc_id", "text"), "doc_id"
    ).collect()
    for r in got:
        assert np.allclose(
            list(r["embedding"]), embed_text(r["text"], 32, idf=w)
        )


def test_idf_downweights_ubiquitous_tokens(spark):
    """'common' appears in every doc; with IDF the query's rare term
    dominates the ranking, without it the common term can."""
    rows = [
        (1, "common rareterm alpha beta"),
        (2, "common common common common gamma delta"),
        (3, "common epsilon zeta eta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with_idf = semantic_topk(df, "common rareterm", k=3, idf=True).collect()
    assert with_idf[0]["doc_id"] == 1  # rare term wins under IDF
    # sanity: without idf the common-heavy doc competes
    plain = semantic_topk(df, "common rareterm", k=3).collect()
    assert {r["doc_id"] for r in plain} == {1, 2, 3}


def test_idf_shape_validation(docs):
    import numpy as np

    with pytest.raises(ValueError):
        hash_embed(docs, dim=32, idf=np.zeros(16))


def test_precomputed_emb_and_vindex_match_inline(spark, tmp_path):
    """The corpus embedding is query-independent, so the reuse paths
    (emb= precomputed frame; vindex= saved artifact on the exact dial)
    must return the SAME ranking and scores as the inline embed —
    unweighted and IDF-weighted both."""
    from search_engine_spark.operators.embed import fit_bucket_idf
    from search_engine_spark.operators.vector_index import VectorIndex

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).cache()
    q = "hash join partition pruning"

    def rows(df):
        return [
            (r["doc_id"], round(r["cosine"], 9)) for r in df.collect()
        ]

    for weighted in (False, True):
        w = fit_bucket_idf(docs, dim=64) if weighted else None
        emb = hash_embed(docs, dim=64, idf=w).cache()
        path = str(tmp_path / f"vx{int(weighted)}")
        VectorIndex.build(
            emb.withColumnRenamed("doc_id", "vec_id"),
            dim=64, n_centroids=4, m=8,
            idf=list(w) if weighted else None,
        ).save(path)
        vindex = VectorIndex.load(spark, path)

        inline = rows(
            semantic_topk(docs, q, k=10, dim=64, idf=w if weighted else False)
        )
        pre = rows(
            semantic_topk(
                None, q, k=10, dim=64, emb=emb,
                idf=w if weighted else False,
            )
        )
        via_index = rows(semantic_topk(None, q, k=10, vindex=vindex))
        assert pre == inline
        assert via_index == inline
        emb.unpersist()

    # more_like_this: same three paths agree (df still supplies anchor)
    emb = hash_embed(docs, dim=64).cache()
    vindex = VectorIndex.load(spark, str(tmp_path / "vx0"))
    anchor = docs.first()["doc_id"]
    inline = rows(more_like_this(docs, anchor, k=10, dim=64))
    assert rows(more_like_this(docs, anchor, k=10, dim=64, emb=emb)) == inline
    assert rows(more_like_this(docs, anchor, k=10, vindex=vindex)) == inline
    emb.unpersist()
    docs.unpersist()


def test_idf_true_with_precomputed_corpus_raises(spark, docs):
    from search_engine_spark.operators.vector_index import VectorIndex

    emb = hash_embed(docs, dim=32)
    with pytest.raises(ValueError, match="emb="):
        semantic_topk(docs, "spark", emb=emb, idf=True, dim=32)
    vindex = VectorIndex.build(
        emb.withColumnRenamed("doc_id", "vec_id"), dim=32,
        n_centroids=2, m=4,
    )
    with pytest.raises(ValueError, match="vindex="):
        semantic_topk(docs, "spark", vindex=vindex, idf=True, dim=32)
