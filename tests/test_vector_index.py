"""Persisted ANN index (operators/vector_index.py): save/load
roundtrip value-identity on the exact dial, recall at the product
defaults, and PARTITION PRUNING of the probed clusters on the saved
layout."""

import numpy as np
import pytest

from search_engine_spark.operators.similarity import cosine_topk
from search_engine_spark.operators.vector_index import VectorIndex

DIM = 64
N = 400


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((N, DIM))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>"
    ).cache()


@pytest.fixture(scope="module")
def saved(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vidx"))
    VectorIndex.build(emb, dim=DIM, n_centroids=8, ks=64).save(d)
    return VectorIndex.load(spark, d)


def _ids(df):
    return [r.vec_id for r in df.collect()]


def test_exact_dial_roundtrips_to_brute(emb, saved):
    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [
        (r.vec_id, round(r.cosine, 6))
        for r in cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()
    ]
    got = [
        (r.vec_id, round(r.cosine, 6))
        for r in saved.topk(qvec, k=10, exact=True, exclude_ids=[0])
        .collect()
    ]
    # saved embeddings are float32-roundtripped -> compare ids + 1e-5
    assert [g[0] for g in got] == [e[0] for e in exact]
    for (_, gs), (_, es) in zip(got, exact):
        assert abs(gs - es) < 1e-5
    assert saved.n_vectors == N and saved.dim == DIM


def test_default_dial_recall(emb, saved):
    hits = tot = 0
    for qid in (0, 1, 2, 3, 4):
        qvec = [
            float(x)
            for x in emb.where(f"vec_id = {qid}").first()["embedding"]
        ]
        exact = set(_ids(cosine_topk(emb, qvec, k=10, exclude_ids=[qid])))
        got = set(_ids(saved.topk(qvec, k=10, exclude_ids=[qid])))
        hits += len(got & exact)
        tot += len(exact)
    assert hits / tot >= 0.75, hits / tot


def test_probe_is_partition_pruned(emb, saved):
    """The IVF probe must reach the parquet scan as a PartitionFilters
    entry on cluster — unprobed cluster directories are never read."""
    qvec = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    plan = saved.topk(qvec, k=10, n_probe=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), plan[:2000]


def test_build_is_deterministic(spark, emb):
    a = VectorIndex.build(emb, dim=DIM, n_centroids=8, ks=64)
    b = VectorIndex.build(emb, dim=DIM, n_centroids=8, ks=64)
    assert a.cents == b.cents
    assert np.array_equal(a.codebooks.cents, b.codebooks.cents)
