"""Product-quantization ANN (similarity.train_pq/pq_attach/pq_topk):
exact-rerank identity with brute force at pool >= N, recall@10 >= 0.8
at the default pool on the ADVERSARIAL corpus (near-uniform vectors,
the distribution that caps bucket-pruning recall — see BENCH.md), and
the adaptive IVF/LSH defaults + PQ screen integration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.similarity import (
    PQCodebooks,
    cosine_topk,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
    pq_attach,
    pq_topk,
    train_pq,
)

DIM = 64
N = 400


@pytest.fixture(scope="module")
def emb(spark):
    # near-uniform vectors: top-10 neighbor cosines land around
    # 0.25-0.45, like the driver's synthetic embeddings table — the
    # worst case for bucketed ANN and the regime the PQ screen must
    # survive
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((N, DIM))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>"
    ).cache()


@pytest.fixture(scope="module")
def cb(emb):
    return train_pq(emb, dim=DIM, m=8, ks=64, iters=4)


@pytest.fixture(scope="module")
def encoded(emb, cb):
    return pq_attach(emb, cb).cache()


def _ids(df):
    return [r.vec_id for r in df.collect()]


def test_pq_exact_pool_equals_brute(emb, cb, encoded):
    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [
        (r.vec_id, round(r.cosine, 9))
        for r in cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()
    ]
    got = [
        (r.vec_id, round(r.cosine, 9))
        for r in pq_topk(
            encoded, cb, qvec, k=10, pool=10**9, exclude_ids=[0]
        ).collect()
    ]
    assert got == exact


def test_pq_default_pool_recall(emb, cb, encoded):
    hits = tot = 0
    for qid in (0, 1, 2, 3, 4):
        qvec = [
            float(x)
            for x in emb.where(f"vec_id = {qid}").first()["embedding"]
        ]
        exact = set(
            _ids(cosine_topk(emb, qvec, k=10, exclude_ids=[qid]))
        )
        got = set(
            _ids(pq_topk(encoded, cb, qvec, k=10, exclude_ids=[qid]))
        )
        hits += len(got & exact)
        tot += len(exact)
    assert hits / tot >= 0.8, hits / tot


def test_pq_codebooks_roundtrip_and_determinism(emb, cb):
    again = train_pq(emb, dim=DIM, m=8, ks=64, iters=4)
    assert np.array_equal(cb.cents, again.cents)
    rt = PQCodebooks.from_json(cb.to_json())
    assert rt.dim == DIM and rt.m == 8 and np.allclose(rt.cents, cb.cents)


def test_pq_attach_null_and_ragged_rows(spark, cb):
    df = spark.createDataFrame(
        [
            (0, [float(i) for i in range(DIM)]),
            (1, None),
            (2, [1.0, 2.0]),  # ragged
        ],
        "vec_id: long, embedding: array<float>",
    )
    rows = {r.vec_id: r for r in pq_attach(df, cb).collect()}
    assert rows[0].pq_w0 is not None
    assert rows[1].pq_w0 is None and rows[2].pq_w0 is None
    # screen ranks NULL-code rows last instead of crashing
    qvec = [1.0] * DIM
    got = _ids(pq_topk(pq_attach(df, cb), cb, qvec, k=3))
    assert got[0] == 0


def test_ivf_adaptive_default_with_pq_screen(emb, cb, encoded):
    cents = kmeans_centroids(emb, dim=DIM, n_centroids=8, iters=2)
    assigned = pq_attach(ivf_assign(emb, cents), cb).cache()
    hits = tot = 0
    for qid in (0, 1, 2, 3, 4):
        qvec = [
            float(x)
            for x in emb.where(f"vec_id = {qid}").first()["embedding"]
        ]
        exact = set(_ids(cosine_topk(emb, qvec, k=10, exclude_ids=[qid])))
        got = set(
            _ids(
                ivf_topk(
                    assigned, cents, qvec, k=10, codebooks=cb,
                    exclude_ids=[qid],
                )
            )
        )
        hits += len(got & exact)
        tot += len(exact)
    assert hits / tot >= 0.75, hits / tot  # ceil(0.7·8)=6 probes + PQ
    # the exhaustive dial must stay EXACT even with codes present
    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [
        (r.vec_id, round(r.cosine, 9))
        for r in cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()
    ]
    full = [
        (r.vec_id, round(r.cosine, 9))
        for r in ivf_topk(
            assigned, cents, qvec, k=10, n_probe=len(cents),
            codebooks=cb, exclude_ids=[0],
        ).collect()
    ]
    assert full == exact


def test_lsh_adaptive_default_with_pq_screen(emb, cb, encoded):
    hits = tot = 0
    for qid in (0, 1, 2):
        qvec = [
            float(x)
            for x in emb.where(f"vec_id = {qid}").first()["embedding"]
        ]
        exact = set(_ids(cosine_topk(emb, qvec, k=10, exclude_ids=[qid])))
        got = set(
            _ids(
                lsh_topk(
                    encoded, qvec, dim=DIM, k=10, n_planes=6,
                    codebooks=cb, exclude_ids=[qid],
                )
            )
        )
        hits += len(got & exact)
        tot += len(exact)
    assert hits / tot >= 0.75, hits / tot  # radius ceil(0.6·6)=4
    # exhaustive dial with codes present stays exact
    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [
        (r.vec_id, round(r.cosine, 9))
        for r in cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()
    ]
    full = [
        (r.vec_id, round(r.cosine, 9))
        for r in lsh_topk(
            encoded, qvec, dim=DIM, k=10, n_planes=6, probe_radius=6,
            codebooks=cb, exclude_ids=[0],
        ).collect()
    ]
    assert full == exact
