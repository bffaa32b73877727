"""Embedding-cosine near-dup (brute + LSH-bucketed) and snippet
generation: correctness vs independent numpy/python recomputation,
LSH recall vs the brute-force baseline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
)
from search_engine_spark.operators.snippets import make_snippets

DIM = 8
N = 80
THRESH = 0.6


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors: 8 centroids + small noise → plenty of near-dups
    rng = np.random.default_rng(11)
    cents = rng.standard_normal((8, DIM))
    vecs = cents[np.arange(N) % 8] + 0.15 * rng.standard_normal((N, DIM))
    rows = [
        (int(i), [float(x) for x in vecs[i]]) for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


@pytest.fixture(scope="module")
def numpy_pairs(emb):
    rows = sorted(
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in emb.collect()
    )
    vecs = np.stack([v for _, v in rows])
    sims = (vecs @ vecs.T) / (
        np.linalg.norm(vecs, axis=1)[:, None]
        * np.linalg.norm(vecs, axis=1)[None, :]
    )
    out = {}
    for i in range(N):
        for j in range(i + 1, N):
            if sims[i, j] >= THRESH:
                out[(i, j)] = sims[i, j]
    return out


def test_brute_pairs_match_numpy(emb, numpy_pairs):
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs(emb, threshold=THRESH).collect()
    }
    assert set(got) == set(numpy_pairs)
    for k, v in got.items():
        assert abs(v - numpy_pairs[k]) < 1e-9


def test_lsh_pairs_subset_with_recall(emb, numpy_pairs):
    got = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_lsh(
            emb, dim=DIM, threshold=THRESH, n_planes=4
        ).collect()
    }
    assert got <= set(numpy_pairs)  # no false positives (exact verify)
    recall = len(got) / len(numpy_pairs)
    assert recall >= 0.5, recall  # clustered data: same bucket often


def test_snippets_window_and_highlight(spark):
    rows = [
        (0, "alpha beta gamma delta " * 20 + "needle in the stack"),
        (1, "no hits here at all"),
        (2, "Needle first then filler " + "x " * 200),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r.doc_id: r.snippet
        for r in make_snippets(df, ["needle"], width=60).collect()
    }
    # hit centred: window starts 30 chars before the hit
    assert "**needle**" in out[0]
    assert len(out[0]) <= 60 + len("****")
    # miss → document head, unhighlighted
    assert out[1] == "no hits here at all"
    # case-insensitive match, original casing preserved in highlight
    assert out[2].startswith("**Needle**")


def test_snippets_multiword_first_hit(spark):
    df = spark.createDataFrame(
        [(0, "zzz " * 50 + "join here and hash there")],
        "doc_id: long, text: string",
    )
    (snip,) = [
        r.snippet for r in make_snippets(df, ["hash", "join"], width=40).collect()
    ]
    # earliest of the two words anchors the window
    assert "**join**" in snip


def test_ivf_ann_recall(spark, emb):
    """IVF: deterministic k-means training, cluster-probed top-k; recall
    vs brute-force cosine_topk on clustered data."""
    from search_engine_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb, dim=DIM, n_centroids=8, iters=3)
    assert len(cents) == 8 and all(len(c) == DIM for c in cents)
    # training is deterministic: same call, same centroids
    again = kmeans_centroids(emb, dim=DIM, n_centroids=8, iters=3)
    assert cents == again

    assigned = ivf_assign(emb, cents).persist()
    assert assigned.select("cluster").distinct().count() > 1

    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()]
    approx = [
        r.vec_id
        for r in ivf_topk(assigned, cents, qvec, k=10, n_probe=2).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, recall  # clustered data, 2-of-8 probes


def test_lsh_exact_configs_equal_brute(spark, emb):
    """Exactness dials: probe_radius == n_planes scans every bucket and
    must reproduce brute-force cosine_topk verbatim; n_planes=0 pair
    dedup must equal the brute-force pair join."""
    from search_engine_spark.operators.similarity import cosine_topk, lsh_topk

    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [
        (r.vec_id, round(r.cosine, 9))
        for r in cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()
    ]
    full_probe = [
        (r.vec_id, round(r.cosine, 9))
        for r in lsh_topk(
            emb, qvec, dim=DIM, k=10, n_planes=4, probe_radius=4,
            exclude_ids=[0],
        ).collect()
    ]
    assert full_probe == exact

    brute = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(emb, threshold=THRESH).collect()
    }
    one_bucket = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_lsh(
            emb, dim=DIM, threshold=THRESH, n_planes=0
        ).collect()
    }
    assert one_bucket == brute


def test_lsh_multiprobe_recall_monotone(spark, emb):
    """Multiprobe: widening the hamming radius can only add candidates,
    so recall vs brute force is monotone in the radius."""
    from search_engine_spark.operators.similarity import cosine_topk, lsh_topk

    qvec = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    exact = {r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()}
    recalls = []
    for radius in (0, 1, 4):
        got = {
            r.vec_id
            for r in lsh_topk(
                emb, qvec, dim=DIM, k=10, n_planes=4, probe_radius=radius
            ).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_lsh_high_dim_plan_stays_small(spark):
    """dim=768: bucket assignment must be ONE Arrow UDF, not ~6k per-dim
    literals in a Catalyst tree (the round-1 analysis blow-up)."""
    import numpy as np

    from search_engine_spark.operators.similarity import lsh_assign_buckets

    rng = np.random.default_rng(5)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(768)])
        for i in range(32)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    bucketed = lsh_assign_buckets(df, dim=768, n_planes=8)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 20_000, len(plan)   # literal-expansion guard
    assert plan.count("ArrowEvalPython") == 1
    got = bucketed.select("vec_id", "bucket").collect()
    assert len(got) == 32
    assert all(0 <= r.bucket < 256 for r in got)
    # deterministic: numpy recomputation of one signature matches
    from search_engine_spark.operators.similarity import lsh_query_bucket

    v = dict(rows)[3]
    want = lsh_query_bucket(v, dim=768, n_planes=8)
    assert dict((r.vec_id, r.bucket) for r in got)[3] == want


def test_kmeans_init_no_global_window(spark, emb):
    """The round-1 init pushed the whole table through one task via
    row_number() over an unpartitioned Window; the hash-sample init must
    plan as TakeOrderedAndProject with no Window/Exchange-to-1."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import (
        _init_sample,
        as_double_array,
    )

    base = emb.select(
        F.col("vec_id").alias("_id"),
        as_double_array(F.col("embedding")).alias("v"),
    )
    plan = _init_sample(base, 8)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_lsh_null_embedding_bucket_zero(spark):
    """NULL / wrong-dim embedding rows must land in bucket 0 (the old
    column-expression behavior), not crash the Arrow UDF task."""
    from search_engine_spark.operators.similarity import lsh_assign_buckets

    rows = [
        (0, [1.0] * 4),
        (1, None),
        (2, [0.5, -0.5, 0.25, -0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {
        r.vec_id: r.bucket
        for r in lsh_assign_buckets(df, dim=4, n_planes=4).collect()
    }
    assert got[1] == 0
    assert 0 <= got[0] < 16 and 0 <= got[2] < 16
