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


# ---------------------------------------------------------------------------
# incremental maintenance: append / remove on the saved layout
# ---------------------------------------------------------------------------


def test_append_to_equals_union_on_exact_dial(spark, emb, tmp_path):
    """build(base) -> save -> append_to(delta): the exact dial over the
    appended index == brute force over the FULL set; untouched cluster
    files gain no bytes (only the delta is written)."""
    import glob
    import os

    d = str(tmp_path / "vidx_inc")
    base = emb.where("vec_id % 5 != 0")
    delta = emb.where("vec_id % 5 = 0")
    VectorIndex.build(base, dim=DIM, n_centroids=8, ks=64).save(d)
    files_before = {
        f: os.path.getsize(f)
        for f in glob.glob(os.path.join(d, "vectors", "**", "*.parquet"),
                           recursive=True)
    }
    appended = VectorIndex.append_to(spark, d, delta)
    # every pre-existing file untouched byte-for-byte (size proxy)
    for f, sz in files_before.items():
        assert os.path.getsize(f) == sz, f
    assert appended.n_vectors == N

    qvec = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    exact = [
        r.vec_id
        for r in cosine_topk(emb, qvec, k=10, exclude_ids=[1]).collect()
    ]
    got = [
        r.vec_id
        for r in appended.topk(qvec, k=10, exact=True, exclude_ids=[1])
        .collect()
    ]
    assert got == exact


def test_append_then_default_dial_finds_delta_neighbor(spark, emb, tmp_path):
    """A near-duplicate of the query inserted via append_to must come
    back first on the DEFAULT (approximate) dial — the delta rows land
    in the right probe clusters."""
    d = str(tmp_path / "vidx_inc2")
    VectorIndex.build(emb, dim=DIM, n_centroids=8, ks=64).save(d)
    qvec = [float(x) for x in emb.where("vec_id = 2").first()["embedding"]]
    twin = [x * 1.001 for x in qvec]
    delta = spark.createDataFrame(
        [(10_000, twin)], "vec_id: long, embedding: array<float>"
    )
    appended = VectorIndex.append_to(spark, d, delta)
    top = appended.topk(qvec, k=3, exclude_ids=[2]).collect()
    assert top[0].vec_id == 10_000


def test_remove_ids_partition_pruned_rewrite(spark, emb, tmp_path):
    """remove_ids deletes rows and rewrites ONLY the clusters that held
    them; the exact dial afterwards == brute force over the survivors."""
    import glob
    import os

    d = str(tmp_path / "vidx_rm")
    built = VectorIndex.build(emb, dim=DIM, n_centroids=8, ks=64)
    built.save(d)
    loaded = VectorIndex.load(spark, d)
    victims = [3, 7, 11]
    victim_clusters = {
        int(r["cluster"])
        for r in loaded.vectors.where(
            loaded.vectors.vec_id.isin(victims)
        ).select("cluster").distinct().collect()
    }
    mtimes = {}
    for f in glob.glob(os.path.join(d, "vectors", "cluster=*")):
        mtimes[f] = max(
            os.path.getmtime(p)
            for p in glob.glob(os.path.join(f, "*.parquet"))
        )
    removed = VectorIndex.remove_ids(spark, d, victims)
    assert removed.n_vectors == N - len(victims)
    assert removed.vectors.where(
        removed.vectors.vec_id.isin(victims)
    ).count() == 0
    # untouched-cluster files keep their mtimes (no rewrite)
    for f, mt in mtimes.items():
        c = int(f.rsplit("=", 1)[1])
        if c not in victim_clusters:
            got = max(
                os.path.getmtime(p)
                for p in glob.glob(os.path.join(f, "*.parquet"))
            )
            assert got == mt, f

    qvec = [float(x) for x in emb.where("vec_id = 4").first()["embedding"]]
    exact = [
        r.vec_id
        for r in cosine_topk(
            emb.where(~emb.vec_id.isin(victims)), qvec, k=10,
            exclude_ids=[4],
        ).collect()
    ]
    got = [
        r.vec_id
        for r in removed.topk(qvec, k=10, exact=True, exclude_ids=[4])
        .collect()
    ]
    assert got == exact


def test_remove_ids_empties_whole_cluster(spark, emb, tmp_path):
    """Deleting every vector of a cluster drops its directory (dynamic
    overwrite alone would leave the stale files)."""
    import glob
    import os

    d = str(tmp_path / "vidx_rm_all")
    VectorIndex.build(emb, dim=DIM, n_centroids=8, ks=64).save(d)
    loaded = VectorIndex.load(spark, d)
    one_cluster = int(loaded.vectors.first()["cluster"])
    victims = [
        int(r["vec_id"])
        for r in loaded.vectors.where(
            loaded.vectors.cluster == one_cluster
        ).select("vec_id").collect()
    ]
    removed = VectorIndex.remove_ids(spark, d, victims)
    assert not os.path.isdir(
        os.path.join(d, "vectors", f"cluster={one_cluster}")
    )
    assert removed.n_vectors == N - len(victims)
    assert removed.vectors.where(
        removed.vectors.vec_id.isin(victims)
    ).count() == 0


def test_remove_ids_refuses_to_empty_the_index(spark, emb, tmp_path):
    d = str(tmp_path / "vidx_rm_every")
    VectorIndex.build(emb, dim=DIM, n_centroids=8, ks=64).save(d)
    with pytest.raises(ValueError, match="EVERY vector"):
        VectorIndex.remove_ids(spark, d, list(range(N)))
    # index untouched and still readable
    assert VectorIndex.load(spark, d).n_vectors == N
