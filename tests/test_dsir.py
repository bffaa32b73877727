"""DSIR importance resampling: Spark vs an independent pure-Python
derivation of the whole chain (hashlib buckets -> smoothed LMs ->
weights -> Gumbel-top-k), plus plan-shape and behavioral checks."""

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import dsir
from search_engine_spark.session import local_df

DIM = 257  # prime, small enough to force collisions on purpose


def py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def py_buckets(text, dim=DIM):
    toks = py_tokens(text)
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim
        for g in grams
    ]


def py_log_ratios(raw_texts, target_texts, dim=DIM, alpha=1.0):
    t = np.zeros(dim)
    r = np.zeros(dim)
    for x in target_texts:
        for b in py_buckets(x, dim):
            t[b] += 1
    for x in raw_texts:
        for b in py_buckets(x, dim):
            r[b] += 1
    return np.log((t + alpha) / (t.sum() + alpha * dim)) - np.log(
        (r + alpha) / (r.sum() + alpha * dim)
    )


def py_weight(text, lam, dim=DIM):
    return float(sum(lam[b] for b in py_buckets(text, dim)))


def py_gumbel(doc_id, seed=0):
    hv = int(
        hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16
    )
    u = (hv + 0.5) / 4294967296.0
    return -math.log(-math.log(u))


RAW = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles and joins and aggregates dataframes"),
    (2, "hash join partition pruning predicate pushdown spark"),
    (3, "lorem ipsum dolor sit amet consectetur"),
    (4, "distributed hash join and shuffle partition spark spark"),
    (5, ""),
    (6, "THE Quick  brown---fox?! 42 c3po"),
    (7, "unrelated words entirely about cooking pasta sauce"),
]
TARGET = [
    (100, "spark hash join shuffle partition"),
    (101, "dataframes aggregates joins spark shuffle"),
    (102, "partition pruning pushdown hash join spark"),
]


@pytest.fixture(scope="module")
def raw_df(spark):
    return local_df(spark, RAW, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def target_df(spark):
    return local_df(spark, TARGET, "doc_id long, text string")


@pytest.fixture(scope="module")
def lam(raw_df, target_df):
    return dsir.fit_log_ratios(raw_df, target_df, dim=DIM)


def test_bucket_counts_match_python(spark, raw_df):
    got = {
        r["bucket"]: r["cnt"]
        for r in dsir.ngram_bucket_counts(raw_df, dim=DIM).collect()
    }
    want = {}
    for _, text in RAW:
        for b in py_buckets(text):
            want[b] = want.get(b, 0) + 1
    assert got == want


def test_log_ratios_match_python(lam):
    want = py_log_ratios(
        [t for _, t in RAW], [t for _, t in TARGET]
    )
    np.testing.assert_allclose(lam, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("method", ["arrow", "relational"])
def test_weights_match_python(raw_df, lam, method):
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir.dsir_weights(raw_df, lam, method=method).collect()
    }
    assert set(got) == {i for i, _ in RAW}
    for doc_id, text in RAW:
        assert got[doc_id] == pytest.approx(
            py_weight(text, lam), abs=1e-9
        ), (method, doc_id)


def test_empty_doc_weighs_zero(raw_df, lam):
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir.dsir_weights(raw_df, lam).collect()
    }
    assert got[5] == 0.0


def test_target_like_docs_outrank_off_target(raw_df, lam):
    w = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir.dsir_weights(raw_df, lam).collect()
    }
    # docs 2 and 4 are built from target vocabulary; 3 and 7 are not
    assert min(w[2], w[4]) > max(w[3], w[7])


def test_select_matches_python_gumbel_topk(raw_df, lam):
    got = dsir.dsir_select(raw_df, lam, k=4, seed=7).collect()
    keys = {
        doc_id: py_weight(text, lam) + py_gumbel(doc_id, seed=7)
        for doc_id, text in RAW
    }
    want = sorted(keys, key=lambda d: (-keys[d], d))[:4]
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert r["gumbel_key"] == pytest.approx(keys[r["doc_id"]], abs=1e-9)


def test_select_is_deterministic_and_seed_sensitive(raw_df, lam):
    a = [r["doc_id"] for r in dsir.dsir_select(raw_df, lam, 4, seed=7).collect()]
    b = [r["doc_id"] for r in dsir.dsir_select(raw_df, lam, 4, seed=7).collect()]
    assert a == b
    seen = {tuple(a)}
    for seed in range(20):
        seen.add(
            tuple(
                r["doc_id"]
                for r in dsir.dsir_select(raw_df, lam, 4, seed=seed).collect()
            )
        )
    assert len(seen) > 1  # the seed actually perturbs the draw


def test_resample_returns_original_rows(raw_df, target_df):
    out = dsir.dsir_resample(raw_df, target_df, k=3, seed=1, dim=DIM)
    rows = out.collect()
    assert len(rows) == 3
    assert set(out.columns) == {"doc_id", "text", "dsir_weight"}
    originals = dict(RAW)
    for r in rows:
        assert r["text"] == originals[r["doc_id"]]


def test_weight_plan_is_narrow(raw_df, lam):
    plan = dsir.dsir_weights(raw_df, lam)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # closure-captured lambda: no join/shuffle
    assert "ArrowEvalPython" in plan


def test_select_plan_is_takeordered(raw_df, lam):
    plan = (
        dsir.dsir_select(raw_df, lam, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_fit_validates_inputs(raw_df, target_df):
    with pytest.raises(ValueError):
        dsir.fit_log_ratios(raw_df, target_df, dim=0)
    with pytest.raises(ValueError):
        dsir.fit_log_ratios(raw_df, target_df, alpha=0.0)
    with pytest.raises(ValueError):
        dsir.dsir_select(raw_df, np.zeros(DIM), k=0)
    with pytest.raises(ValueError):
        dsir.dsir_weights(raw_df, np.zeros(DIM), method="nope")
