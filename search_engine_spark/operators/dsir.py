"""DSIR — Data Selection via Importance Resampling, re-expressed
relationally (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS; the standard way to pick the slice of
a raw crawl that "looks like" a high-quality target corpus).

The estimator is the paper's hashed-n-gram variant:

  1. features: word uni+bigrams of lowercased text, hashed into
     ``dim`` buckets (default 10 000);
  2. two bag-of-buckets unigram LMs, fit on the target corpus and the
     raw corpus, Laplace-smoothed;
  3. per-document importance weight
       w(x) = log p_target(x) - log p_raw(x)
            = sum over the doc's gram occurrences of
              lambda[bucket] = log p_t[bucket] - log p_r[bucket];
  4. selection: Gumbel-top-k over the weights — exactly sampling k
     documents WITHOUT replacement with probability proportional to
     exp(w), but deterministic given ``seed`` (the Gumbel noise is
     derived from md5, not an RNG), so any engine reproduces the
     sample bit-for-bit.

100 TB shape:
  - the two LM fits are one groupBy(bucket) each — the aggregate
    output is bounded by ``dim`` rows (~10k) regardless of corpus
    size, and is collected driver-side into a dense numpy vector;
  - the weighting pass is NARROW: the log-ratio vector (~80 KB) is
    closure-captured into one Arrow UDF (same pattern as the LSH
    plane matrix), so no join, no shuffle, no per-row Python;
  - selection is a TakeOrderedAndProject (top-k by perturbed weight),
    never a global sort materialization.

Every step is deterministic and mirrored bucket-for-bucket by the
DuckDB oracle SQL (driver_contract ``dsir_weights``/``dsir_select``):
the md5 bucket arithmetic is the repo's standard engine-portable hash
(textstats._hash_bucket), and the Gumbel uniform is
(md5_32(seed:doc_id)+0.5)/2^32.

Hashing collisions are the paper's own tradeoff: two grams sharing a
bucket share a weight contribution. That is part of the estimator's
definition, not an approximation knob of this implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DSIR_DIM = 10_000
DSIR_ALPHA = 1.0

_GUMBEL_DENOM = 4294967296.0  # 2^32: md5_32 values land in [0, 2^32)


def _word_tokens(text_col: Column) -> Column:
    """DSIR features are surface words (the paper hashes raw
    uni/bigrams) — the engine's shared surface tokenization, NOT the
    Porter index analyzer."""
    from search_engine_spark.operators.textstats import surface_tokens

    return surface_tokens(text_col)


def ngram_buckets(text_col: Column, dim: int = DSIR_DIM) -> Column:
    """array<long> of hashed uni+bigram buckets in [0, dim) for one
    text cell, occurrence-repeated (a gram appearing 3 times yields 3
    array entries — the LMs are count-based). Bigram feature string is
    ``"w1 w2"``. Pure JVM column algebra (md5 + conv), zero Python."""
    toks = _word_tokens(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % dim,
    )


def ngram_bucket_counts(
    df: DataFrame, text_col: str = "text", dim: int = DSIR_DIM
) -> DataFrame:
    """(bucket, cnt) hashed-gram occurrence counts — the sufficient
    statistic for one DSIR unigram LM. One explode + one groupBy whose
    result is bounded by ``dim`` rows however large ``df`` is."""
    return (
        df.select(
            F.explode(ngram_buckets(F.col(text_col), dim)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def fit_log_ratios(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    dim: int = DSIR_DIM,
    alpha: float = DSIR_ALPHA,
) -> np.ndarray:
    """Dense float64 ``lambda`` vector of length ``dim``:

        lambda[b] = ln((t_b + alpha) / (T + alpha*dim))
                  - ln((r_b + alpha) / (R + alpha*dim))

    with t/r the target/raw bucket counts and T/R their totals
    (Laplace-smoothed so never-seen buckets are defined). Driver-side
    cost is two <= dim-row collects — independent of corpus size."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1 (got {dim})")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (got {alpha})")

    def dense(df: DataFrame) -> np.ndarray:
        v = np.zeros(dim, dtype=np.float64)
        for r in ngram_bucket_counts(df, text_col, dim).collect():
            v[r["bucket"]] = float(r["cnt"])
        return v

    t, r = dense(target_df), dense(raw_df)
    lt = np.log((t + alpha) / (t.sum() + alpha * dim))
    lr = np.log((r + alpha) / (r.sum() + alpha * dim))
    return lt - lr


def dsir_weights(
    df: DataFrame,
    log_ratios: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "arrow",
) -> DataFrame:
    """(doc_id, dsir_weight): per-document importance weight under the
    fitted log-ratio vector. Empty/gram-free documents weigh 0.0.

    ``method="arrow"`` (default, the scale path): one narrow Arrow UDF
    with the closure-captured lambda vector — numpy gather + sum per
    row, NO shuffle, NO join. ``method="relational"`` is the same
    arithmetic as explode -> broadcast bucket join -> groupBy(doc_id)
    sum — the shape the DuckDB oracle mirrors; kept as an in-repo
    cross-check (tests pin arrow == relational)."""
    lam = np.ascontiguousarray(np.asarray(log_ratios, dtype=np.float64))
    dim = int(lam.shape[0])
    buckets = ngram_buckets(F.col(text_col), dim)
    ids = F.col(id_col).alias("doc_id")

    if method == "arrow":

        @pandas_udf(T.DoubleType())
        def weight(bs: pd.Series) -> pd.Series:
            out = np.zeros(len(bs), dtype=np.float64)
            for i, b in enumerate(bs):
                if b is not None and len(b):
                    out[i] = lam[np.asarray(b, dtype=np.int64)].sum()
            return pd.Series(out)

        return df.select(ids, weight(buckets).alias("dsir_weight"))

    if method == "relational":
        from search_engine_spark.session import local_df

        lam_df = local_df(
            df.sparkSession,
            [(int(b), float(lam[b])) for b in range(dim)],
            "bucket long, lam double",
        )
        grams = df.select(ids, F.explode_outer(buckets).alias("bucket"))
        return (
            grams.join(F.broadcast(lam_df), "bucket", "left")
            .groupBy("doc_id")
            .agg(F.coalesce(F.sum("lam"), F.lit(0.0)).alias("dsir_weight"))
        )

    raise ValueError(f"unknown method {method!r} (arrow|relational)")


def gumbel_key(
    weight_col: Column, id_col: Column, seed: int = 0
) -> Column:
    """``weight + Gumbel(0,1)`` with the Gumbel draw derived from
    md5(seed:doc_id): u = (md5_32 + 0.5)/2^32 in (0,1), g = -ln(-ln u).
    Sorting desc by this key and taking k is EXACTLY sampling k rows
    without replacement with P ∝ exp(weight) (the Gumbel-top-k trick),
    but reproducible in any engine — no RNG state, no partition-order
    dependence."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (hv.cast("double") + F.lit(0.5)) / F.lit(_GUMBEL_DENOM)
    return weight_col + -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    log_ratios: np.ndarray,
    k: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, dsir_weight, gumbel_key) for the k documents selected
    by Gumbel-top-k importance resampling, ranked by key desc (doc_id
    tie-break). Plans as weight scan -> TakeOrderedAndProject."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    w = dsir_weights(df, log_ratios, text_col=text_col, id_col=id_col)
    keyed = w.withColumn(
        "gumbel_key", gumbel_key(F.col("dsir_weight"), F.col("doc_id"), seed)
    )
    return keyed.orderBy(F.desc("gumbel_key"), F.asc("doc_id")).limit(k)


def dsir_resample(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DSIR_DIM,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """The end-to-end operator: fit the two hashed-ngram LMs, weight
    ``raw_df``, Gumbel-top-k select, and return the selected ROWS of
    ``raw_df`` (all original columns plus ``dsir_weight``) — the
    pipeline-facing form. The k selected ids ride a broadcast join
    back onto the corpus scan when k is broadcast-sized; past that the
    optimizer falls back to a shuffle semi-join on the id."""
    lam = fit_log_ratios(
        raw_df, target_df, text_col=text_col, dim=dim, alpha=alpha
    )
    picked = dsir_select(
        raw_df, lam, k, seed=seed, text_col=text_col, id_col=id_col
    ).select(F.col("doc_id").alias(id_col), "dsir_weight")
    return raw_df.join(F.broadcast(picked), id_col, "inner")
