"""Hybrid sparse+dense retrieval: BM25 (the reference's lexical
ranker) fused with hashed-embedding cosine (operators/embed.py) by
reciprocal-rank fusion (Cormack et al. 2009, "Reciprocal Rank Fusion
outperforms Condorcet and individual Rank Learning Methods" — the
industry-standard score-free combiner):

    rrf(d) = sum over ranked lists L containing d of 1 / (rrf_k + rank_L(d))

Rank-based fusion needs no score normalization (BM25 is unbounded,
cosine lives in [-1, 1]) and is exactly reproducible in SQL — the
driver-gate entry re-derives BOTH candidate pools (BM25 chain + sparse
hashed-embedding chain) and the fused ranking relationally.

100 TB shape: each candidate pool is its own audited plan (postings
probe + TakeOrderedAndProject; narrow embed pass +
TakeOrderedAndProject) producing <= ``pool`` rows, so fusion itself —
rank windows + a full outer join + top-k — runs on k·L rows no matter
the corpus size. The single-partition rank windows are bounded by
``pool`` BY CONSTRUCTION (same discipline as the suggestion trie).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60
POOL = 100


def rank_pool(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    pool: int = POOL,
) -> DataFrame:
    """(id_col, rank): dense 1-based ranks of the top ``pool`` rows by
    (score DESC, id ASC) — the deterministic tie-break every ranked
    surface in this engine uses. Input is expected to be a bounded
    candidate frame (<= pool rows after its own top-k), so the
    single-partition window is fine."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.select(id_col, score_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= pool)
        .select(id_col, "rank")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, rrf_score) top-k fusion of (id, rank) frames. A doc
    missing from a list contributes 0 from it (the standard RRF
    convention). Exact arithmetic: sums of 1/(rrf_k + int) are the
    same binary doubles in any engine, so ties break on id_col
    identically everywhere."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    out = None
    for i, df in enumerate(ranked):
        part = df.select(
            id_col, F.col("rank").alias(f"_r{i}")
        )
        out = part if out is None else out.join(part, id_col, "outer")
    score = None
    for i in range(len(ranked)):
        c = F.when(
            F.col(f"_r{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"_r{i}")),
        ).otherwise(F.lit(0.0))
        score = c if score is None else score + c
    return (
        out.select(id_col, score.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def hybrid_topk(
    idx,
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    pool: int = POOL,
    rrf_k: int = RRF_K,
    dim: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf=False,
    emb: DataFrame | None = None,
    vindex=None,
    exact: bool = True,
) -> DataFrame:
    """(doc_id, rrf_score): BM25 top-``pool`` over ``idx`` fused with
    hashed-embedding cosine top-``pool`` over ``docs`` for the same
    free-text query. The lexical side sees the index's analyzer
    (stemming, stopwords — quirk Q3 semantics via ``search``); the
    dense side sees surface tokens — fusing the two views is the point
    (lexical precision + sign-hash recall of vocabulary overlap).

    The lexical side already reuses a built artifact (``idx``); give
    the dense side the same treatment for repeated queries by passing
    ``emb=`` (a precomputed ``hash_embed`` frame) or ``vindex=`` (a
    saved ``VectorIndex``) through to ``semantic_topk`` — otherwise
    every call pays a full-corpus embedding scan for a
    query-independent column."""
    from search_engine_spark.operators.embed import (
        EMBED_DIM,
        semantic_topk,
    )
    from search_engine_spark.operators.query import search

    lex = search(idx, query_text, k=pool)
    sem = semantic_topk(
        docs, query_text, k=pool,
        dim=dim or EMBED_DIM, text_col=text_col, id_col=id_col,
        idf=idf, emb=emb, vindex=vindex, exact=exact,
    )
    return rrf_fuse(
        [
            rank_pool(lex, "score", id_col=id_col, pool=pool),
            rank_pool(sem, "cosine", id_col=id_col, pool=pool),
        ],
        k=k,
        rrf_k=rrf_k,
        id_col=id_col,
    )
