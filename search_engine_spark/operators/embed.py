"""Feature-hashed document embeddings and text-to-text retrieval —
the engine's model-free semantic layer (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning": signed hashed
bag-of-words, the classic collision-unbiased sparse projection).

Why it belongs here: the ANN stack (cosine_topk / LSH / IVF / PQ /
VectorIndex) consumes an ``array<float>`` column; this module produces
that column FROM TEXT, closing the loop raw corpus -> embedding ->
ANN index -> "more like this" / free-text similar-document retrieval
with zero external models — everything derivable (and oracle-checkable)
from md5 arithmetic.

The estimator: token t contributes sign(t) at bucket(t), where
bucket = md5_32(t) % dim and sign = ±1 from bit 16 of the same hash
(independent of the low bucket bits for dim <= 2^16); the vector is
L2-normalized. Occurrences count — TF weighting is the raw count.

100 TB shape:
  - per-token hashing runs JVM-side (one md5 per token inside the
    tokenize transform — no Python in the hash path); the ONLY Python
    is one Arrow pass doing the dense scatter-add (np.add.at) +
    normalize, so embedding is a zero-shuffle narrow scan;
  - retrieval is whatever the ANN stack does with the column: brute
    cosine is one narrow pass + TakeOrderedAndProject; at scale the
    same column feeds VectorIndex.build for the cluster-pruned path.

DuckDB mirrors every step sparsely (tokens -> md5 buckets/signs ->
per-bucket sums -> norms -> dot) — the gate entry checks the cosine
TOP-K itself, not just the plumbing.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EMBED_DIM = 64

_SIGN_SHIFT = 16  # sign bit; buckets use the low bits (dim <= 2^16)


def _word_tokens(text_col: Column) -> Column:
    """The engine's shared surface tokenization (same as DSIR)."""
    from search_engine_spark.operators.textstats import surface_tokens

    return surface_tokens(text_col)


def hashed_features(text_col: Column, dim: int = EMBED_DIM) -> Column:
    """array<long> of encoded (bucket, sign) features, one per token
    occurrence: e = bucket*2 + signbit. ONE md5 per token, computed
    JVM-side; the Arrow scatter pass decodes with e>>1 / e&1."""
    hashes = F.transform(
        _word_tokens(text_col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    return F.transform(
        hashes,
        lambda h: (h % dim) * 2 + F.shiftright(h, _SIGN_SHIFT) % 2,
    )


def fit_bucket_idf(
    df: DataFrame,
    dim: int = EMBED_DIM,
    text_col: str = "text",
) -> np.ndarray:
    """Dense float64 IDF vector over the HASH BUCKETS:
    ``idf[b] = ln((N + 1) / (df_b + 1))`` where df_b counts documents
    whose token set touches bucket b. Collisions fold into the weight
    (two tokens sharing a bucket share a df) — the same estimator
    tradeoff as DSIR's hashed LMs, and what keeps the statistic
    bounded by ``dim`` rows at ANY corpus size: one explode +
    countDistinct groupBy, then a <= dim-row collect."""
    n_docs = df.count()
    rows = (
        df.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        hashed_features(F.col(text_col), dim),
                        lambda e: F.shiftright(e, 1),
                    )
                )
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    dfv = np.zeros(dim, dtype=np.float64)
    for r in rows:
        dfv[r["bucket"]] = float(r["df"])
    return np.log((n_docs + 1.0) / (dfv + 1.0))


def hash_embed(
    df: DataFrame,
    dim: int = EMBED_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    idf: np.ndarray | None = None,
) -> DataFrame:
    """(id_col, out_col): the L2-normalized signed hashed bag-of-words
    vector per document (all-zero for token-free docs). Hashing is JVM
    column algebra; the dense scatter-add + normalize is one Arrow
    pass — zero shuffle, zero join (plan-asserted in tests).

    Pass ``idf`` (from ``fit_bucket_idf``) to weight each occurrence
    by its bucket's IDF — common tokens stop dominating the cosine;
    the vector rides the UDF closure exactly like DSIR's log-ratio
    vector, so the plan shape is unchanged."""
    if not 1 <= dim <= (1 << _SIGN_SHIFT):
        raise ValueError(f"dim must be in [1, 65536] (got {dim})")
    w = None
    if idf is not None:
        w = np.ascontiguousarray(np.asarray(idf, dtype=np.float64))
        if w.shape != (dim,):
            raise ValueError(f"idf must have shape ({dim},), got {w.shape}")
    feats = hashed_features(F.col(text_col), dim)

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def scatter(es: pd.Series) -> pd.Series:
        out = []
        for e in es:
            v = np.zeros(dim, dtype=np.float64)
            if e is not None and len(e):
                a = np.asarray(e, dtype=np.int64)
                b = a >> 1
                sign = (a & 1) * 2.0 - 1.0
                np.add.at(v, b, sign * w[b] if w is not None else sign)
                n = float(np.sqrt((v * v).sum()))
                if n > 0.0:
                    v /= n
            out.append(v)
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias(id_col), scatter(feats).alias(out_col)
    )


def embed_text(
    text: str, dim: int = EMBED_DIM, idf: np.ndarray | None = None
) -> list[float]:
    """Driver-side twin of ``hash_embed`` for a single string (query
    embedding) — identical md5 arithmetic, pinned equal in tests;
    pass the same ``idf`` vector used for the corpus side."""
    v = [0.0] * dim
    for t in _py_tokens(text):
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        b = h % dim
        s = 1.0 if (h >> _SIGN_SHIFT) & 1 else -1.0
        v[b] += s * (float(idf[b]) if idf is not None else 1.0)
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v] if n > 0.0 else v


def _py_tokens(text: str) -> list[str]:
    from search_engine_spark.operators.textstats import surface_tokens_py

    return surface_tokens_py(text)


def _unit_dot_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str,
    exclude_ids: list | None = None,
) -> DataFrame:
    """Top-k by dot product — equal to cosine because ``hash_embed``
    vectors are unit-norm (zero-vector docs score 0.0 and sink,
    instead of tripping ANSI divide-by-zero like a ratio would).
    Plans as one narrow scan + TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = emb.select(
        id_col,
        F.aggregate(
            F.zip_with(F.col("embedding"), q, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("cosine"),
    )
    if exclude_ids:
        df = df.where(~F.col(id_col).isin(exclude_ids))
    return df.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _resolve_idf_weight(idf, df, dim, text_col, reuse) -> np.ndarray | None:
    """Normalize the ``idf`` dial shared by the retrieval entry points:
    False/None -> unweighted; an array -> use it verbatim (the caller
    states what the corpus side was built with); True -> fit from the
    corpus — only legal when the corpus is being embedded inline
    (``reuse`` names the precomputed argument otherwise: fitting a NEW
    weighting for the query against an already-weighted corpus would
    be exactly the asymmetric-cosine bug this dial exists to avoid)."""
    if idf is None or idf is False:
        return None
    if idf is True:
        if reuse is not None:
            raise ValueError(
                f"idf=True refits from the corpus, but {reuse}= supplies "
                "precomputed embeddings — pass the idf VECTOR they were "
                "built with instead (or rely on the VectorIndex's "
                "persisted one)"
            )
        return fit_bucket_idf(df, dim=dim, text_col=text_col)
    return np.asarray(idf, dtype=np.float64)


def semantic_topk(
    df: DataFrame | None,
    query_text: str,
    k: int = 10,
    dim: int = EMBED_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf=False,
    emb: DataFrame | None = None,
    vindex=None,
    exact: bool = True,
) -> DataFrame:
    """Free-text similar-document retrieval. (doc_id, cosine), cos
    DESC / id ASC. ``idf=True`` fits the bucket-IDF first (one bounded
    groupBy) and weights both sides; pass the fitted VECTOR instead
    when the corpus side is precomputed.

    The corpus embedding is QUERY-INDEPENDENT, so repeated queries
    should not pay a full-corpus Arrow pass each (at 100 TB that scan
    is the dominant cost) — the same artifact-reuse story as
    ``search(idx, ...)``:

      * ``emb=``    — a precomputed ``hash_embed`` frame
                      (id_col, embedding); persist or save it once,
                      query it Q times.
      * ``vindex=`` — a (saved) ``VectorIndex``; ``exact=True`` (the
                      default) is the brute-cosine dial == the inline
                      path, ``exact=False`` takes the IVF-PQ probe.
                      The index's persisted IDF weighting is applied
                      to the query automatically.
      * neither     — embeds ``df`` inline (one narrow Arrow pass):
                      right for a single ad-hoc query."""
    return _reuse_dispatch_topk(
        query_text, df, k, dim, text_col, id_col, idf, emb, vindex,
        exact,
    )


def _reuse_dispatch_topk(
    query_text: str,
    df: DataFrame | None,
    k: int,
    dim: int,
    text_col: str,
    id_col: str,
    idf,
    emb: DataFrame | None,
    vindex,
    exact: bool,
    exclude_ids: list | None = None,
) -> DataFrame:
    """Shared emb=/vindex=/inline dispatch for ``semantic_topk`` and
    ``more_like_this``: resolve the idf weighting once, embed the query
    with the SAME weighting the corpus side carries, then route to the
    VectorIndex, the precomputed embedding frame, or an inline embed."""
    w = _resolve_idf_weight(
        idf, df, dim, text_col,
        reuse="emb" if emb is not None else
        ("vindex" if vindex is not None else None),
    )
    if vindex is not None:
        qv = embed_text(
            query_text, vindex.dim,
            idf=w if w is not None else vindex.idf,
        )
        out = vindex.topk(qv, k=k, exact=exact, exclude_ids=exclude_ids)
        return (
            out.withColumnRenamed("vec_id", id_col)
            if id_col != "vec_id"
            else out
        )
    corpus = (
        emb
        if emb is not None
        else hash_embed(df, dim=dim, text_col=text_col, id_col=id_col, idf=w)
    )
    return _unit_dot_topk(
        corpus, embed_text(query_text, dim, idf=w), k, id_col,
        exclude_ids=exclude_ids,
    )


def more_like_this(
    df: DataFrame,
    doc_id,
    k: int = 10,
    dim: int = EMBED_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf=False,
    emb: DataFrame | None = None,
    vindex=None,
    exact: bool = True,
) -> DataFrame:
    """Top-k documents most similar to ``doc_id`` (itself excluded):
    the anchor's text is fetched from ``df`` (one pruned scan),
    embedded driver-side, and cosined against the corpus embedding —
    inline by default, or reused via ``emb=`` / ``vindex=`` exactly as
    in ``semantic_topk`` (``df`` still supplies the anchor text)."""
    anchor = (
        df.where(F.col(id_col) == doc_id).select(text_col).limit(1).collect()
    )
    if not anchor:
        raise KeyError(f"{id_col}={doc_id!r} not found")
    return _reuse_dispatch_topk(
        anchor[0][0], df, k, dim, text_col, id_col, idf, emb, vindex,
        exact, exclude_ids=[doc_id],
    )
