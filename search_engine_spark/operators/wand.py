"""Block-max WAND top-k retrieval (north-star scale path).

Exhaustive ``query.search`` explodes every posting of every query term and
group-sums — correct, but at 10^12-file scale a stopword-ish query term
drags billions of postings through the shuffle. WAND [Broder et al., CIKM
2003] + block-max refinement [Ding & Suel, SIGIR 2011] skips every doc-id
region whose *upper-bound* score cannot enter the current top-k.

Spark mapping (no custom Catalyst work — all above the planner):

  postings.filter(term in stems)               # row-group pruned scan,
                                               # one row per (term, shard)
    -> groupBy(shard).applyInPandas(wand_shard) # shards are ALIGNED doc-id
                                               # ranges across terms
                                               # (index_build layout), so a
                                               # shard is a self-contained
                                               # mini-index: per-shard WAND
                                               # is exact, Lucene-segment
                                               # style
    -> per-shard top-k (doc_id, rel)
    -> global orderBy(score desc, doc_id asc).limit(k)   # k*n_shards rows

Inside ``wand_shard`` (vectorized, no per-posting Python):
  1. Decode ONLY the cheapest full term (the one with the fewest
     postings? no — the highest upper bound): its exact kth-largest
     single-term contribution seeds the threshold θ (any doc's final
     score ≥ its single-term score, so θ is a valid lower bound for the
     kth final score).
  2. Each term's block-max array defines a piecewise-constant upper-bound
     function over doc-id space (block b of term t covers
     [doc_ids_t[bB], doc_ids_t[(b+1)B-1]] with max contribution
     idf_t·block_max_t[b]). Merge all block boundaries into one grid
     (np.searchsorted) and sum the per-term pieces → UB(interval).
  3. Drop every posting that falls in an interval with UB < θ (searchsorted
     range masks) — the block-max pruning step; decode/score only
     survivors via one concatenate + np.unique segment-sum.
  4. Exact top-k of survivors with the Q6 tie-break (score desc, doc_id
     asc). Exactness: any doc excluded had Σ_t blockmax ≥ its true score
     below θ ≤ true kth score.

Uses the codec binaries (doc_ids_enc / bm25_tf_enc / block_max), NOT the
decoded ``postings`` arrays — this is the path that works with
``store_arrays=False`` (the at-scale layout where decoded arrays are not
materialized in parquet).

Reference parity: result set and BM25 scores are rank-identical to
``query.search`` for plain (no boolean operator, no phrase) queries with
no PageRank mix — asserted in tests/test_wand.py. PageRank's additive
0.3·pr term would break the WAND upper bound unless a per-shard max-pr
is tracked; callers needing the mixed score use ``search`` (the candidate
sets are small post-boolean anyway).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.operators import codec
from search_engine_spark.operators.index_build import Index
from search_engine_spark.operators.parser import query_stems

WAND_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rel", T.DoubleType()),
    ]
)


def _wand_shard_topk(
    terms: list[dict], k: int, block_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k (doc_ids, rels) within one shard. ``terms`` rows carry
    decoded-on-demand codec buffers + idf. Vectorized block-max WAND."""
    # per-term decoded ids + contributions (contribs = idf * bm25_tf)
    doc_arrays, contrib_arrays, ub = [], [], []
    for t in terms:
        ids = codec.delta_decode_ids(t["doc_ids_enc"])
        tfs = codec.decode_tfs(t["bm25_tf_enc"]).astype(np.float64)
        doc_arrays.append(ids)
        contrib_arrays.append(t["idf"] * tfs)
        ub.append(t["idf"] * float(t["max_bm25_tf"]))

    # ---- phase 1: seed θ from the highest-upper-bound term ----
    seed = int(np.argmax(ub))
    seed_contrib = contrib_arrays[seed]
    if seed_contrib.size >= k:
        theta = float(np.partition(seed_contrib, -k)[-k])
    else:
        theta = 0.0

    if len(terms) == 1:
        ids, contribs = doc_arrays[0], contrib_arrays[0]
        return _topk(ids, contribs, k)

    # ---- phase 2: piecewise-constant UB over doc-id space ----
    # block b of term t spans [ids[bB], ids[min((b+1)B, n)-1]] with max
    # contribution idf * block_max[b]
    bounds = []  # per-term (starts, maxima)
    for t, ids in zip(terms, doc_arrays):
        bm = np.asarray(t["block_max"], dtype=np.float64) * t["idf"]
        starts = ids[::block_size]
        bounds.append((starts, bm))
    grid = np.unique(np.concatenate([s for s, _ in bounds]))
    ub_grid = np.zeros(grid.size, dtype=np.float64)
    for (starts, bm), ids in zip(bounds, doc_arrays):
        # which block of this term covers each grid point: the last block
        # whose start <= g; points past the term's last doc contribute 0
        idx = np.searchsorted(starts, grid, side="right") - 1
        vals = np.where(idx >= 0, bm[np.clip(idx, 0, bm.size - 1)], 0.0)
        vals[grid > ids[-1]] = 0.0
        ub_grid += vals

    live = ub_grid >= theta if theta > 0 else np.ones_like(ub_grid, bool)

    # ---- phase 3: exact-score postings in live intervals only ----
    kept_ids, kept_contribs = [], []
    for ids, contribs in zip(doc_arrays, contrib_arrays):
        # grid interval of each posting; interval i spans
        # [grid[i], grid[i+1])
        iv = np.searchsorted(grid, ids, side="right") - 1
        m = live[np.clip(iv, 0, live.size - 1)]
        kept_ids.append(ids[m])
        kept_contribs.append(contribs[m])
    all_ids = np.concatenate(kept_ids)
    all_contribs = np.concatenate(kept_contribs)
    if all_ids.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, all_contribs)
    # survivor scores are EXACT: a doc id falls in exactly one grid
    # interval, so all of its postings (every term) were kept or dropped
    # together — no partial sums. θ-filter just shrinks the top-k input
    # (≥ k docs with score ≥ θ are guaranteed alive: the seed term's own
    # top-k, whose intervals have UB ≥ score ≥ θ).
    if theta > 0.0:
        m = scores >= theta - 1e-12
        uniq, scores = uniq[m], scores[m]
    return _topk(uniq, scores, k)


def _topk(ids: np.ndarray, scores: np.ndarray, k: int):
    """Top-k by (score desc, doc_id asc), exact under ties."""
    if ids.size > k:
        # kth-largest score, then keep ALL docs at or above it so the
        # doc_id tie-break sees every tied candidate
        kth = -np.partition(-scores, k - 1)[k - 1]
        m = scores >= kth
        ids, scores = ids[m], scores[m]
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order]


def search_wand(
    index: Index,
    query: str,
    k: int | None = None,
) -> DataFrame:
    """Top-k disjunctive BM25 via block-max WAND. Rank-identical to
    ``query.search(index, query, k)`` for plain queries when no PageRank
    column is present (scores = relevance_weight · Σ idf·bm25_tf)."""
    cfg = index.cfg
    k = k or cfg.topk_default
    stems = list(dict.fromkeys(query_stems(query, cfg.stem)))
    spark = index.postings.sparkSession
    if not stems:
        return spark.createDataFrame([], "doc_id long, rel double, score double")

    # idf of the query stems: tiny driver-side lookup (metadata access,
    # same role as the reference's IN-probe on term_stats)
    idf_rows = (
        index.term_stats.filter(F.col("term").isin(stems))
        .select("term", "idf")
        .collect()
    )
    idf_map = {r["term"]: float(r["idf"]) for r in idf_rows}
    stems = [s for s in stems if s in idf_map]
    if not stems:
        return spark.createDataFrame([], "doc_id long, rel double, score double")

    block_size = cfg.block_size
    bc_idf = spark.sparkContext.broadcast(idf_map)

    def wand_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        idf = bc_idf.value
        terms = [
            {
                "doc_ids_enc": r.doc_ids_enc,
                "bm25_tf_enc": r.bm25_tf_enc,
                "block_max": r.block_max,
                "max_bm25_tf": r.max_bm25_tf,
                "idf": idf[r.term],
            }
            for r in pdf.itertuples()
        ]
        ids, rels = _wand_shard_topk(terms, k, block_size)
        return pd.DataFrame({"doc_id": ids, "rel": rels})

    shard_rows = index.postings.filter(F.col("term").isin(stems)).select(
        "term", "shard", "max_bm25_tf", "doc_ids_enc", "bm25_tf_enc", "block_max"
    )
    per_shard = shard_rows.groupBy("shard").applyInPandas(
        wand_shard, schema=WAND_SHARD_SCHEMA
    )
    w = float(cfg.relevance_weight)
    return (
        per_shard.select(
            "doc_id", "rel", (F.col("rel") * w).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
