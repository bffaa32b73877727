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
    -> per-shard top-k (doc_id, rel, score)
    -> global orderBy(score desc, doc_id asc).limit(k)   # k*n_shards rows

Inside ``wand_shard`` (vectorized, no per-posting Python):
  1. Seed the threshold θ from the highest-upper-bound term: its exact
     kth-largest single-term FINAL contribution (w_rel·idf·tf). Any doc's
     final score ≥ its single-term relevance part (PageRank ≥ 0), so at
     least k docs score ≥ θ and θ lower-bounds the shard's kth final
     score.
  2. Each term's block-max array defines a piecewise-constant upper-bound
     function over doc-id space. Merge all block boundaries into one grid
     (np.searchsorted) and sum the per-term pieces; with a PageRank mix
     the interval UB adds ``w_pr · max(page_rank in shard)`` — the
     per-shard max-pr term that makes the mixed score WAND-safe.
  3. Drop every posting in an interval with UB < θ (searchsorted range
     masks); decode/score only survivors via one concatenate + np.unique
     segment-sum; survivor PageRank is a sorted-array searchsorted
     lookup.
  4. Exact top-k of survivors with the Q6 tie-break (score desc, doc_id
     asc). Exactness: any doc excluded had Σ_t blockmax·w_rel + w_pr·max_pr
     ≥ its true score below θ ≤ true kth score.

Uses the codec binaries (doc_ids_enc / bm25_tf_enc / block_max), NOT the
decoded ``postings`` arrays — this is the path that works with
``store_arrays=False`` (the at-scale layout where decoded arrays are not
materialized in parquet). ``block_max`` is computed at build time from the
float32-ROUNDTRIPPED bm25 values (index_build._make_codec_udf), so the UB
bounds exactly what this module decodes.

Reference parity: result set and scores are rank-identical to
``query.search`` for plain (no boolean operator, no phrase) queries —
WITH or WITHOUT the 0.7·rel + 0.3·pagerank mix — asserted in
tests/test_wand.py. The PageRank rows ride into each shard via a
cogroup on the aligned shard key (doc_id // docs_per_shard), so no
per-doc join happens outside the pruned candidate set.
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
        T.StructField("page_rank", T.DoubleType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _wand_shard_topk(
    terms: list[dict],
    k: int,
    block_size: int,
    w_rel: float = 1.0,
    w_pr: float = 0.0,
    pr_ids: np.ndarray | None = None,
    pr_vals: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact top-k (doc_ids, rels, prs, scores) within one shard.
    ``terms`` rows carry decoded-on-demand codec buffers + idf;
    (pr_ids, pr_vals) is the shard's doc_id-sorted PageRank lookup
    (empty/None → all zeros). Vectorized block-max WAND."""
    use_pr = (
        w_pr != 0.0 and pr_ids is not None and pr_ids.size > 0
    )
    max_pr = float(pr_vals.max()) if use_pr else 0.0

    def _pr_of(ids: np.ndarray) -> np.ndarray:
        if not use_pr:
            return np.zeros(ids.size, dtype=np.float64)
        pos = np.searchsorted(pr_ids, ids)
        pos = np.clip(pos, 0, pr_ids.size - 1)
        return np.where(pr_ids[pos] == ids, pr_vals[pos], 0.0)

    # per-term decoded ids + FINAL-space contributions (w_rel·idf·bm25_tf)
    doc_arrays, contrib_arrays, ub = [], [], []
    for t in terms:
        ids = codec.delta_decode_ids(t["doc_ids_enc"])
        tfs = codec.decode_tfs(t["bm25_tf_enc"]).astype(np.float64)
        doc_arrays.append(ids)
        contrib_arrays.append(w_rel * t["idf"] * tfs)
        ub.append(w_rel * t["idf"] * float(t["max_bm25_tf"]))

    # ---- phase 1: seed θ from the highest-upper-bound term ----
    seed = int(np.argmax(ub))
    seed_contrib = contrib_arrays[seed]
    if seed_contrib.size >= k:
        theta = float(np.partition(seed_contrib, -k)[-k])
    else:
        theta = 0.0

    if len(terms) == 1 and not use_pr:
        ids, contribs = doc_arrays[0], contrib_arrays[0]
        rels = contribs / w_rel if w_rel != 0 else contribs
        i, s = _topk(ids, contribs, k)
        order = np.searchsorted(ids, i)
        return i, rels[order], np.zeros(i.size), s

    # ---- phase 2: piecewise-constant UB over doc-id space ----
    # block b of term t spans [ids[bB], ids[min((b+1)B, n)-1]] with max
    # FINAL contribution w_rel·idf·block_max[b]
    bounds = []  # per-term (starts, maxima)
    for t, ids in zip(terms, doc_arrays):
        bm = np.asarray(t["block_max"], dtype=np.float64) * (
            w_rel * t["idf"]
        )
        starts = ids[::block_size]
        bounds.append((starts, bm))
    grid = np.unique(np.concatenate([s for s, _ in bounds]))
    ub_grid = np.full(grid.size, w_pr * max_pr, dtype=np.float64)
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
        z = np.empty(0, np.float64)
        return np.empty(0, np.int64), z, z.copy(), z.copy()
    uniq, inv = np.unique(all_ids, return_inverse=True)
    rel_w = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(rel_w, inv, all_contribs)
    prs = _pr_of(uniq)
    scores = rel_w + w_pr * prs
    # survivor scores are EXACT: a doc id falls in exactly one grid
    # interval, so all of its postings (every term) were kept or dropped
    # together — no partial sums. θ-filter just shrinks the top-k input
    # (≥ k docs with score ≥ θ are guaranteed alive: the seed term's own
    # top-k, whose intervals have UB ≥ score ≥ θ). Relative slack guards
    # float-sum-order jitter at the θ boundary.
    if theta > 0.0:
        m = scores >= theta - (1e-12 + 1e-9 * abs(theta))
        uniq, scores, rel_w, prs = uniq[m], scores[m], rel_w[m], prs[m]
    top_ids, top_scores = _topk(uniq, scores, k)
    order = np.searchsorted(uniq, top_ids)
    rels = (rel_w[order] / w_rel) if w_rel != 0 else rel_w[order]
    return top_ids, rels, prs[order], top_scores


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
    page_rank: DataFrame | None = None,
) -> DataFrame:
    """Top-k disjunctive BM25 via block-max WAND. Rank-identical to
    ``query.search(index, query, k)`` for plain queries — including the
    0.7·rel + 0.3·page_rank mixed score when a PageRank source is
    present (``page_rank`` arg, else ``index.docs.page_rank``), via the
    per-shard max-pr upper-bound term."""
    cfg = index.cfg
    k = k or cfg.topk_default
    stems = list(dict.fromkeys(query_stems(query, cfg.stem)))
    spark = index.postings.sparkSession
    empty_schema = "doc_id long, rel double, page_rank double, score double"
    if not stems:
        return spark.createDataFrame([], empty_schema)

    # idf of the query stems: tiny driver-side lookup (metadata access,
    # same role as the reference's IN-probe on term_stats)
    from search_engine_spark.operators.query import _idf_map

    idf_map = _idf_map(index, stems)
    stems = [s for s in stems if s in idf_map]
    if not stems:
        return spark.createDataFrame([], empty_schema)

    if page_rank is None and index.docs is not None and "page_rank" in index.docs.columns:
        page_rank = index.docs.select("doc_id", "page_rank")

    if len(stems) == 1:
        # cost-based dispatch: with one term there is nothing to prune —
        # every posting's score is just idf·tf, so block-max bounds never
        # exclude anything and the Python-side decode only adds cost
        # (measured 5.3 s vs 0.25 s JVM-side on a hot term at 480k docs).
        # The exhaustive path IS the optimal single-term plan.
        from search_engine_spark.operators.query import search

        return search(index, query, k=k, page_rank=page_rank)

    block_size = cfg.block_size
    w_rel = float(cfg.relevance_weight)
    w_pr = float(cfg.pagerank_weight) if page_rank is not None else 0.0
    bc_idf = spark.sparkContext.broadcast(idf_map)

    def _terms_of(pdf: pd.DataFrame) -> list[dict]:
        idf = bc_idf.value
        return [
            {
                "doc_ids_enc": r.doc_ids_enc,
                "bm25_tf_enc": r.bm25_tf_enc,
                "block_max": r.block_max,
                "max_bm25_tf": r.max_bm25_tf,
                "idf": idf[r.term],
            }
            for r in pdf.itertuples()
        ]

    shard_rows = index.postings.filter(F.col("term").isin(stems)).select(
        "term", "shard", "max_bm25_tf", "doc_ids_enc", "bm25_tf_enc", "block_max"
    )

    if page_rank is None:

        def wand_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            ids, rels, prs, scores = _wand_shard_topk(
                _terms_of(pdf), k, block_size, w_rel=w_rel
            )
            return pd.DataFrame(
                {"doc_id": ids, "rel": rels, "page_rank": prs, "score": scores}
            )

        per_shard = shard_rows.groupBy("shard").applyInPandas(
            wand_shard, schema=WAND_SHARD_SCHEMA
        )
    else:
        # PageRank rows cogroup on the SAME aligned shard key the posting
        # layout uses (doc_id // docs_per_shard) — no doc-level join, no
        # extra shuffle shape beyond the two co-keyed exchanges. The pr
        # table is pruned map-side to the shards the query's postings
        # actually touch (broadcast semi-join on the tiny distinct-shard
        # set) — otherwise every query would shuffle one pr row per
        # corpus doc through the cogroup.
        touched = F.broadcast(shard_rows.select("shard").distinct())
        pr_sharded = (
            page_rank.select(
                F.floor(
                    F.col("doc_id") / F.lit(cfg.docs_per_shard)
                ).cast("long").alias("shard"),
                "doc_id",
                F.col("page_rank").cast("double").alias("page_rank"),
            )
            .join(touched, "shard", "left_semi")
        )

        def wand_shard_pr(
            _key, left: pd.DataFrame, right: pd.DataFrame
        ) -> pd.DataFrame:
            if len(left) == 0:
                return pd.DataFrame(
                    {c: [] for c in ("doc_id", "rel", "page_rank", "score")}
                )
            pr = right.sort_values("doc_id")
            ids, rels, prs, scores = _wand_shard_topk(
                _terms_of(left),
                k,
                block_size,
                w_rel=w_rel,
                w_pr=w_pr,
                pr_ids=pr["doc_id"].to_numpy(dtype=np.int64),
                pr_vals=pr["page_rank"].to_numpy(dtype=np.float64),
            )
            return pd.DataFrame(
                {"doc_id": ids, "rel": rels, "page_rank": prs, "score": scores}
            )

        per_shard = (
            shard_rows.groupBy("shard")
            .cogroup(pr_sharded.groupBy("shard"))
            .applyInPandas(wand_shard_pr, schema=WAND_SHARD_SCHEMA)
        )

    return (
        per_shard.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    )
