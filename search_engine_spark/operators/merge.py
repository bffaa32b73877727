"""Incremental index maintenance: LSM-style merge + delete compaction.

Web-scale indexes are never rebuilt from scratch on every crawl: the
reference engine re-runs its indexer over the crawled store
(SE/Indexer/Indexer.java drives batch re-index passes); the at-scale
equivalent is the log-structured pattern every production engine uses —
build a small DELTA index from the new/updated documents, then merge it
into the main index without touching the raw text again:

    delta = build_index(new_docs)            # tokenizes only the delta
    main  = merge_indexes(main, delta)       # no retokenization

``merge_indexes`` is an UPSERT (a doc_id present in both sides takes the
right/delta side's postings — a recrawled page replaces its old copy);
``delete_docs`` is the matching compaction for removed documents.

Why a merge must re-score (and why that is still cheap): BM25 weights
are denormalized into the posting lists (the reference stores final
per-term scores the same way — SURVEY.md §2.3), and bm25_tf depends on
the corpus-wide ``avgdl``/``N`` which change whenever the corpus does.
So the merge decodes both sides to flat (doc_id, term, tf, positions)
rows — tf and positions are corpus-independent — recomputes the global
stats, and re-runs the exact assembly stage of ``build_index``
(``merge_postings``: the one wide exchange + JVM array build + codec).
What it NEVER re-runs is tokenization/stemming — the dominant cost of a
full rebuild (the 2M-doc study spends >80% of build wall time ahead of
the groupBy) — and the delta side's raw text is never read at all.

Scale shape:
  * arrays profile: the flat decode is a narrow explode; ``doc_len`` is
    recovered per-posting as ``round(tf / tf_norm)`` (tf_norm was stored
    as tf/doc_len, so the roundtrip is exact after integer rounding) —
    NO join against doc_stats on the token-scale rows.
  * codec profile (``store_arrays=False``): an Arrow decode over only
    ``doc_ids_enc``/``tf_enc``/``pos_enc`` (bm25 binaries are pruned
    from the scan — they are recomputed anyway), then one join to
    doc_stats for doc_len.
  * the upsert anti-join streams the main side against the delta's
    doc-id set (broadcast for the common small-delta case — AQE picks;
    for the typical daily-delta merge this is a map-side filter).

This complements ``index_checkpoint.finalize_from_raw``, which merges
RAW tokenized batches within one resumable build; ``merge_indexes``
operates on two already-FINALIZED indexes (e.g. yesterday's published
index + today's delta).

Relation to the reference: the reference has no explicit merge (it
re-indexes into SQLite in place, SE/Indexer/DBManager.java upserts per
doc); this operator reproduces those upsert semantics at Spark scale.
Equality contract, pinned by tests/test_merge.py:
``merge_indexes(build(A), build(B))`` is value-identical to
``build_index(A ⊎ B)`` (right-wins on doc_id), and
``delete_docs(build(A ∪ B), ids(B))`` to ``build_index(A)``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.operators.index_build import (
    Index,
    merge_postings,
)

# cfg fields that change posting CONTENT — two indexes disagreeing on
# any of these cannot be merged (their tf/positions/scores live in
# different spaces). Layout-only knobs (store_arrays, shuffle sizing)
# may differ.
_CONTENT_CFG_FIELDS = (
    "min_word_len",
    "max_word_len",
    "stem",
    "remove_stopwords",
    "token_pattern",
    "bm25_k1",
    "bm25_b",
    "docs_per_shard",
    "block_size",
)


def _check_compatible(a: EngineConfig, b: EngineConfig) -> None:
    bad = [
        f
        for f in _CONTENT_CFG_FIELDS
        if getattr(a, f) != getattr(b, f)
    ]
    if bad:
        raise ValueError(
            "cannot merge indexes built with different analyzer/scoring "
            f"configs; mismatched fields: {bad}"
        )


def flat_postings(index: Index) -> DataFrame:
    """Decode an index back to flat (doc_id, term, tf, positions,
    doc_len) rows — the corpus-independent posting payload.

    Arrays profile: narrow explode, doc_len recovered from tf/tf_norm
    (no join). Codec profile: Arrow decode of the three needed binaries
    (bm25_tf_enc pruned) + one doc_stats join for doc_len.
    """
    if index.cfg.store_arrays:
        return (
            index.postings.select("term", F.explode("postings").alias("p"))
            .select(
                F.col("p.doc_id").alias("doc_id"),
                "term",
                F.col("p.tf").alias("tf"),
                F.col("p.positions").alias("positions"),
                # tf_norm was stored as tf/doc_len (build_index), so
                # tf/tf_norm == doc_len up to float64 ulps; round makes
                # the integer exact. tf_norm==0 encodes the sectioned
                # analyzer's re-validated doc_len==0 quirk (T6) — keep 0.
                F.when(
                    F.col("p.tf_norm") > 0,
                    F.round(F.col("p.tf") / F.col("p.tf_norm")).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
                .alias("doc_len"),
            )
        )

    import numpy as np

    from search_engine_spark.operators import codec

    def decode(batches):
        # rows-level Python only; per-posting work is numpy — the
        # term_matches/wand decode pattern.
        for pdf in batches:
            ids_l, tfs_l, pos_l, n_l = [], [], [], []
            for r in pdf.itertuples():
                ids = codec.delta_decode_ids(r.doc_ids_enc)
                ids_l.append(ids)
                tfs_l.append(codec.decode_tfs(r.tf_enc))
                pos_l.append(codec.decode_positions(r.pos_enc, ids.size))
                n_l.append(ids.size)
            if not ids_l:
                yield pd.DataFrame(
                    {"doc_id": [], "term": [], "tf": [], "positions": []}
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids_l),
                    "term": np.repeat(
                        pdf["term"].to_numpy(), np.asarray(n_l)
                    ),
                    "tf": np.concatenate(tfs_l).astype(np.float64),
                    "positions": [pl for pls in pos_l for pl in pls],
                }
            )

    decoded = index.postings.select(
        "term", "doc_ids_enc", "tf_enc", "pos_enc"
    ).mapInPandas(
        decode,
        schema="doc_id long, term string, tf double, "
        "positions array<int>",
    )
    return decoded.join(
        index.doc_stats.select("doc_id", "doc_len"), "doc_id"
    )


def _reassemble(
    flat: DataFrame,
    doc_stats: DataFrame,
    cfg: EngineConfig,
    docs: DataFrame | None,
) -> Index:
    """The post-tokenize tail of ``build_index``: global stats →
    per-posting rescore → ``merge_postings`` → term_stats. Expression
    trees match build_index exactly so a merged index is value-identical
    to a from-scratch rebuild of the same corpus."""
    agg = doc_stats.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)

    k1, b = cfg.bm25_k1, cfg.bm25_b
    per_term = (
        flat.select(
            "doc_id",
            F.col("doc_len").cast("double").alias("doc_len"),
            "term",
            "tf",
            "positions",
        )
        .withColumn(
            "tf_norm",
            F.when(F.col("doc_len") > 0, F.col("tf") / F.col("doc_len"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "bm25_tf",
            (F.col("tf") * (1.0 + k1))
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * F.col("doc_len") / F.lit(max(avgdl, 1e-12)))
            ),
        )
        .withColumn(
            "shard",
            (F.col("doc_id") / F.lit(cfg.docs_per_shard)).cast("long"),
        )
    )
    postings = merge_postings(per_term, cfg)
    term_stats = (
        postings.groupBy("term")
        .agg(F.sum("n_postings").alias("df"))
        .withColumn("idf", F.log10(F.lit(float(n_docs)) / F.col("df")))
    )
    return Index(
        postings=postings,
        term_stats=term_stats,
        doc_stats=doc_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        cfg=cfg,
        docs=docs,
    )


def merge_indexes(
    a: Index,
    b: Index,
    cfg: EngineConfig | None = None,
    on_conflict: str = "right",
) -> Index:
    """Upsert-merge two finalized indexes (right side wins on doc_id).

    ``on_conflict``: ``"right"`` (default — b's postings replace a's for
    shared doc_ids, the recrawl semantics) or ``"error"`` (raise if the
    doc-id sets overlap — the append-only delta case where an overlap
    means an id-allocation bug upstream).

    Output layout follows ``cfg`` (default: ``a.cfg``); content-shaping
    config fields must agree between the two sides.
    """
    _check_compatible(a.cfg, b.cfg)
    if on_conflict not in ("right", "error"):
        raise ValueError(f"on_conflict must be 'right' or 'error': {on_conflict!r}")
    cfg = cfg or a.cfg

    b_ids = b.doc_stats.select("doc_id")
    # the driver knows the delta's exact cardinality — hint the upsert
    # anti-join to broadcast for the common small-delta merge so the
    # main side is filtered map-side (no shuffle of its token-scale
    # rows on doc_id). Past ~2M ids (~16 MB of longs) fall back to
    # Spark's own strategy (AQE may still pick broadcast at runtime).
    if b.n_docs <= 2_000_000:
        b_ids = F.broadcast(b_ids)
    if on_conflict == "error":
        n_overlap = a.doc_stats.join(b_ids, "doc_id", "left_semi").count()
        if n_overlap:
            raise ValueError(
                f"doc-id overlap ({n_overlap} docs) with on_conflict='error'"
            )

    flat = flat_postings(a).join(b_ids, "doc_id", "left_anti").unionByName(
        flat_postings(b)
    )
    doc_stats = (
        a.doc_stats.select("doc_id", "doc_len")
        .join(b_ids, "doc_id", "left_anti")
        .unionByName(b.doc_stats.select("doc_id", "doc_len"))
    )
    docs = None
    if a.docs is not None and b.docs is not None:
        common = [c for c in a.docs.columns if c in set(b.docs.columns)]
        docs = (
            a.docs.select(common)
            .join(b_ids, "doc_id", "left_anti")
            .unionByName(b.docs.select(common))
        )
    return _reassemble(flat, doc_stats, cfg, docs)


def delete_docs(index: Index, doc_ids) -> Index:
    """Compaction: a new index with ``doc_ids`` removed and ALL global
    statistics (N, avgdl, df/idf, bm25 weights) exactly recomputed —
    value-identical to rebuilding from the surviving corpus.

    ``doc_ids``: a DataFrame with a ``doc_id`` column, or a Python
    iterable of ids (broadcast as a literal filter when small).
    """
    spark = index.postings.sparkSession
    if isinstance(doc_ids, DataFrame):
        ids_df = doc_ids.select("doc_id").distinct()
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long"
        )
    flat = flat_postings(index).join(ids_df, "doc_id", "left_anti")
    doc_stats = index.doc_stats.select("doc_id", "doc_len").join(
        ids_df, "doc_id", "left_anti"
    )
    docs = (
        index.docs.join(ids_df, "doc_id", "left_anti")
        if index.docs is not None
        else None
    )
    return _reassemble(flat, doc_stats, index.cfg, docs)
