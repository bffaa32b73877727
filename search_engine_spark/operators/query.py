"""Query-side operators (SURVEY.md §2.4-2.5): posting lookup, boolean
combine, phrase match, BM25/TF-IDF scoring, PageRank mix, top-k.

Plan shape for one query (SURVEY.md §3.1 "Spark shape"):
  parse on the driver (strings; Q1-Q3)
  -> postings.filter(term.isin(stems))      # parquet row-group pruning on
                                            # the term column (sorted at
                                            # save time) + min/max stats
  -> explode(postings)                      # narrow
  -> boolean semi/anti/union combine        # semi-joins on doc_id
  -> broadcast-join idf of the <=N query terms
  -> groupBy(doc_id).sum(idf·bm25_tf)       # the only wide exchange,
                                            # cardinality = candidate docs
  -> + 0.3·pagerank, orderBy(score desc, doc_id asc).limit(k)
                                            # TakeOrderedAndProject — no
                                            # global sort materialization

Quirk fidelity (SURVEY.md §2.9): AND keeps left's tf/idf (Q4), OR merge
right-wins per term + max pagerank (Q5), tie-break score DESC doc_id ASC
(Q6), phrase gap-3 chained-walk matcher (Q8), single boolean operator (Q9).
"""

from __future__ import annotations

import os
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from search_engine_spark.operators.index_build import Index
from search_engine_spark.session import local_df
from search_engine_spark.operators.parser import (
    detect_operator,
    is_phrase,
    query_stems,
    strip_phrase,
)

MATCH_COLS = ["doc_id", "term", "tf", "tf_norm", "bm25_tf", "positions"]


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.DoubleType()),
        T.StructField("bm25_tf", T.DoubleType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


def term_matches(
    index: Index, stems: list[str], base: DataFrame | None = None,
    shard_filter: DataFrame | None = None,
) -> DataFrame:
    """Q4 posting lookup: (doc_id, term, tf, tf_norm, bm25_tf, positions)
    rows for the query stems.

    Two physical paths, same output:
      * ``store_arrays=True``: explode the decoded posting arrays (pure
        JVM).
      * ``store_arrays=False`` (the at-scale layout — decoded arrays are
        not stored twice next to the codec): decode the delta+varint /
        float32 binaries in an Arrow UDF, then reconstruct ``tf_norm``
        (= tf / doc_len, not separately encoded) from doc_stats.

    ``base``: an already-decoded matches DataFrame (MATCH_COLS) covering
    a superset of ``stems`` — the batch path (``search_many``) decodes
    the union of all queries' terms ONCE and every per-query plan
    filters that shared, persisted scan instead of re-reading parquet.

    ``shard_filter``: optional one-column (shard) whitelist, broadcast
    semi-joined against the posting BLOCK rows before any decode —
    callers whose semantics bound candidates to a shard subset (phrase:
    a match needs ALL stems, and shard = doc_id // docs_per_shard is
    aligned across terms) prune whole codec blocks this way instead of
    decoding then discarding rows.
    """
    if base is not None:
        return base.filter(F.col("term").isin(list(stems)))
    rows = index.postings.filter(F.col("term").isin(list(stems)))
    if shard_filter is not None:
        rows = rows.join(F.broadcast(shard_filter), "shard", "left_semi")
    if index.cfg.store_arrays:
        return rows.select(
            "term", F.explode("postings").alias("p")
        ).select(
            F.col("p.doc_id").alias("doc_id"),
            "term",
            F.col("p.tf").alias("tf"),
            F.col("p.tf_norm").alias("tf_norm"),
            F.col("p.bm25_tf").alias("bm25_tf"),
            F.col("p.positions").alias("positions"),
        )

    import numpy as np

    from search_engine_spark.operators import codec

    def decode(batches):
        # Python loops only over (term, shard) ROWS; per-posting work is
        # numpy (decode + one concatenate per column) — the wand.py
        # pattern. This is the at-scale read path (store_arrays=False),
        # so no per-posting Python objects.
        for pdf in batches:
            ids_l, tfs_l, bms_l, pos_l, n_l = [], [], [], [], []
            for r in pdf.itertuples():
                ids = codec.delta_decode_ids(r.doc_ids_enc)
                ids_l.append(ids)
                tfs_l.append(codec.decode_tfs(r.tf_enc))
                bms_l.append(codec.decode_tfs(r.bm25_tf_enc))
                pos_l.append(codec.decode_positions(r.pos_enc, ids.size))
                n_l.append(ids.size)
            if not ids_l:
                yield pd.DataFrame(
                    {k.name: [] for k in _DECODED_SCHEMA.fields}
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids_l),
                    "term": np.repeat(
                        pdf["term"].to_numpy(), np.asarray(n_l)
                    ),
                    "tf": np.concatenate(tfs_l).astype(np.float64),
                    "bm25_tf": np.concatenate(bms_l).astype(np.float64),
                    "positions": [pl for pls in pos_l for pl in pls],
                }
            )

    decoded = rows.select(
        "term", "doc_ids_enc", "tf_enc", "bm25_tf_enc", "pos_enc"
    ).mapInPandas(decode, schema=_DECODED_SCHEMA)
    return decoded.join(index.doc_stats, "doc_id").select(
        "doc_id",
        "term",
        "tf",
        F.when(
            F.col("doc_len") > 0, F.col("tf") / F.col("doc_len")
        ).otherwise(F.lit(0.0)).alias("tf_norm"),
        "bm25_tf",
        "positions",
    )


def term_doc_ids(
    index: Index, stems: list[str], base: DataFrame | None = None
) -> DataFrame:
    """Ids-only posting lookup for AND/NOT probe sides: quirk Q4 keeps
    the LEFT side's term data regardless, so the right component only
    ever contributes a doc-id set. Decoding tf/bm25/positions for it
    (VERDICT r02 #4) was pure waste — this path reads/decodes ONLY the
    doc ids:
      * ``store_arrays=True``: explode ``postings.doc_id`` (a single
        array<long> field extraction — positions/tf arrays never
        materialize per-row),
      * ``store_arrays=False``: an Arrow stage over just the
        ``doc_ids_enc`` binary (delta+varint decode; tf/bm25/pos codecs
        untouched, and column pruning keeps them out of the scan)."""
    if base is not None:
        return base.filter(F.col("term").isin(list(stems))).select("doc_id")
    rows = index.postings.filter(F.col("term").isin(list(stems)))
    if index.cfg.store_arrays:
        return rows.select(F.explode("postings.doc_id").alias("doc_id"))

    import numpy as np

    from search_engine_spark.operators import codec

    def decode_ids(batches):
        for pdf in batches:
            arrs = [
                codec.delta_decode_ids(b) for b in pdf["doc_ids_enc"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(arrs)
                    if arrs
                    else np.empty(0, dtype=np.int64)
                }
            )

    return rows.select("doc_ids_enc").mapInPandas(
        decode_ids, schema="doc_id long"
    )


def component_doc_ids(
    index: Index, part: str, base: DataFrame | None = None
) -> DataFrame:
    """Doc-id set of one query component — the AND/NOT probe side.
    Phrase components still need positions (gap check), so they take the
    full decode; term components take the ids-only path."""
    do_stem = index.cfg.stem
    if is_phrase(part):
        return phrase_matches(
            index, query_stems(strip_phrase(part), do_stem), base=base
        ).select("doc_id")
    return term_doc_ids(index, query_stems(part, do_stem), base=base)


def _make_phrase_udf(stems: list[str], max_gap: int):
    """Vectorized wrapper over the quirk-Q8 matcher. ``plists`` arrives as
    one array<struct<term, positions>> per candidate doc."""
    from search_engine_spark.oracle import phrase_match

    order = list(stems)

    @pandas_udf(T.BooleanType())
    def phrase_ok(plists: pd.Series) -> pd.Series:
        out = []
        for entries in plists:
            by_term = {e["term"]: sorted(e["positions"]) for e in entries}
            pls = [by_term.get(s, []) for s in order]
            out.append(phrase_match(pls, max_gap))
        return pd.Series(out)

    return phrase_ok


def _phrase_matches_cogrouped(
    index: Index, stems: list[str], uniq: list[str],
    shard_filter: DataFrame | None,
) -> DataFrame:
    """Per-shard cogrouped phrase match over the posting BLOCK rows.

    The old shape decoded every stem's postings into per-doc rows, wide-
    exchanged ALL of them (positions included) through a
    groupBy(doc_id).collect_list, and gap-checked afterwards — at 8M
    docs a two-wide-stem phrase shuffled ~10M nested position arrays to
    find its candidates. Shards are doc-id ranges aligned across terms
    (index_build.py), so the intersection + gap check can instead run
    INSIDE one applyInPandas per shard over the codec binaries (present
    in BOTH physical layouts — POSTINGS_SCHEMA always carries them):
    the only exchange is the block rows themselves (n_stems × n_shards
    rows ≈ the stems' compressed postings), per-task memory is bounded
    by docs_per_shard, and only SURVIVORS join doc_stats for tf_norm.
    Semantics are byte-identical: candidates = docs holding ALL stems
    (reference HAVING count = n, QueryIndex.java:225-229), matcher =
    the same quirk-Q8 ``oracle.phrase_match`` chained walk."""
    import numpy as np

    from search_engine_spark.operators import codec
    from search_engine_spark.oracle import phrase_match

    n_uniq = len(uniq)
    order = list(stems)
    max_gap = index.cfg.phrase_max_gap
    # tf/bm25 precision must match the profile the caller scores with:
    # the arrays profile stores float64, the codec binaries are float32 —
    # on store_arrays=True ship the stored arrays (aligned with the
    # encoded doc-id run by construction), else decode the binaries.
    has_arrays = index.cfg.store_arrays
    val_cols = (
        [
            F.col("postings.tf").alias("tf_arr"),
            F.col("postings.bm25_tf").alias("bm25_arr"),
        ]
        if has_arrays
        else [F.col("tf_enc"), F.col("bm25_tf_enc")]
    )
    blocks = index.postings.filter(F.col("term").isin(uniq)).select(
        "term", "shard", "doc_ids_enc", "pos_enc", *val_cols
    )
    if shard_filter is not None:
        blocks = blocks.join(F.broadcast(shard_filter), "shard", "left_semi")

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "term": pd.Series(dtype="object"),
                "tf": pd.Series(dtype="float64"),
                "bm25_tf": pd.Series(dtype="float64"),
                "positions": pd.Series(dtype="object"),
            }
        )
        per_term = {}
        for r in pdf.itertuples():
            ids = codec.delta_decode_ids(r.doc_ids_enc)
            if has_arrays:
                tfs = np.asarray(r.tf_arr, dtype=np.float64)
                bms = np.asarray(r.bm25_arr, dtype=np.float64)
            else:
                tfs = codec.decode_tfs(r.tf_enc)
                bms = codec.decode_tfs(r.bm25_tf_enc)
            per_term[r.term] = (
                ids,
                tfs,
                bms,
                codec.decode_positions(r.pos_enc, ids.size),
            )
        if len(per_term) < n_uniq:
            return empty
        cand = None
        for ids, _tf, _bm, _pos in per_term.values():
            cand = (
                ids
                if cand is None
                else np.intersect1d(cand, ids, assume_unique=True)
            )
            if cand.size == 0:
                return empty
        # block doc-id runs are sorted by construction -> searchsorted
        locs = {t: np.searchsorted(v[0], cand) for t, v in per_term.items()}
        keep = [
            j
            for j in range(cand.size)
            if phrase_match(
                [sorted(per_term[s][3][locs[s][j]]) for s in order], max_gap
            )
        ]
        if not keep:
            return empty
        out: dict = {
            "doc_id": [], "term": [], "tf": [], "bm25_tf": [],
            "positions": [],
        }
        for t, (ids, tfs, bms, pos) in per_term.items():
            for j in keep:
                i = locs[t][j]
                out["doc_id"].append(int(cand[j]))
                out["term"].append(t)
                out["tf"].append(float(tfs[i]))
                out["bm25_tf"].append(float(bms[i]))
                out["positions"].append(pos[i])
        return pd.DataFrame(out)

    decoded = blocks.groupBy("shard").applyInPandas(
        check, schema=_DECODED_SCHEMA
    )
    return decoded.join(index.doc_stats, "doc_id").select(
        "doc_id",
        "term",
        "tf",
        F.when(
            F.col("doc_len") > 0, F.col("tf") / F.col("doc_len")
        ).otherwise(F.lit(0.0)).alias("tf_norm"),
        "bm25_tf",
        "positions",
    )


def phrase_matches(
    index: Index, stems: list[str], base: DataFrame | None = None
) -> DataFrame:
    """Q6-Q8: candidate docs containing ALL stems (countDistinct == n,
    the reference's HAVING-subquery shape, QueryIndex.java:225-229), then
    the gap-3 positional check as an Arrow UDF over nested position
    arrays — positions never explode into rows (vs the reference's
    row-per-position WordPositions table).

    Block-level prune before the decode: a phrase candidate contains
    ALL stems, and the posting layout shards by doc range
    (shard = doc_id // docs_per_shard, aligned across terms —
    index_build.py module doc), so only shards where EVERY stem has a
    posting block can contribute. The whitelist is an aggregation over
    posting BLOCK rows (≤ n_terms × n_shards rows, never entries) and
    is broadcast — a stem absent from the index (reference: empty
    phrase result, QueryIndex.java HAVING count = n) zeroes it and the
    positions codec never runs; a rare-stem phrase decodes only the
    rare stem's shards. At 8M docs the empty-stem case drops from the
    full wide-term positions decode (~8 s) to the block-row scan."""
    uniq = list(dict.fromkeys(stems))
    shard_filter = None
    if base is None and len(uniq) > 1:
        blocks = index.postings.filter(F.col("term").isin(uniq))
        shard_filter = (
            blocks.groupBy("shard")
            .agg(F.countDistinct("term").alias("nt"))
            .filter(F.col("nt") == F.lit(len(uniq)))
            .select("shard")
        )
        return _phrase_matches_cogrouped(index, stems, uniq, shard_filter)
    rows = term_matches(index, uniq, base=base, shard_filter=shard_filter)
    # collect the FULL match entries in the one candidate groupBy and
    # explode the survivors back out: the old shape semi-joined `rows`
    # against the gated candidates, which evaluated the codec decode
    # TWICE (once per plan branch) — this is one decode, one exchange
    entry = F.struct("term", "tf", "tf_norm", "bm25_tf", "positions")
    cand = (
        rows.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.collect_list(entry).alias("plists"),
        )
        .filter(F.col("n_terms") == len(uniq))
    )
    ok = cand.filter(
        _make_phrase_udf(stems, index.cfg.phrase_max_gap)(F.col("plists"))
    )
    return ok.select("doc_id", F.explode("plists").alias("e")).select(
        "doc_id",
        F.col("e.term").alias("term"),
        F.col("e.tf").alias("tf"),
        F.col("e.tf_norm").alias("tf_norm"),
        F.col("e.bm25_tf").alias("bm25_tf"),
        F.col("e.positions").alias("positions"),
    )


def combine_and(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q9/quirk Q4: intersection keeping ONLY the left side's term data
    (ref: QP.java:245-273)."""
    return left.join(right.select("doc_id").distinct(), "doc_id", "left_semi")


def combine_not(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q11: difference (ref: QP.java:327-358)."""
    return left.join(right.select("doc_id").distinct(), "doc_id", "left_anti")


def combine_or(left: DataFrame, right: DataFrame) -> DataFrame:
    """Q10/quirk Q5: union; on (doc, term) collision the RIGHT side's entry
    wins (reference putAll bias, QP.java:282-324)."""
    tagged = left.withColumn("side", F.lit(0)).unionByName(
        right.withColumn("side", F.lit(1))
    )
    return (
        tagged.groupBy("doc_id", "term")
        .agg(
            F.max_by(
                F.struct("tf", "tf_norm", "bm25_tf", "positions"), "side"
            ).alias("e")
        )
        .select(
            "doc_id",
            "term",
            F.col("e.tf").alias("tf"),
            F.col("e.tf_norm").alias("tf_norm"),
            F.col("e.bm25_tf").alias("bm25_tf"),
            F.col("e.positions").alias("positions"),
        )
    )


def component_matches(
    index: Index, part: str, base: DataFrame | None = None
) -> DataFrame:
    do_stem = index.cfg.stem  # query analyzer mirrors the index analyzer
    if is_phrase(part):
        return phrase_matches(
            index, query_stems(strip_phrase(part), do_stem), base=base
        )
    return term_matches(index, query_stems(part, do_stem), base=base)


def _query_matches(
    index: Index, query: str, base: DataFrame | None = None
) -> DataFrame:
    """Parse + component lookup + boolean combine for one query string —
    shared by search / search_paged / total_count."""
    op, left, right = detect_operator(query)
    matches = component_matches(index, left, base=base)
    if op == "OR":
        matches = combine_or(
            matches, component_matches(index, right, base=base)
        )
    elif op in ("AND", "NOT"):
        # probe side: ids-only lookup (quirk Q4 discards its term data)
        ids = component_doc_ids(index, right, base=base)
        matches = (combine_and if op == "AND" else combine_not)(
            matches, ids
        )
    return matches


def query_terms_needed(index: Index, query: str) -> list[str]:
    """Every stem any component of ``query`` will look up — the unit the
    batch path unions across queries for its single shared scan."""
    op, left, right = detect_operator(query)
    parts = [left] + ([right] if op is not None else [])
    stems: list[str] = []
    for p in parts:
        s = strip_phrase(p) if is_phrase(p) else p
        stems.extend(query_stems(s, index.cfg.stem))
    return stems


def _idf_map(index: Index, stems: list[str]) -> dict[str, float]:
    """Driver-side idf lookup for a known stem set; terms absent from
    the index are simply absent from the map.

    When the index rode through save()/load() on a local path, the
    sorted term_stats parquet is read directly with pyarrow (row-group
    stats prune to the query's term range) — ~1 ms instead of the
    ~0.4 s Spark-job floor, the same artifacts-not-jobs move as
    serving.py. Falls back to one tiny Spark job on the in-memory
    term_stats plan (fresh builds, merged indexes, remote paths)."""
    stems = list(stems)
    if index.path:
        ts_dir = os.path.join(index.path, "term_stats")
        if os.path.isdir(ts_dir):
            try:
                import pyarrow.dataset as ds

                tbl = ds.dataset(ts_dir, format="parquet").to_table(
                    columns=["term", "idf"],
                    filter=ds.field("term").isin(stems),
                )
                return {
                    t: float(v)
                    for t, v in zip(
                        tbl["term"].to_pylist(), tbl["idf"].to_pylist()
                    )
                }
            except Exception:
                pass
    return {
        r["term"]: float(r["idf"])
        for r in index.term_stats.filter(
            F.col("term").isin(stems)
        ).collect()
    }


def _idf_literal(idf_map: dict[str, float]):
    """idf as a LITERAL map expression keyed by ``term`` — zero joins in
    the scoring job (the reference's denormalized-IDF design). Empty map
    → a null column, so the not-null filter drops every row."""
    if not idf_map:
        return F.lit(None).cast("double")
    mapping = F.create_map(
        *[
            x
            for t, v in sorted(idf_map.items())
            for x in (F.lit(t), F.lit(v))
        ]
    )
    return mapping[F.col("term")]


def _mix_pagerank(
    rel: DataFrame,
    index: Index,
    page_rank: DataFrame | None,
    key_cols: list[str],
) -> DataFrame:
    """Attach page_rank (auto-attach from index.docs when present,
    else 0.0) and the 0.7·rel + 0.3·pr score — shared by the per-query
    and batch scoring paths."""
    w_rel = F.lit(index.cfg.relevance_weight)
    w_pr = F.lit(index.cfg.pagerank_weight)
    if (
        page_rank is None
        and index.docs is not None
        and "page_rank" in index.docs.columns
    ):
        page_rank = index.docs.select("doc_id", "page_rank")
    if page_rank is not None:
        rel = rel.join(page_rank, "doc_id", "left").fillna(
            {"page_rank": 0.0}
        )
    else:
        rel = rel.withColumn("page_rank", F.lit(0.0))
    return rel.select(
        *key_cols,
        "rel",
        "page_rank",
        (w_rel * F.col("rel") + w_pr * F.col("page_rank")).alias("score"),
    )


def score_matches(
    index: Index,
    matches: DataFrame,
    mode: str = "bm25",
    page_rank: DataFrame | None = None,
    stems: list[str] | None = None,
    idf_map: dict[str, float] | None = None,
) -> DataFrame:
    """R1-R4: per-doc relevance Σ idf·w(tf) + 0.7/0.3 PageRank mix.

    IDF attachment, fastest to slowest path:
      * ``idf_map`` given (or ``stems`` known → one tiny driver lookup
        on the persisted term_stats, the reference's IN-probe): idf is a
        LITERAL map expression — zero joins, zero broadcast exchange in
        the scoring job. This mirrors the reference's denormalized-IDF
        design (IDF rides next to the posting, SQLiteSearcher.java).
      * fallback: broadcast semi-join against term_stats (used when the
        caller hands a matches frame with unknown terms).
    A term absent from term_stats has no postings either, so the literal
    map and the inner join keep exactly the same rows."""
    if idf_map is None and stems:
        idf_map = _idf_map(index, stems)
    if idf_map is not None:
        weighted = matches.withColumn("idf", _idf_literal(idf_map)).where(
            F.col("idf").isNotNull()
        )
    else:
        idf = F.broadcast(
            index.term_stats.select("term", "idf").join(
                matches.select("term").distinct(), "term", "left_semi"
            )
        )
        weighted = matches.join(idf, "term")
    rel_term = (
        F.col("idf") * F.col("bm25_tf")
        if mode == "bm25"
        else F.col("idf") * F.col("tf_norm")
    )
    rel = weighted.groupBy("doc_id").agg(F.sum(rel_term).alias("rel"))
    return _mix_pagerank(rel, index, page_rank, key_cols=["doc_id"])


def search(
    index: Index,
    query: str,
    k: int | None = None,
    mode: str = "bm25",
    page_rank: DataFrame | None = None,
    base: DataFrame | None = None,
    idf_map: dict[str, float] | None = None,
) -> DataFrame:
    """Full reference-semantics search: returns the top-k
    (doc_id, rel, page_rank, score) with the Q6 deterministic tie-break."""
    k = k or index.cfg.topk_default
    matches = _query_matches(index, query, base=base)
    scored = score_matches(
        index,
        matches,
        mode=mode,
        page_rank=page_rank,
        stems=query_terms_needed(index, query),
        idf_map=idf_map,
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_paged(
    index: Index,
    query: str,
    page: int,
    size: int,
    mode: str = "bm25",
    page_rank: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """R5 pagination (ref BackendManager.java:331-356): rank the FULL
    candidate set, return (rows [page·size, page·size+size), total).
    Beyond-last-page → (empty, total) — the reference's
    ``SearchResponse(emptyList, rankedDocIds.size())``. The slice plans
    as a global-sort limit over the (small) scored set; ``total`` is the
    ranked-candidate count, exactly ``rankedDocIds.size()``."""
    if page < 0 or size <= 0:
        raise ValueError(
            f"page must be >= 0 and size >= 1 (got page={page}, size={size})"
        )
    scored = score_matches(
        index,
        _query_matches(index, query),
        mode=mode,
        page_rank=page_rank,
        stems=query_terms_needed(index, query),
    )
    scored = scored.persist()
    try:
        total = scored.count()
        start = page * size
        if start >= total:
            rows, schema = [], scored.schema
        else:
            page_df = (
                scored.orderBy(F.desc("score"), F.asc("doc_id"))
                .offset(start)
                .limit(size)
            )
            rows, schema = page_df.collect(), page_df.schema
    finally:
        # the page is <= size rows — materialize it and release the
        # cached candidate set (a per-request persist would otherwise
        # leak for the session's lifetime)
        scored.unpersist()
    spark = index.postings.sparkSession
    return local_df(spark, rows, schema), total


def search_many(
    index: Index,
    queries: list[str],
    k: int | None = None,
    mode: str = "bm25",
    page_rank: DataFrame | None = None,
) -> DataFrame:
    """Batch evaluation: one DataFrame (query, doc_id, rel, page_rank,
    score) holding every query's top-k.

    Scale shape: the expensive part of a query — posting scan + codec
    decode + explode — is done ONCE for the union of all queries' stems
    (one ``term.isin(...)`` pushed scan, persisted), and each per-query
    plan filters that shared base. The per-query combine/score stages
    then run over candidate-set-sized data only, and the union runs as
    one Spark job. Evaluation is EAGER (the result is <= k rows per
    query) so the shared scan's cache is released before returning —
    round-1 shape was N independent plans = N full scans."""
    spark = index.postings.sparkSession
    result_schema = (
        "query string, doc_id long, rel double, "
        "page_rank double, score double"
    )
    if not queries:
        return spark.createDataFrame([], result_schema)
    if len(queries) > index.cfg.batch_dispatch_threshold:
        # cost-based dispatch (mirrors the WAND single-term dispatch):
        # past the threshold the union plan's O(N) Catalyst branches and
        # single driver collect lose to the one-plan queries-as-data
        # path. Duplicate query strings are evaluated ONCE on the batch
        # plan and re-expanded per occurrence afterwards (r03 verdict
        # #9 — the old guard fell back to the O(N)-branch union path
        # whenever the batch contained a single duplicate). The final
        # sort restores this function's per-query rank order over
        # ≤ N·k already-materialized rows (overall query order is
        # lexicographic here vs input-order on the union path; callers
        # key on the ``query`` column).
        from collections import Counter

        counts = Counter(queries)
        res = search_batch(
            index, list(counts), k=k, mode=mode, page_rank=page_rank
        )
        if any(c > 1 for c in counts.values()):
            cdf = local_df(
                spark,
                [(q, c) for q, c in counts.items() if c > 1],
                "query string, _n int",
            )
            dup = (
                res.join(F.broadcast(cdf), "query")
                .withColumn(
                    "_i", F.explode(F.sequence(F.lit(2), F.col("_n")))
                )
                .drop("_n", "_i")
            )
            res = res.unionByName(dup)
        return res.select(
            "query", "doc_id", "rel", "page_rank", "score"
        ).orderBy("query", F.desc("score"), F.asc("doc_id"))
    all_stems: list[str] = []
    for q in queries:
        all_stems.extend(query_terms_needed(index, q))
    all_stems = list(dict.fromkeys(all_stems))
    base = term_matches(index, all_stems)
    persisted = len(queries) > 1 and bool(all_stems)
    if persisted:
        # eager materialization: one small job fills the cache before the
        # union plan runs, so concurrent branches never race to compute
        # the shared scan (lazy persist let every branch kick it off)
        base = base.persist()
        base.count()
    try:
        # one idf lookup for the whole batch (not one per query)
        idf_map = _idf_map(index, all_stems) if all_stems else {}
        parts = []
        for q in queries:
            parts.append(
                search(
                    index, q, k=k, mode=mode, page_rank=page_rank,
                    base=base, idf_map=idf_map,
                ).withColumn("query", F.lit(q))
            )
        union = reduce(lambda a, b: a.unionByName(b), parts)
        union = union.select(
            "query", "doc_id", "rel", "page_rank", "score"
        )
        rows = union.collect()
    finally:
        if persisted:
            base.unpersist()
    return local_df(spark, rows, result_schema)


def _batch_phrase_udf(max_gap: int):
    """Vectorized quirk-Q8 matcher for the batch plan: the stem ORDER
    arrives as a per-row array column (joined from broadcast metadata),
    so one UDF serves every phrase component in the batch."""
    from search_engine_spark.oracle import phrase_match

    @pandas_udf(T.BooleanType())
    def phrase_ok(stems_arr: pd.Series, plists: pd.Series) -> pd.Series:
        out = []
        for stems, entries in zip(stems_arr, plists):
            by_term = {e["term"]: sorted(e["positions"]) for e in entries}
            pls = [by_term.get(s, []) for s in stems]
            out.append(phrase_match(pls, max_gap))
        return pd.Series(out)

    return phrase_ok


def search_batch(
    index: Index,
    queries: list[str],
    k: int | None = None,
    mode: str = "bm25",
    page_rank: DataFrame | None = None,
) -> DataFrame:
    """Distributed batch evaluation: ONE plan for any number of queries
    (VERDICT r02 #3 — ``search_many`` unions N per-query branches, so
    Catalyst planning is O(N) and results funnel through one driver
    collect; fine for 7 queries, a ceiling for a 10k-query offline
    evaluation).

    Shape: the batch is DATA, not plan structure —
      (query, comp_id, term) rows  (driver-parsed, broadcast)
      ⋈ decoded matches on term    (broadcast hash join, no shuffle of
                                    the posting side)
      → phrase gate per (query, comp, doc) for phrase components
      → AND/NOT gate via one (query, doc_id) join against the right
        component's doc set
      → groupBy(query, doc_id).sum(idf·w)   # idf is a LITERAL map
      → two-stage per-query top-k            # tournament: top-k per
        (query, doc_id%16) bucket, then top-k per query — a hot query's
        candidate set never lands in a single window partition
    Result (query, doc_id, rel, page_rank, score) is eagerly
    ``localCheckpoint``-ed (executor-side materialization, ≤k rows per
    query — the driver never funnels the rows) so the shared decoded
    scan can be released before returning.

    Quirk semantics identical to ``search``/``search_many``: AND scores
    the LEFT side only (Q4), OR unions (doc, term) pairs (the Q5
    right-wins bias is value-neutral — both sides read the same index),
    NOT anti-joins, phrase uses the gap-``max_gap`` matcher (Q8),
    tie-break score DESC doc_id ASC (Q6). Duplicate query strings are
    evaluated once."""
    spark = index.postings.sparkSession
    k = k or index.cfg.topk_default
    result_schema = (
        "query string, doc_id long, rel double, "
        "page_rank double, score double"
    )
    queries = list(dict.fromkeys(queries))
    if not queries:
        return spark.createDataFrame([], result_schema)

    do_stem = index.cfg.stem
    # (query, comp_id, term, scoring, op, is_phr)
    comp_rows: list[tuple] = []
    phrase_rows: list[tuple] = []  # (query, comp_id, stems, n_uniq)
    all_stems: list[str] = []
    has_gate = False
    for q in queries:
        op, left, right = detect_operator(q)
        comps = [(0, left)] + ([(1, right)] if op is not None else [])
        for cid, part in comps:
            phr = is_phrase(part)
            stems = query_stems(strip_phrase(part) if phr else part, do_stem)
            uniq = list(dict.fromkeys(stems))
            scoring = cid == 0 or op == "OR"
            has_gate = has_gate or (cid == 1 and op in ("AND", "NOT"))
            for t in uniq:
                comp_rows.append((q, cid, t, scoring, op or "", phr))
            if phr and uniq:
                phrase_rows.append((q, cid, stems, len(uniq)))
        all_stems.extend(query_terms_needed(index, q))
    all_stems = list(dict.fromkeys(all_stems))

    if not comp_rows or not all_stems:
        return spark.createDataFrame([], result_schema)

    comp_terms = local_df(
        spark, comp_rows, "query string, comp_id int, term string, "
        "scoring boolean, op string, is_phr boolean"
    )
    base = term_matches(index, all_stems).persist()
    matched = F.broadcast(comp_terms).join(base, "term")

    # phrase gate: (query, comp_id, doc_id) rows passing all-terms +
    # gap check, one groupBy over phrase-component rows only
    if phrase_rows:
        pmeta = F.broadcast(
            local_df(
                spark,
                phrase_rows,
                "query string, comp_id int, stems array<string>, "
                "n_uniq int",
            )
        )
        pcand = (
            matched.filter(F.col("is_phr"))
            .groupBy("query", "comp_id", "doc_id")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.collect_list(F.struct("term", "positions")).alias(
                    "plists"
                ),
            )
            .join(pmeta, ["query", "comp_id"])
            .filter(F.col("n_terms") == F.col("n_uniq"))
        )
        phrase_ok = pcand.filter(
            _batch_phrase_udf(index.cfg.phrase_max_gap)(
                F.col("stems"), F.col("plists")
            )
        ).select("query", "comp_id", "doc_id")

    def _restrict_phrase(df):
        """Keep only phrase-passing docs for phrase components; plain
        components pass through untouched (the ``is_phr`` flag rides in
        from the broadcast comp_terms metadata — no per-query plan
        structure)."""
        if not phrase_rows:
            return df
        plain = df.filter(~F.col("is_phr"))
        phr = df.filter(F.col("is_phr")).join(
            phrase_ok, ["query", "comp_id", "doc_id"], "left_semi"
        )
        return plain.unionByName(phr)

    scoring = _restrict_phrase(matched.filter(F.col("scoring"))).select(
        "query", "op", "doc_id", "term", "bm25_tf", "tf_norm"
    ).dropDuplicates(["query", "doc_id", "term"])

    if has_gate:
        right_docs = (
            _restrict_phrase(
                matched.filter(
                    (F.col("comp_id") == 1) & F.col("op").isin("AND", "NOT")
                )
            )
            .select("query", "doc_id")
            .distinct()
            .withColumn("_gate", F.lit(True))
        )
        scoring = scoring.join(
            right_docs, ["query", "doc_id"], "left"
        ).filter(
            F.when(F.col("op") == "AND", F.col("_gate").isNotNull())
            .when(F.col("op") == "NOT", F.col("_gate").isNull())
            .otherwise(F.lit(True))
        ).drop("_gate")

    idf_map = _idf_map(index, all_stems)
    if not idf_map:
        base.unpersist()
        return spark.createDataFrame([], result_schema)
    w_col = F.col("bm25_tf") if mode == "bm25" else F.col("tf_norm")
    weighted = scoring.withColumn("idf", _idf_literal(idf_map)).where(
        F.col("idf").isNotNull()
    )
    rel = weighted.groupBy("query", "doc_id").agg(
        F.sum(F.col("idf") * w_col).alias("rel")
    )
    scored = _mix_pagerank(
        rel, index, page_rank, key_cols=["query", "doc_id"]
    )

    from pyspark.sql import Window

    order = [F.desc("score"), F.asc("doc_id")]
    stage1 = Window.partitionBy(
        "query", F.pmod(F.col("doc_id"), F.lit(16))
    ).orderBy(*order)
    stage2 = Window.partitionBy("query").orderBy(*order)
    topk = (
        scored.withColumn("_r", F.row_number().over(stage1))
        .filter(F.col("_r") <= k)
        .withColumn("_r", F.row_number().over(stage2))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    out = topk.localCheckpoint(eager=True)
    base.unpersist()
    return out


class QueryCache:
    """Q12 (ref QP.java:25-37): access-ordered LRU over materialized
    query results, 1000 entries like the reference. Driver-side by
    design — the cache stores collected top-k rows, not DataFrames, so a
    hit does zero cluster work (the reference's <5 ms cached-query
    path). Keyed on (query, k, mode)."""

    def __init__(self, index: Index, maxsize: int = 1000):
        from collections import OrderedDict

        self.index = index
        self.maxsize = maxsize
        self._d = OrderedDict()
        self.hits = 0
        self.misses = 0

    def search(self, query: str, k: int | None = None, mode: str = "bm25"):
        key = (query, k, mode)
        if key in self._d:
            self._d.move_to_end(key)
            self.hits += 1
            return list(self._d[key])  # copy: callers must not mutate
        self.misses += 1
        rows = search(self.index, query, k=k, mode=mode).collect()
        self._d[key] = rows
        if len(self._d) > self.maxsize:
            self._d.popitem(last=False)
        return list(rows)


def total_count(index: Index, query: str) -> int:
    """Q13 (ref BackendManager.java:96-119): COUNT(DISTINCT doc_id) over
    the query's candidate set. (Dead code in the reference — search()
    uses documents.size() instead — kept for API parity.)"""
    return (
        _query_matches(index, query).select("doc_id").distinct().count()
    )


def attach_doc_metadata(
    results: DataFrame, docs: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """R6 (ref BackendManager.java:358-396): join result rows back to the
    document table for display columns, preserving rank order. The
    reference emulates order-preservation with ORDER BY CASE; here the
    score column rides along and a final orderBy restores rank."""
    cols = cols or [c for c in ("repo", "path", "url", "title") if c in docs.columns]
    out = results.join(
        docs.select("doc_id", *cols), "doc_id", "left"
    )
    return out.orderBy(F.desc("score"), F.asc("doc_id"))
