"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All hot-path expressions are JVM-side column ops (whole-stage codegen);
the only Python is the rolling-hash fingerprint variant, which is
Arrow-vectorized and optional (the md5 variant is the SQL-checkable one).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# small marker-word lists for n-gram-free heuristic language ID;
# deterministic and reproducible in plain SQL (IN-list membership counts)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "les", "des", "est", "une", "dans", "pour", "qui", "pas", "sur"),
}


def _ws_tokens(text_col: Column) -> Column:
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_ws_tokens, n_alpha_tokens): raw whitespace tokens and
    the [a-z]+, len>=2 subset (the engine's validity gate, minus
    stopword/stemming)."""
    toks = _ws_tokens(F.col(text_col))
    alpha = F.filter(
        toks, lambda t: (F.length(t) >= 2) & t.rlike("^[a-z]+$")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.size(alpha).cast("long").alias("n_alpha_tokens"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, uniq_ratio, mean_token_len, score).

    score = 0.5·min(n_tokens/100, 1) + 0.3·uniq_ratio
          + 0.2·min(mean_token_len/8, 1)
    — a lexical-quality heuristic in the spirit of Gopher/C4-style
    length/diversity filters; every term is a JVM expression.
    """
    toks = _ws_tokens(F.col(text_col))
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    total_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    uniq_ratio = F.when(n > 0, uniq / n).otherwise(F.lit(0.0))
    mean_len = F.when(n > 0, total_len / n).otherwise(F.lit(0.0))
    score = (
        0.5 * F.least(n / F.lit(100.0), F.lit(1.0))
        + 0.3 * uniq_ratio
        + 0.2 * F.least(mean_len / F.lit(8.0), F.lit(1.0))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        mean_len.alias("mean_token_len"),
        score.alias("score"),
    )


def langid(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pred_lang, hits): marker-word voting over whitespace
    tokens. argmax with lexicographic tie-break on language code so the
    result is deterministic (and SQL-reproducible)."""
    toks = _ws_tokens(F.col(text_col))

    def _hits(words):
        # NB: Spark higher-order lambdas must take only Column params —
        # close over the word list via a factory, not a default arg.
        return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")

    hit_cols = {lang: _hits(words) for lang, words in LANG_MARKERS.items()}
    # argmax by (hits DESC, lang ASC) via array_max over structs
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    hits.alias("hits"),
                    # invert lang for tie-break: max struct picks the
                    # lexicographically LARGEST second field, so negate by
                    # using a descending sort key trick: compare on
                    # (hits, reversed lang) is awkward — instead subtract
                    # a tiny deterministic epsilon per language rank.
                    F.lit(-rank).alias("rank_neg"),
                    F.lit(lang).alias("lang"),
                )
                for rank, (lang, hits) in enumerate(sorted(hit_cols.items()))
            ]
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("pred_lang"),
        best["hits"].alias("hits"),
    )


def fingerprint_md5(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fp): md5 content fingerprint (SQL-checkable)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("fp"),
    )


_ROLL_BASE = 1000003
_ROLL_MOD = (1 << 61) - 1


def rolling_hash(text: str) -> int:
    """Polynomial rolling hash of a string (driver/UDF-side),
    base 1000003 mod 2^61-1 — used for shift-resistant fingerprinting."""
    h = 0
    for ch in text:
        h = (h * _ROLL_BASE + ord(ch)) % _ROLL_MOD
    return h


def fingerprint_rolling(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fp): rolling-hash fingerprint via Arrow-batched UDF."""

    @pandas_udf(T.LongType())
    def roll(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: rolling_hash(t or ""))

    return df.select(
        F.col(id_col).alias("doc_id"), roll(F.col(text_col)).alias("fp")
    )


# --------------------------------------------------------------------------
# deterministic stratified sampling — training-data mixture control
# --------------------------------------------------------------------------

SAMPLE_BUCKETS = 10_000


def surface_tokens(text_col: Column) -> Column:
    """The engine's standard SURFACE tokenization (hashed-feature
    operators — DSIR, hashed embeddings): lowercase, split on
    non-alphanumeric runs, empties dropped. Deliberately NOT the index
    analyzer (no stemming/stopwords — those features hash raw words);
    every DuckDB oracle CTE that mirrors a hashed-feature operator
    restates exactly this definition."""
    return F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != ""
    )


def surface_tokens_py(text: str) -> list[str]:
    """Driver-side twin of ``surface_tokens`` (pinned equal where a
    scalar path mirrors a column path, e.g. embed.embed_text)."""
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _hash_bucket(id_col: Column) -> Column:
    """Stable per-row bucket in [0, SAMPLE_BUCKETS): first 8 hex chars of
    md5(id) as an integer — identical arithmetic is expressible in any
    engine (the DuckDB oracle reproduces it), unlike RNG-based
    ``DataFrame.sample``/``sampleBy`` whose draws are engine-private."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SAMPLE_BUCKETS
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row of stratum ``s`` iff its hash bucket falls below
    ``fractions[s] * SAMPLE_BUCKETS`` — deterministic mixture control
    (e.g. downsample boilerplate languages when assembling a training
    mix). Strata absent from ``fractions`` are DROPPED (explicit
    allowlist). Narrow (no shuffle, no RNG state); resolution is
    1/SAMPLE_BUCKETS of a stratum."""
    bucket = _hash_bucket(F.col(id_col))
    keep = F.lit(False)
    for stratum, frac in sorted(fractions.items()):
        keep = keep | (
            (F.col(strat_col) == stratum)
            & (bucket < int(frac * SAMPLE_BUCKETS))
        )
    return df.where(keep)


# --------------------------------------------------------------------------
# sequence packing — fixed-token-budget training sequences
# --------------------------------------------------------------------------


def temperature_fractions(
    df: DataFrame,
    budget: int,
    strat_col: str = "lang",
    temperature: float = 0.5,
) -> dict[str, float]:
    """Temperature-rebalanced mixture fractions: sampling weight
    q_s ∝ n_s^T over the strata (T=1 proportional, T→0 uniform —
    the multilingual-pretraining upsampling rule), converted to
    per-stratum KEEP fractions for a ``budget``-row target mix:

        frac_s = min(1, budget · q_s / n_s)

    Low-resource strata get fractions ABOVE their proportional share;
    a stratum whose full population is smaller than its allocation
    saturates at 1.0 (the shortfall is reported, not silently
    redistributed — rerun with a larger budget or lower T to spread
    it). Driver-side: one tiny groupBy-count collect (one row per
    stratum); weights are summed in sorted-stratum order so the float
    result is deterministic. Feed the returned dict straight into
    ``stratified_sample``."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1 (got {budget})")
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0 (got {temperature})")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strat_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return {}
    weights = {s: float(n) ** temperature for s, n in counts.items()}
    z = sum(weights[s] for s in sorted(weights))
    return {
        s: min(1.0, budget * (weights[s] / z) / counts[s])
        for s in sorted(counts)
    }


def temperature_sample(
    df: DataFrame,
    budget: int,
    strat_col: str = "lang",
    temperature: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """``df`` downsampled to a temperature-rebalanced ~``budget``-row
    training mix: ``temperature_fractions`` → ``stratified_sample``
    (deterministic md5-bucket keeps, no RNG state). Survivor count is
    budget in expectation minus saturation shortfall."""
    fracs = temperature_fractions(
        df, budget, strat_col=strat_col, temperature=temperature
    )
    return stratified_sample(
        df, fracs, strat_col=strat_col, id_col=id_col
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Concatenate-and-cut sequence packing for LM training: documents
    are laid end-to-end in ``id_col`` order (deterministic) and the
    stream is cut every ``budget`` tokens, the standard pretraining
    packing where a document may span a sequence boundary.

    Output: (doc_id, n_tokens, start_offset, seq_first, seq_last) —
    ``start_offset`` is the document's global token offset,
    ``seq_first``/``seq_last`` the ids of the sequences it lands in
    (equal unless the doc straddles a cut). A downstream tokenizer
    shards by ``seq_first`` to materialize the actual sequences.

    Scale shape: the global running token offset is a DISTRIBUTED
    prefix sum — range-partition by id, cumsum inside each partition,
    then add per-partition totals prefix-summed over the tiny
    one-row-per-partition frame (same pattern as repo_link_graph's
    boundary stitch; the only single-partition window input is one row
    per range partition). Token count is whitespace split by default;
    pass ``tokens_col`` (an array column, e.g. ``bpe_encode``'s token
    ids) to pack a REAL tokenizer's stream instead."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1 (got {budget})")
    from pyspark.sql import Window

    # filter '' after split: Java split keeps leading/trailing empties,
    # and trim() strips only 0x20 — "hello\n" must count 1, not 2
    n_tok = (
        F.size(F.col(tokens_col))
        if tokens_col is not None
        else F.size(
            F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
        )
    )
    parts = (
        df.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tokens"))
        .repartitionByRange("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    wl = Window.partitionBy("pid").orderBy("doc_id")
    local = parts.withColumn(
        "local_end", F.sum("n_tokens").over(wl)
    )
    totals = parts.groupBy("pid").agg(
        F.sum("n_tokens").alias("part_total")
    )
    wp = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # tiny: one row per range partition
    offsets = totals.withColumn(
        "part_offset", F.coalesce(F.sum("part_total").over(wp), F.lit(0))
    ).select("pid", "part_offset")
    out = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_tokens",
        (F.col("part_offset") + F.col("local_end") - F.col("n_tokens"))
        .alias("start_offset"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / budget).alias("seq_first"),
        F.floor(
            (
                F.col("start_offset")
                + F.greatest(F.col("n_tokens") - 1, F.lit(0))
            )
            / budget
        ).alias("seq_last"),
    )


def materialize_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """The exploded slice rows a trainer actually consumes (r03 verdict
    #7): one row per (sequence, document) intersection —
    (seq_id, doc_id, token_start, token_end, seq_pos) where
    [token_start, token_end) is the DOC-relative token span landing in
    sequence ``seq_id`` and ``seq_pos`` is where that span starts
    INSIDE the sequence. Every sequence except the stream's last packs
    exactly ``budget`` tokens with zero padding (pinned in
    tests/test_pack_sequences.py); empty documents contribute no rows.

    Pure integer column algebra over ``pack_sequences``'s distributed
    prefix sum — the explode is at most 1 + n_tokens/budget rows per
    doc, so the output is O(total_tokens / budget + n_docs) rows and
    never materializes token text."""
    packed = pack_sequences(
        df, budget, text_col=text_col, id_col=id_col, tokens_col=tokens_col
    )
    b = F.lit(budget)
    seq = F.col("seq_id")
    t_start = F.greatest(F.lit(0), seq * b - F.col("start_offset"))
    t_end = F.least(F.col("n_tokens"), (seq + 1) * b - F.col("start_offset"))
    return (
        packed.select(
            "doc_id",
            "n_tokens",
            "start_offset",
            F.explode(
                F.sequence(F.col("seq_first"), F.col("seq_last"))
            ).alias("seq_id"),
        )
        .select(
            seq.cast("long").alias("seq_id"),
            F.col("doc_id"),
            t_start.cast("long").alias("token_start"),
            t_end.cast("long").alias("token_end"),
            (F.col("start_offset") + t_start - seq * b)
            .cast("long")
            .alias("seq_pos"),
        )
        .where(F.col("token_end") > F.col("token_start"))
    )


def emit_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """The actual packed training sequences, one row per sequence:

    (seq_id, n_docs, n_tokens, tokens) — ``tokens`` is the sequence's
    token array (whitespace tokens by default; pass ``tokens_col`` to
    pack a real tokenizer's output, e.g. ``bpe_encode`` ids — then
    ``tokens`` carries that column's element type), assembled from the
    documents' slices in stream order.
    Every sequence except the stream's last carries exactly ``budget``
    tokens; concatenating sequences in seq_id order reproduces the
    corpus token stream in ``id_col`` order exactly — the parquet a
    trainer's data loader reads directly (add
    ``.option("maxRecordsPerFile", ...)`` on the write for fixed-size
    shards).

    Scale shape: ``materialize_sequences``'s slice rows join back to
    each document's token array (a doc ships its array once per
    sequence it touches — at most 1 + n_tokens/budget times), the
    slice projection cuts it to the piece, and ONE groupBy(seq_id)
    reassembles pieces in seq_pos order. Each grouped row is bounded
    by ``budget`` tokens, and sequences are uniformly sized by
    construction, so the exchange cannot skew regardless of document
    length distribution."""
    slices = materialize_sequences(
        df, budget, text_col=text_col, id_col=id_col, tokens_col=tokens_col
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        (
            F.col(tokens_col)
            if tokens_col is not None
            else F.filter(
                F.split(F.col(text_col), "\\s+"), lambda t: t != ""
            )
        ).alias("_toks"),
    )
    pieces = slices.join(toks, "doc_id").select(
        "seq_id",
        "seq_pos",
        F.slice(
            "_toks",
            (F.col("token_start") + 1).cast("int"),
            (F.col("token_end") - F.col("token_start")).cast("int"),
        ).alias("piece"),
    )
    return (
        pieces.groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seq_pos", "piece"))
                    ),
                    lambda x: x["piece"],
                )
            ).alias("tokens"),
        )
        .select(
            "seq_id",
            "n_docs",
            F.size("tokens").cast("long").alias("n_tokens"),
            "tokens",
        )
    )


# --------------------------------------------------------------------------
# corpus-unigram language-model scoring — fluency signal for data curation
# --------------------------------------------------------------------------


def unigram_lm_score(
    postings_flat: DataFrame, doc_stats: DataFrame
) -> DataFrame:
    """(doc_id, n_tokens, avg_logp): per-document mean log10 unigram
    probability under the corpus's OWN unigram LM — the CCNet-style
    fluency signal (documents far below the corpus mode are boilerplate
    or noise; far above are repetitive), computed without any external
    model: P(t) = cf(t) / total_tokens over the same index the engine
    already builds.

    Inputs: ``postings_flat`` = (doc_id, term, tf) exploded postings,
    ``doc_stats`` = (doc_id, doc_len). Documents with doc_len == 0
    score 0.0.

    Scale shape: one groupBy(term) over the (already doc-grouped)
    postings to get corpus frequencies, one join back on term (the
    vocabulary side is Zipf-small — AQE broadcasts it), one
    groupBy(doc_id) partial-aggregated sum. The corpus text is never
    re-tokenized and never shuffled; only (term, tf) pairs move.
    """
    cf = postings_flat.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = doc_stats.agg(
        F.sum("doc_len").cast("double").alias("total_tokens")
    )
    scored = (
        postings_flat.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.log10(F.col("cf") / F.col("total_tokens"))
            ).alias("logp_sum")
        )
    )
    return doc_stats.join(scored, "doc_id", "left").select(
        "doc_id",
        F.col("doc_len").alias("n_tokens"),
        F.when(
            F.col("doc_len") > 0,
            F.coalesce(F.col("logp_sum"), F.lit(0.0)) / F.col("doc_len"),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_logp"),
    )


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    exact: bool = True,
) -> DataFrame:
    """Frequency capping: keep at most ``cap`` documents per value of
    ``group_col`` (domain / source / shard), chosen DETERMINISTICALLY —
    the standard web-corpus step that stops a crawler-friendly host
    from dominating the training mix.

    exact=True — rank rows inside each group by (md5-bucket, id) and
    keep rank <= cap: exactly ``cap`` survivors per group. The window
    shuffles on ``group_col``, so one pathological hot domain lands in
    one task; fine up to ~10^7 rows per group.

    exact=False — the 100 TB shape for hot keys: join each row to its
    group's total count (partial-aggregated, tiny) and keep rows whose
    md5 bucket falls below cap/count of the bucket space. No window,
    no per-group single task — survivor count is cap in expectation
    (binomial spread ~sqrt(cap)), still deterministic row-by-row.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1 (got {cap})")
    bucket = _hash_bucket(F.col(id_col))
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            bucket.asc(), F.col(id_col).asc()
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap)
            .drop("_rn")
        )
    counts = df.groupBy(group_col).agg(F.count("*").alias("_gn"))
    return (
        df.join(F.broadcast(counts), group_col)
        .where(
            bucket
            < F.least(
                F.lit(float(SAMPLE_BUCKETS)),
                F.lit(float(cap * SAMPLE_BUCKETS)) / F.col("_gn"),
            )
        )
        .drop("_gn")
    )
