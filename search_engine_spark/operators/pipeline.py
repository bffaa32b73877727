"""End-to-end training-data preparation: the hygiene chain a 100 TB
LM-pretraining pipeline runs over a raw corpus, composed from this
repo's operators in one declarative pass per stage:

  0. C4 line cleaning    (quality.c4_apply — terminal-punct lines
                          kept, javascript/lorem-ipsum/brace pages
                          dropped; off by default)
  1. language filter     (textstats.langid — marker-word voting)
  2. quality filter      (textstats.quality_score >= min_quality)
  2b. Gopher rules       (quality.gopher_keep — word-count / word-len
                          / symbol / bullet / ellipsis / alpha /
                          stop-word gates; off by default)
  2c. PII scrub          (quality.scrub_pii — emails/IPs/phone runs
                          replaced by typed tokens; off by default)
  3. exact dedup         (dedup.exact_dedup — min-id survivor per hash)
  4. near-dup clusters   (dedup.minhash_lsh_pairs →
                          connected_components → keep-canonical)
  4b. substring dedup    (dedup.strip_duplicated_spans — duplicated
                          >= L-token runs cut, one canonical copy
                          kept corpus-wide; off by default)
  4c. source capping     (textstats.cap_per_group — at most N docs
                          per source/domain, deterministic md5-bucket
                          rank; off by default)
  5. decontamination     (decontam.decontaminate vs a held-out eval
                          set, GPT-3-style n-gram overlap)
  5b. DSIR selection     (dsir.dsir_resample — keep the k survivors
                          that look most like a target corpus, by
                          Gumbel-top-k over hashed-ngram importance
                          weights; off by default)
  5c. BPE tokenize       (operators/bpe.py — with ``bpe_vocab_size``
                          set, a tokenizer is trained on the survivors
                          and they gain a ``token_ids`` column;
                          report.tokenizer carries the artifact;
                          independent of packing)
  6. sequence packing    (textstats.materialize_sequences slice rows —
                          over REAL token ids when stage 5c ran)

Every stage is optional; stages see only the previous stage's
survivors, so each filter's wide work shrinks with the corpus. The
report counts one aggregate per stage (cheap jobs over id columns).

Scale shape: nothing here collects documents driver-side; each stage
is the operator's own audited plan (broadcast eval shingles, banded
minhash candidates, component labels over near-dups only)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PipelineReport:
    counts: dict = field(default_factory=dict)   # stage -> surviving docs
    dropped: dict = field(default_factory=dict)  # stage -> docs removed
    secs: dict = field(default_factory=dict)     # stage -> wall seconds
    tokenizer: object = None  # trained BPETokenizer when bpe_vocab_size set

    def record(
        self, stage: str, before: int, after: int,
        secs: float | None = None,
    ) -> None:
        self.counts[stage] = after
        self.dropped[stage] = before - after
        if secs is not None:
            self.secs[stage] = round(secs, 3)


def prepare_training_data(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    c4_min_lines: int | None = None,
    lang: str | None = "en",
    min_quality: float | None = 0.3,
    gopher: bool = False,
    pii: bool = False,
    exact: bool = True,
    minhash_threshold: float | None = 0.8,
    num_hashes: int = 8,
    strip_spans_min_len: int | None = None,
    source_cap: int | None = None,
    source_col: str = "source",
    source_cap_exact: bool = True,
    eval_df: DataFrame | None = None,
    decontam_ngram: int = 13,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_seed: int = 0,
    bpe_vocab_size: int | None = None,
    pack_budget: int | None = 2048,
) -> tuple[DataFrame, DataFrame | None, PipelineReport]:
    """Returns (clean_docs, slice_rows_or_None, report). Pass ``None``
    for a stage's knob to skip it (``exact=False`` to skip exact
    dedup).

    ``clean_docs`` comes back PERSISTED (the last stage's cache, kept
    so the caller's terminal write doesn't recompute the chain) —
    ``clean_docs.unpersist()`` after materializing it, or each call in
    a long-lived session leaks one corpus-sized cached frame."""
    from search_engine_spark.operators.decontam import decontaminate
    from search_engine_spark.operators.dedup import (
        drop_near_duplicates,
        exact_dedup,
        minhash_lsh_pairs,
        strip_duplicated_spans,
    )
    from search_engine_spark.operators.textstats import (
        langid,
        materialize_sequences,
        quality_score,
    )

    report = PipelineReport()
    cur = docs
    n = cur.count()
    report.counts["input"] = n

    # Each stage ends in a count() for the report; without a persist the
    # count of stage k would re-execute stages 1..k-1 every time (O(k²)
    # corpus scans). Persist the survivor frame per stage and drop the
    # previous stage's copy once the next is materialized. At 100 TB the
    # same shape holds with MEMORY_AND_DISK spill — or write each stage
    # to a table and read it back, which is what a production run of
    # jobs/prepare_training_data_job.py over petabytes would do between
    # stages; the join-back-to-text structure is unchanged either way.
    import time

    _prev: list[DataFrame] = []
    _t0 = [time.perf_counter()]

    def _materialize(df: DataFrame) -> tuple[DataFrame, int, float]:
        df = df.persist()
        cnt = df.count()
        while _prev:
            _prev.pop().unpersist()
        _prev.append(df)
        dt, _t0[0] = time.perf_counter() - _t0[0], time.perf_counter()
        return df, cnt, dt

    if c4_min_lines is not None:
        from search_engine_spark.operators.quality import c4_apply

        cur, n2, dt = _materialize(
            c4_apply(cur, text_col=text_col, min_kept_lines=c4_min_lines)
        )
        report.record("c4_clean", n, n2, secs=dt)
        n = n2

    if lang is not None:
        keep = langid(cur, text_col=text_col, id_col=id_col).where(
            F.col("pred_lang") == lang
        ).select(F.col("doc_id").alias(id_col))
        cur, n2, dt = _materialize(cur.join(keep, id_col, "left_semi"))
        report.record("langid", n, n2, secs=dt)
        n = n2

    if min_quality is not None:
        keep = quality_score(
            cur, text_col=text_col, id_col=id_col
        ).where(F.col("score") >= min_quality).select(
            F.col("doc_id").alias(id_col)
        )
        cur, n2, dt = _materialize(cur.join(keep, id_col, "left_semi"))
        report.record("quality", n, n2, secs=dt)
        n = n2

    if gopher:
        from search_engine_spark.operators.quality import gopher_keep

        cur, n2, dt = _materialize(gopher_keep(cur, text_col=text_col))
        report.record("gopher", n, n2, secs=dt)
        n = n2

    if pii:
        from search_engine_spark.operators.quality import scrub_pii

        # doc count is unchanged (text rewritten in place) — runs
        # BEFORE dedup so duplicate detection sees the scrubbed text
        cur, n2, dt = _materialize(scrub_pii(cur, text_col=text_col))
        report.record("pii_scrub", n, n2, secs=dt)
        n = n2

    if exact:
        keep = exact_dedup(cur, text_col=text_col, id_col=id_col).select(
            F.col("keep_id").alias(id_col)
        )
        cur, n2, dt = _materialize(cur.join(keep, id_col, "left_semi"))
        report.record("exact_dedup", n, n2, secs=dt)
        n = n2

    if minhash_threshold is not None:
        pairs = minhash_lsh_pairs(
            cur,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            threshold=minhash_threshold,
        )
        cur, n2, dt = _materialize(
            drop_near_duplicates(
                cur, pairs, id_col=id_col, id_a="doc_a", id_b="doc_b"
            )
        )
        report.record("near_dup", n, n2, secs=dt)
        n = n2

    if strip_spans_min_len is not None:
        # doc count is unchanged (spans are cut, docs survive) — the
        # report row records the stage's wall cost; "dropped" stays 0
        cur, n2, dt = _materialize(
            strip_duplicated_spans(
                cur, text_col=text_col, id_col=id_col,
                min_len=strip_spans_min_len,
            )
        )
        report.record("strip_spans", n, n2, secs=dt)
        n = n2

    if source_cap is not None:
        from search_engine_spark.operators.textstats import cap_per_group

        if source_col not in cur.columns:
            raise ValueError(
                f"source_cap set but column {source_col!r} is absent "
                f"(have {cur.columns})"
            )
        cur, n2, dt = _materialize(
            cap_per_group(
                cur, source_cap, group_col=source_col, id_col=id_col,
                exact=source_cap_exact,
            )
        )
        report.record("source_cap", n, n2, secs=dt)
        n = n2

    if eval_df is not None:
        cur, n2, dt = _materialize(
            decontaminate(
                cur, eval_df, text_col=text_col, id_col=id_col,
                n=decontam_ngram,
            )
        )
        report.record("decontam", n, n2, secs=dt)
        n = n2

    if dsir_target is not None and dsir_k is not None:
        from search_engine_spark.operators.dsir import dsir_resample

        # importance resampling LAST among the filters: the LM fit and
        # the k-selection should see only clean survivors. Survivors
        # gain a dsir_weight column (their log p_target/p_raw score).
        cur, n2, dt = _materialize(
            dsir_resample(
                cur, dsir_target, k=dsir_k, seed=dsir_seed,
                text_col=text_col, id_col=id_col,
            )
        )
        report.record("dsir", n, n2, secs=dt)
        n = n2

    tokens_col = None
    if bpe_vocab_size:
        # tokenizer trained on the SURVIVORS (the corpus the model will
        # actually see); survivors gain token_ids whether or not packing
        # runs, and report.tokenizer carries the artifact. Goes through
        # _materialize so the previous stage's cache is released like
        # every other stage (count == survivor count, not recorded).
        from search_engine_spark.operators.bpe import (
            bpe_encode,
            train_bpe,
        )

        tok = train_bpe(cur, vocab_size=bpe_vocab_size, text_col=text_col)
        cur, _, dt = _materialize(
            bpe_encode(cur, tok, text_col=text_col)
        )
        tokens_col = "token_ids"
        report.secs["bpe"] = dt
        report.tokenizer = tok

    slices = None
    if pack_budget:
        slices = materialize_sequences(
            cur,
            budget=pack_budget,
            text_col=text_col,
            id_col=id_col,
            tokens_col=tokens_col,
        )
        report.counts["slices"] = slices.count()
    return cur, slices, report
