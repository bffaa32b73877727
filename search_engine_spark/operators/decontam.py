"""Eval-set decontamination for training-data pipelines.

Standard LLM training-data hygiene (GPT-3 appendix C / the Pile:
drop or flag training documents sharing any word n-gram with a held-out
evaluation set) applied to this engine's corpus model. Out of the
reference's scope (it has no train/eval split — this is one of the
training-data operators the graft adds as first-class), but it reuses
the engine's shingling exactly (``dedup.doc_shingles``: whitespace
tokens, word n-grams), so a corpus already shingled for near-dup
detection shares the work.

Shape at 100 TB: the TRAIN side is the big one — its shingles are a
narrow projection (explode + distinct inside one hash aggregate). The
EVAL side is tiny by construction (benchmarks are thousands of docs,
not billions), so its distinct-shingle set is broadcast and the
contamination check is a broadcast semi/inner join — NO shuffle of the
training corpus beyond its own per-doc distinct. ``n`` defaults to 13
(the GPT-3 choice); lower it for short-document corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    _term_hash60 as _shingle_hash60,
    doc_shingles,
)


def eval_shingles(
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Distinct shingles of the eval set — the (small) broadcast side.
    Materialize once per eval set and reuse across training shards."""
    return doc_shingles(eval_df, text_col, id_col, n).select(
        "shingle"
    ).distinct()


def contamination_stats(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, n_shared) for every training doc sharing >= 1 word
    n-gram with the eval set; n_shared counts its distinct shared
    shingles. Clean docs do not appear (at scale the contaminated set
    is a tiny fraction — emitting only hits keeps the result small).

    ``hashed=True`` joins on the shingle's 60-bit hash instead of the
    string: a 13-gram averages ~90 bytes, so a 10M-shingle eval set
    broadcasts ~900 MB as strings vs ~80 MB hashed — use it when the
    eval set is big enough for the broadcast to hurt. Measured at the
    sf corpus the string join is ~10% faster warm (the md5 per train
    shingle outweighs a tiny broadcast), so strings stay the default.
    Hash collisions only ADD contamination flags (the conservative
    direction) at ~(n_ev·n_tr)/2^60 expected pairs."""
    key = "shingle"
    ev = eval_shingles(eval_df, text_col, id_col, n)
    tr = doc_shingles(train_df, text_col, id_col, n)
    if hashed:
        key = "h"
        ev = ev.select(_shingle_hash60(F.col("shingle")).alias("h"))
        tr = tr.select(
            "doc_id", _shingle_hash60(F.col("shingle")).alias("h")
        )
    return (
        tr.join(F.broadcast(ev), key)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_hits: int = 1,
    hashed: bool = False,
) -> DataFrame:
    """Training rows with contaminated docs removed (docs sharing
    >= ``min_hits`` distinct n-grams with the eval set). Broadcast
    semi-join shape: the training table is scanned once, never
    shuffled on content."""
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1 (got {min_hits})")
    bad = contamination_stats(
        train_df, eval_df, text_col, id_col, n, hashed=hashed
    ).where(F.col("n_shared") >= min_hits).select("doc_id")
    return train_df.join(
        bad, train_df[id_col] == bad["doc_id"], "left_anti"
    )
