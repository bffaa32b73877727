#!/usr/bin/env python
"""spark-submit entry: the full training-data hygiene pipeline
(operators/pipeline.py) — langid → quality → exact dedup → near-dup
clusters → decontamination → packed-sequence slices.

    spark-submit --py-files "$ZIP" jobs/prepare_training_data_job.py \\
        --input /path/to/docs_parquet --output /path/to/out \\
        [--text-col content] [--doc-id-col doc_id] \\
        [--c4-min-lines N] [--gopher] [--pii] \\
        [--lang en | --no-langid] [--min-quality 0.3 | --no-quality] \\
        [--no-exact-dedup] [--minhash-threshold 0.8 | --no-near-dup] \\
        [--strip-spans-min-len L] \\
        [--source-cap N [--source-col source] [--source-cap-approx]] \\
        [--eval /path/to/eval_parquet] [--ngram 13] \\
        [--dsir-target /path/to/target_parquet --dsir-k N [--dsir-seed S]] \\
        [--pack-budget 2048 | --no-pack] [--bpe-vocab V]

Writes <output>/docs (surviving corpus) and <output>/slices (trainer
slice rows, when packing is on), prints one JSON report line with
per-stage survivor/dropped counts.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument(
        "--c4-min-lines", type=int, default=None,
        help="C4 line cleaning: keep terminal-punct lines, drop pages "
        "with fewer than N survivors / lorem-ipsum / '{'",
    )
    ap.add_argument(
        "--gopher", action="store_true",
        help="apply the Gopher document-level quality rules",
    )
    ap.add_argument("--lang", default="en")
    ap.add_argument("--no-langid", action="store_true")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--no-quality", action="store_true")
    ap.add_argument("--no-exact-dedup", action="store_true")
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument(
        "--strip-spans-min-len", type=int, default=None,
        help="also cut duplicated >=L-token runs (substring-level "
        "exact dedup, one canonical copy kept corpus-wide)",
    )
    ap.add_argument(
        "--pii", action="store_true",
        help="scrub emails/IPv4/phone runs to typed tokens before dedup",
    )
    ap.add_argument(
        "--source-cap", type=int, default=None,
        help="keep at most N docs per --source-col value (hot-domain "
        "frequency cap, deterministic md5-bucket rank)",
    )
    ap.add_argument("--source-col", default="source")
    ap.add_argument(
        "--source-cap-approx", action="store_true",
        help="windowless count-join cap (survivors = N in expectation) "
        "for groups too hot for a per-group window task",
    )
    ap.add_argument("--eval")
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument(
        "--dsir-target", default=None,
        help="parquet of target-domain docs: keep the --dsir-k "
        "survivors most like it (hashed-ngram importance resampling, "
        "Gumbel-top-k; requires --dsir-k)",
    )
    ap.add_argument("--dsir-k", type=int, default=None)
    ap.add_argument("--dsir-seed", type=int, default=0)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--no-pack", action="store_true")
    ap.add_argument(
        "--bpe-vocab", type=int, default=None,
        help="train a BPE tokenizer of this vocab size on the "
        "surviving corpus and pack REAL token ids (writes "
        "<output>/tokenizer.json)",
    )
    args = ap.parse_args()
    if (args.dsir_target is None) != (args.dsir_k is None):
        ap.error("--dsir-target and --dsir-k must be given together")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("se-prepare-data").getOrCreate()

    from search_engine_spark.operators.pipeline import (
        prepare_training_data,
    )

    docs = spark.read.parquet(args.input)
    eval_df = spark.read.parquet(args.eval) if args.eval else None
    t0 = time.perf_counter()
    clean, slices, report = prepare_training_data(
        docs,
        text_col=args.text_col,
        id_col=args.doc_id_col,
        c4_min_lines=args.c4_min_lines,
        lang=None if args.no_langid else args.lang,
        min_quality=None if args.no_quality else args.min_quality,
        gopher=args.gopher,
        pii=args.pii,
        exact=not args.no_exact_dedup,
        minhash_threshold=(
            None if args.no_near_dup else args.minhash_threshold
        ),
        num_hashes=args.num_hashes,
        strip_spans_min_len=args.strip_spans_min_len,
        source_cap=args.source_cap,
        source_col=args.source_col,
        source_cap_exact=not args.source_cap_approx,
        eval_df=eval_df,
        decontam_ngram=args.ngram,
        dsir_target=(
            spark.read.parquet(args.dsir_target)
            if args.dsir_target
            else None
        ),
        dsir_k=args.dsir_k,
        dsir_seed=args.dsir_seed,
        bpe_vocab_size=args.bpe_vocab,
        pack_budget=None if args.no_pack else args.pack_budget,
    )
    clean.write.mode("overwrite").parquet(
        os.path.join(args.output, "docs")
    )
    if slices is not None:
        slices.write.mode("overwrite").parquet(
            os.path.join(args.output, "slices")
        )
    if report.tokenizer is not None:
        report.tokenizer.save(os.path.join(args.output, "tokenizer.json"))
    clean.unpersist()  # the returned frame stays persisted for the caller
    print(
        json.dumps(
            {
                "counts": report.counts,
                "dropped": report.dropped,
                "stage_secs": report.secs,
                "wall_sec": round(time.perf_counter() - t0, 2),
                "output": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
