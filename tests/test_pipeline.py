"""End-to-end training-data hygiene pipeline (operators/pipeline.py):
each stage's survivors must equal the operator-by-operator composition,
planted artifacts (exact dups, near-dup clusters, eval contamination,
off-language docs) must fall in the RIGHT stage, and the packed slice
rows must tile the surviving corpus."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.pipeline import prepare_training_data
from search_engine_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    """Base corpus + planted hazards at reserved id ranges."""
    base = generate_corpus(spark, 150, seed=21).select(
        "doc_id", "content"
    )
    sample = [r["content"] for r in base.where("doc_id < 3").collect()]
    extras = [
        # exact duplicates of doc 0 (min-id 0 survives)
        (1000, sample[0]),
        (1001, sample[0]),
        # near-dup cluster of doc 1 (one word appended)
        (1002, sample[1] + " extra"),
        (1003, sample[1] + " extras"),
        # off-language doc (German markers)
        (1004, "der die das und ist nicht mit sich auf werden " * 30),
        # junk: English-classified (marker word) but fails the quality
        # filter (3 tokens, 1/3 unique, short): score ~0.19 < 0.3
        (1005, "the the the"),
    ]
    return base.unionByName(
        spark.createDataFrame(extras, "doc_id long, content string")
    ).cache()


def test_pipeline_stages_drop_planted_hazards(spark, corpus):
    eval_df = corpus.where(F.col("doc_id") == 2)  # contaminates doc 2
    clean, slices, report = prepare_training_data(
        corpus,
        lang="en",
        min_quality=0.3,
        exact=True,
        minhash_threshold=0.8,
        num_hashes=8,
        eval_df=eval_df,
        decontam_ngram=5,
        pack_budget=256,
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    # stage attribution
    assert 1004 not in kept                      # langid
    assert 1005 not in kept                      # quality
    assert 1000 not in kept and 1001 not in kept  # exact dedup
    assert 0 in kept                             # min-id survivor
    # near-dup cluster {1, 1002, 1003} keeps only the canonical 1
    assert 1 in kept and 1002 not in kept and 1003 not in kept
    assert 2 not in kept                         # decontam vs eval
    # report bookkeeping is exact
    assert report.counts["input"] == 156
    assert report.dropped["langid"] >= 1
    assert report.dropped["quality"] >= 1
    assert report.dropped["exact_dedup"] == 2
    assert report.dropped["near_dup"] == 2
    assert report.dropped["decontam"] >= 1
    assert report.counts["decontam"] == len(kept)

    # slices tile the SURVIVING corpus exactly
    total_tokens = (
        clean.select(
            F.size(
                F.filter(F.split("content", "\\s+"), lambda t: t != "")
            ).alias("n")
        ).agg(F.sum("n")).collect()[0][0]
    )
    got_tokens = slices.select(
        F.sum(F.col("token_end") - F.col("token_start"))
    ).collect()[0][0]
    assert got_tokens == total_tokens
    assert report.counts["slices"] == slices.count()


def test_pipeline_stages_skippable(spark, corpus):
    clean, slices, report = prepare_training_data(
        corpus,
        lang=None,
        min_quality=None,
        exact=False,
        minhash_threshold=None,
        eval_df=None,
        pack_budget=None,
    )
    assert slices is None
    assert report.counts == {"input": 156}
    assert clean.count() == 156


def test_pii_stage_scrubs_before_dedup(spark):
    """Two docs identical EXCEPT for their planted emails must collapse
    in exact dedup once the scrub runs first."""
    body = "english text the of and to in is was he for " * 5
    docs = spark.createDataFrame(
        [
            (1, body + " contact alice@example.com"),
            (2, body + " contact bob@example.com"),
            (3, "totally different english text the of and " * 6),
        ],
        ["doc_id", "content"],
    )
    clean, _, report = prepare_training_data(
        docs,
        lang=None, min_quality=None, minhash_threshold=None,
        pack_budget=None, pii=True, exact=True,
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == {1, 3}  # 2 deduped against scrubbed 1
    assert report.dropped["pii_scrub"] == 0
    assert report.dropped["exact_dedup"] == 1
    texts = {r["doc_id"]: r["content"] for r in clean.collect()}
    assert texts[1].endswith("contact <EMAIL>")


def test_source_cap_stage(spark):
    import hashlib

    rows = [
        (i, "english text the of and to in is was he for " * 5,
         "hot" if i < 30 else f"cold{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string, source string")
    clean, _, report = prepare_training_data(
        docs,
        lang=None, min_quality=None, exact=False,
        minhash_threshold=None, pack_budget=None,
        source_cap=5,
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    # every 1-doc cold source survives; the hot source is capped at 5
    assert all(i in kept for i in range(30, 40))
    hot_kept = sorted(i for i in kept if i < 30)
    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10_000
    assert hot_kept == sorted(
        sorted(range(30), key=lambda i: (bucket(i), i))[:5]
    )
    assert report.dropped["source_cap"] == 25
    # requesting the stage without the column is an explicit error
    with pytest.raises(ValueError, match="source_cap"):
        prepare_training_data(
            docs.drop("source"),
            lang=None, min_quality=None, exact=False,
            minhash_threshold=None, pack_budget=None,
            source_cap=5,
        )


def test_strip_spans_stage(spark):
    """The optional substring-dedup stage cuts a planted duplicated run
    from the non-canonical doc, keeps doc counts unchanged, and records
    its wall cost in the report."""
    run = " ".join(f"tok{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "the alpha " + run + " omega end"),
            (2, "the beta " + run + " closing words here"),
            (3, "the plain document with no repeats anywhere at all"),
        ],
        "doc_id long, content string",
    )
    clean, slices, report = prepare_training_data(
        docs,
        lang=None,
        min_quality=None,
        exact=False,
        minhash_threshold=None,
        strip_spans_min_len=8,
        eval_df=None,
        pack_budget=None,
    )
    out = {r["doc_id"]: r["content"] for r in clean.collect()}
    assert len(out) == 3 and report.dropped["strip_spans"] == 0
    assert "tok5" in out[1]          # canonical copy survives
    assert "tok5" not in out[2]      # duplicate run cut
    assert out[3].endswith("at all")  # untouched doc
    assert report.secs["strip_spans"] > 0


def test_c4_and_gopher_stages(spark):
    docs = spark.createDataFrame(
        [
            # passes C4 (3 terminal-punct lines) AND Gopher (long,
            # alphabetic, stop words, sane word lengths)
            (
                1,
                "\n".join(
                    "the quick brown fox jumps over that lazy dog and of it."
                    for _ in range(8)
                ),
            ),
            # C4 drops it: no terminal punctuation anywhere
            (2, "line one\nline two\nline three"),
            # survives C4 but Gopher drops it: too few words after
            # cleaning (3 short lines < 50 words)
            (3, "Short one.\nShort two.\nShort three."),
        ],
        ["doc_id", "content"],
    )
    clean, _, report = prepare_training_data(
        docs,
        c4_min_lines=3,
        lang=None,
        min_quality=None,
        gopher=True,
        exact=False,
        minhash_threshold=None,
        pack_budget=None,
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    clean.unpersist()
    assert kept == {1}
    assert report.counts["c4_clean"] == 2   # doc 2 fell here
    assert report.counts["gopher"] == 1     # doc 3 fell here
    assert report.dropped["c4_clean"] == 1
    assert report.dropped["gopher"] == 1


def test_dsir_stage_selects_target_like_docs(spark):
    """With a spark-flavored target, the DSIR stage keeps the
    spark-flavored survivors and the report records the stage."""
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle partition join dataframe aggregate spark"),
            (2, "hash join shuffle spark partition pruning pushdown"),
            (3, "cooking pasta sauce tomato basil garlic dinner recipe"),
            (4, "gardening roses soil watering sunlight pruning shears"),
            (5, "spark dataframe join aggregate shuffle partition scan"),
        ],
        ["doc_id", "content"],
    )
    target = spark.createDataFrame(
        [
            (100, "spark join shuffle partition dataframe"),
            (101, "aggregate scan pushdown spark dataframe join"),
        ],
        ["doc_id", "content"],
    )
    clean, _, report = prepare_training_data(
        docs,
        lang=None,
        min_quality=None,
        exact=False,
        minhash_threshold=None,
        dsir_target=target,
        dsir_k=3,
        dsir_seed=3,
        pack_budget=None,
    )
    rows = clean.collect()
    clean.unpersist()
    assert len(rows) == 3
    assert report.counts["dsir"] == 3 and report.dropped["dsir"] == 2
    # exp(w) gaps between on/off-target docs dwarf Gumbel noise here:
    # the selected 3 are exactly the spark-flavored docs
    assert {r["doc_id"] for r in rows} == {1, 2, 5}
    # survivors carry their importance weight (absolute value is
    # smoothing-dominated at toy scale; the ORDERING is what selected)
    assert all(r["dsir_weight"] is not None for r in rows)


def test_bpe_packing_stage(spark):
    """With bpe_vocab_size set the pipeline trains a tokenizer on the
    survivors, survivors gain token_ids, and slices tile the BPE token
    stream (not the whitespace stream)."""
    docs = spark.createDataFrame(
        [
            (1, "the newest shuffle join is the widest join in spark"),
            (2, "lower the partition count for the newest spark scan"),
            (3, "wide rows flow lower and lower in the newest plan"),
        ],
        ["doc_id", "content"],
    )
    clean, slices, report = prepare_training_data(
        docs,
        lang=None,
        min_quality=None,
        exact=False,
        minhash_threshold=None,
        bpe_vocab_size=60,
        pack_budget=9,
    )
    tok = report.tokenizer
    assert tok is not None and len(tok.vocab) <= 60
    rows = clean.orderBy("doc_id").collect()
    total = 0
    for r in rows:
        assert list(r["token_ids"]) == tok.encode_str(r["content"])
        total += len(r["token_ids"])
    # slices tile the BPE stream: full coverage, budget-aligned cuts
    srows = slices.orderBy("seq_id", "doc_id").collect()
    assert sum(r["token_end"] - r["token_start"] for r in srows) == total
    assert "bpe" in report.secs
    clean.unpersist()


def test_bpe_without_packing_still_tokenizes(spark):
    """--no-pack + bpe_vocab_size: survivors gain token_ids and the
    tokenizer artifact is produced even though no slices are built."""
    docs = spark.createDataFrame(
        [(1, "spark join shuffle"), (2, "lower the partition count")],
        ["doc_id", "content"],
    )
    clean, slices, report = prepare_training_data(
        docs,
        lang=None,
        min_quality=None,
        exact=False,
        minhash_threshold=None,
        bpe_vocab_size=50,
        pack_budget=None,
    )
    assert slices is None
    assert report.tokenizer is not None
    rows = clean.orderBy("doc_id").collect()
    assert all(
        list(r["token_ids"]) == report.tokenizer.encode_str(r["content"])
        for r in rows
    )
    clean.unpersist()
