"""BPE tokenizer: independent naive oracle, Spark==driver identity,
determinism, round-trip, packing integration, plan shape."""

import json

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.bpe import (
    END_WORD,
    UNK_ID,
    BPETokenizer,
    bpe_decode,
    bpe_encode,
    train_bpe,
    train_bpe_from_counts,
    word_counts,
)

# ---------------------------------------------------------------- naive oracle


def naive_bpe_train(counts, vocab_size):
    """Independent reimplementation (different data layout: dict of
    symbol-tuples, re-counting from scratch each round)."""
    words = {}
    for w, c in counts:
        if w:
            words[tuple(w) + (END_WORD,)] = words.get(
                tuple(w) + (END_WORD,), 0
            ) + int(c)
    alphabet = sorted({s for w in words for s in w if len(s) == 1} | {END_WORD})
    vocab = ["<unk>"] + list(alphabet)[: max(0, vocab_size - 1)]
    merges = []
    while len(vocab) < vocab_size:
        pairs = {}
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        eligible = {p: c for p, c in pairs.items() if c >= 2}
        if not eligible:
            break
        best = min(eligible, key=lambda p: (-eligible[p], p))
        merges.append(best)
        vocab.append(best[0] + best[1])
        new_words = {}
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges, {s: i for i, s in enumerate(vocab)}


def naive_encode_word(word, merges):
    syms = list(word) + [END_WORD]
    for a, b in merges:  # apply merges in learned order
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return syms


COUNTS = [
    ("low", 5),
    ("lower", 2),
    ("newest", 6),
    ("widest", 3),
    ("new", 2),
    ("wide", 1),
]


def test_train_matches_naive_oracle():
    tok = train_bpe_from_counts(COUNTS, vocab_size=40)
    merges, vocab = naive_bpe_train(COUNTS, 40)
    assert list(tok.merges) == merges
    assert tok.vocab == vocab


def test_encode_matches_naive_merge_order():
    """Rank-greedy encode (pick the lowest-rank pair anywhere) equals
    apply-merges-in-order — the standard BPE equivalence."""
    tok = train_bpe_from_counts(COUNTS, vocab_size=40)
    for w in ["newest", "lowest", "low", "widest", "wider", "zzz", "e"]:
        assert tok.encode_word(w) == naive_encode_word(w, list(tok.merges))


def test_sennrich_example_merges():
    """The paper's worked example: est-family merges dominate."""
    tok = train_bpe_from_counts(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 30
    )
    assert tok.merges[0] == ("e", "s")
    assert tok.merges[1] == ("es", "t")
    assert ("est" + END_WORD) in tok.vocab or ("est", END_WORD) in tok.merges


def test_unk_and_empty():
    tok = train_bpe_from_counts(COUNTS, vocab_size=40)
    assert tok.encode_str("") == []
    ids = tok.encode_str("!!!")
    assert ids and all(i == UNK_ID for i in ids[:-1])


def test_vocab_too_small_for_alphabet_raises():
    # the alphabet is never truncated: a vocab that cannot hold <unk>
    # plus every base symbol would make decode lossy, so it raises
    alpha = {c for w, _ in COUNTS for c in w} | {END_WORD}
    with pytest.raises(ValueError, match="base alphabet"):
        train_bpe_from_counts(COUNTS, vocab_size=len(alpha))
    tok = train_bpe_from_counts(COUNTS, vocab_size=len(alpha) + 1)
    assert len(tok.vocab) == len(alpha) + 1


def test_json_roundtrip(tmp_path):
    tok = train_bpe_from_counts(COUNTS, vocab_size=40)
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2 == tok
    # artifact is canonical: same bytes on re-save
    assert tok2.to_json() == tok.to_json()
    json.loads(tok.to_json())  # valid JSON


# ---------------------------------------------------------------- spark side


@pytest.fixture(scope="module")
def text_df(spark):
    rows = [
        (1, "the newest shuffle join is the widest join"),
        (2, "lower the partition count for the newest scan"),
        (3, "wide rows flow lower and lower"),
        (4, ""),
        (5, "zzz unseen-chars: 42!"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


@pytest.fixture(scope="module")
def trained(text_df):
    return train_bpe(text_df, vocab_size=80)


def test_train_bpe_deterministic(text_df, trained):
    tok2 = train_bpe(text_df.repartition(7), vocab_size=80)
    assert tok2 == trained  # partitioning must not leak into the artifact


def test_word_counts_cap_and_order(text_df, spark):
    wc = word_counts(text_df, max_words=3).collect()
    assert len(wc) == 3
    # count desc, word asc
    assert wc[0]["word"] == "the" and wc[0]["cnt"] == 4
    cnts = [r["cnt"] for r in wc]
    assert cnts == sorted(cnts, reverse=True)
    # max_word_len drops junk instead of training on it
    junk = spark.createDataFrame(
        [(1, "ok " + "x" * 200)], ["doc_id", "text"]
    )
    got = {r["word"] for r in word_counts(junk, max_word_len=64).collect()}
    assert got == {"ok"}


def test_bpe_encode_matches_driver(text_df, trained):
    enc = bpe_encode(text_df, trained).select("doc_id", "text", "token_ids")
    for r in enc.collect():
        assert list(r["token_ids"]) == trained.encode_str(r["text"])


def test_bpe_encode_plan_is_narrow(text_df, trained):
    plan = bpe_encode(text_df, trained)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # closure-captured ranks: no join/shuffle


def test_bpe_decode_roundtrip(text_df, trained):
    from search_engine_spark.operators.bpe import split_words

    df = bpe_decode(bpe_encode(text_df, trained), trained)
    for r in df.select("text", "text_decoded").collect():
        # the tokenizer trained on this corpus, so every char is in
        # the alphabet: round-trip is exact for every row (UNK-lossy
        # decode is pinned in test_unk_decodes_to_replacement_char)
        assert r["text_decoded"] == " ".join(split_words(r["text"]))


def test_unk_decodes_to_replacement_char():
    tok = train_bpe_from_counts(COUNTS, vocab_size=40)
    ids = tok.encode_str("zz!")  # '!' is outside the training alphabet
    assert UNK_ID in ids
    assert "�" in tok.decode_ids(ids)
    assert "<unk>" not in tok.decode_ids(ids)


def test_ascii_whitespace_pretokenization():
    """str.split() is unicode; the tokenizer is ASCII-ws (the class
    Java \\s and the DuckDB oracle's RE2 class agree on) so every
    mirroring engine sees the same words."""
    from search_engine_spark.operators.bpe import split_words

    assert split_words("a\x0bb") == ["a", "b"]  # vertical tab splits
    assert split_words(" a\tb\nc ") == ["a", "b", "c"]
    # NBSP is unicode-only whitespace: str.split would cut here, the
    # tokenizer (and the SQL oracle) must NOT
    assert split_words("a\xa0b") == ["a\xa0b"]
    assert "a\xa0b".split() == ["a", "b"]  # the trap being avoided



def test_pack_bpe_tokens_end_to_end(text_df, trained):
    """emit_sequences over REAL token ids: budget-exact tiling and the
    concatenated stream equals the concatenated per-doc encodings."""
    from search_engine_spark.operators.textstats import emit_sequences

    enc = bpe_encode(text_df, trained).cache()
    budget = 7
    seqs = emit_sequences(
        enc, budget, tokens_col="token_ids"
    ).orderBy("seq_id").collect()
    stream = [t for r in seqs for t in r["tokens"]]
    want = [
        t
        for r in enc.orderBy("doc_id").collect()
        for t in r["token_ids"]
    ]
    assert stream == want
    assert all(r["n_tokens"] == budget for r in seqs[:-1])
    assert 1 <= seqs[-1]["n_tokens"] <= budget
    assert all(isinstance(stream[0], int) for _ in [0])
    enc.unpersist()
