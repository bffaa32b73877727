"""Byte-pair-encoding tokenizer, trained and applied Spark-first
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the classic word-frequency BPE, not a byte-level GPT-2
variant; the corpus here is plain text so word-level is the right
fidelity/cost point).

Why this belongs in the engine: the packing chain (textstats
pack/materialize/emit_sequences) counts whitespace tokens by default,
but a trainer consumes REAL tokenizer ids. ``bpe_encode`` produces an
``array<int>`` column that plugs straight into their ``tokens_col``
hook, so the engine can emit genuinely trainable packed sequences.

100 TB shape:
  - training never sees documents: its input is the (word, count)
    frequency table — ONE groupBy over the corpus whose output is then
    cut to the ``max_words`` most frequent words (distributed
    TakeOrdered, so the driver receives at most ``max_words`` tiny
    rows regardless of corpus size). Merge learning runs driver-side
    over that bounded table, exactly like the reference implementation
    of the paper — cost is O(vocab_size * max_words), corpus-free.
  - encoding is a NARROW Arrow pass: the merge-rank dict (a few
    thousand string pairs) is closure-captured into one pandas_udf —
    no join, no shuffle, no per-row Python. A per-batch word cache
    exploits Zipf: each distinct word in a batch is BPE-merged once.
  - the artifact is a small JSON (save/load), so a publish generation
    can pin the tokenizer next to the index artifacts.

Determinism: merge selection tie-breaks on (count desc, pair lex asc);
vocab ids are assigned base-alphabet-sorted then merge-order — two
training runs over the same frequency table produce byte-identical
artifacts, and tests pin the whole chain against an independent naive
reimplementation.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from functools import cached_property

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

END_WORD = "</w>"
UNK_ID = 0
UNK_TOKEN = "<unk>"

# ASCII whitespace, the class Java \s matches — NOT python str.split()
# (unicode): every engine that mirrors this chain (Spark F.split("\\s+"),
# the DuckDB oracle's regexp_replace, RE2) agrees on this class, and it
# keeps BPE word boundaries identical to pack_sequences' token counting
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def split_words(text: str) -> list[str]:
    """The tokenizer's pre-tokenization: ASCII-whitespace split,
    empties dropped."""
    return [w for w in _WS_RE.split(text) if w]


@dataclass(frozen=True)
class BPETokenizer:
    """An immutable trained tokenizer: ``merges`` in learned order,
    ``vocab`` symbol->id (id 0 reserved for <unk>). Pure-python
    ``encode_str`` is the semantics; ``bpe_encode`` is the same
    algorithm vectorized over a DataFrame."""

    merges: tuple[tuple[str, str], ...]
    vocab: dict[str, int]

    # cached_property writes through __dict__, so it coexists with
    # frozen=True; the hot encode loop must not rebuild this per word
    @cached_property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def encode_word(self, word: str) -> list[str]:
        """BPE-merge one pre-tokenized word into subword symbols."""
        syms = list(word) + [END_WORD]
        ranks = self.ranks
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        return syms

    def encode_str(self, text: str) -> list[int]:
        """Token ids for one text cell: ASCII-whitespace
        pre-tokenization (the same class the packing chain's Java \\s
        counts), per-word BPE, symbols outside the vocab -> UNK_ID."""
        vocab = self.vocab
        out: list[int] = []
        for word in split_words(text):
            for s in self.encode_word(word):
                out.append(vocab.get(s, UNK_ID))
        return out

    def decode_ids(self, ids: list[int]) -> str:
        """Inverse of encode_str up to whitespace normalization (and
        exactly inverse when no UNK was emitted — UNK renders U+FFFD,
        never recoverable content)."""
        inv = {i: s for s, i in self.vocab.items()}
        inv[UNK_ID] = "�"
        text = "".join(inv.get(i, "�") for i in ids)
        return text.replace(END_WORD, " ").strip()

    def to_json(self) -> str:
        return json.dumps(
            {"merges": [list(m) for m in self.merges], "vocab": self.vocab},
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, s: str) -> "BPETokenizer":
        d = json.loads(s)
        return cls(
            merges=tuple((a, b) for a, b in d["merges"]),
            vocab={k: int(v) for k, v in d["vocab"].items()},
        )

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(self.to_json())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            return cls.from_json(f.read())


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 65_536,
    max_word_len: int = 64,
) -> DataFrame:
    """The (word, cnt) frequency table BPE trains on: whitespace
    split, words longer than ``max_word_len`` dropped (they are
    Zipf-tail junk and would quadratically inflate merge counting),
    cut to the ``max_words`` most frequent (count desc, word asc —
    deterministic). One groupBy; the limit plans as TakeOrdered, so
    at any corpus size the collected table is <= max_words rows."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), "\\s+"), lambda t: t != ""
                )
            ).alias("word")
        )
        .where(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
    )


def train_bpe_from_counts(
    counts: list[tuple[str, int]], vocab_size: int
) -> BPETokenizer:
    """Learn merges from a (word, count) table — the driver-side core,
    corpus-free. ``vocab_size`` bounds |alphabet| + |merges| + 1 (the
    reserved <unk>); training stops early when no pair repeats."""
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2 (got {vocab_size})")
    # working state: each word is a symbol tuple, weighted by count
    words: list[list[str]] = []
    freqs: list[int] = []
    alphabet: set[str] = {END_WORD}
    for w, c in counts:
        if not w:
            continue
        words.append(list(w) + [END_WORD])
        freqs.append(int(c))
        alphabet.update(w)

    # BPE always retains the full base alphabet: silently dropping
    # chars beyond a sorted prefix would send every word containing a
    # dropped char to <unk> and make decode lossy (and would flip the
    # bpe_roundtrip conservation oracle red on a char-rich corpus)
    if words and vocab_size < len(alphabet) + 1:
        raise ValueError(
            f"vocab_size={vocab_size} cannot hold <unk> plus the "
            f"{len(alphabet)}-symbol base alphabet (need >= "
            f"{len(alphabet) + 1})"
        )
    vocab: dict[str, int] = {UNK_TOKEN: UNK_ID}
    for s in sorted(alphabet):
        vocab[s] = len(vocab)

    merges: list[tuple[str, str]] = []
    while len(vocab) < vocab_size:
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(words, freqs):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        best = None
        for p, c in pair_counts.items():
            if c < 2:
                continue
            if best is None or (-c, p) < (-best[1], best[0]):
                best = (p, c)
        if best is None:
            break
        (a, b), _ = best
        merged = a + b
        merges.append((a, b))
        vocab[merged] = len(vocab)
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return BPETokenizer(merges=tuple(merges), vocab=vocab)


def train_bpe(
    df: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    max_words: int = 65_536,
    max_word_len: int = 64,
) -> BPETokenizer:
    """End-to-end training: distributed frequency table -> driver-side
    merge learning. The only data crossing to the driver is the
    <= max_words (word, cnt) rows."""
    rows = word_counts(
        df, text_col=text_col, max_words=max_words, max_word_len=max_word_len
    ).collect()
    return train_bpe_from_counts(
        [(r["word"], r["cnt"]) for r in rows], vocab_size
    )


def bpe_encode(
    df: DataFrame,
    tokenizer: BPETokenizer,
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Append ``out_col: array<int>`` — the tokenizer's ids for
    ``text_col``. One closure-captured Arrow pass (merge ranks + vocab
    ride the closure, same pattern as dsir_weights' lambda vector); a
    per-batch word->ids cache collapses Zipf-repeated words to one
    merge computation each."""
    merges = tokenizer.merges
    vocab = tokenizer.vocab

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(texts: pd.Series) -> pd.Series:
        tok = BPETokenizer(merges=merges, vocab=vocab)
        cache: dict[str, list[int]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            ids: list[int] = []
            for word in split_words(t):
                got = cache.get(word)
                if got is None:
                    got = [
                        vocab.get(s, UNK_ID) for s in tok.encode_word(word)
                    ]
                    cache[word] = got
                ids.extend(got)
            out.append(ids)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_decode(
    df: DataFrame,
    tokenizer: BPETokenizer,
    ids_col: str = "token_ids",
    out_col: str = "text_decoded",
) -> DataFrame:
    """Append ``out_col: string`` — the round-trip text (whitespace
    normalized; UNK and unknown ids render U+FFFD). Pure JVM column
    algebra: id -> symbol via a map literal, concat, end-of-word ->
    space."""
    inv = {i: s for s, i in tokenizer.vocab.items()}
    inv[UNK_ID] = "�"
    mapping = F.create_map(
        *[x for i in sorted(inv) for x in (F.lit(i), F.lit(inv[i]))]
    )
    joined = F.array_join(
        F.transform(
            F.col(ids_col),
            lambda i: F.coalesce(mapping[i], F.lit("�")),
        ),
        "",
    )
    return df.withColumn(
        out_col, F.trim(F.replace(joined, F.lit(END_WORD), F.lit(" ")))
    )
