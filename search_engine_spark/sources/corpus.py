"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Input-table shape per BASELINE.json ``input_hint``:
``(repo: string, path: string, commit: string, lang: string, content: string)``
plus derived ``doc_id: long`` (dense, deterministic) and
``sha256: string`` (the per-row invariant column).

Generation is *distributed and deterministic*: ``spark.range(n)`` fans ids
across executors and every row is a pure function of its id and the seed
(seeded per-row RNG), so the same (n, seed) yields byte-identical corpora
at any parallelism level — this is what lets the two-parallelism scaling
benchmark run on identical input without materializing it first.

The vocabulary deliberately mixes code identifiers with
Porter-interesting English forms (traveling/caresses/ponies/...),
stopwords, and >45-char / 1-char tokens so every tokenizer gate
(length, [a-z]+, stopword, stemming) fires (SURVEY.md §5 / FIXTURES F1).
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LANGS = ["py", "java", "js", "go", "md"]

# English words incl. Porter-interesting forms + stopwords + digits/mixed
_WORDS_EN = """
traveling travel traveled caresses caress ponies pony ization relational
conditional rational hesitancy digitizer operator feudalism decisiveness
hopefulness formality sensitivity triplicate formative electricity hopeful
goodness revival allowance inference airliner adjustable defensible
irritant replacement adjustment dependent adoption communism activate
angularity effective bowdlerize banana recipe apple query search engine
index token document cluster partition shuffle broadcast executor driver
the and is of to in for with on at by this that from 1 x y42
""".split()

_WORDS_CODE = """
def class import return self args kwargs lambda yield async await
public static void main string integer boolean interface extends
function const let var module exports require package func struct
spark dataframe filter groupby agg join window select explode
posting inverted bm25 pagerank stemmer tokenizer shard varint delta
""".split()

_LONG_TOKEN = "x" * 46  # exceeds MAX_WORD_LENGTH=45 → must be filtered

_VOCAB = _WORDS_EN + _WORDS_CODE + [_LONG_TOKEN, "don't", "a"]

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _row_for(i: int, seed: int) -> tuple[str, str, str, str, str]:
    rng = random.Random((seed << 32) ^ i)
    # Zipf-ish repo sizes: repo index skewed toward small numbers
    repo_idx = int(rng.paretovariate(1.2)) % 97
    repo = f"org{repo_idx % 7}/repo{repo_idx}"
    lang = _LANGS[rng.randrange(len(_LANGS))]
    path = f"src/mod{rng.randrange(20)}/file{i}.{lang}"
    commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:12]
    n_tok = rng.randrange(20, 220)
    words = [ _VOCAB[rng.randrange(len(_VOCAB))] for _ in range(n_tok) ]
    # plant exact phrase occurrences (gap tests) in ~10% of docs
    if i % 10 == 0:
        words[0:0] = ["banana", "recipe"]
    if i % 17 == 0:
        words[0:0] = ["banana", "x", "x", "x", "recipe"]  # gap > 3 negative
    content = " ".join(words)
    return repo, path, commit, lang, content


def generate_corpus(
    spark: SparkSession, n_docs: int = 1000, seed: int = 42,
    num_partitions: int | None = None, start_id: int = 0,
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` files.

    Returns columns (repo, path, commit, lang, content, doc_id, sha256).
    ``doc_id`` is the generation id — dense and deterministic (the
    generator IS the canonical (repo, path) order), so no global sort is
    needed; for external tables use :func:`assign_doc_ids`.

    ``start_id`` starts the id range at an offset: doc ``i`` here is
    byte-identical to doc ``i`` of a start-0 run (the row is a pure
    function of the id), so a delta slice [N, N+d) can be generated in
    O(d) instead of generating N+d rows and filtering — a doc_id filter
    cannot be pushed below the mapInPandas generator.
    """
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_row_for(int(i), seed) for i in pdf["id"]]
            out = pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )
            out["doc_id"] = pdf["id"].values
            yield out

    # note: StructType.add mutates in place — build a fresh schema
    schema = T.StructType(
        CORPUS_SCHEMA.fields + [T.StructField("doc_id", T.LongType())]
    )
    df = (
        spark.range(start_id, start_id + n_docs, numPartitions=num_partitions)
        .mapInPandas(gen, schema=schema)
        .withColumn("sha256", F.sha2(F.col("content"), 256))
    )
    return df


def assign_doc_ids(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Dense, deterministic doc_id for an external corpus table.

    Scale note: a global ``row_number()`` window would funnel everything
    through one partition. Instead we range-repartition on the order
    columns, sort within partitions, and use ``zipWithIndex`` — fully
    distributed with one extra job to count partition sizes.
    """
    sorted_df = df.repartitionByRange(*order_cols).sortWithinPartitions(
        *order_cols
    )
    out_schema = T.StructType(
        sorted_df.schema.fields + [T.StructField("doc_id", T.LongType())]
    )
    rdd = sorted_df.rdd.zipWithIndex().map(lambda ri: (*ri[0], ri[1]))
    return sorted_df.sparkSession.createDataFrame(rdd, out_schema)
