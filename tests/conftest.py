import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from search_engine_spark.config import EngineConfig  # noqa: E402
from search_engine_spark.oracle import oracle_build  # noqa: E402
from search_engine_spark.sources.corpus import generate_corpus  # noqa: E402

N_DOCS = 200
SEED = 42
# small shards so the sharding path is exercised even at 200 docs
TEST_CFG = EngineConfig(docs_per_shard=64, block_size=16)


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("search-engine-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_df(spark):
    return generate_corpus(spark, n_docs=N_DOCS, seed=SEED).cache()


@pytest.fixture(scope="session")
def corpus_rows(corpus_df):
    return [
        (r["doc_id"], r["content"])
        for r in corpus_df.select("doc_id", "content").collect()
    ]


@pytest.fixture(scope="session")
def oracle_idx(corpus_rows):
    return oracle_build(corpus_rows, cfg=TEST_CFG)


@pytest.fixture(scope="session")
def spark_index(corpus_df):
    from search_engine_spark.operators.index_build import build_index

    idx = build_index(corpus_df, cfg=TEST_CFG)
    idx.postings = idx.postings.cache()
    idx.term_stats = idx.term_stats.cache()
    idx.doc_stats = idx.doc_stats.cache()
    return idx
