"""search_engine_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch rebuild of the indexer + ranker pipeline of the reference
single-node Java search engine (shady-2004/Search-Engine, see SURVEY.md),
re-expressed Spark-first:

- inverted-index build as DataFrame transforms + Arrow-vectorized pandas UDFs
  (tokenize/stem), range-bucketed posting shards with delta+varint codec
- DF/IDF + doc-length stats for BM25 (k1=1.2, b=0.75) and for reference
  TF-IDF parity mode (log10 IDF, 0.7/0.3 PageRank mix)
- boolean / phrase query semantics quirk-identical to the reference
  (SURVEY.md §2.9)
- partition-parallel PageRank, dedup / similarity / text-quality operators
  for a large-scale training-data pipeline.

Designed for 1000-executor clusters over Iceberg/parquet; tested on local[*].
"""

__version__ = "0.1.0"

from search_engine_spark.config import EngineConfig  # noqa: F401
