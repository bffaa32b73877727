"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship BM25 top-k query at sf0.001.
``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator (see SURVEY.md §2 and search_engine_spark/driver_contract.py);
keys present in ``queries()`` but absent from ``oracle_sql()`` are
non-SQL-expressible (iterative PageRank, LSH ANN, custom hashing) and get
the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from search_engine_spark.driver_contract import q_bm25_topk
    from search_engine_spark.session import ship_package

    ship_package(spark)
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from search_engine_spark.driver_contract import QUERIES
    from search_engine_spark.session import ship_package

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from search_engine_spark.driver_contract import ORACLE_SQL

    return dict(ORACLE_SQL)
