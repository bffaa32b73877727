"""SparkSession helper with engine defaults + package shipping.

``get_spark()`` gives a session with the engine's recommended configs
(AQE, Arrow, adaptive skew join) and ships this package to executors via
``addPyFile`` — the programmatic equivalent of
``spark-submit --py-files search_engine_spark.zip`` (the north-rule
deployment mode), so UDFs deserialize on workers regardless of cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # posting shards can be wide rows; keep Arrow batches bounded
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def package_zip() -> str:
    """Zip this package for --py-files-style distribution."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(
        tempfile.gettempdir(), "search_engine_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(out, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out


def ship_package(spark: SparkSession) -> None:
    spark.sparkContext.addPyFile(package_zip())


def get_spark(
    app_name: str = "search-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    ship: bool = True,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if ship:
        ship_package(spark)
    return spark
