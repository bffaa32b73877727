from search_engine_spark.streaming.incremental import (  # noqa: F401
    StreamingIndexIngest,
)
