from cuckoofilter_spark.streaming.incremental import (  # noqa: F401
    StreamingSketchBuilder,
    streaming_distinct_by_key,
)
