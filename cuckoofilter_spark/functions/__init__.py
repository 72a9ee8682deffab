from cuckoofilter_spark.functions.registry import (  # noqa: F401
    register_filter,
    register_sketch,
    register_sketch_aggs,
)
