from cuckoofilter_spark.functions.registry import register_filter, register_sketch  # noqa: F401
