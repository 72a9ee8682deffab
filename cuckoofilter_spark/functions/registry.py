"""SQL surface: register built filters/sketches as session UDFs so
membership and estimation are queryable from ``spark.sql`` — the
"queryable for token/doc membership from SQL" obligation.

    filt = build_filter(df, "tokens", params)
    register_filter(spark, filt, "corpus_contains")
    spark.sql("SELECT * FROM candidates WHERE corpus_contains(token)")

Each registration broadcasts the serialized state once; executors
deserialize lazily and cache per worker process (see operators/membership).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from cuckoofilter_spark.operators.membership import _get_filter
from cuckoofilter_spark.sketches.base import deserialize_sketch, serialize_sketch


def register_filter(spark: SparkSession, filt, name: str = "cf_contains"):
    """Register ``name(key) -> boolean`` membership UDF for SQL use."""
    from cuckoofilter_spark.operators.membership import cf_contains_udf

    udf = cf_contains_udf(spark, filt)
    spark.udf.register(name, udf)
    return udf


# full-blob digest key: a prefix-hash key aliases two same-param sketches
# whose headers match but whose payloads diverge (see operators/membership)
_SKETCH_CACHE: dict[bytes, object] = {}


def _get_sketch(blob: bytes):
    key = hashlib.md5(blob).digest()
    s = _SKETCH_CACHE.get(key)
    if s is None:
        s = deserialize_sketch(blob)
        _SKETCH_CACHE[key] = s
    return s


def register_sketch(spark: SparkSession, sketch, name: str):
    """Register a sketch point-query UDF:

    - CountMinSketch → ``name(key) -> bigint`` (frequency estimate)
    - BloomFilter    → ``name(key) -> boolean``
    """
    import numpy as np

    bc = spark.sparkContext.broadcast(serialize_sketch(sketch))
    kind = type(sketch).__name__

    if kind == "BloomFilter":
        @pandas_udf("boolean")
        def fn(keys: pd.Series) -> pd.Series:
            s = _get_sketch(bc.value)
            return pd.Series(s.contains(keys.to_numpy(dtype=np.int64, na_value=0)))
    elif kind == "CountMinSketch":
        @pandas_udf("long")
        def fn(keys: pd.Series) -> pd.Series:
            s = _get_sketch(bc.value)
            return pd.Series(s.estimate(keys.to_numpy(dtype=np.int64, na_value=0)))
    else:
        raise ValueError(f"no SQL point-query shape for {kind}")
    spark.udf.register(name, fn)
    return fn
