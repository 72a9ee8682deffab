"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship cuckoo-filter membership query at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full operator suite
(cuckoo filter build/probe/delete, Bloom/HLL/CMS/KLL/t-digest checks,
dedup / text-analysis / similarity pipeline ops) with DuckDB oracles.
Implementation lives in ``cuckoofilter_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cuckoofilter_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the distributed
    cuckoo filter over lineitem part keys, probe the part table."""
    return QUERIES["cf_member_parts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
