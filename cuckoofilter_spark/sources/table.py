"""Table source abstraction: Iceberg when available, parquet otherwise.

The production target (north_rule) is an Iceberg table of pre-tokenized
sequences.  This sandbox image ships no iceberg-spark-runtime jar, so
``read_table`` probes for the Iceberg data source and falls back to
parquet — every operator in this library takes a DataFrame, so the scan
format is the ONLY thing that changes between environments.  What Iceberg
adds at 100 TB (and why the operators already assume it): partition
pruning + min/max file skipping on the scan (our builds project a single
column, so pruned scans are the dominant saving), snapshot-consistent
resumable reads for the checkpointed build, and `route`-keyed state
tables for the routed filter with partition-level pruning on probe."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, location: str,
               fmt: str | None = None) -> DataFrame:
    """Read `location` as an Iceberg table identifier/path when the runtime
    is present (or ``fmt="iceberg"`` is forced), else as parquet."""
    if fmt == "iceberg" or (fmt is None and iceberg_available(spark)
                            and not location.endswith(".parquet")):
        try:
            return spark.read.format("iceberg").load(location)
        except Exception:  # noqa: BLE001 — not an iceberg location
            if fmt == "iceberg":
                raise
    return spark.read.parquet(location)
