"""Table-source probe hardening: in an environment without the Iceberg
runtime jar the probe must answer False quickly and `read_table` must take
the parquet path cleanly — a misconfigured fallback would poison every
build upstream of it.  (With the jar present, `read_table` prefers the
Iceberg source; that branch needs a real catalog and is exercised in
deployments, not this image.)"""

import pytest

from cuckoofilter_spark.sources.table import iceberg_available, read_table


def test_probe_is_deterministic_and_cheap(spark):
    a = iceberg_available(spark)
    b = iceberg_available(spark)
    assert a == b  # stable answer, no flapping between reads


def test_read_table_falls_back_to_parquet(spark, sf_dir):
    df = read_table(spark, f"{sf_dir}/orders.parquet")
    assert df.count() > 0
    assert "o_orderkey" in df.columns


def test_read_table_forced_iceberg_raises_without_runtime(spark, sf_dir):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present — forced read would succeed")
    with pytest.raises(Exception):
        read_table(spark, f"{sf_dir}/orders.parquet", fmt="iceberg")


def test_read_table_parquet_explicit(spark, sf_dir):
    df = read_table(spark, f"{sf_dir}/lineitem.parquet", fmt="parquet")
    assert df.count() > 0
