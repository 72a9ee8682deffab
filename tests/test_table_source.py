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


def test_iceberg_membership_end_to_end(spark, sf_dir, tmp_path):
    """When the iceberg-spark-runtime jar IS present (deployments; not
    this image — no network to fetch it, see NOTES_r3), build a real
    hadoop-catalog table and run a membership build+probe against it.
    Skips with the environment reason otherwise."""
    if not iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar in image (offline sandbox)")
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.build import build_filter
    from cuckoofilter_spark.operators.membership import membership_df
    from cuckoofilter_spark.params import CuckooParams

    spark.conf.set("spark.sql.catalog.local",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.writeTo("local.db.orders").using("iceberg").createOrReplace()
    tbl = read_table(spark, "local.db.orders", fmt="iceberg")
    filt = build_filter(tbl.select("o_custkey"), "o_custkey",
                        CuckooParams(max_table_size=65536))
    probes = tbl.select(F.col("o_custkey").alias("k")).distinct()
    n = membership_df(spark, filt, probes, "k").count()
    assert n == probes.count()  # no false negatives through the iceberg scan

    # checkpointed build resumes over the snapshot-consistent iceberg scan:
    # interrupt after 3 shards, resume, and the merged filter must agree
    from cuckoofilter_spark.operators.checkpointed_build import (
        CheckpointedBuild,
    )

    params = CuckooParams(max_table_size=65536)
    cb = CheckpointedBuild(spark, str(tmp_path / "ckpt"), params,
                           "o_custkey", n_shards=8)
    m1 = cb.run(tbl, max_shards=3)
    assert m1["shards_built"] == 3
    m2 = cb.run(tbl)
    assert m2["shards_skipped"] == 3
    resumed = cb.finalize()
    keys = [r[0] for r in probes.limit(500).collect()]
    import numpy as np

    assert resumed.contains(np.asarray(keys, dtype=np.int64)).all()
