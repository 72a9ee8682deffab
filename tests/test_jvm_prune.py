"""JVM-only bloom pruning path: Catalyst injects might_contain into the
probe scan and the result stays exactly equal to the plain semi join."""

import pytest

from cuckoofilter_spark.operators.jvm_prune import (
    RUNTIME_BLOOM_CONFS,
    bloom_pruned_semi_join,
    enable_runtime_bloom,
    plan_has_bloom_prune,
)


@pytest.fixture()
def bloom_spark(spark):
    """Session with runtime bloom on and broadcast joins off (injection
    only fires for shuffle joins — the 100 TB regime)."""
    old = {k: spark.conf.get(k, None) for k in RUNTIME_BLOOM_CONFS}
    old["spark.sql.autoBroadcastJoinThreshold"] = spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold")
    enable_runtime_bloom(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_injected_and_exact(bloom_spark, sf01_dir):
    spark = bloom_spark
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    sel = spark.read.parquet(f"{sf01_dir}/part.parquet").filter("p_size = 1")
    pruned = bloom_pruned_semi_join(li.select("l_partkey"), "l_partkey",
                                    sel, "p_partkey")
    assert plan_has_bloom_prune(pruned)
    exact = li.select("l_partkey").join(
        sel.select("p_partkey"),
        li["l_partkey"] == sel["p_partkey"], "left_semi")
    assert sorted(r[0] for r in pruned.collect()) == \
        sorted(r[0] for r in exact.collect())


def test_no_injection_for_broadcast_join(spark, sf01_dir):
    """With broadcast joins allowed, Spark skips the bloom (the broadcast
    hash join already prunes) — documents when this path is a no-op."""
    enable_runtime_bloom(spark)
    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    sel = spark.read.parquet(f"{sf01_dir}/part.parquet").filter("p_size = 1")
    pruned = bloom_pruned_semi_join(li.select("l_partkey"), "l_partkey",
                                    sel, "p_partkey")
    assert pruned.count() > 0  # exactness regardless of injection
