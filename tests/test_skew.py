"""Explicit skew treatments: salted aggregation and replicated skew join
produce exactly the unsalted answers with bounded reducer fan-in."""

import pyspark.sql.functions as F

from cuckoofilter_spark.operators.skew import (
    replicated_skew_join,
    salted_group_count,
    with_salt,
)


def zipf_df(spark):
    # 50k rows, ~70% on one hot key
    return (spark.range(50_000)
            .select(F.when(F.col("id") % 10 < 7, 0)
                    .otherwise(F.col("id") % 997).alias("k"),
                    F.col("id").alias("payload")))


def test_salted_count_exact(spark):
    df = zipf_df(spark)
    exact = {r["k"]: r["cnt"] for r in
             df.groupBy("k").agg(F.count("*").cast("long").alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_group_count(df, "k", 16).collect()}
    assert salted == exact


def test_salt_spreads_hot_key(spark):
    df = with_salt(zipf_df(spark), 16)
    per_bucket = (df.filter(F.col("k") == 0).groupBy("_salt")
                  .count().collect())
    assert len(per_bucket) == 16  # the hot key now spans every bucket
    counts = [r["count"] for r in per_bucket]
    assert max(counts) < 2.5 * min(counts)


def test_replicated_skew_join_exact(spark):
    big = zipf_df(spark)
    small = spark.createDataFrame([(0, "hot"), (1, "a"), (2, "b")], "k long, v string")
    exact = sorted((r["k"], r["payload"], r["v"])
                   for r in big.join(small, "k").collect())
    got = sorted((r["k"], r["payload"], r["v"])
                 for r in replicated_skew_join(big, small, "k", 8).collect())
    assert got == exact


def test_kll_range_buckets_balance_skewed_column(spark, sf01_dir):
    """Sketch-driven range bucketing: cut points from the distributed KLL
    split a (right-skewed) price column into near-equal buckets — the
    balanced-repartition primitive for skewed numeric sources."""
    from cuckoofilter_spark.operators.skew import kll_range_bounds, with_range_bucket
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    n_parts = 8
    bounds = kll_range_bounds(li, "l_extendedprice", n_parts)
    assert bounds == sorted(bounds) and len(bounds) == n_parts - 1
    bucketed = with_range_bucket(li, "l_extendedprice", bounds)
    sizes = {r["_bucket"]: r["n"] for r in
             bucketed.groupBy("_bucket").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(n_parts))  # every bucket non-empty
    n = sum(sizes.values())
    ideal = n / n_parts
    # KLL rank error eps ~ 1.7/k => bucket size within a few eps*n of ideal
    assert max(sizes.values()) <= 1.5 * ideal, sizes
    # bucket id is monotone in the value (range semantics, not hash)
    mm = (bucketed.groupBy("_bucket")
          .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
          .orderBy("_bucket").collect())
    for a, b in zip(mm, mm[1:]):
        assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 1e-9
