"""Explicit skew handling (north_rule: "explicit salting/repartitioning
for skewed sources").

Where skew can and cannot hurt this engine:

- **Per-partition filter builds are skew-immune by construction**: the
  build is a narrow map over whatever partitions the scan produced — a hot
  *key* never concentrates rows, because nothing partitions by key.
  `repartition(n)` (round-robin) in `build_filter` balances *bytes*.
- **Shard-keyed builds** (`checkpointed_build`, `routed`) partition by a
  *hash* of the key, which is uniform even when the raw key distribution
  is Zipf; with dedup semantics a hot key is one fingerprint, so no shard
  is heavy.
- **Relational pipeline ops** (dedup joins, groupBys) are where real skew
  lives: a stop-gram shingle or a hot user_id concentrates a join key.
  AQE skew-join splitting is on by default (session.py); the helpers here
  are the explicit, plan-visible treatments for when the optimizer needs
  help — salting for aggregations and for joins against a replicated
  small side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt column in [0, buckets) — deterministic per row
    via a hash of the whole row rather than rand(), so retries/resumes
    assign the same salt."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                         F.lit(buckets)))


def salted_group_count(df: DataFrame, key: str, buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe grouped count: partial count by (key, salt)
    spreads a hot key over `buckets` reducers, final sums per key.
    Identical result to ``groupBy(key).count()``; bounded reducer size."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias("cnt"))


def replicated_skew_join(big: DataFrame, small: DataFrame, key: str,
                         buckets: int = 16) -> DataFrame:
    """Skew join: salt the big side, replicate the small side across every
    salt value, join on (key, salt) — the classic hot-key spreading when
    the small side fits a modest replication factor but not a broadcast.
    (With AQE on, prefer letting skew-join splitting try first.)"""
    b = with_salt(big, buckets)
    s = small.crossJoin(
        big.sparkSession.range(buckets).select(F.col("id").cast("long").alias("_salt")))
    out = b.join(s, [key, "_salt"])
    return out.drop("_salt")


# caveat: rows identical in EVERY column share a salt (content-hash).  For
# fully-duplicated hot rows pass a distinct-ish column list explicitly or
# pre-attach an ingest id; content-hashing is what keeps salt assignment
# stable across task retries and checkpoint resumes (north_rule).


def kll_range_bounds(df: DataFrame, col: str, n_parts: int,
                     k: int = 200, seed: int = 5) -> "list[float]":
    """Balanced range cut points from the distributed KLL sketch: one
    narrow pass builds the sketch (state-only shuffle — one ~KB blob per
    partition), then quantiles at i/n_parts.  This is the sketch-library
    answer to Spark's own range partitioner, whose reservoir sampling
    launches an extra collect job per sort/repartitionByRange; the KLL
    bounds are mergeable state that can be maintained incrementally
    (streaming) and reused across jobs."""
    import numpy as np

    from cuckoofilter_spark.operators.sketch_build import build_sketch
    from cuckoofilter_spark.sketches.kll import KLLSketch

    kll = build_sketch(df.select(col), col,
                       lambda pid: KLLSketch(k=k, seed=seed), values="float")
    qs = np.arange(1, n_parts) / n_parts
    return [float(v) for v in kll.quantile(qs)]


def with_range_bucket(df: DataFrame, col: str, bounds: "list[float]",
                      col_name: str = "_bucket") -> DataFrame:
    """Monotone bucket id per row from precomputed cut points (JVM-side
    chained comparisons — no UDF).  ``repartition(n, col_name)`` then
    spreads a skewed numeric column into ~equal-sized partitions; the
    bucket id is also the sort-bucket for bucketed writes."""
    bucket: Column = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(col) > F.lit(float(b))).cast("int")
    return df.withColumn(col_name, bucket.cast("long"))
