"""KMV (bottom-k / theta-family) sketch: estimate accuracy, merge laws,
serde, and the set-operation advantage over HLL inclusion–exclusion on
small intersections."""

import numpy as np
import pytest

from cuckoofilter_spark.sketches import deserialize_sketch, serialize_sketch
from cuckoofilter_spark.sketches.hll import HyperLogLog, intersection_estimate
from cuckoofilter_spark.sketches.kmv import (
    KMVSketch,
    kmv_intersection_estimate,
    kmv_jaccard_estimate,
    kmv_union_estimate,
)


def test_exact_below_k():
    s = KMVSketch(k=256, seed=1)
    s.update(np.arange(100, dtype=np.int64))
    s.update(np.arange(100, dtype=np.int64))  # idempotent on duplicates
    assert s.estimate() == 100.0


@pytest.mark.parametrize("n", [10_000, 100_000])
def test_estimate_within_3sigma(n):
    s = KMVSketch(k=1024, seed=7)
    s.update(np.arange(n, dtype=np.int64))
    assert abs(s.estimate() - n) / n <= 3 * s.rel_error


def test_merge_equals_single_build_and_is_associative():
    keys = np.arange(50_000, dtype=np.int64)
    whole = KMVSketch(k=512, seed=3)
    whole.update(keys)
    parts = []
    for i in range(5):
        p = KMVSketch(k=512, seed=3)
        p.update(keys[i::5])
        parts.append(p)
    lr = parts[0].copy()
    for p in parts[1:]:
        lr.merge(p)
    rl = parts[4].copy()
    for p in reversed(parts[:4]):
        rl.merge(p)
    assert np.array_equal(lr.values, whole.values)
    assert np.array_equal(lr.values, rl.values)  # merge-order invariant


def test_serde_roundtrip():
    s = KMVSketch(k=128, seed=9)
    s.update(np.arange(10_000, dtype=np.int64))
    t = deserialize_sketch(serialize_sketch(s))
    assert isinstance(t, KMVSketch)
    assert np.array_equal(t.values, s.values)
    assert t.estimate() == s.estimate()


def test_set_ops_beat_hll_on_small_intersection():
    """The reason KMV exists here: a 1% overlap of two 100k-key sets.
    HLL inclusion–exclusion error is on the union's scale; KMV sample
    agreement is tight relative to the intersection itself."""
    rng = np.random.default_rng(5)
    a_keys = np.arange(0, 100_000, dtype=np.int64)
    b_keys = np.arange(99_000, 199_000, dtype=np.int64)  # overlap 1_000
    ka, kb = KMVSketch(k=4096, seed=2), KMVSketch(k=4096, seed=2)
    ka.update(a_keys)
    kb.update(b_keys)
    ha, hb = HyperLogLog(p=12, seed=2), HyperLogLog(p=12, seed=2)
    ha.update(a_keys)
    hb.update(b_keys)

    true_inter = 1_000.0
    kmv_err = abs(kmv_intersection_estimate(ka, kb) - true_inter)
    hll_err = abs(intersection_estimate(ha, hb) - true_inter)
    # KMV relative error on the intersection stays bounded; HLL's is on
    # the union scale (199k·1.6% ≈ 3200 — bigger than the intersection)
    assert kmv_err <= 0.5 * true_inter, kmv_err
    assert kmv_err < hll_err

    u = kmv_union_estimate(ka, kb)
    assert abs(u - 199_000) / 199_000 <= 3 * ka.rel_error
    j = kmv_jaccard_estimate(ka, kb)
    assert abs(j - true_inter / 199_000) <= 0.01


def test_rides_the_distributed_build(spark):
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.sketch_build import build_sketch

    df = spark.range(0, 60_000).select(F.col("id").alias("k"))
    s = build_sketch(df, "k", lambda pid: KMVSketch(k=1024, seed=7),
                     num_partitions=8)
    assert abs(s.estimate() - 60_000) / 60_000 <= 3 * s.rel_error
