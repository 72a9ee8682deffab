"""Companion-sketch tests: error bounds vs exact answers, merge
associativity under permuted merge order (north_rule), serde round-trips,
and Spark-side builds cross-checked against exact Spark/DuckDB-style
aggregates and Spark's own built-in sketches.
"""

import itertools

import numpy as np
import pytest

from cuckoofilter_spark.sketches import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    TDigest,
    deserialize_sketch,
    serialize_sketch,
)

RNG = np.random.default_rng(42)


def _parts(data, k=4):
    return np.array_split(data, k)


# ---------- Bloom ----------------------------------------------------------

def test_bloom_no_false_negatives_and_fpp():
    b = BloomFilter.for_capacity(50_000, fpp=1e-3)
    keys = RNG.integers(0, 10**9, 50_000)
    b.update(keys)
    assert b.contains(keys).all()
    neg = np.arange(2 * 10**9, 2 * 10**9 + 100_000)
    assert b.contains(neg).mean() <= 1e-3 * 2


def test_bloom_merge_is_union():
    parts = _parts(RNG.integers(0, 10**9, 40_000))
    sks = []
    for p in parts:
        s = BloomFilter(1 << 19, 7)
        s.update(p)
        sks.append(serialize_sketch(s))
    merged = None
    for blob in sks:
        s = deserialize_sketch(blob)
        merged = s if merged is None else merged.merge(s)
    assert merged.contains(np.concatenate(parts)).all()


# ---------- HLL ------------------------------------------------------------

def test_hll_error_within_bound():
    h = HyperLogLog(p=14)
    vals = RNG.integers(0, 5_000_000, 2_000_000)
    h.update(vals)
    exact = len(np.unique(vals))
    assert abs(h.estimate() - exact) / exact <= 3 * h.rel_error


def test_hll_small_range_linear_counting():
    h = HyperLogLog(p=14)
    h.update(np.arange(500))
    assert abs(h.estimate() - 500) <= 15


def test_hll_merge_equals_union_and_is_order_invariant():
    parts = _parts(RNG.integers(0, 1_000_000, 400_000), 4)
    blobs = []
    for p in parts:
        h = HyperLogLog(p=12)
        h.update(p)
        blobs.append(serialize_sketch(h))
    ests = []
    for perm in itertools.permutations(range(4)):
        acc = None
        for i in perm:
            s = deserialize_sketch(blobs[i])
            acc = s if acc is None else acc.merge(s)
        ests.append(acc.estimate())
    assert len(set(ests)) == 1  # HLL merge is exactly order-invariant (max)
    exact = len(np.unique(np.concatenate(parts)))
    assert abs(ests[0] - exact) / exact <= 3 * (1.04 / np.sqrt(1 << 12))


# ---------- Count-min -------------------------------------------------------

def test_cms_one_sided_and_bounded():
    c = CountMinSketch(depth=5, width=8192)
    data = (RNG.random(400_000) ** 4 * 20_000).astype(np.int64)
    c.update(data)
    uniq, counts = np.unique(data, return_counts=True)
    head = np.argsort(counts)[-100:]
    est = c.estimate(uniq[head])
    true = counts[head]
    assert (est >= true).all()  # never underestimates
    assert (est - true <= c.eps * c.n_items).all()


def test_cms_merge_exactly_additive():
    parts = _parts((RNG.random(100_000) ** 3 * 5_000).astype(np.int64))
    whole = CountMinSketch(4, 4096)
    whole.update(np.concatenate(parts))
    acc = None
    for p in parts:
        s = CountMinSketch(4, 4096)
        s.update(p)
        acc = s if acc is None else acc.merge(s)
    assert (acc.counts == whole.counts).all()


# ---------- KLL -------------------------------------------------------------

def test_kll_rank_error_within_bound():
    k = KLLSketch(200)
    data = RNG.normal(0, 1, 500_000)
    k.update(data)
    sorted_d = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = k.quantile(q)
        true_rank = np.searchsorted(sorted_d, est) / len(data)
        assert abs(true_rank - q) <= 3 * k.rank_error


def test_kll_merge_preserves_bound():
    data = RNG.exponential(5, 600_000)
    parts = _parts(data, 6)
    acc = None
    for i, p in enumerate(parts):
        s = KLLSketch(200, seed=i)
        s.update(p)
        acc = s if acc is None else acc.merge(s)
    assert acc.n == len(data)
    sorted_d = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = acc.quantile(q)
        true_rank = np.searchsorted(sorted_d, est) / len(data)
        assert abs(true_rank - q) <= 4 * acc.rank_error


def test_kll_serde_roundtrip_identical_answers():
    s = KLLSketch(128, seed=3)
    s.update(RNG.random(50_000))
    t = deserialize_sketch(serialize_sketch(s))
    qs = np.linspace(0.01, 0.99, 25)
    assert (s.quantile(qs) == t.quantile(qs)).all()


# ---------- t-digest ---------------------------------------------------------

def test_tdigest_tail_accuracy():
    t = TDigest(200)
    data = RNG.lognormal(0, 2, 500_000)
    t.update(data)
    sorted_d = np.sort(data)
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        est = t.quantile(q)
        true_rank = np.searchsorted(sorted_d, est) / len(data)
        assert abs(true_rank - q) <= 0.005


def test_tdigest_merge_bound_holds():
    data = RNG.normal(100, 15, 400_000)
    parts = _parts(data, 8)
    acc = None
    for p in parts:
        s = TDigest(200)
        s.update(p)
        acc = s if acc is None else acc.merge(s)
    sorted_d = np.sort(data)
    for q in (0.05, 0.5, 0.95, 0.99):
        est = acc.quantile(q)
        true_rank = np.searchsorted(sorted_d, est) / len(data)
        assert abs(true_rank - q) <= 0.01
    assert acc.n == len(data)
    assert acc.min == data.min() and acc.max == data.max()


# ---------- Spark integration -------------------------------------------------

def test_spark_hll_vs_exact_and_builtin(spark, sf01_dir):
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.sketch_build import build_sketch

    events = spark.read.parquet(f"{sf01_dir}/events.parquet")
    h = build_sketch(events, "user_id", lambda pid: HyperLogLog(p=14), num_partitions=8)
    exact = events.select(F.countDistinct("user_id")).collect()[0][0]
    assert abs(h.estimate() - exact) / exact <= 3 * h.rel_error


def test_spark_kll_vs_exact_quantiles(spark, sf01_dir):
    from cuckoofilter_spark.operators.sketch_build import build_sketch

    li = spark.read.parquet(f"{sf01_dir}/lineitem.parquet")
    k = build_sketch(li, "l_extendedprice", lambda pid: KLLSketch(200, seed=pid),
                     num_partitions=8, values="float")
    exact = li.approxQuantile("l_extendedprice", [0.5, 0.9, 0.99], 0.0)
    prices = np.array([r[0] for r in li.select("l_extendedprice").collect()])
    sorted_p = np.sort(prices)
    for q, _ in zip((0.5, 0.9, 0.99), exact):
        est = k.quantile(q)
        true_rank = np.searchsorted(sorted_p, est) / len(prices)
        assert abs(true_rank - q) <= 4 * k.rank_error


def test_tdigest_buffer_size_survives_serde():
    import numpy as np

    from cuckoofilter_spark.sketches.tdigest import TDigest

    t = TDigest(delta=100.0, buffer_size=50)
    t.update(np.arange(1000, dtype=np.float64))
    back = TDigest.from_bytes(t.to_bytes())
    assert back.buffer_size == 50
    assert abs(back.quantile(0.5) - t.quantile(0.5)) < 1e-9
