"""Routed (hash-partitioned) filter: the no-broadcast scale path.
Same membership contract as the global filter — zero false negatives,
bounded FPR — plus route-merge and persistence round-trips."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.routed import RoutedCuckooFilter
from cuckoofilter_spark.params import CuckooParams

# sub-filter sized for ~N_KEYS / N_ROUTES keys each
N_KEYS = 200_000
N_ROUTES = 16
PARAMS = CuckooParams(max_table_size=2 * N_KEYS // N_ROUTES, bits_per_fp=16)


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(0, N_KEYS).select(F.col("id").alias("k")).repartition(8)


@pytest.fixture(scope="module")
def routed(spark, keys_df):
    return RoutedCuckooFilter.build(keys_df, "k", PARAMS, n_routes=N_ROUTES)


def test_no_false_negatives(spark, routed, keys_df):
    res = routed.contains(keys_df, "k")
    assert res.filter(~F.col("member")).count() == 0


def test_fpr_bounded(spark, routed):
    negs = spark.range(10_000_000, 10_100_000).select(F.col("id").alias("k"))
    n_fp = routed.contains(negs, "k").filter(F.col("member")).count()
    assert n_fp / 100_000 <= PARAMS.fpr_bound


def test_member_semi_is_exact_on_positive_probes(spark, routed, keys_df):
    sample = keys_df.filter(F.col("k") % 97 == 0)
    assert routed.member_semi(sample, "k").count() == sample.count()


def test_merge_unions_key_sets(spark, keys_df):
    a_keys = keys_df.filter(F.col("k") < N_KEYS // 2)
    b_keys = keys_df.filter(F.col("k") >= N_KEYS // 2)
    a = RoutedCuckooFilter.build(a_keys, "k", PARAMS, n_routes=N_ROUTES)
    b = RoutedCuckooFilter.build(b_keys, "k", PARAMS, n_routes=N_ROUTES)
    m = a.merge(b)
    res = m.contains(keys_df, "k")
    assert res.filter(~F.col("member")).count() == 0


def test_persist_and_load_roundtrip(spark, routed, keys_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("routed") / "state")
    saved = routed.persist(path)
    loaded = RoutedCuckooFilter.load(spark, path, PARAMS, N_ROUTES)
    for f in (saved, loaded):
        assert f.contains(keys_df, "k").filter(~F.col("member")).count() == 0
    st = loaded.stats()
    # dedup (set) semantics: distinct keys sharing a (bucket-pair, fp) are
    # stored once, so stored count can fall a hair below the key count
    assert N_KEYS * 0.999 <= st["n_keys"] <= N_KEYS
    assert st["routes_materialized"] <= N_ROUTES


def test_state_stays_small_relative_to_keys(routed):
    st = routed.stats()
    # ~2 bytes/key fingerprints + headers, zlib-packed; must be far below
    # raw key storage (8 B/key) — the point of a filter
    assert st["state_bytes"] < N_KEYS * 4
