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


def test_routed_delete(spark):
    """Distributed delete parity (DCF/dynamic_cuckoo_filter.h:393-416 on
    the routed surface): delete evens, odds stay, evens drop to FP noise,
    element counts fall by exactly the number of deleted copies."""
    n = 50_000
    params = CuckooParams(max_table_size=2 * n // N_ROUTES, bits_per_fp=16)
    keys = spark.range(0, n).select(F.col("id").alias("k")).repartition(8)
    routed = RoutedCuckooFilter.build(keys, "k", params, n_routes=N_ROUTES,
                                      dedup=False)
    routed.state = routed.state.persist()
    evens = keys.filter(F.col("k") % 2 == 0)
    odds = keys.filter(F.col("k") % 2 == 1)
    n_before = routed.stats()["n_keys"]

    after = routed.delete(evens, "k")
    after.state = after.state.persist()
    n_after = after.stats()["n_keys"]
    assert n_before - n_after == n // 2  # every delete found its copy

    assert after.contains(odds, "k").filter(~F.col("member")).count() == 0
    still = after.contains(evens, "k").filter(F.col("member")).count()
    assert still <= max(3, int(3 * params.fpr_bound * (n // 2)))
    # untouched routes' state must survive a delete whose keys miss them:
    assert after.state.count() == routed.state.count()
    routed.state.unpersist()
    after.state.unpersist()


def test_routed_delete_on_set_semantics_removes_membership(spark):
    keys = spark.range(0, 20_000).select(F.col("id").alias("k"))
    params = CuckooParams(max_table_size=4096, bits_per_fp=16)
    routed = RoutedCuckooFilter.build(keys, "k", params, n_routes=8, dedup=True)
    sub = keys.filter(F.col("k") < 1000)
    after = routed.delete(sub, "k")
    after.state = after.state.persist()
    hits = after.contains(sub, "k").filter(F.col("member")).count()
    assert hits <= max(3, int(3 * params.fpr_bound * 1000))
    rest = keys.filter(F.col("k") >= 1000)
    assert after.contains(rest, "k").filter(~F.col("member")).count() == 0
    after.state.unpersist()


def test_partitioned_persist_prunes_routes(spark, routed, keys_df, tmp_path_factory):
    """Route-partitioned state layout: probing is still exact, and a
    route-sliced read prunes the other routes' files at the scan (the
    Iceberg-style point-lookup path)."""
    from cuckoofilter_spark.plans import read_schema_columns

    path = str(tmp_path_factory.mktemp("routedp") / "state")
    saved = routed.persist(path, partition_by_route=True)
    assert saved.contains(keys_df, "k").filter(~F.col("member")).count() == 0
    one = saved.state.filter(F.col("route") == 3)
    # partition pruning: route is a partition column, not data read
    assert "route" not in read_schema_columns(one)
    assert one.count() == 1


def test_pre_dedup_build_same_answers(spark):
    """Map-side-deduped build = plain build on a duplicate-heavy (Zipf-ish)
    stream: identical membership answers, shuffle carries distinct keys."""
    from pyspark.sql import functions as F

    keys = (spark.range(0, 200_000)
            .select(F.pmod(F.col("id") * F.col("id"), F.lit(5000)).alias("k")))
    params = CuckooParams(max_table_size=2048, bits_per_fp=16)
    plain = RoutedCuckooFilter.build(keys, "k", params, n_routes=8,
                                     pre_dedup=False)
    deduped = RoutedCuckooFilter.build(keys, "k", params, n_routes=8)  # auto-on
    probes = spark.range(0, 10_000).select(F.col("id").alias("k"))
    a = {r["k"]: r["member"] for r in plain.contains(probes, "k").collect()}
    b = {r["k"]: r["member"] for r in deduped.contains(probes, "k").collect()}
    assert a == b
