"""As-of join: brute-force parity, directions, ties, tolerance, plan shape."""

import pyspark.sql.functions as F
import pytest

from cuckoofilter_spark.operators.asof import asof_join

# (key, lts) left rows × (key, rts, val, tb) right rows — includes: an
# unmatched-left key (9), an unmatched-early left row, equal-ts inclusive
# matches, and an equal-(key, rts) tie (key 2 @ rts 50, tb 7 vs 8)
LEFT = [(1, 10), (1, 25), (1, 3), (2, 50), (2, 51), (9, 40)]
RIGHT = [(1, 5, "a", 1), (1, 10, "b", 2), (1, 20, "c", 3),
         (2, 50, "d", 7), (2, 50, "e", 8), (2, 60, "f", 9)]


def _brute(direction):
    out = {}
    for k, lts in LEFT:
        if direction == "backward":
            cand = [r for r in RIGHT if r[0] == k and r[1] <= lts]
            pick = max(cand, key=lambda r: (r[1], r[3])) if cand else None
        else:
            cand = [r for r in RIGHT if r[0] == k and r[1] >= lts]
            pick = min(cand, key=lambda r: (r[1], r[3])) if cand else None
        out[(k, lts)] = pick[2] if pick else None
    return out


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "k int, lts int")
    r = spark.createDataFrame(RIGHT, "k int, rts int, val string, tb int")
    return l, r


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute_force(spark, direction):
    l, r = _dfs(spark)
    got = {(row["k"], row["lts"]): row["val"]
           for row in asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                                value_cols=["val"], direction=direction,
                                right_tiebreak="tb").collect()}
    assert got == _brute(direction)


def test_asof_tolerance_nulls_far_matches(spark):
    l, r = _dfs(spark)
    got = {(row["k"], row["lts"]): row["val"]
           for row in asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                                value_cols=["val"], right_tiebreak="tb",
                                tolerance_sec=5).collect()}
    exp = {(k, lts): (v if v is not None and any(
        r[0] == k and r[2] == v and lts - r[1] <= 5 for r in RIGHT) else None)
        for (k, lts), v in _brute("backward").items()}
    assert got == exp


def test_asof_left_outer_keeps_all_rows(spark):
    l, r = _dfs(spark)
    out = asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["val", "tb"])
    assert out.count() == len(LEFT)
    assert set(out.columns) == {"k", "lts", "val", "tb"}


def test_asof_single_shuffle(spark):
    """The whole join is ONE exchange (the key hash partition for the
    window) — the union and the carried-value projection are narrow."""
    l, r = _dfs(spark)
    out = asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_asof_rejects_bad_args(spark):
    l, r = _dfs(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, "k", "lts", "rts", ["val"], direction="nearest")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r.withColumnRenamed("val", "lts"), "k", "lts", "rts",
                  ["lts"])


def test_asof_null_valued_nearest_row_wins_whole_row(spark):
    """The nearest right row is the match even when one of its values is
    NULL — and all value columns come from that SAME row (no stitching
    values from different right rows)."""
    l = spark.createDataFrame([(1, 25)], "k int, lts int")
    r = spark.createDataFrame([(1, 5, "a", 100), (1, 20, None, 200)],
                              "k int, rts int, val string, amt int")
    row = asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["val", "amt"]).collect()[0]
    assert row["val"] is None and row["amt"] == 200


def test_asof_tolerance_gates_on_matched_rows_own_ts(spark):
    """Tolerance measures the matched row's own timestamp — a far-away
    older row's value must not leak through a near NULL-valued match."""
    l = spark.createDataFrame([(1, 25)], "k int, lts int")
    r = spark.createDataFrame([(1, 5, "a", 100), (1, 20, None, 200)],
                              "k int, rts int, val string, amt int")
    row = asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["val", "amt"], tolerance_sec=10).collect()[0]
    assert row["val"] is None and row["amt"] == 200  # ts=20 row, gap 5 <= 10
    row = asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["val", "amt"], tolerance_sec=3).collect()[0]
    assert row["val"] is None and row["amt"] is None  # gap 5 > 3


def test_asof_tolerance_on_timestamp_ntz(spark):
    """tolerance_sec must work on TIMESTAMP_NTZ — this repo's parquet
    timestamp type (events.ts, orders.o_orderdate)."""
    l = spark.sql("SELECT 1 AS k, TIMESTAMP_NTZ'2024-01-01 00:01:00' AS lts")
    r = spark.sql(
        "SELECT 1 AS k, TIMESTAMP_NTZ'2024-01-01 00:00:00' AS rts, 'x' AS val")
    ok = asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                   value_cols=["val"], tolerance_sec=120).collect()[0]
    assert ok["val"] == "x"
    far = asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["val"], tolerance_sec=30).collect()[0]
    assert far["val"] is None


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_skew_buckets_identical_to_single_window(spark, direction):
    """The hot-key range-bucketed path must return byte-identical results
    to the single-window path — ties, NULL values, unmatched rows and a
    hot key crossing every bucket boundary included."""
    import random
    rng = random.Random(7)
    left_rows = [(k, rng.randrange(0, 1000))
                 for k in (1, 1, 2, 9) for _ in range(40)]
    left_rows += [(1, 0), (1, 999)]  # exact range endpoints
    right_rows = [(k, rng.randrange(0, 1000),
                   None if rng.random() < 0.2 else f"v{i}", i)
                  for i, k in enumerate(k for k in (1, 1, 1, 2)
                                        for _ in range(30))]
    right_rows += [(1, 500, "tie_a", 900), (1, 500, "tie_b", 901)]
    l = spark.createDataFrame(left_rows, "k int, lts int")
    r = spark.createDataFrame(right_rows, "k int, rts int, val string, tb int")

    kw = dict(on="k", left_ts="lts", right_ts="rts", value_cols=["val", "tb"],
              direction=direction, right_tiebreak="tb")
    plain = sorted(map(tuple, asof_join(l, r, **kw).collect()))
    bucketed = sorted(map(tuple,
                          asof_join(l, r, skew_buckets=8, **kw).collect()))
    assert plain == bucketed
    one = sorted(map(tuple, asof_join(l, r, skew_buckets=1, **kw).collect()))
    assert plain == one  # B=1 degenerates to the single-window path


def test_asof_skew_buckets_with_tolerance_and_degenerate_range(spark):
    l = spark.createDataFrame([(1, 25), (1, 10)], "k int, lts int")
    r = spark.createDataFrame([(1, 5, "a"), (1, 20, "b")],
                              "k int, rts int, val string")
    kw = dict(on="k", left_ts="lts", right_ts="rts", value_cols=["val"],
              tolerance_sec=6)
    plain = sorted(map(tuple, asof_join(l, r, **kw).collect()))
    bucketed = sorted(map(tuple,
                          asof_join(l, r, skew_buckets=4, **kw).collect()))
    assert plain == bucketed == [(1, 10, "a"), (1, 25, "b")]
    # all timestamps equal -> zero span -> falls back to one bucket
    l0 = spark.createDataFrame([(1, 7)], "k int, lts int")
    r0 = spark.createDataFrame([(1, 7, "x")], "k int, rts int, val string")
    got = asof_join(l0, r0, on="k", left_ts="lts", right_ts="rts",
                    value_cols=["val"], skew_buckets=4).collect()[0]
    assert got["val"] == "x"


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("skew", [None, 4])
def test_asof_null_timestamps_never_match(spark, direction, skew):
    """SQL inequality semantics: NULL right_ts rows are never carried as a
    match, NULL left_ts rows keep all-null values — on BOTH window paths."""
    l = spark.createDataFrame(
        [(1, 10), (1, None), (9, None)], "k int, lts int")
    r = spark.createDataFrame(
        [(1, 5, "a", 1), (1, None, "ghost", 2), (9, None, "ghost", 3)],
        "k int, rts int, val string, tb int")
    got = {(row["k"], row["lts"]): row["val"]
           for row in asof_join(l, r, on="k", left_ts="lts", right_ts="rts",
                                value_cols=["val"], direction=direction,
                                right_tiebreak="tb",
                                skew_buckets=skew).collect()}
    exp = {(1, 10): ("a" if direction == "backward" else None),
           (1, None): None, (9, None): None}
    assert got == exp
