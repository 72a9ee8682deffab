"""As-of (nearest-timestamp) join — the classic time-series operator Spark
lacks natively, built as ONE hash shuffle + window, never a range explosion.

For each left row, attach the right row with the greatest ``right_ts`` ≤
``left_ts`` (direction="backward", inclusive; "forward" = smallest
``right_ts`` ≥ ``left_ts``) within the same key.  The naive relational
spelling — ``left JOIN right ON key AND right_ts <= left_ts`` then argmax —
materializes |left| × (avg right rows per key) intermediate rows, which at
100 TB is a catastrophic range-join explosion.  This implementation is the
union+window formulation instead:

1. union the two sides (right rows carry the value columns, left rows
   carry nulls) — narrow, no shuffle;
2. ONE hash shuffle on the key (the window exchange), sort within the
   partition by (ts, side, tiebreak);
3. ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT
   carries each right row's values forward to every left row until the
   next right row — O(n log n) sort, O(1) state, zero blow-up;
4. keep the left rows.

Shuffled bytes = |left| + |right| rows exactly once.  Skew: a hot key's
rows land in one task (inherent to per-key ordering); the window itself is
streaming so memory is bounded.  For extreme key skew pass
``skew_buckets=B``: the timeline is range-cut into B equal-width slices,
each (key, slice) sorts independently (a hot key fans out across B
tasks), and a per-(key, slice) summary relation — one row per slice, the
slice's nearest right row — is prefix-carried across slices and joined
back (tiny relation, AQE-broadcastable).  Output is provably identical to
the single-window path (equality-gated in tests).

Semantics matched to DuckDB's ASOF JOIN (the oracle engine), plus a
deterministic ``right_tiebreak`` for equal (key, right_ts) rows which the
SQL standard leaves unspecified: backward picks the MAX tiebreak, forward
the MIN (mirrors "latest/earliest wins").

Reference parity: the reference engine has no as-of join; this is part of
the training-data/eventlog surface the brief's pipeline framing demands
(join each sample/event to the most recent upstream state snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE, _TS, _TB, _M = "__asof_side", "__asof_ts", "__asof_tb", "__asof_match"
_B, _IN, _CARRY = "__asof_bucket", "__asof_in", "__asof_carry"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str, value_cols: list[str],
              direction: str = "backward",
              right_tiebreak: str | None = None,
              tolerance_sec: float | None = None,
              skew_buckets: int | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row, with ``value_cols`` from the
    nearest preceding (backward) / following (forward) ``right`` row of the
    same ``on`` key; unmatched left rows keep nulls (left-outer semantics).

    ``right_tiebreak``: column ordering equal-(key, ts) right rows — the
    max (backward) / min (forward) wins deterministically.  ``tolerance_sec``
    drops matches farther than this many seconds from ``left_ts``.
    NULL timestamps follow SQL inequality semantics: a NULL ``right_ts``
    row is never a match (filtered from the union), and a NULL ``left_ts``
    row keeps all-null value columns — identical on the plain and
    ``skew_buckets`` paths.
    ``skew_buckets``: hot-key path — range-cut the timeline into this many
    slices so one key's rows sort in parallel tasks (identical output;
    requires numeric or timestamp ts and non-null tiebreak values).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    dup = set(value_cols) & set(left.columns)
    if dup:
        raise ValueError(f"value_cols collide with left columns: {sorted(dup)}")
    for c in (_SIDE, _TS, _TB, _M, _B, _IN, _CARRY):
        if c in left.columns or c in right.columns:
            raise ValueError(f"reserved column name in input: {c}")
    if "__match_ts" in value_cols:
        raise ValueError("reserved value column name: __match_ts")

    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    # NULL-ts right rows can never satisfy the inequality (SQL: NULL
    # compares unknown), yet under the backward asc window they'd sort
    # NULLS FIRST and be carried as ts = -infinity — and the skew_buckets
    # path would instead drop them (NULL bucket).  Filter them out so both
    # paths agree with SQL semantics.
    r = right.where(F.col(right_ts).isNotNull()).select(
        F.col(on),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        tb.alias(_TB),
        *[F.col(c) for c in value_cols])
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_TB].dataType).alias(_TB))
    both = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at equal ts (inclusive match);
        # among equal-(key, ts) right rows the LAST in asc tiebreak = max
        order = [F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc()]
    else:
        order = [F.col(_TS).desc(), F.col(_SIDE).asc(), F.col(_TB).desc()]

    is_ts = both.schema[_TS].dataType.typeName().startswith("timestamp")
    secs = (lambda c: c.cast("timestamp").cast("double")) if is_ts \
        else (lambda c: c.cast("double"))

    # carry the whole matched right ROW as one struct: the struct is
    # non-null for every right row even when its fields are null, so (a)
    # a NULL-valued nearest right row is still the match (its null wins,
    # not a stale older value), (b) every value column comes from the
    # SAME right row, and (c) tolerance measures that row's own timestamp
    payload = F.when(F.col(_SIDE) == 0,
                     F.struct(F.col(_TS).alias("__match_ts"),
                              *[F.col(c) for c in value_cols]))

    if skew_buckets and skew_buckets > 1:
        carried = _bucketed_match(both, on, order, payload, secs,
                                  skew_buckets, direction)
    else:
        w = (Window.partitionBy(on).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = both.withColumn(_M, F.last(payload, ignorenulls=True).over(w))
    # a NULL left_ts never matches anything (inequality vs NULL is
    # unknown); without the guard a forward-direction NULL sorts last
    # under desc and would wrongly pick up the final carried value
    take = F.when(F.col(_TS).isNotNull(), F.col(_M))
    if tolerance_sec is not None:
        gap = F.abs(secs(F.col(_TS)) - secs(F.col(_M)["__match_ts"]))
        take = F.when(F.col(_TS).isNotNull() & (gap <= tolerance_sec),
                      F.col(_M))

    return (carried.where(F.col(_SIDE) == 1)
            .select(*[c for c in left.columns],
                    *[take[c].alias(c) for c in value_cols]))


def _bucketed_match(both: DataFrame, on: str, order: list, payload,
                    secs, n_buckets: int, direction: str) -> DataFrame:
    """Hot-key variant of the carry-forward: range-cut the timeline into
    ``n_buckets`` equal-width slices so ONE key's rows sort across
    ``n_buckets`` independent tasks instead of one.

    Per (key, slice) the usual window finds the in-slice match; what a
    slice cannot see — a match in an earlier slice (later, for forward) —
    arrives via the summary relation: one row per (key, slice) holding the
    slice's own nearest right row, prefix-carried across slices with a
    second window over that TINY relation (|keys|·B rows) and joined back
    (AQE broadcasts it).  Equal timestamps always share a slice (the cut
    is a pure function of ts), so tie-break semantics are unchanged and
    the output is identical to the single-window path.
    """
    lo, hi = both.agg(F.min(secs(F.col(_TS))),
                      F.max(secs(F.col(_TS)))).first()
    if lo is None or hi is None or hi <= lo:
        w = (Window.partitionBy(on).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return both.withColumn(_M, F.last(payload, ignorenulls=True).over(w))
    width = (hi - lo) / n_buckets
    bucket = F.least(F.greatest(
        F.floor((secs(F.col(_TS)) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_buckets - 1)).cast("int")
    b = both.withColumn(_B, bucket)

    w_in = (Window.partitionBy(on, _B).orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    b = b.withColumn(_IN, F.last(payload, ignorenulls=True).over(w_in))

    # per-(key, slice) nearest right row: max/min over the (ts, tb) pair
    pick = F.max_by if direction == "backward" else F.min_by
    summ = (b.where(F.col(_SIDE) == 0)
            .groupBy(on, _B)
            .agg(pick(payload, F.struct(F.col(_TS), F.col(_TB)))
                 .alias("__slice_best")))
    grid = b.select(on, _B).distinct()
    border = F.col(_B).asc() if direction == "backward" else F.col(_B).desc()
    w_carry = (Window.partitionBy(on).orderBy(border)
               .rowsBetween(Window.unboundedPreceding, -1))
    carry = (grid.join(summ, [on, _B], "left")
             .withColumn(_CARRY, F.last("__slice_best", ignorenulls=True)
                         .over(w_carry))
             .select(on, _B, _CARRY))

    return (b.join(carry, [on, _B], "left")
            .withColumn(_M, F.coalesce(F.col(_IN), F.col(_CARRY)))
            .drop(_B, _IN, _CARRY))
