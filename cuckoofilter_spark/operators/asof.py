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
streaming so memory is bounded — for extreme key skew, range-partition the
timeline per key upstream and run per-slice with boundary carry-in.

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


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str, value_cols: list[str],
              direction: str = "backward",
              right_tiebreak: str | None = None,
              tolerance_sec: float | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row, with ``value_cols`` from the
    nearest preceding (backward) / following (forward) ``right`` row of the
    same ``on`` key; unmatched left rows keep nulls (left-outer semantics).

    ``right_tiebreak``: column ordering equal-(key, ts) right rows — the
    max (backward) / min (forward) wins deterministically.  ``tolerance_sec``
    drops matches farther than this many seconds from ``left_ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    dup = set(value_cols) & set(left.columns)
    if dup:
        raise ValueError(f"value_cols collide with left columns: {sorted(dup)}")
    for c in (_SIDE, _TS, _TB, _M):
        if c in left.columns or c in right.columns:
            raise ValueError(f"reserved column name in input: {c}")
    if "__match_ts" in value_cols:
        raise ValueError("reserved value column name: __match_ts")

    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r = right.select(
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
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    # carry the whole matched right ROW as one struct: the struct is
    # non-null for every right row even when its fields are null, so (a)
    # a NULL-valued nearest right row is still the match (its null wins,
    # not a stale older value), (b) every value column comes from the
    # SAME right row, and (c) tolerance measures that row's own timestamp
    payload = F.when(F.col(_SIDE) == 0,
                     F.struct(F.col(_TS).alias("__match_ts"),
                              *[F.col(c) for c in value_cols]))
    carried = both.withColumn(_M, F.last(payload, ignorenulls=True).over(w))
    take = F.col(_M)
    if tolerance_sec is not None:
        is_ts = both.schema[_TS].dataType.typeName().startswith("timestamp")
        secs = (lambda c: c.cast("timestamp").cast("double")) if is_ts \
            else (lambda c: c.cast("double"))
        gap = F.abs(secs(F.col(_TS)) - secs(F.col(_M)["__match_ts"]))
        take = F.when(gap <= tolerance_sec, F.col(_M))

    return (carried.where(F.col(_SIDE) == 1)
            .select(*[c for c in left.columns],
                    *[take[c].alias(c) for c in value_cols]))
