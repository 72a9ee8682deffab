"""Distributed filter/sketch build: per-partition Arrow-vectorized build →
deterministic multi-level tree merge.

This is the Spark-native replacement for the reference's single-threaded
insert loop (``Demo/cf_demo.cpp:16-27``) and the distributed analog of DCF
chain growth + compaction (SURVEY.md §3.3): each input partition builds one
``DynamicCuckooFilter`` inside ``mapInPandas`` (NumPy batch kernels over
Arrow record batches — no per-row Python), then filters are folded together
level by level with a **deterministic merge tree**: blobs are grouped by
``partition_id // fanin`` and each group is folded in ascending partition-id
order inside ``applyInPandas``.  Unlike ``RDD.treeAggregate`` (whose reduce
order follows task completion), the tree shape and fold order here are pure
functions of the partition ids — the same at local[8] and local[32], which
is what makes "identical estimates at N and 4N executors" (north_rule) hold
by construction rather than by commutativity luck.

Scale notes (100 TB / ~10^6 input partitions):
- stage 1 emits ONE row (a few hundred KB zlib-packed) per input partition —
  the shuffle into the merge stage moves sketch state, never data rows;
- each merge level reduces the blob count by ``fanin`` (64): 10^6 blobs →
  3 levels; level parallelism = n_blobs/fanin tasks, all executor-side;
- the driver only ever folds the final ≤ fanin blobs;
- column pruning: we select only the key column(s) before the UDF, so the
  parquet/Iceberg scan reads one column (check ``ReadSchema`` in explain).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from cuckoofilter_spark.core.dynamic_filter import DynamicCuckooFilter
from cuckoofilter_spark.core.serde import deserialize_filter, serialize_filter
from cuckoofilter_spark.params import CuckooParams

BLOB_SCHEMA = "pid long, blob binary, n_rows long, n_items long"


def _keys_from_series(s: pd.Series) -> np.ndarray:
    """Extract a flat int64 key array from a scalar-int or array<int> column."""
    if len(s) and isinstance(s.iloc[0], (list, np.ndarray)):
        arrs = [np.asarray(a, dtype=np.int64) for a in s if a is not None and len(a)]
        return np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    return s.to_numpy(dtype=np.int64, na_value=0)


def build_partition_udf(params: CuckooParams, dedup: bool = True):
    """mapInPandas function: fold every Arrow batch of one partition into a
    DynamicCuckooFilter; emit a single (pid, blob, n_rows, n_items) row.

    ``dedup=True`` (set semantics) is the scale default: corpus token
    streams are heavily skewed (Zipf), and a multiset filter would need one
    slot per *occurrence* of a hot token — unbounded chain growth.  Set
    semantics stores each distinct (bucket-pair, fp) once; membership
    answers are identical."""
    ptuple = params.to_tuple()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        p = CuckooParams.from_tuple(ptuple)
        filt = DynamicCuckooFilter(p, rng_seed=pid, dedup=dedup)
        n_rows = 0
        n_items = 0
        for pdf in batches:
            col = pdf.iloc[:, 0]
            keys = _keys_from_series(col)
            n_rows += len(pdf)
            n_items += len(keys)
            if len(keys):
                filt.insert(keys)
        yield pd.DataFrame(
            {"pid": [pid], "blob": [serialize_filter(filt)],
             "n_rows": [n_rows], "n_items": [n_items]}
        )

    return fn


def _merge_group_udf(seed_tag: int):
    """applyInPandas fold: merge a group's blobs in ascending pid order."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pid")
        acc = None
        for blob in pdf["blob"]:
            f = deserialize_filter(bytes(blob))
            if acc is None:
                acc = f
            else:
                acc.merge(f)
        gid = int(pdf["pid"].iloc[0])
        return pd.DataFrame(
            {"pid": [gid], "blob": [serialize_filter(acc)],
             "n_rows": [int(pdf["n_rows"].sum())], "n_items": [int(pdf["n_items"].sum())]}
        )

    return fn


def tree_merge_blobs(blobs_df: DataFrame, fanin: int = 64):
    """Deterministically fold a (pid, blob, n_rows, n_items) DataFrame down
    to one filter.  Executor-side levels while > fanin blobs remain, then a
    driver-side ordered fold of the last ≤ fanin.  Returns
    (filter, n_rows, n_items)."""
    import pyspark.sql.functions as F

    df = blobs_df
    n = df.count()
    # executor-side levels: each shrinks the blob count by `fanin`.
    # group id = pid // fanin, fold within group ordered by pid, and the
    # group id becomes the next level's pid — a pure function of partition
    # ids, hence the same tree at any cluster size.
    while n > fanin:
        df = (
            df.withColumn("gid", (F.col("pid") / fanin).cast("long"))
            .groupBy("gid")
            .applyInPandas(lambda pdf: _merge_group_udf(0)(pdf.drop(columns=["gid"])),
                           schema=BLOB_SCHEMA)
            .withColumn("pid", (F.col("pid") / fanin).cast("long"))
        )
        n = -(-n // fanin)
    rows = df.collect()
    rows.sort(key=lambda r: r["pid"])
    acc = None
    n_rows = 0
    n_items = 0
    for r in rows:
        f = deserialize_filter(bytes(r["blob"]))
        acc = f if acc is None else acc.merge(f)
        n_rows += r["n_rows"]
        n_items += r["n_items"]
    return acc, n_rows, n_items


def build_filter(df: DataFrame, col: str, params: CuckooParams,
                 fanin: int = 64, num_partitions: int | None = None,
                 compact: bool = True, dedup: bool = True) -> DynamicCuckooFilter:
    """Build a global DynamicCuckooFilter over ``df[col]`` (int column or
    array<int> column).

    ``num_partitions``: fix the build parallelism explicitly.  Fixing it
    (rather than inheriting the scan's split count) pins the merge tree, so
    results are bit-identical across cluster sizes — the north_rule's
    N-vs-4N invariance.  Salting/skew is irrelevant here because the build
    is a narrow map (no shuffle by key); repartition only balances bytes.
    """
    proj = df.select(col)  # column pruning reaches the scan
    if num_partitions is not None:
        proj = proj.repartition(num_partitions)
    blobs = proj.mapInPandas(build_partition_udf(params, dedup=dedup), schema=BLOB_SCHEMA)
    filt, n_rows, n_items = tree_merge_blobs(blobs, fanin=fanin)
    if filt is None:
        filt = DynamicCuckooFilter(params)
    if compact:
        filt.compact()
    return filt
