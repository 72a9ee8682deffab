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

#: row-group splitting cutoff for the pyarrow-direct build: a CONSTANT so
#: split granularity is a pure function of the data layout, never of
#: cluster size (the merge tree must be identical at N and 4N executors)
ROW_GROUP_SPLIT_MAX_FILES = 48


def _keys_from_series(s: pd.Series) -> np.ndarray:
    """Extract a flat int64 key array from a scalar-int or array<int> column."""
    if len(s) and isinstance(s.iloc[0], (list, np.ndarray)):
        arrs = [np.asarray(a, dtype=np.int64) for a in s if a is not None and len(a)]
        return np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    return s.to_numpy(dtype=np.int64, na_value=0)


def _keys_from_arrow(col) -> np.ndarray:
    """Flatten an Arrow scalar-int or list<int> column to int64 — zero-copy
    offsets arithmetic, no per-row Python.  This path is ~10× faster than
    pandas list-of-array handling and is where "vectorized Arrow UDFs, no
    per-row Python" (north_star) is actually won or lost."""
    import pyarrow as pa

    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        col = col.flatten()
    if col.null_count:
        col = col.fill_null(0)
    # keep the native integer width (int32 stays int32 — hash64 widens
    # lazily); avoiding the int64 copy halves the bandwidth of this path
    return col.to_numpy(zero_copy_only=False)


def build_partition_udf(params: CuckooParams, dedup: bool = True):
    """mapInArrow function: fold every Arrow batch of one partition into a
    DynamicCuckooFilter; emit a single (pid, blob, n_rows, n_items) row.

    ``dedup=True`` (set semantics) is the scale default: corpus token
    streams are heavily skewed (Zipf), and a multiset filter would need one
    slot per *occurrence* of a hot token — unbounded chain growth.  Set
    semantics stores each distinct (bucket-pair, fp) once; membership
    answers are identical."""
    import pyarrow as pa

    ptuple = params.to_tuple()

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        p = CuckooParams.from_tuple(ptuple)
        filt = DynamicCuckooFilter(p, rng_seed=pid, dedup=dedup)
        n_rows = 0
        n_items = 0
        for b in batches:
            keys = _keys_from_arrow(b.column(0))
            n_rows += b.num_rows
            n_items += len(keys)
            if len(keys):
                filt.insert(keys)
        yield pa.record_batch({
            "pid": pa.array([pid], pa.int64()),
            "blob": pa.array([serialize_filter(filt)], pa.binary()),
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_items": pa.array([n_items], pa.int64()),
        })

    return fn


def _merge_group_udf():
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


def tree_merge_blobs(blobs_df: DataFrame, fanin: int = 8,
                     n_blobs: int | None = None):
    """Deterministically fold a (pid, blob, n_rows, n_items) DataFrame down
    to one filter.  Executor-side levels while > fanin blobs remain, then a
    driver-side ordered fold of the last ≤ fanin.  Returns
    (filter, n_rows, n_items).

    ``n_blobs``: pass the known blob count (one per input partition) to
    avoid a ``count()`` action — counting would EXECUTE the whole upstream
    build once, then ``collect()`` would execute it again.

    Why a small fanin matters for scaling: the fold's work is proportional
    to the *sum of stored fingerprints across folded blobs*.  A flat
    driver-side fold of P partition filters costs Σ_P (grows with cluster
    parallelism — inverse scaling!); a fanin-f tree does that work in
    parallel executor stages and the driver only ever folds ≤ f blobs, so
    the critical path is ~f·(per-blob fingerprints)·log_f(P)."""
    import pyspark.sql.functions as F

    df = blobs_df
    n = n_blobs if n_blobs is not None else df.count()
    # executor-side levels: each shrinks the blob count by `fanin`.
    # group id = pid // fanin, fold within group ordered by pid, and the
    # group id becomes the next level's pid — a pure function of partition
    # ids, hence the same tree at any cluster size.
    while n > fanin:
        df = (
            df.withColumn("gid", (F.col("pid") / fanin).cast("long"))
            .groupBy("gid")
            .applyInPandas(lambda pdf: _merge_group_udf()(pdf.drop(columns=["gid"])),
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


def build_filter_from_parquet(spark, path: str, col: str, params: CuckooParams,
                              fanin: int = 8, compact: bool = True,
                              dedup: bool = True) -> DynamicCuckooFilter:
    """Scale-path build: Spark distributes parquet *file splits*; each task
    reads its files directly with pyarrow (column-pruned, zero-copy list
    flatten) and builds a partition filter — the JVM never materializes the
    token column.

    Why: the generic path ships every token through parquet→InternalRow→
    Arrow-IPC→Python (measured ~3× slower than the kernel+IO cost).  For a
    one-column build over 10^12 tokens that re-encode IS the job, so the
    specialized source reads Arrow-native, exactly like Python-native table
    readers (Petastorm etc.).  Works against any pyarrow filesystem
    (local/HDFS/S3) since executors read their own splits.

    The file→task assignment is sorted-deterministic, so the merge tree is
    pinned regardless of cluster size (north_rule invariance)."""
    import pyarrow as pa

    files = sorted(_list_parquet_files(path))
    if not files:
        # an empty filter answers "non-member" to everything — a silent
        # wrong-path/permissions bug must not masquerade as that
        raise ValueError(f"no parquet files found under {path!r}")
    ptuple = params.to_tuple()
    # Split granularity: one task per FILE by default.  When the file
    # count is small (single-file tables, small imports), split per ROW
    # GROUP instead — the footer reads that requires are one per file,
    # affordable exactly when files are few.  The cutoff is a CONSTANT,
    # i.e. a pure function of the data layout — never of cluster size —
    # so the split list, per-split rng seeds and the merge tree are
    # identical at N and 4N executors (north_rule invariance; a
    # defaultParallelism-based cutoff would silently change the tree
    # with the cluster).
    if len(files) <= ROW_GROUP_SPLIT_MAX_FILES:
        splits = []
        for fid, f in enumerate(files):
            nrg = _num_row_groups(f)
            if nrg == 0:
                # metadata-only file (0 row groups): keep one whole-file
                # split so the task list is never empty and spark.range
                # never sees numPartitions=0
                splits.append((fid, -1))
            else:
                splits.extend((fid, rg) for rg in range(nrg))
    else:
        splits = [(fid, -1) for fid in range(len(files))]  # -1 = whole file
    bc_files = spark.sparkContext.broadcast(files)
    bc_splits = spark.sparkContext.broadcast(splits)

    def read_build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        p = CuckooParams.from_tuple(ptuple)
        flist = bc_files.value
        slist = bc_splits.value
        for b in batches:
            for sid in b.column(0).to_pylist():
                fid, rg = slist[sid]
                fpath = flist[fid]
                filt = DynamicCuckooFilter(p, rng_seed=sid, dedup=dedup)
                n_rows = 0
                n_items = 0
                if "://" in fpath:
                    rfs, rpath = pafs.FileSystem.from_uri(fpath)
                    pf = pq.ParquetFile(rfs.open_input_file(rpath))
                else:
                    pf = pq.ParquetFile(fpath)
                # small streaming batches: ~8k docs ≈ 2M tokens ≈ 9 MB —
                # decode scratch stays cache-resident; whole-file reads
                # measured ~10× slower under 32-way concurrency
                rgs = None if rg < 0 else [rg]
                for rb in pf.iter_batches(columns=[col], batch_size=8192,
                                          row_groups=rgs):
                    keys = _keys_from_arrow(rb.column(0))
                    n_rows += rb.num_rows
                    n_items += len(keys)
                    if len(keys):
                        filt.insert(keys)
                yield pa.record_batch({
                    "pid": pa.array([sid], pa.int64()),
                    "blob": pa.array([serialize_filter(filt)], pa.binary()),
                    "n_rows": pa.array([n_rows], pa.int64()),
                    "n_items": pa.array([n_items], pa.int64()),
                })

    ids_df = spark.range(0, len(splits), numPartitions=len(splits))
    blobs = ids_df.mapInArrow(read_build, schema=BLOB_SCHEMA)
    filt, _, _ = tree_merge_blobs(blobs, fanin=fanin, n_blobs=len(splits))
    if filt is None:
        filt = DynamicCuckooFilter(params, dedup=dedup)
    if compact:
        filt.compact()
    return filt


def _num_row_groups(fpath: str) -> int:
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    if "://" in fpath:
        rfs, rpath = pafs.FileSystem.from_uri(fpath)
        return pq.ParquetFile(rfs.open_input_file(rpath)).metadata.num_row_groups
    return pq.ParquetFile(fpath).metadata.num_row_groups


def _list_parquet_files(path: str) -> list[str]:
    """List .parquet data files under *path* on any pyarrow filesystem
    (local path or URI — file://, hdfs://, s3://): executors re-open the
    returned paths with the same ``from_uri`` resolution."""
    import os

    from pyarrow import fs as pafs

    filesystem, rel = pafs.FileSystem.from_uri(path) if "://" in path else (
        pafs.LocalFileSystem(), os.path.abspath(path))
    info = filesystem.get_file_info(rel)
    if info.type == pafs.FileType.File:
        # local paths go back absolute: executors re-open them and must not
        # depend on sharing the driver's cwd (only true in local mode)
        return [path if "://" in path else os.path.abspath(path)]
    sel = pafs.FileSelector(rel, recursive=True, allow_not_found=True)
    prefix = path.rstrip("/") if "://" in path else rel.rstrip("/")
    out = []
    for f in filesystem.get_file_info(sel):
        name = f.base_name
        relp = os.path.relpath(f.path, rel).replace(os.sep, "/")
        # skip hidden/underscore names at ANY path level (spark.read
        # semantics): _temporary/ holds uncommitted task attempts of a
        # crashed or in-flight write — including them would insert keys
        # from duplicate/aborted attempts
        hidden = any(p.startswith(("_", ".")) for p in relp.split("/"))
        if (f.type == pafs.FileType.File and name.endswith(".parquet")
                and not hidden):
            # re-root on the caller's path form so URI schemes survive
            out.append(prefix + "/" + relp)
    return out


def build_filter(df: DataFrame, col: str, params: CuckooParams,
                 fanin: int = 8, num_partitions: int | None = None,
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
        n_blobs = num_partitions
    else:
        n_blobs = proj.rdd.getNumPartitions()
    blobs = proj.mapInArrow(build_partition_udf(params, dedup=dedup), schema=BLOB_SCHEMA)
    filt, n_rows, n_items = tree_merge_blobs(blobs, fanin=fanin, n_blobs=n_blobs)
    if filt is None:
        filt = DynamicCuckooFilter(params)
    if compact:
        filt.compact()
    return filt
