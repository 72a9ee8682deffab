"""FASTA k-mer source — literal parity with the reference's only file
source (``FASTA/fasta_reader.cpp:11-83``, ``FASTA/fasta_iterator.cpp``).

Reference semantics, reproduced exactly:

- lines are consumed until the first ``>`` header; its text (sans ``>``)
  is the sequence identifier (``fasta_reader.cpp:27-36``);
- every subsequent line is concatenated into one buffer verbatim — the
  reference does NOT treat later ``>`` lines specially
  (``prepareNext``, ``fasta_reader.cpp:50-60``), i.e. one record per file;
- k-mers are stride-1 windows of length k over that buffer
  (``nextKMere``, ``fasta_reader.cpp:66-75``), crossing line boundaries.

Spark mapping: the FILE is the unit of parallelism (one task per file via
the same broadcast-file-list pattern as ``build_filter_from_parquet``) —
genomic corpora are many-file; a single monster genome would be chunked
with k-1 overlap upstream.  K-mer hashing is the vectorized byte-Horner
kernel shared with the token n-gram path (``operators/kmers.py``): the
window hash is computed over the raw sequence bytes with NumPy
``sliding_window_view`` — no per-window string materialization, no per-row
Python — standing in for the reference's CityHash64-over-string
(``Utils/hash_function.cpp:64-68``; the FPR bound is hash-agnostic,
SURVEY §2.4 #25).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cuckoofilter_spark.core.dynamic_filter import DynamicCuckooFilter
from cuckoofilter_spark.operators.kmers import ngram_hashes
from cuckoofilter_spark.params import CuckooParams


def parse_fasta(text: str) -> tuple[str, str]:
    """(identifier, concatenated sequence) with reference-exact parsing."""
    lines = text.split("\n")
    i = 0
    ident = ""
    while i < len(lines):
        line = lines[i]
        i += 1
        if not line:
            continue
        if line.startswith(">"):
            ident = line[1:]
            break
    return ident, "".join(l for l in lines[i:])


def _read_text(path: str) -> str:
    if "://" in path:
        from pyarrow import fs as pafs

        f, p = pafs.FileSystem.from_uri(path)
        return f.open_input_file(p).read().decode("utf-8", errors="replace")
    with open(path, encoding="utf-8", errors="replace") as fh:
        return fh.read()


def kmer_strings(seq: str, k: int) -> list[str]:
    """All stride-1 k-mers of one sequence (``nextKMere`` order)."""
    return [seq[i:i + k] for i in range(len(seq) - k + 1)]


def kmer_hashes(seq: str, k: int) -> np.ndarray:
    """Vectorized window hash of every stride-1 k-mer: Horner over the raw
    sequence bytes — equals ``hash_kmer_batch`` on the same windows."""
    b = np.frombuffer(seq.encode("utf-8"), dtype=np.uint8)
    return ngram_hashes(b, k)


def hash_kmer_batch(kmers: "np.ndarray | list[str]", k: int) -> np.ndarray:
    """Hash a batch of equal-length k-mer strings (the probe side) with the
    same byte-Horner kernel: one frombuffer over the concatenated bytes,
    one reshape, one vectorized fold — no per-string loop."""
    from cuckoofilter_spark.operators.kmers import NGRAM_MULT

    joined = "".join(kmers).encode("utf-8")
    flat = np.frombuffer(joined, dtype=np.uint8)
    if len(flat) != k * len(kmers):
        # non-ASCII / ragged-length fallback (never hit for ACGT alphabets):
        # strings shorter than k have no k-window — emit sentinel hash 0
        # instead of crashing on an empty window array
        out = np.zeros(len(kmers), dtype=np.uint64)
        for i, s in enumerate(kmers):
            h = kmer_hashes(s, k)
            if len(h):
                out[i] = h[0]
        return out
    win = flat.reshape(len(kmers), k).astype(np.uint64)
    acc = np.zeros(len(kmers), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * NGRAM_MULT + win[:, j]
    return acc


def fasta_kmers_df(spark: SparkSession, paths: list[str], k: int) -> DataFrame:
    """DataFrame of (seq_id, pos, kmer) — every stride-1 k-mer of every
    file, one task per file."""
    import pandas as pd

    files = sorted(paths)
    bc = spark.sparkContext.broadcast(files)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        flist = bc.value
        for pdf in batches:
            for fid in pdf["id"]:
                ident, seq = parse_fasta(_read_text(flist[int(fid)]))
                kmers = kmer_strings(seq, k)
                if kmers:
                    yield pd.DataFrame({
                        "seq_id": ident,
                        "pos": np.arange(len(kmers), dtype=np.int64),
                        "kmer": kmers,
                    })

    ids = spark.range(0, len(files), numPartitions=max(1, len(files)))
    return ids.mapInPandas(fn, schema="seq_id string, pos long, kmer string")


def build_fasta_filter(spark: SparkSession, paths: list[str], k: int,
                       params: CuckooParams, fanin: int = 8,
                       dedup: bool = False) -> DynamicCuckooFilter:
    """Distributed k-mer filter build over FASTA files: each task parses
    its file, hashes every window with the vectorized byte-Horner kernel
    and folds them into a partition filter; blobs tree-merge as usual.
    ``dedup=False`` = the reference's insert-a-copy-per-occurrence
    (``insertKmers``, ``Tests/cf_fasta_test.cpp:11-24``), which is what
    makes the delete-all phase restore an empty filter."""
    import pyarrow as pa

    from cuckoofilter_spark.core.serde import serialize_filter
    from cuckoofilter_spark.operators.build import BLOB_SCHEMA, tree_merge_blobs

    files = sorted(paths)
    if not files:
        raise ValueError("no FASTA files given")
    bc = spark.sparkContext.broadcast(files)
    ptuple = params.to_tuple()

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        flist = bc.value
        p = CuckooParams.from_tuple(ptuple)
        for b in batches:
            for fid in b.column(0).to_pylist():
                _, seq = parse_fasta(_read_text(flist[fid]))
                hashes = kmer_hashes(seq, k)
                filt = DynamicCuckooFilter(p, rng_seed=fid, dedup=dedup)
                if len(hashes):
                    filt.insert(hashes.astype(np.int64))
                yield pa.record_batch({
                    "pid": pa.array([fid], pa.int64()),
                    "blob": pa.array([serialize_filter(filt)], pa.binary()),
                    "n_rows": pa.array([1], pa.int64()),
                    "n_items": pa.array([len(hashes)], pa.int64()),
                })

    ids = spark.range(0, len(files), numPartitions=len(files))
    blobs = ids.mapInArrow(fn, schema=BLOB_SCHEMA)
    filt, _, _ = tree_merge_blobs(blobs, fanin=fanin, n_blobs=len(files))
    return filt if filt is not None else DynamicCuckooFilter(params, dedup=dedup)


def cf_contains_kmer_udf(spark: SparkSession, filt: DynamicCuckooFilter,
                         k: int):
    """Vectorized ``contains(kmer_string) -> boolean`` pandas UDF bound to
    a broadcast of *filt* — probe side of the FASTA workload."""
    from pyspark.sql.functions import pandas_udf

    from cuckoofilter_spark.core.serde import serialize_filter
    from cuckoofilter_spark.operators.membership import _get_filter

    bc = spark.sparkContext.broadcast(serialize_filter(filt))

    @pandas_udf("boolean")
    def contains(kmers: pd.Series) -> pd.Series:
        f = _get_filter(bc.value)
        # NULLs and wrong-length strings are never k-mers → never members;
        # substitute a k-length placeholder so one bad row doesn't knock the
        # whole batch off the concatenate-and-reshape fast path
        valid = (kmers.notna() & (kmers.str.len() == k)).to_numpy()
        vals = kmers.where(valid, "\x00" * k).to_numpy()
        h = hash_kmer_batch(vals, k).astype(np.int64)
        return pd.Series(f.contains(h) & valid)

    return contains
