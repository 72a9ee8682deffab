"""Deterministic synthetic token corpus per BASELINE.json ``input_hint``:
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)``.

Generation rules follow FIXTURES.md §1: per-doc length in [32, 512] and
token values drawn Zipf-ish from vocab [0, 50_000) by a per-doc PRNG seeded
``seed ^ doc_index`` — a pure function of (seed, doc index), so the table is
**bit-identical at any parallelism/partitioning** (the per-row invariant:
token-array equality across runs and cluster sizes).  ``source`` is
categorical with skewed weights (0.7/0.15/0.1/0.05) — the skewed partition
key the skew-handling tests exercise.

Generated distributed (``spark.range`` → ``mapInPandas``), never on the
driver: at the production 10^12-sequence scale the generator IS the scan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB = 50_000
SOURCES = np.array(["web", "books", "code", "wiki"])
_SRC_CUM = np.cumsum([0.7, 0.15, 0.1, 0.05])

TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _gen_batch(idx: np.ndarray, seed: int) -> pd.DataFrame:
    doc_ids = [f"doc{i:08d}" for i in idx]
    toks: list[np.ndarray] = []
    srcs: list[str] = []
    for i in idx:
        rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(i))
        length = 32 + int(rng.integers(0, 481))
        u = rng.random(length)
        # Zipf-ish hot head: cubing pushes mass toward token 0
        toks.append((u**3 * VOCAB).astype(np.int32))
        srcs.append(SOURCES[int(np.searchsorted(_SRC_CUM, rng.random()))])
    return pd.DataFrame(
        {"doc_id": doc_ids, "tokens": toks,
         "n_tok": np.array([len(t) for t in toks], dtype=np.int32), "source": srcs}
    )


def synth_tokens_df(spark: SparkSession, n_docs: int, seed: int = 42,
                    num_partitions: int | None = None) -> DataFrame:
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), seed)

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(fn, schema=TOKENS_SCHEMA)


def write_synth_tokens(spark: SparkSession, path: str, n_docs: int,
                       seed: int = 42, num_partitions: int | None = None) -> str:
    """Materialize the corpus to parquet once (idempotent cache)."""
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        # plain-encoded zstd: dictionary decode of int lists costs ~1.8× in
        # scan CPU (measured); a token store is scan-bound, so trade a few %
        # of size for decode speed
        (synth_tokens_df(spark, n_docs, seed, num_partitions).write
         .option("parquet.enable.dictionary", "false")
         .option("compression", "zstd")
         .mode("overwrite").parquet(path))
    return path
