"""Benchmark harness (driver-run per round).

Headline: tokens/sec for the distributed cuckoo-filter build + tree merge
over the input_hint token table (doc_id, tokens:array<int32>, n_tok,
source), synthesized deterministically and cached as parquet so the timing
measures build+merge, not generation.  Also times the query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "cf_build_merge_tokens_per_sec", "value": N,
   "unit": "tokens/sec", "queries": {...per-query sec...}, "sf": ...,
   "build_sec": ..., "n_tokens": ..., "scaling": {...}}

Set SPARK_GRAFT_SCALING=1 to additionally run the same build at
local[N/4] and local[N] (same input, same merge tree) and report
throughput at both plus efficiency — the sandbox stand-in for the
north_rule's N→4N executor scaling criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "0") == "1"

#: docs per unit sf (mean ~272 tokens/doc → sf0.1 ≈ 5.4M tokens)
DOCS_PER_SF = 200_000

BENCH_QUERIES = [
    "cf_member_parts", "cf_build_fpr", "bloom_membership", "hll_ndv",
    "cms_heavy_hitters", "kll_quantiles", "tdigest_quantiles",
    "exact_dedup", "token_stats", "quality", "lang_id", "fingerprint",
    "ngram_jaccard", "minhash_lsh", "simhash_dups", "emb_topk",
    "emb_neardup", "events_dedup",
]


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def token_table(spark, sf: float):
    from cuckoofilter_spark.sources.tokens import write_synth_tokens

    n_docs = max(1000, int(DOCS_PER_SF * sf))
    path = os.path.abspath(f".synth/tokens_sf{sf}")
    write_synth_tokens(spark, path, n_docs, seed=42, num_partitions=CPUS * 2)
    return spark.read.parquet(path)


def timed_build(spark, cpus: int, sf: float) -> tuple[float, int]:
    """Build the global filter over every token; returns (sec, n_tokens)."""
    import pyspark.sql.functions as F

    from cuckoofilter_spark.operators.build import build_filter
    from cuckoofilter_spark.params import CuckooParams
    from cuckoofilter_spark.sources.tokens import VOCAB

    toks = token_table(spark, sf)
    n_tokens = toks.agg(F.sum("n_tok")).collect()[0][0]
    params = CuckooParams(max_table_size=VOCAB, bits_per_fp=16)
    t0 = time.time()
    filt = build_filter(toks, "tokens", params, num_partitions=cpus * 2)
    dt = time.time() - t0
    assert filt.element_count > 0
    return dt, int(n_tokens)


def run_at(cpus: int, sf: float) -> tuple[float, int]:
    """Build in a dedicated SparkSession at local[cpus]."""
    from cuckoofilter_spark.session import get_spark

    spark = get_spark(f"bench-local{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    try:
        return timed_build(spark, cpus, sf)
    finally:
        spark.stop()


def main() -> None:
    sf = sf_of(SF_DIR)
    result: dict = {"metric": "cf_build_merge_tokens_per_sec", "unit": "tokens/sec",
                    "sf": sf, "cpus": CPUS}

    # -- headline build at full parallelism --------------------------------
    build_sec, n_tokens = run_at(CPUS, sf)
    result["build_sec"] = round(build_sec, 3)
    result["n_tokens"] = n_tokens
    result["value"] = round(n_tokens / build_sec, 1)

    # -- optional scaling evidence (north_rule N → 4N) ---------------------
    if SCALING:
        lo = max(1, CPUS // 4)
        sec_lo, _ = run_at(lo, sf)
        eff = (sec_lo / build_sec) / (CPUS / lo)
        result["scaling"] = {
            "cpus_lo": lo, "tokens_per_sec_lo": round(n_tokens / sec_lo, 1),
            "cpus_hi": CPUS, "tokens_per_sec_hi": result["value"],
            "efficiency": round(eff, 3),
        }

    # -- query suite -------------------------------------------------------
    from cuckoofilter_spark.queries import QUERIES
    from cuckoofilter_spark.session import get_spark

    spark = get_spark("bench-queries", master=f"local[{CPUS}]")
    qtimes = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = QUERIES[name](spark, SF_DIR).count()
        qtimes[name] = round(time.time() - t0, 3)
        assert n >= 0
    spark.stop()
    result["queries"] = qtimes

    print(json.dumps(result))


if __name__ == "__main__":
    main()
