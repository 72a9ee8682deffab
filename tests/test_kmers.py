"""String-key and token n-gram membership — the FASTA k-mer workload
(Tests/cf_fasta_test.cpp) re-expressed over the input_hint token table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.kmers import (
    build_ngram_filter,
    build_string_filter,
    contains_ngrams,
    hashed_key,
    ngram_hashes,
)
from cuckoofilter_spark.params import CuckooParams


def test_ngram_hashes_match_window_semantics():
    toks = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    h3 = ngram_hashes(toks, 3)
    assert len(h3) == 3  # stride-1 windows, FASTA nextKMere semantics
    # same window content → same hash, regardless of position
    assert ngram_hashes(np.array([2, 3, 4]), 3)[0] == h3[1]
    assert len(ngram_hashes(np.array([1, 2]), 3)) == 0


def test_flat_batch_masks_document_boundaries():
    from cuckoofilter_spark.operators.kmers import _flat_ngram_hashes

    # docs [1,2,3] and [4,5,6]: flat windows (3,4,?) (2,3,4)… crossing the
    # boundary must not appear
    ends = np.array([3, 6], dtype=np.int64)
    values = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)
    got = set(_flat_ngram_hashes(ends, values, 3).tolist())
    want = set(ngram_hashes(np.array([1, 2, 3]), 3).tolist()) | \
        set(ngram_hashes(np.array([4, 5, 6]), 3).tolist())
    assert got == want
    cross = ngram_hashes(np.array([2, 3, 4]), 3)[0]
    assert cross not in got


def test_string_filter_no_false_negatives(spark, sf01_dir):
    docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w")).distinct()
    filt = build_string_filter(words, "w", CuckooParams(max_table_size=4096),
                               num_partitions=4)
    probe = words.select(hashed_key("w").alias("h")).toPandas()["h"].to_numpy()
    assert filt.contains(probe).all()


def test_ngram_filter_end_to_end(spark):
    from cuckoofilter_spark.sources.tokens import synth_tokens_df

    toks_df = synth_tokens_df(spark, n_docs=300, seed=42, num_partitions=4)
    params = CuckooParams(max_table_size=1 << 16, bits_per_fp=16)
    filt = build_ngram_filter(toks_df, "tokens", n=5, params=params)

    # zero false negatives: every document's own windows are members
    rows = toks_df.limit(50).collect()
    for r in rows:
        toks = np.asarray(r["tokens"], dtype=np.int64)
        assert contains_ngrams(filt, toks, 5).all()

    # FPR bounded on never-seen windows (values outside the vocab)
    rng = np.random.default_rng(9)
    neg = rng.integers(10**9, 10**10, size=(2000, 5))
    hits = sum(bool(contains_ngrams(filt, row, 5)[0]) for row in neg)
    assert hits / 2000 <= max(3 / 2000, params.fpr_bound * 3)


def test_ngram_filter_matches_exact_distinct_count(spark):
    """The filter's stored-count equals the exact distinct n-gram count
    (within fingerprint-collision slack) — cross-check vs a relational
    exact computation of the same windows."""
    from cuckoofilter_spark.sources.tokens import synth_tokens_df

    toks_df = synth_tokens_df(spark, n_docs=100, seed=1, num_partitions=2)
    params = CuckooParams(max_table_size=1 << 16, bits_per_fp=16)
    filt = build_ngram_filter(toks_df, "tokens", n=8, params=params)

    pdf = toks_df.toPandas()
    exact = set()
    for t in pdf["tokens"]:
        exact.update(ngram_hashes(np.asarray(t, dtype=np.int64), 8).tolist())
    assert abs(filt.element_count - len(exact)) <= max(3, len(exact) * 0.001)


def test_prefix_jaccard_equals_naive(spark, sf01_dir):
    """PPJoin prefix filtering is an optimization, not an approximation."""
    from cuckoofilter_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
        shingles,
    )

    sh = shingles(spark.read.parquet(f"{sf01_dir}/documents.parquet"), 3).persist()
    try:
        naive = {tuple(r) for r in jaccard_pairs(sh, 5000).collect()}
        prefix = {tuple(r) for r in jaccard_pairs_prefix(sh, 5000).collect()}
    finally:
        # leave no cached subtree behind — later plan-shape tests would
        # resolve their logically-equal subtrees to this cache
        sh.unpersist()
    assert naive == prefix and len(naive) > 0


def test_stop_gram_cap_bounds_posting_lists_exactly(spark):
    """A corpus-wide stop-gram must NOT enter the candidate join with a
    posting list proportional to n (VERDICT r2 item 1).  The df-cap
    partitions candidate generation: light posting lists are ≤ cap by
    construction, and the hot gram survives only in the prefix-spill set
    (docs that are ≥ τ hot grams) — while output stays byte-identical to
    the naive all-pairs join, including the pair connected ONLY by the
    hot gram."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
        prefix_index,
        shingles,
    )

    n, cap, tau = 200, 10, 7000
    rows = [(i, f"stop stop stop u{i}a u{i}b u{i}c u{i}d") for i in range(n)]
    # two near-pure-boilerplate docs whose ONLY shingle is the hot gram:
    # the heavy path alone can connect them (J = 1.0)
    rows += [(1000, "stop stop stop stop"), (1001, "stop stop stop stop")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(docs, 3).persist()
    try:
        idx = prefix_index(sh, tau).persist()
        try:
            # the hot gram (df = n+2) reaches only the 2 spill docs' prefixes
            heavy_posting = (idx.filter(F.col("gram_df") > cap)
                             .groupBy("gram").count().collect())
            assert len(heavy_posting) == 1
            assert heavy_posting[0]["count"] == 2  # not ∝ n
            # every light posting list entering the join is ≤ cap
            light_max = (idx.filter(F.col("gram_df") <= cap)
                         .groupBy("gram").count()
                         .agg(F.max("count")).collect()[0][0])
            assert light_max <= cap
        finally:
            idx.unpersist()
        naive = {tuple(r) for r in jaccard_pairs(sh, tau).collect()}
        capped = {tuple(r) for r in
                  jaccard_pairs_prefix(sh, tau, df_cap=cap).collect()}
    finally:
        sh.unpersist()
    assert capped == naive
    assert (1000, 1001, 1, 1, 10000) in capped


def test_salted_prefix_join_generates_each_pair_exactly_once(spark):
    """The hot-gram salt re-routes pair generation across bucket-pair
    tasks; every unordered doc pair must still appear EXACTLY once (no
    loss at bucket boundaries, no double-count on the diagonal)."""
    from cuckoofilter_spark.operators.dedup import _prefix_self_join

    n = 100
    ranked = spark.createDataFrame(
        [(i, 1, 1, n) for i in range(n)],
        "doc_id long, gram long, n_sh long, gram_df long")
    out = _prefix_self_join(ranked, tau=1.0, df_cap=7).collect()
    pairs = {(r["d1"], r["d2"]) for r in out}
    assert len(out) == len(pairs) == n * (n - 1) // 2
    assert all(d1 < d2 for d1, d2 in pairs)


def test_ngram_membership_probe_stays_distributed(spark, sf_dir, monkeypatch):
    """VERDICT r2 item 3: the membership gate query may collect scalar
    aggregates / the 1-row verdict, but never documents or probe sets —
    every collect in its body must return a handful of rows."""
    from pyspark.sql import DataFrame

    from cuckoofilter_spark.queries import q_ngram_membership

    orig = DataFrame.collect

    def guarded(self):
        rows = orig(self)
        assert len(rows) <= 4, (
            f"q_ngram_membership collected {len(rows)} rows to the driver")
        return rows

    monkeypatch.setattr(DataFrame, "collect", guarded)
    out = orig(q_ngram_membership(spark, sf_dir))
    assert len(out) == 1 and out[0]["zero_false_negatives"] is True


def test_rolling_fingerprint_invariants(spark):
    """Order-sensitive content fingerprint: deterministic, order-aware,
    edit-aware."""
    from cuckoofilter_spark.operators.text import rolling_fingerprint

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "d c b a"), (3, "a b c d e")],
        "doc_id long, text string")
    fp = {r["doc_id"]: r["rolling_fp"] for r in rolling_fingerprint(docs).collect()}
    assert fp[0] == fp[1]           # same content → same code
    assert fp[0] != fp[2]           # reorder → different
    assert fp[0] != fp[3]           # edit → different
    # stable across partitionings (pure function of content)
    fp2 = {r["doc_id"]: r["rolling_fp"]
           for r in rolling_fingerprint(docs.repartition(3)).collect()}
    assert fp == fp2
