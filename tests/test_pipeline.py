"""Training-data pipeline operators (operators/pipeline.py):
decontamination, distributed prefix sum / sequence packing, deterministic
stratified sampling, sketch-balanced bucketing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.operators import pipeline as P


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

def test_decontaminate_matches_plain_gram_join(spark, docs):
    from cuckoofilter_spark.operators.dedup import shingles

    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    got = {(r["doc_id"], r["n_overlap"])
           for r in P.decontaminate(spark, train, bench, n=5).collect()}

    bg = shingles(bench, n=5).select("gram").distinct()
    want = {(r["doc_id"], r["n_overlap"]) for r in
            shingles(train, n=5).join(bg, "gram", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("n_overlap"))
            .collect()}
    assert got == want and len(got) > 0


def test_decontaminate_planted_overlap(spark):
    # doc 100 copies a 5-gram run from bench doc 0; doc 101 shares nothing
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(100, "xx beta gamma delta epsilon zeta yy"),
         (101, "one two three four five six seven")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["n_overlap"]
            for r in P.decontaminate(spark, train, bench, n=5).collect()}
    # "beta gamma delta epsilon zeta" is the single shared 5-gram
    assert rows == {100: 1}


def test_decontaminate_plan_probes_before_join(spark, docs):
    """The broadcast-filter probe must prune the train gram stream as a
    narrow Filter BEFORE the exact verify join, and the whole operator
    stays within its shuffle budget (bench distinct + join side +
    final groupBy)."""
    from cuckoofilter_spark.plans import count_exchanges, explain_str

    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    out = P.decontaminate(spark, train, bench, n=5)
    plan = explain_str(out, "simple")
    probe = plan.find("Filter pythonUDF")
    join = max(plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
    assert probe != -1 and join != -1 and join < probe  # probe deeper (below)
    assert count_exchanges(out) <= 3


def test_decontaminate_no_collect_of_grams(spark, docs, monkeypatch):
    """The gram stream must never be collected — only scalar sizing
    aggregates and the ≤N-row result come to the driver."""
    from pyspark.sql import DataFrame

    orig = DataFrame.collect

    def guarded(self):
        rows = orig(self)
        assert len(rows) <= 1000, f"driver collect of {len(rows)} rows"
        return rows

    monkeypatch.setattr(DataFrame, "collect", guarded)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    assert P.decontaminate(spark, train, bench, n=5).count() > 0


# ---------------------------------------------------------------------------
# prefix_sum / pack_sequences
# ---------------------------------------------------------------------------

def test_prefix_sum_equals_pandas_cumsum(spark, docs):
    w = docs.select("doc_id", F.length("text").cast("long").alias("w"))
    got = P.prefix_sum(w, "doc_id", "w", num_buckets=8).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = w.toPandas().sort_values("doc_id").reset_index(drop=True)
    expect = ref["w"].cumsum() - ref["w"]
    assert (got["doc_id"] == ref["doc_id"]).all()
    assert (got["offset"] == expect).all()


def test_prefix_sum_bucket_count_invariance(spark, docs):
    """The result is independent of the bucketing granularity."""
    w = docs.select("doc_id", F.length("text").cast("long").alias("w"))
    a = P.prefix_sum(w, "doc_id", "w", num_buckets=2).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = P.prefix_sum(w, "doc_id", "w", num_buckets=31).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_covers_stream_exactly(spark, docs):
    """Chunk spans tile the concatenated token stream: doc i+1 starts
    where doc i ended, and every chunk id up to the last is used."""
    w = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    out = P.pack_sequences(w, seq_len=128, num_buckets=8).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["offset"] + out["n_tok"]).iloc[:-1].equals(
        out["offset"].iloc[1:].reset_index(drop=True))
    total = int(out["n_tok"].sum())
    assert int(out["chunk_last"].max()) == (total - 1) // 128
    assert (out["n_chunks"] == out["chunk_last"] - out["chunk_first"] + 1).all()


def test_pack_chunks_content_exact(spark, docs):
    """Every chunk is full except the last, totals match, and chunk 0's
    digest equals the md5 of the first seq_len words computed directly."""
    import hashlib

    L = 128
    out = P.pack_chunks(docs, seq_len=L).toPandas() \
        .sort_values("chunk_id").reset_index(drop=True)
    total = int(out["n_tok"].sum())
    assert (out["n_tok"].iloc[:-1] == L).all()
    assert 0 < int(out["n_tok"].iloc[-1]) <= L
    assert len(out) == (total + L - 1) // L

    stream = []
    for r in docs.select("doc_id", "text").collect():
        stream.append((r["doc_id"], r["text"]))
    words = " ".join(t for _, t in sorted(stream)).split(" ")
    assert total == len(words)
    want = hashlib.md5(" ".join(words[:L]).encode()).hexdigest()
    assert out["chunk_md5"].iloc[0] == want


def test_prefix_sum_no_single_partition_sort(spark, docs):
    """The plan must not contain a global (single-partition) Sort — the
    whole point vs a bare ORDER BY window."""
    w = docs.select("doc_id", F.length("text").cast("long").alias("w"))
    plan = P.prefix_sum(w, "doc_id", "w", num_buckets=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# shuffle_rank
# ---------------------------------------------------------------------------

def test_shuffle_rank_is_a_permutation(spark, docs):
    out = P.shuffle_rank(docs.select("doc_id"), "doc_id").toPandas()
    n = len(out)
    assert sorted(out["shuffle_rank"]) == list(range(n))
    # and it is not the identity (the point of shuffling)
    assert (out.sort_values("doc_id")["shuffle_rank"].to_numpy()
            != range(n)).any()


def test_shuffle_rank_salt_gives_new_permutation(spark, docs):
    ids = docs.select("doc_id")
    a = P.shuffle_rank(ids, "doc_id", salt="e1").toPandas() \
        .sort_values("doc_id")["shuffle_rank"].to_numpy()
    b = P.shuffle_rank(ids, "doc_id", salt="e2").toPandas() \
        .sort_values("doc_id")["shuffle_rank"].to_numpy()
    c = P.shuffle_rank(ids, "doc_id", salt="e1").toPandas() \
        .sort_values("doc_id")["shuffle_rank"].to_numpy()
    assert (a != b).any() and (a == c).all()


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_stable(spark, docs):
    rates = {f"src{i}": 0.5 for i in range(20)}
    a = {r["doc_id"] for r in P.stratified_sample(docs, "source", rates).collect()}
    b = {r["doc_id"] for r in P.stratified_sample(docs, "source", rates).collect()}
    assert a == b and 0 < len(a) < 500
    # stability under corpus growth: a subset corpus keeps the same rows
    sub = docs.filter(F.col("doc_id") < 200)
    c = {r["doc_id"] for r in P.stratified_sample(sub, "source", rates).collect()}
    assert c == {d for d in a if d < 200}


def test_stratified_sample_rates_within_binomial_band(spark, docs):
    rates = {f"src{i}": [0.2, 0.8][i % 2] for i in range(20)}
    got = (P.stratified_sample(docs, "source", rates)
           .groupBy("source").agg(F.count("*").alias("kept")).collect())
    per = {r["source"]: r["kept"] for r in got}
    n_per = {r["source"]: r["cnt"] for r in
             docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    for s, n in n_per.items():
        p = rates[s]
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(per.get(s, 0) - n * p) <= 4 * sigma + 1


def test_stratified_sample_unknown_stratum_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string")
    out = P.stratified_sample(df, "source", {"a": 1.0})
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_stratified_sample_salt_changes_sample(spark, docs):
    rates = {f"src{i}": 0.5 for i in range(20)}
    a = {r["doc_id"] for r in
         P.stratified_sample(docs, "source", rates, salt="v1").collect()}
    b = {r["doc_id"] for r in
         P.stratified_sample(docs, "source", rates, salt="v2").collect()}
    assert a != b


def test_stratified_sample_is_shuffle_free(spark, docs):
    """The rate map joins by broadcast and the hash filter is narrow —
    zero shuffle exchanges in the plan."""
    from cuckoofilter_spark.plans import count_exchanges

    rates = {f"src{i}": 0.5 for i in range(20)}
    assert count_exchanges(P.stratified_sample(docs, "source", rates)) == 0


def test_shingles_linear_in_document_length(spark):
    """Regression for the O(words²) inline-split re-evaluation: one
    20k-word document shingles in well under a second warm (the broken
    plan took ~125 s).  A 30 s ceiling leaves 50× margin for host
    noise while still failing decisively if the quadratic returns."""
    import time

    from cuckoofilter_spark.operators.dedup import shingles

    text = " ".join(f"w{i % 97}x{i % 89}" for i in range(20000))
    big = spark.createDataFrame([(1, text)], "doc_id long, text string")
    q = shingles(big, n=5).agg(F.sum(F.col("gram") % 1000003))
    q.collect()  # JIT/codegen warm-up
    t0 = time.time()
    q.collect()
    assert time.time() - t0 < 30


# ---------------------------------------------------------------------------
# quantile_buckets
# ---------------------------------------------------------------------------

def test_quantile_buckets_partition_and_balance(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_totalprice")
    B = 8
    bounds, bucketed, sk = P.quantile_buckets(orders, "o_totalprice", B, k=512)
    assert len(bounds) == B - 1 and bounds == sorted(bounds)
    counts = {r["bucket"]: r["cnt"] for r in
              bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
              .collect()}
    n = orders.count()
    assert sum(counts.values()) == n          # a partition of the relation
    assert set(counts) <= set(range(B))
    slack = 6 * sk.rank_error * n
    for b in range(B):
        assert abs(counts.get(b, 0) - n / B) <= slack


# ---------------------------------------------------------------------------
# mix_sources (temperature-weighted source mixing)
# ---------------------------------------------------------------------------

def test_mix_sources_integer_rule_reproducible_in_python(spark):
    """The survivor set is exactly the pure-integer rule h·q_s < 2^32·q_min
    recomputed independently in Python — bit-reproducibility across
    engines, which is the operator's whole contract."""
    import hashlib
    import math

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {r["doc_id"] for r in P.mix_sources(df).collect()}

    q = {"big": math.isqrt(900), "small": math.isqrt(100)}
    qmin = min(q.values())
    expect = set()
    for i, s in rows:
        h = int(hashlib.md5(f"{i}|mix1".encode()).hexdigest()[:8], 16)
        if h * q[s] < (1 << 32) * qmin:
            expect.add(i)
    assert kept == expect
    # smallest source keeps everything; big is cut to ~q_min/q_big = 1/3
    assert {i for i in kept if i >= 900} == set(range(900, 1000))
    n_big = sum(1 for i in kept if i < 900)
    assert abs(n_big - 300) <= 4 * (900 * (1 / 3) * (2 / 3)) ** 0.5


def test_mix_sources_sqrt_mixture_shape(spark):
    """Sampled counts follow the α=0.5 temperature: a 100×-larger source
    contributes ~10× the rows, not 100×."""
    rows = [(i, "xl") for i in range(10000)] + [(10000 + i, "xs") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    per = {r["source"]: r["c"] for r in
           P.mix_sources(df).groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert per["xs"] == 100
    # expected xl keep ≈ 10000·(10/100) = 1000 → ratio ≈ 10×, not 100×
    assert 800 <= per["xl"] <= 1200


def test_mix_sources_single_small_shuffle(spark, docs):
    """Only the |sources|-row count aggregate shuffles; the corpus-side
    filter is a broadcast join + narrow filter."""
    from cuckoofilter_spark.plans import count_exchanges

    out = P.mix_sources(docs)
    # the tiny groupBy(count) pair of exchanges is the only shuffle; the
    # docs-side path must contribute none (no repartition of the corpus)
    assert count_exchanges(out) <= 2
    assert "BroadcastExchange" in out._jdf.queryExecution().executedPlan().toString()


def test_rare_bigrams_hand_values(spark):
    from cuckoofilter_spark.operators.pipeline import rare_bigrams

    docs = spark.createDataFrame(
        [(0, "a b c d"),    # bigrams: ab bc cd
         (1, "a b c e"),    # bigrams: ab bc ce
         (2, "a b x"),      # bigrams: ab bx
         (3, "z")],         # < 2 words -> excluded
        "doc_id long, text string")
    # corpus counts: ab=3, bc=2, cd=1, ce=1, bx=1 -> rare (cnt<=2): all but ab
    got = {r["doc_id"]: r for r in rare_bigrams(docs, rare_max=2).collect()}
    assert 3 not in got and len(got) == 3
    assert (got[0]["n_bigrams"], got[0]["n_rare"]) == (3, 2)
    assert got[0]["rare_ratio_x1e4"] == 6666
    assert (got[1]["n_bigrams"], got[1]["n_rare"]) == (3, 2)
    assert (got[2]["n_bigrams"], got[2]["n_rare"]) == (2, 1)
    assert got[2]["rare_ratio_x1e4"] == 5000


def test_pack_chunks_tokens_col_matches_text_path(spark):
    """Packing pre-tokenized int arrays must produce the identical chunk
    relation as packing the equivalent stringified text."""
    from cuckoofilter_spark.operators.pipeline import pack_chunks

    rows = [(i, list(range(i * 7, i * 7 + 5 + (i % 11)))) for i in range(40)]
    toks = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    texts = spark.createDataFrame(
        [(i, " ".join(str(t) for t in ts)) for i, ts in rows],
        "doc_id long, text string")
    a = {(r["chunk_id"], r["n_tok"], r["chunk_md5"])
         for r in pack_chunks(toks, 16, tokens_col="tokens",
                              num_buckets=4).collect()}
    b = {(r["chunk_id"], r["n_tok"], r["chunk_md5"])
         for r in pack_chunks(texts, 16, num_buckets=4).collect()}
    assert a == b and len(a) > 1


def test_tokens_pack_bucket_invariance(spark):
    """num_buckets is a pure parallelism knob: the 8-bucket and 32-bucket
    packs of the same token stream must produce byte-identical
    (chunk_id, n_tok, chunk_md5) relations — the packing analog of the
    north rule's identical-estimates-at-N-and-4N obligation.  (Moved here
    from the q_tokens_pack oracle query, which now runs ONE pipeline.)"""
    import pyspark.sql.functions as F

    from cuckoofilter_spark.operators.pipeline import pack_chunks
    from cuckoofilter_spark.sources.tokens import synth_tokens_df

    toks = (synth_tokens_df(spark, 120, seed=42, num_partitions=8)
            .withColumn("_ord", F.substring("doc_id", 4, 8).cast("long")))
    a = {(r["chunk_id"], r["n_tok"], r["chunk_md5"])
         for r in pack_chunks(toks, 256, order_col="_ord",
                              tokens_col="tokens", num_buckets=32).collect()}
    b = {(r["chunk_id"], r["n_tok"], r["chunk_md5"])
         for r in pack_chunks(toks, 256, order_col="_ord",
                              tokens_col="tokens", num_buckets=8).collect()}
    assert a == b and len(a) > 1


def test_mix_sources_empty_input_returns_empty(spark):
    from cuckoofilter_spark.operators.pipeline import mix_sources

    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string")
    assert mix_sources(docs).count() == 0


def test_bucket_column_collision_rejected(spark):
    import pytest

    from cuckoofilter_spark.operators.pipeline import quantile_buckets

    df = spark.createDataFrame([(1, 2)], "v long, bucket long")
    with pytest.raises(AssertionError):
        quantile_buckets(df, "v", 4)
