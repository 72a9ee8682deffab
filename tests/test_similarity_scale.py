"""Approximate-similarity scale paths: IVF and RP-LSH vs the exact
brute-force baseline — recall bounds, not exactness (by construction)."""

import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_neardup_pairs,
    neardup_pairs_blas,
)


@pytest.fixture(scope="module")
def emb(spark, sf01_dir):
    return spark.read.parquet(f"{sf01_dir}/embeddings.parquet")


def test_ivf_topk_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    cent = kmeans_centroids(emb, n_clusters=16, seed=42, sample=500)
    approx = ivf_topk(emb, queries, cent, k=5, nprobe=4)

    e = {(r["q_id"], r["nbr_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["nbr_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # nprobe=4/16 cells scanned


def test_ivf_scores_match_exact_on_hits(spark, emb):
    """Where IVF returns a pair the exact search also returns, the scores
    are identical (same rescoring arithmetic)."""
    queries = emb.filter(F.col("vec_id") < 10)
    cent = kmeans_centroids(emb, n_clusters=16, seed=42, sample=500)
    e = {(r["q_id"], r["nbr_id"]): r["cos_x1e4"]
         for r in cosine_topk(emb, queries, k=5).collect()}
    for r in ivf_topk(emb, queries, cent, k=5, nprobe=4).collect():
        key = (r["q_id"], r["nbr_id"])
        if key in e:
            assert e[key] == r["cos_x1e4"]


def test_blas_neardup_matches_bruteforce(spark, emb):
    """Distributed blocked GEMM = the naive expression-based all-pairs,
    pair for pair and score for score."""
    from cuckoofilter_spark.operators.similarity import neardup_pairs

    small = emb.filter(F.col("vec_id") < 400)
    brute = {(r["v1"], r["v2"]): r["cos_x1e4"]
             for r in neardup_pairs(small, tau_x1e4=4000).collect()}
    blas = {(r["v1"], r["v2"]): r["cos_x1e4"]
            for r in neardup_pairs_blas(small, tau_x1e4=4000, block=128).collect()}
    assert blas == brute and len(brute) > 0


def test_blas_neardup_no_driver_collect(spark, emb, monkeypatch):
    """The scale gate from VERDICT r1: the corpus must never be collected
    to the driver — plan construction AND execution run with
    DataFrame.collect forbidden (toPandas-based result fetch only)."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("driver-side collect in neardup_pairs_blas")

    monkeypatch.setattr(DataFrame, "collect", boom)
    out = neardup_pairs_blas(emb.filter(F.col("vec_id") < 300),
                             tau_x1e4=4000, block=64)
    n = out.count()  # executes the whole plan
    assert n > 0


def test_ivf_topk_no_driver_collect(spark, emb, monkeypatch):
    """VERDICT r3 #5: query vectors must not be collected either — with
    centroids in hand (the bounded k-means sample is allowed), building
    AND executing the whole IVF plan runs with DataFrame.collect
    forbidden, so corpus-vs-corpus probing never bottlenecks the driver."""
    from pyspark.sql import DataFrame

    queries = emb.filter(F.col("vec_id") < 20)
    cent = kmeans_centroids(emb, n_clusters=16, seed=42, sample=500)

    def boom(self):
        raise AssertionError("driver-side collect in ivf_topk")

    monkeypatch.setattr(DataFrame, "collect", boom)
    n = ivf_topk(emb, queries, cent, k=5, nprobe=4).count()
    assert n > 0


def test_ivf_probe_cells_match_driver_argsort(spark, emb):
    """The distributed probe-cell assignment equals the per-row NumPy
    argsort computed locally (same GEMM, same tie behavior)."""
    import numpy as np

    from cuckoofilter_spark.operators.similarity import ivf_probe_cells

    queries = emb.filter(F.col("vec_id") < 30)
    cent = kmeans_centroids(emb, n_clusters=16, seed=42, sample=500)
    got = {(r["q_id"], r["cell"])
           for r in ivf_probe_cells(queries, cent, nprobe=4).collect()}
    rows = queries.select("vec_id", "embedding").collect()
    qm = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    top = np.argsort(-(qm @ cent.T), axis=1)[:, :4]
    want = {(int(r[0]), int(c)) for r, row in zip(rows, top) for c in row}
    assert got == want and len(want) == 30 * 4


def test_kmeans_sampling_partitioning_invariant(spark, emb):
    """Hash-threshold sampling → identical centroids whatever the input
    partitioning (the north_rule N-vs-4N invariance), and no global sort."""
    import numpy as np

    c1 = kmeans_centroids(emb, n_clusters=8, seed=42, sample=300)
    c2 = kmeans_centroids(emb.repartition(17), n_clusters=8, seed=42, sample=300)
    assert np.array_equal(c1, c2)


def test_lsh_neardup_recall_vs_exact(spark, emb):
    exact = {(r["v1"], r["v2"]) for r in
             neardup_pairs_blas(emb, tau_x1e4=4000).collect()}
    got = {(r["v1"], r["v2"]) for r in
           lsh_neardup_pairs(emb, tau_x1e4=4000, nbits=4, tables=16,
                             seed=1).collect()}
    assert got <= exact or not exact  # no false positives (exact rescoring)
    if exact:
        # τ=0.4 ⇒ θ≈66°, per-bit p≈0.63: P(candidate) = 1-(1-p^4)^16 ≈ 0.94
        assert len(got & exact) / len(exact) >= 0.6


def test_canonical_pair_score_is_shape_independent():
    """The emitted cos_x1e4 for a pair must not depend on how many pairs
    were scored in the same kernel call (the cross-kernel floor hazard)."""
    import numpy as np

    from cuckoofilter_spark.operators.similarity import _canon_cos_x1e4

    rng = np.random.default_rng(3)
    M = rng.standard_normal((64, 64))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    i = np.arange(63)
    j = i + 1
    batch = _canon_cos_x1e4(M[i], M[j])
    for k in range(0, 63, 7):
        solo = _canon_cos_x1e4(M[i[k:k + 1]], M[j[k:k + 1]])
        assert solo[0] == batch[k]


def test_cos_udf_bit_identical_to_expression_fold(spark, emb):
    """cos_x1e4_udf = floor(cosine(a,b)*1e4) value for value on real
    embeddings — the NumPy kernel accumulates dims sequentially exactly
    like the Catalyst fold, so floor-boundary values cannot diverge."""
    from cuckoofilter_spark.operators.similarity import cos_x1e4_udf, cosine

    q = (emb.filter(F.col("vec_id") < 50)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    c = emb.select(F.col("vec_id").alias("nbr_id"),
                   F.col("embedding").alias("n_vec"))
    pairs = c.join(F.broadcast(q), F.col("nbr_id") != F.col("q_id"))
    score = cos_x1e4_udf()
    both = pairs.select(
        "q_id", "nbr_id",
        score(F.col("q_vec"), F.col("n_vec")).alias("udf"),
        F.floor(cosine(F.col("q_vec"), F.col("n_vec")) * 10000)
        .cast("long").alias("expr"))
    n_diff = both.filter(F.col("udf") != F.col("expr")).count()
    assert n_diff == 0
    n_corpus = emb.count()
    assert both.count() == 50 * n_corpus - 50


def test_cos_udf_degenerate_inputs_defined(spark):
    """NULL / ragged / zero-norm / NaN pairs → NULL (ADVICE r4): the
    expression fold NULL-propagates for missing/ragged arrays and RAISES
    (ANSI DIVIDE_BY_ZERO) for zero norms — the UDF must neither crash in
    np.stack nor emit np.floor(nan).astype's platform-defined int64, and
    well-formed rows in the same batch must stay expression-identical."""
    from cuckoofilter_spark.operators.similarity import cos_x1e4_udf, cosine

    rows = [
        ("ok", [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        ("anti", [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),
        ("null_a", None, [1.0, 2.0, 3.0]),
        ("null_b", [1.0, 2.0, 3.0], None),
        ("ragged", [1.0, 2.0], [1.0, 2.0, 3.0]),
        ("zero_a", [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),
        ("zero_both", [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]),
        ("nan_a", [float("nan"), 1.0, 2.0], [1.0, 2.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "tag string, a array<double>, b array<double>")
    score = cos_x1e4_udf()
    got = {r["tag"]: r["udf"]
           for r in df.select(
               "tag", score(F.col("a"), F.col("b")).alias("udf")).collect()}
    assert got["ok"] == 10000
    assert got["anti"] == -10000
    for tag in ("null_a", "null_b", "ragged", "zero_a", "zero_both", "nan_a"):
        assert got[tag] is None, tag
    # well-formed rows still match the expression fold even when batched
    # alongside degenerate ones
    wf = df.filter(F.col("tag").isin("ok", "anti"))
    both = wf.select(
        score(F.col("a"), F.col("b")).alias("udf"),
        F.floor(cosine(F.col("a"), F.col("b")) * 10000)
        .cast("long").alias("expr"))
    assert both.filter(F.col("udf") != F.col("expr")).count() == 0
