"""Scale hygiene as assertions: pruning, pushdown, shuffle counts, codegen
— the `.explain("formatted")`-and-iterate loop, made permanent."""

from pyspark.sql import functions as F

from cuckoofilter_spark.plans import plan_report, read_schema_columns, count_exchanges


def test_build_projection_prunes_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey")
    assert read_schema_columns(df) == ["l_partkey"]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .filter(F.col("l_partkey") > 100).select("l_partkey"))
    rep = plan_report(df)
    assert "l_partkey" in rep["pushed_filters"]
    assert rep["read_schema"] == ["l_partkey"]
    assert rep["codegen"]


def test_token_stats_is_shuffle_free(spark, sf01_dir):
    """Per-doc text analytics are narrow maps — zero exchanges."""
    from cuckoofilter_spark.operators.text import token_stats

    df = token_stats(spark.read.parquet(f"{sf01_dir}/documents.parquet"))
    assert count_exchanges(df) == 0
    assert read_schema_columns(df) == ["doc_id", "text"]


def test_exact_dedup_single_shuffle(spark, sf01_dir):
    from cuckoofilter_spark.operators.dedup import exact_dedup

    df = exact_dedup(spark.read.parquet(f"{sf01_dir}/documents.parquet"))
    assert count_exchanges(df) == 1  # the groupBy(digest) — nothing else


def test_shingles_are_shuffle_free(spark, sf01_dir):
    """Per-doc distinct happens narrow (array_distinct in the row) — the
    exploded corpus must NEVER shuffle just to deduplicate shingles."""
    from cuckoofilter_spark.operators.dedup import shingles

    sh = shingles(spark.read.parquet(f"{sf01_dir}/documents.parquet"), 3)
    assert count_exchanges(sh) == 0


def test_minhash_signatures_single_shuffle(spark, sf01_dir):
    from cuckoofilter_spark.operators.dedup import minhash_signatures, shingles

    sh = shingles(spark.read.parquet(f"{sf01_dir}/documents.parquet"), 3)
    sig = minhash_signatures(sh, num_hashes=16)
    # the signature groupBy is the ONLY exchange (shingling is narrow)
    assert count_exchanges(sig) == 1


def test_minhash_signatures_inrow_zero_shuffle_and_value_identical(
        spark, sf01_dir):
    """The in-row signature path (array_min over the per-doc gram array)
    is a narrow projection — ZERO exchanges — and value-identical to the
    grouped formulation over the exploded relation."""
    from cuckoofilter_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_inrow,
        shingle_arrays,
    )

    docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    arrays = shingle_arrays(docs, 3)
    inrow = minhash_signatures_inrow(arrays, num_hashes=16)
    assert count_exchanges(inrow) == 0
    grouped = minhash_signatures(
        arrays.selectExpr("doc_id", "explode(grams) AS gram"), num_hashes=16)
    a = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
         for r in inrow.collect()}
    b = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
         for r in grouped.collect()}
    assert a == b and len(a) > 400


def test_topk_broadcasts_queries(spark, sf01_dir):
    """Corpus side must NOT shuffle for the top-k join — queries broadcast."""
    from cuckoofilter_spark.operators.similarity import cosine_topk
    from cuckoofilter_spark.plans import explain_str

    emb = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    df = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_rank_filters_compile_to_window_group_limit(spark, sf01_dir):
    """The rank-≤-k filter must compile to Spark 4's WindowGroupLimit so
    each map task keeps only its partial top-k BEFORE the window shuffle —
    without it the full scored relation shuffles (the docstring-claimed
    pushdown in similarity.cosine_topk and the per-brand top-n query).  A
    conf change disabling the rewrite must fail here, not silently
    regress."""
    from cuckoofilter_spark.operators.similarity import cosine_topk
    from cuckoofilter_spark.plans import explain_str
    from cuckoofilter_spark.queries import q_top_parts_per_brand

    emb = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    topk = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    assert "WindowGroupLimit" in explain_str(topk, "simple")
    brand = q_top_parts_per_brand(spark, sf01_dir)
    assert "WindowGroupLimit" in explain_str(brand, "simple")


def test_round_robin_exchange_counted_once(spark, sf_dir):
    """repartition(n) is ONE shuffle — the audit must not double-count
    RoundRobinPartitioning exchanges."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(7)
    assert count_exchanges(df) == 1


def test_frame_sample_plan_prunes_payload(spark, sf_dir):
    """The metadata-only frame grid must never read the binary payload:
    ReadSchema on the scan excludes it (media rows are MBs — reading
    payloads for a frame-index plan is the 100TB mistake)."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.multimodal import frame_sample_plan

    path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("video").alias("media_type"),
        (F.floor(F.length("text") / 50) + 1).cast("int").alias("n_frames"))
    # write as a real media table so the scan is a fresh parquet relation
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "media")
        media.write.parquet(p)
        frames = frame_sample_plan(spark.read.parquet(p), every_n=10)
        cols = read_schema_columns(frames)
        assert "payload" not in cols, cols
        assert "n_frames" in cols
        assert frames.count() > 0


def test_simhash_inrow_zero_shuffle_and_value_identical(spark, sf01_dir):
    """simhash_inrow = simhash over the exploded relation, bit for bit,
    with zero exchanges (grams hashed once behind a projection, nbits
    sign tests as narrow array passes)."""
    from cuckoofilter_spark.operators.dedup import (
        shingle_arrays,
        simhash,
        simhash_inrow,
    )

    docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    arrays = shingle_arrays(docs, 3)
    inrow = simhash_inrow(arrays)
    assert count_exchanges(inrow) == 0
    a = {r["doc_id"]: r["simhash"] for r in inrow.collect()}
    b = {r["doc_id"]: r["simhash"] for r in
         simhash(arrays.selectExpr("doc_id", "explode(grams) AS gram"))
         .collect()}
    assert a == b and len(a) > 400


def test_gram_pipeline_never_sinks_below_a_repartition(spark, sf01_dir):
    """Regression gate for the r5 plan defect: with plain explode,
    InferFiltersFromGenerate derives size/isnotnull predicates whose
    pushdown substitutes the ENTIRE split+n-gram+hash expression through
    the projections and below an upstream repartition — the gram pipeline
    then ran (twice) inside the single pre-shuffle scan task.  With
    explode_outer, every node below the round-robin exchange must be
    hash-free (scan / cheap filter / column projection only)."""
    import re

    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.dedup import shingles
    from cuckoofilter_spark.plans import explain_str

    docs = spark.read.parquet(f"{sf01_dir}/documents.parquet").repartition(8)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    plan = explain_str(
        shingles(bench, n=5).select("gram").distinct(), "formatted")
    nodes = {
        int(m.group(1)): (m.group(2).strip(), m.group(3))
        for m in re.finditer(
            r"\((\d+)\) (\w[\w ]*)\n(.*?)(?=\n\(\d+\) |\Z)", plan, re.S)
    }
    rr = [k for k, (name, body) in nodes.items()
          if name.startswith("Exchange") and "RoundRobinPartitioning" in body]
    assert rr, f"fan-out repartition missing from the plan:\n{plan[:800]}"
    below = min(rr)
    assert any("xxhash64" in body for k, (_, body) in nodes.items()
               if k > below), "gram hashing disappeared from the plan"
    offenders = [k for k, (_, body) in nodes.items()
                 if k < below and "xxhash64" in body]
    assert not offenders, (
        f"gram expression pushed below the repartition again "
        f"(nodes {offenders}):\n{plan[:1200]}")
