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


def test_minhash_signatures_single_shuffle(spark, sf01_dir):
    from cuckoofilter_spark.operators.dedup import minhash_signatures, shingles

    sh = shingles(spark.read.parquet(f"{sf01_dir}/documents.parquet"), 3)
    sig = minhash_signatures(sh, num_hashes=16)
    # shingles distinct (1) + signature groupBy (1)
    assert count_exchanges(sig) <= 2


def test_topk_broadcasts_queries(spark, sf01_dir):
    """Corpus side must NOT shuffle for the top-k join — queries broadcast."""
    from cuckoofilter_spark.operators.similarity import cosine_topk
    from cuckoofilter_spark.plans import explain_str

    emb = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    df = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_round_robin_exchange_counted_once(spark, sf_dir):
    """repartition(n) is ONE shuffle — the audit must not double-count
    RoundRobinPartitioning exchanges."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(7)
    assert count_exchanges(df) == 1
