"""Gopher-style repetition signals: exact values on hand-computed docs,
shuffle-free plan, and agreement with an explode+groupBy re-derivation."""

import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.text import repetition_signals


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        # all-same word: every signal saturates
        (1, "a a a a"),
        # distinct words: top word 1/6, no duplicate grams
        (2, "a b c d e f"),
        # "a b" repeated 3x: dup 2-grams dominate
        (3, "a b a b a b"),
        # single word: no grams at all
        (4, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_exact_values(toy):
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(toy).collect()}
    assert got[1] == dict(doc_id=1, n_words=4, top_word_frac_x1e4=10000,
                          dup_2gram_frac_x1e4=10000, dup_3gram_frac_x1e4=10000,
                          repetitive=True)
    assert got[2] == dict(doc_id=2, n_words=6, top_word_frac_x1e4=1666,
                          dup_2gram_frac_x1e4=0, dup_3gram_frac_x1e4=0,
                          repetitive=False)
    # doc 3: words a×3 b×3 → top 5000; 2-grams [ab,ba,ab,ba,ab] → all 5 dup;
    # 3-grams [aba,bab,aba,bab] → all 4 dup
    assert got[3] == dict(doc_id=3, n_words=6, top_word_frac_x1e4=5000,
                          dup_2gram_frac_x1e4=10000, dup_3gram_frac_x1e4=10000,
                          repetitive=True)
    assert got[4] == dict(doc_id=4, n_words=1, top_word_frac_x1e4=10000,
                          dup_2gram_frac_x1e4=0, dup_3gram_frac_x1e4=0,
                          repetitive=True)


def test_repetition_signals_match_explode_groupby(spark, sf_dir):
    """The sorted-array aggregate pass must equal the classic (shuffling)
    explode + groupBy multiplicity computation on real corpus docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    got = {r["doc_id"]: (r["top_word_frac_x1e4"], r["dup_3gram_frac_x1e4"])
           for r in repetition_signals(docs).collect()}

    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n = {r["doc_id"]: r["n"] for r in
         ws.select("doc_id", F.size("ws").alias("n")).collect()}
    top = {r["doc_id"]: r["m"] for r in
           (ws.select("doc_id", F.explode("ws").alias("w"))
            .groupBy("doc_id", "w").count()
            .groupBy("doc_id").agg(F.max("count").alias("m")).collect())}
    g3 = ws.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("ws") - 2, F.lit(0))),
            lambda i: F.concat_ws("\x01", F.element_at("ws", i),
                                  F.element_at("ws", i + 1),
                                  F.element_at("ws", i + 2)))).alias("g"))
    dup3 = {r["doc_id"]: (r["dup"] or 0, r["tot"]) for r in
            (g3.groupBy("doc_id", "g").count()
             .groupBy("doc_id")
             .agg(F.sum(F.when(F.col("count") >= 2, F.col("count"))).alias("dup"),
                  F.sum("count").alias("tot")).collect())}
    for d, (tw, d3) in got.items():
        assert tw == top[d] * 10000 // n[d]
        dd, tt = dup3[d]
        assert d3 == (dd * 10000 // tt if tt else 0)


def test_repetition_signals_shuffle_free(spark, sf01_dir):
    from cuckoofilter_spark.plans import count_exchanges, read_schema_columns

    df = repetition_signals(spark.read.parquet(f"{sf01_dir}/documents.parquet"))
    assert count_exchanges(df) == 0
    assert read_schema_columns(df) == ["doc_id", "text"]


def test_pii_scrub_redacts_and_counts(spark):
    from cuckoofilter_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a.b-c_d@ex-1.co.uk now 555-123-4567 or 10.0.0.255 end"),
         (2, "no pii here just words"),
         (3, "two mails x@y.io z@w.ai and 999.999.999.999")],
        "doc_id int, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["scrubbed"] == "mail <EMAIL> now <PHONE> or <IP> end"
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ip"]) == (1, 1, 1)
    assert got[2]["scrubbed"] == got[2]["text"]
    assert got[3]["n_email"] == 2 and got[3]["n_ip"] == 1  # regex, not semantic


def test_pii_scrub_is_shuffle_free(spark):
    from cuckoofilter_spark.operators.text import pii_scrub

    df = spark.createDataFrame([(1, "a@b.co")], "doc_id int, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_text_signals_fused_equals_joined_and_shuffle_free(spark):
    """operators/text.text_signals = token_stats ⨝ quality ⨝ lang_id value
    for value, in ONE narrow projection: zero Exchange in the fused plan
    (the join form would be three scans + two shuffles at corpus scale)."""
    from cuckoofilter_spark.operators.text import (
        lang_id,
        quality_score,
        text_signals,
        token_stats,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox is on the hill with a map of the town",
          "en"),
         (2, "der hund ist nicht mit der katze und das ist gut so ja nein "
             "doch immer wieder der fall", "de"),
         (3, "x y z w q r s t u v a1 b2 c3 d4 e5 f6 g7 h8 i9 j0", "und")],
        "doc_id int, text string, lang string")
    fused = {r["doc_id"]: r.asDict() for r in text_signals(df).collect()}
    joined = {r["doc_id"]: r.asDict() for r in
              token_stats(df)
              .join(quality_score(df).drop("n_words"), "doc_id")
              .join(lang_id(df), "doc_id").collect()}
    assert fused == joined and len(fused) == 3
    plan = text_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fingerprints_entry_fused_equals_joined_and_shuffle_free(spark, tmp_path):
    """q_fingerprints (merged driver entry) = q_fingerprint ⨝
    q_rolling_fingerprint value for value, with zero Exchange in the
    fused plan."""
    import os

    from cuckoofilter_spark.queries import (
        q_fingerprint,
        q_fingerprints,
        q_rolling_fingerprint,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(1, "The quick  Brown fox", "en"), (2, "aba aba", "en"),
         (3, "one two three four five", "en")],
        "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    fused = {r["doc_id"]: r.asDict() for r in q_fingerprints(spark, sf).collect()}
    joined = {r["doc_id"]: r.asDict() for r in
              q_fingerprint(spark, sf)
              .join(q_rolling_fingerprint(spark, sf), "doc_id").collect()}
    assert fused == joined and len(fused) == 3
    plan = (q_fingerprints(spark, sf)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


import pytest as _pytest


@_pytest.mark.parametrize("qname", ["token_stats", "quality", "lang_id"])
def test_unmerged_text_building_blocks_match_their_oracles(spark, qname):
    """The unmerged q_token_stats / q_quality / q_lang_id (carried by the
    text_signals driver entry) stay oracle-true standalone — a mini
    check_oracle over each building block at sf0.001."""
    import duckdb

    from cuckoofilter_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    fn = {"token_stats": Q.q_token_stats, "quality": Q.q_quality,
          "lang_id": Q.q_lang_id}[qname]
    sql = {"token_stats": Q.SQL_TOKEN_STATS, "quality": Q.SQL_QUALITY,
           "lang_id": Q.SQL_LANG_ID}[qname]
    df = fn(spark, sf)
    srows = {tuple(str(v) for v in r) for r in
             df.select(*sorted(df.columns)).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    rel = con.sql(sql)
    order = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    orows = {tuple(str(r[i]) for i in order) for r in rel.fetchall()}
    assert srows == orows and len(srows) > 50
