"""Near-dup detection directly on the input_hint token table
(operators/dedup.py:token_shingles + the shared MinHash/LSH/verify
machinery)."""

from pyspark.sql import functions as F

from cuckoofilter_spark.operators.dedup import minhash_near_dups, token_shingles


def test_token_shingles_hand_values(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3, 4]), ("b", [9, 9]), ("c", [1, 2, 3, 1, 2, 3])],
        "doc_id string, tokens array<int>")
    got = {(r["doc_id"], r["gram"]) for r in token_shingles(df, n=3).collect()}
    # doc a: exactly the two sliding 3-grams; doc b too short -> absent;
    # doc c: four positions, deduped to three distinct grams
    a_grams = {g for d, g in got if d == "a"}
    c_grams = {g for d, g in got if d == "c"}
    assert len(a_grams) == 2
    assert not any(d == "b" for d, _ in got)
    assert len(c_grams) == 3  # (1,2,3) twice -> once, plus (2,3,1), (3,1,2)
    assert a_grams & c_grams  # the shared (1,2,3) gram hashes identically


def test_planted_token_neardups_recovered_exactly(spark):
    from cuckoofilter_spark.sources.tokens import VOCAB, synth_tokens_df

    base = synth_tokens_df(spark, 60, seed=7, num_partitions=4)
    idx = F.substring("doc_id", 4, 8).cast("int")
    mutated = (
        base.filter(idx % 10 == 0)
        .select(F.concat(F.lit("dup"), "doc_id").alias("doc_id"),
                F.transform("tokens", lambda t, i: F.when(
                    i % 37 == 0, (t + 1) % VOCAB).otherwise(t)).alias("tokens"),
                "n_tok", "source"))
    corpus = base.unionByName(mutated)
    sh = token_shingles(corpus, n=3).persist()
    pairs = {(r["d1"], r["d2"])
             for r in minhash_near_dups(corpus, tau_x1e4=7000, sh=sh).collect()}
    sh.unpersist()
    planted = {(f"doc{i:08d}", f"dupdoc{i:08d}") for i in range(0, 60, 10)}
    assert pairs == planted
