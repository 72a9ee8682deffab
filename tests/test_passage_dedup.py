"""Passage-level (RefinedWeb-style) cross-document dedup
(operators/dedup.py:passage_dedup)."""

import hashlib

from cuckoofilter_spark.operators.dedup import passage_dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


A = " ".join(f"boiler{i}" for i in range(10))       # shared boilerplate
B = " ".join(f"alpha{i}" for i in range(10))
C = " ".join(f"beta{i}" for i in range(10))
TAIL = "short tail"                                  # < 10-word final passage


def test_planted_boilerplate_removed_everywhere(spark):
    docs = spark.createDataFrame(
        [(0, f"{A} {B}"), (1, f"{A} {C}"), (2, f"{B} {TAIL}")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in passage_dedup(docs).collect()}
    # A appears in docs 0 and 1 -> stripped from both; B appears in 0 and 2.
    assert (got[0]["n_passages"], got[0]["n_dup"]) == (2, 2)
    assert got[0]["cleaned_digest"] == _md5("")
    assert (got[1]["n_passages"], got[1]["n_dup"]) == (2, 1)
    assert got[1]["cleaned_digest"] == _md5(C)
    # the trailing partial passage survives untouched
    assert (got[2]["n_passages"], got[2]["n_dup"]) == (2, 1)
    assert got[2]["cleaned_digest"] == _md5(TAIL)


def test_unique_docs_roundtrip_unchanged(spark):
    texts = [(i, " ".join(f"w{i}_{j}" for j in range(23))) for i in range(4)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r for r in passage_dedup(docs).collect()}
    for i, text in texts:
        assert got[i]["n_dup"] == 0
        assert got[i]["n_passages"] == 3  # ceil(23 / 10)
        # join(split(text)) == text on the single-space corpus convention
        assert got[i]["cleaned_digest"] == _md5(text)


def test_within_doc_repetition_counts_toward_min_count(spark):
    docs = spark.createDataFrame(
        [(0, f"{A} {A}"), (1, f"{B} {C}")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in passage_dedup(docs).collect()}
    # A occurs twice inside doc 0 alone -> total count 2 -> boilerplate.
    assert (got[0]["n_passages"], got[0]["n_dup"]) == (2, 2)
    assert got[0]["cleaned_digest"] == _md5("")
    assert got[1]["n_dup"] == 0


def test_min_count_threshold_respected(spark):
    docs = spark.createDataFrame(
        [(0, f"{A} {B}"), (1, f"{A} {C}")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           passage_dedup(docs, min_count=3).collect()}
    # A occurs only twice corpus-wide: below min_count=3, nothing removed.
    assert got[0]["n_dup"] == 0 and got[1]["n_dup"] == 0
    assert got[0]["cleaned_digest"] == _md5(f"{A} {B}")


def test_dup_discovery_shuffles_hashes_not_text(spark):
    """The duplicate-count aggregate must group on the 8-byte xxhash64
    digest — its exchange carries longs, never passage strings."""
    docs = spark.createDataFrame(
        [(0, f"{A} {B}"), (1, f"{A} {C}")], "doc_id long, text string")
    plan = passage_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    import re
    # every hashpartitioning key in the plan must be LONG-typed (the
    # attribute suffix `#<id>L`) — a regression that groups or joins on
    # a passage STRING prints an un-suffixed attribute and fails here
    keys = re.findall(r"hashpartitioning\((\w+)#\d+(L?)[,)]", plan)
    assert keys, plan
    for name, long_suffix in keys:
        assert long_suffix == "L", (name, plan)
