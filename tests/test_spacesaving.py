"""Space-saving / Misra–Gries top-k: the deterministic guarantee
(est ≤ true ≤ est + err; every key with true > err survives), merge laws,
serde, and the distributed build over a string column."""

import numpy as np
import pytest

from cuckoofilter_spark.sketches import deserialize_sketch, serialize_sketch
from cuckoofilter_spark.sketches.spacesaving import SpaceSavingSketch


def _zipf_stream(n, vocab, seed):
    rng = np.random.default_rng(seed)
    return (rng.random(n) ** 3 * vocab).astype(np.int64)


def test_guarantee_on_zipf_stream():
    stream = _zipf_stream(200_000, 10_000, seed=1)
    s = SpaceSavingSketch(k=512)
    for lo in range(0, len(stream), 8192):
        s.update(stream[lo:lo + 8192])
    true = {int(v): int(c) for v, c in
            zip(*np.unique(stream, return_counts=True))}
    for key, t in true.items():
        est = s.estimate(key)
        assert est <= t <= est + s.err, (key, est, t, s.err)
        if t > s.err:
            assert est > 0  # heavy keys can never be evicted for good


def test_merge_keeps_guarantee_and_is_bounded():
    a_stream = _zipf_stream(100_000, 8_000, seed=2)
    b_stream = _zipf_stream(100_000, 8_000, seed=3)
    a, b = SpaceSavingSketch(k=256), SpaceSavingSketch(k=256)
    a.update(a_stream)
    b.update(b_stream)
    m = a.merge(b)
    assert len(m.counts) <= 256
    whole = np.concatenate([a_stream, b_stream])
    true = {int(v): int(c) for v, c in
            zip(*np.unique(whole, return_counts=True))}
    for key, t in sorted(true.items(), key=lambda kv: -kv[1])[:50]:
        est = m.estimate(key)
        assert est <= t <= est + m.err


def test_serde_roundtrip_string_keys():
    s = SpaceSavingSketch(k=64)
    s.update(np.array(["the"] * 50 + ["a"] * 30 + ["rare"]))
    t = deserialize_sketch(serialize_sketch(s))
    assert isinstance(t, SpaceSavingSketch)
    assert t.counts == s.counts and t.err == s.err and t.n_items == s.n_items
    assert t.top(2) == [("the", 50), ("a", 30)]


def test_distributed_build_over_words(spark, sf01_dir):
    from pyspark.sql import functions as F

    from cuckoofilter_spark.operators.sketch_build import build_sketch

    docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    s = build_sketch(words, "w", lambda pid: SpaceSavingSketch(k=4096),
                     num_partitions=8, values="str")
    exact = {r["w"]: r["c"] for r in
             words.groupBy("w").agg(F.count("*").alias("c"))
             .orderBy(F.desc("c"), F.asc("w")).limit(20).collect()}
    for w, t in exact.items():
        est = s.estimate(w)
        assert est <= t <= est + s.err, (w, est, t, s.err)
        assert est > 0


def test_streaming_topk_matches_batch_guarantee(spark, tmp_path):
    """SpaceSaving rides the streaming foreachBatch builder unchanged
    (one sketch protocol): after consuming the stream, every batch-exact
    top word satisfies the est <= true <= est + err guarantee."""
    from pyspark.sql import functions as F

    from cuckoofilter_spark.streaming.incremental import StreamingSketchBuilder

    src = str(tmp_path / "words_src")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    words.repartition(3).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    b = StreamingSketchBuilder(lambda pid: SpaceSavingSketch(k=4096), "w",
                               state_dir=str(tmp_path / "ss_state"),
                               values="str")
    q = (b.attach(stream).option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    exact = {r["w"]: r["c"] for r in
             batch.groupBy("w").agg(F.count("*").alias("c"))
             .orderBy(F.desc("c"), F.asc("w")).limit(20).collect()}
    for w, t in exact.items():
        est = b.sketch.estimate(w)
        assert 0 < est <= t <= est + b.sketch.err
