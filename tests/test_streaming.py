"""Structured Streaming: incremental sketch build equals batch build;
per-key stateful HLL matches exact distinct counts within bound."""

import numpy as np
import pytest

from cuckoofilter_spark.sketches.hll import HyperLogLog
from cuckoofilter_spark.streaming.incremental import (
    StreamingSketchBuilder,
    streaming_distinct_by_key,
)


@pytest.fixture()
def token_files(spark, tmp_path):
    """Token corpus written as several parquet files → file-per-trigger
    stream."""
    from cuckoofilter_spark.sources.tokens import synth_tokens_df

    path = str(tmp_path / "stream_src")
    synth_tokens_df(spark, n_docs=400, seed=42, num_partitions=4).write.parquet(path)
    return path


def test_incremental_hll_equals_batch(spark, token_files, tmp_path):
    batch_df = spark.read.parquet(token_files)
    stream_df = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1).parquet(token_files)
    )

    b = StreamingSketchBuilder(lambda pid: HyperLogLog(p=12, seed=9), "tokens",
                               state_dir=str(tmp_path / "state"))
    q = (b.attach(stream_df)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    # register-max merge is order-invariant → streaming == batch, exactly
    from cuckoofilter_spark.operators.sketch_build import build_sketch

    ref = build_sketch(batch_df, "tokens", lambda pid: HyperLogLog(p=12, seed=9),
                       num_partitions=4)
    assert b.sketch is not None
    assert (b.sketch.registers == ref.registers).all()
    assert b.sketch.estimate() == ref.estimate()


def test_streaming_builder_resumes_from_disk(spark, token_files, tmp_path):
    batch_df = spark.read.parquet(token_files)
    state = str(tmp_path / "state")
    b1 = StreamingSketchBuilder(lambda pid: HyperLogLog(p=12, seed=9), "tokens",
                                state_dir=state)
    b1.process_batch(batch_df, 0)
    # fresh instance (process restart) picks the persisted sketch back up
    b2 = StreamingSketchBuilder(lambda pid: HyperLogLog(p=12, seed=9), "tokens",
                                state_dir=state)
    assert b2.sketch is not None
    assert (b2.sketch.registers == b1.sketch.registers).all()


def test_streaming_distinct_by_key(spark, token_files, tmp_path):
    import pyspark.sql.functions as F

    batch_df = spark.read.parquet(token_files)
    stream_df = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 2).parquet(token_files)
    )
    per_key = streaming_distinct_by_key(
        stream_df.select("source", F.explode("tokens").alias("token")),
        key_col="source", value_col="token", p=12)
    q = (per_key.writeStream.format("memory").queryName("ndv_by_key")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)

    # last update per key vs exact
    got = {
        r["key"]: r["ndv_estimate"]
        for r in spark.sql("SELECT * FROM ndv_by_key").collect()
    }
    exact = {
        r["source"]: r["ndv"]
        for r in (batch_df.select("source", F.explode("tokens").alias("t"))
                  .groupBy("source").agg(F.countDistinct("t").alias("ndv")).collect())
    }
    rel = 3 * 1.04 / np.sqrt(1 << 12)
    for k, e in exact.items():
        assert k in got
        assert abs(got[k] - e) / e <= rel, (k, got[k], e)
