"""SparkSession factory with scale-aware defaults.

Settings chosen for the 100 TB story, not just local tests:
- AQE on (runtime shuffle re-planning, skew-join splitting),
- Arrow execution for all pandas UDF exchange, bounded batch size so
  per-batch NumPy working sets stay cache/memory friendly,
- shuffle partitions sized to cores locally (a cluster deployment sets
  this to ~2-3x total executor cores via spark-submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "cuckoofilter-spark", master: str | None = None,
              shuffle_partitions: int | None = None, **extra) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # event-time state operators compare naive session-tz timestamps to
        # epoch-ms watermarks — pin UTC so the two clocks agree everywhere
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
