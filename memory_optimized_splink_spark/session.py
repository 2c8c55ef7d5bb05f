"""SparkSession construction tuned for the record-linkage workload.

Design notes (scale-first):
- AQE on: runtime coalescing + skew-join splitting complements our explicit
  hot-key salting (SURVEY.md §4 "Salting / skew handling").
- Arrow on: every string-similarity kernel is a vectorized pandas UDF
  (Arrow batches), never row-at-a-time Python (north rule).
- shuffle.partitions defaults to 32 locally; on a real cluster pass
  ~5x total cores (reference guidance:
  /root/reference/docs/topic_guides/performance/optimising_spark.md:17-21).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "memory-optimized-splink-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # single-JVM local mode: heartbeats share the driver's RPC loop, so
        # long GC pauses / CPU oversubscription can fake a "dead executor".
        # Raise via env for very large local runs (no remote failure to
        # detect); leave the defaults for clusters.
        .config("spark.network.timeout",
                os.environ.get("SPARK_GRAFT_NETWORK_TIMEOUT", "120s"))
        .config("spark.executor.heartbeatInterval",
                os.environ.get("SPARK_GRAFT_HEARTBEAT_INTERVAL", "10s"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get("SPARK_GRAFT_CKPT", "/tmp/spark_graft_ckpt")
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    spark.sparkContext.setLogLevel("WARN")
    return spark
