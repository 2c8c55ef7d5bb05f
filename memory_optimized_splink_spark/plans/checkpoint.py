"""Stage checkpoint registry: resumable, content-addressed parquet stages.

The reference caches materialized tables under names derived from
sha256(sql + uid) and short-circuits on cache hits
(/root/reference/splink/internals/database_api.py:96-170). This engine makes
that durable and resumable (north rule): each pipeline stage writes parquet
to  <base>/<stage>/<sha256(config_json)[:12]>/  and any rerun with the same
config reads it back instead of recomputing — so blocking, scoring, EM and
clustering each resume from the last completed stage after a crash.

Parquet (not .persist) is deliberate: it survives the driver, breaks lineage
for iterative stages, and is the reference's own recommended break-lineage
default on Spark (docs/topic_guides/performance/optimising_spark.md:38-57).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .metrics import MetricsLog


def config_hash(config: dict) -> str:
    blob = json.dumps(config, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:12]


class CheckpointRegistry:
    def __init__(self, spark: SparkSession, base_dir: str,
                 metrics: MetricsLog | None = None, enabled: bool = True):
        self.spark = spark
        self.base_dir = base_dir
        self.metrics = metrics or MetricsLog(os.path.join(base_dir, "lineage.jsonl"))
        self.enabled = enabled

    def path_for(self, stage: str, config: dict) -> str:
        return os.path.join(self.base_dir, stage, config_hash(config))

    def has(self, stage: str, config: dict) -> bool:
        """A stage is complete iff its _SUCCESS marker exists — checked
        through the Hadoop FileSystem API so base_dir may be an HDFS/S3A/
        file:/ URI (the stages themselves are Spark-written parquet, which
        already lands there; a driver-local os.path check would never see
        them)."""
        marker = os.path.join(self.path_for(stage, config), "_SUCCESS")
        try:
            jpath = self.spark._jvm.org.apache.hadoop.fs.Path(marker)
            fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            return bool(fs.exists(jpath))
        except Exception:
            return os.path.exists(marker)

    def stage(self, stage: str, config: dict,
              fn: Callable[[], DataFrame],
              repartition: int | None = None) -> DataFrame:
        """Return the stage's DataFrame, computing + persisting it only if
        this (stage, config) has never completed."""
        if not self.enabled:
            return fn()
        path = self.path_for(stage, config)
        if self.has(stage, config):
            self.metrics.log(stage=stage, event="resume_from_checkpoint",
                             path=path, config_hash=config_hash(config))
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = fn()
        if repartition:
            df = df.repartition(repartition)
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        self.metrics.log_stage(stage, out, wall_sec=time.time() - t0,
                               path=path, config_hash=config_hash(config))
        return out
