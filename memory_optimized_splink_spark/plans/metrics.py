"""Per-stage / per-partition lineage metrics (JSONL).

The fork logs "TIER n status update" progress lines and per-stage COUNT(*)
(/root/reference/splink/internals/inference.py:281-333,
em_training_session.py:215-246). This engine emits the same information as
structured JSONL: one record per stage with wall time, row count, partition
count and per-partition row-count quantiles (skew evidence) — the north
rule's "per-partition lineage and metrics".
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F


class MetricsLog:
    """The JSONL file is a DRIVER-LOCAL log (like Spark's own event log
    default): a file:/ URI path is normalized to its local form, and a
    non-local URI (hdfs:/s3a:) falls back to in-memory records only — a
    cwd-relative open("hdfs:/...") would otherwise create a mangled local
    directory literally named after the scheme."""

    def __init__(self, path: str | None, partition_detail: bool = True):
        if path and ":" in path.split(os.sep, 1)[0]:
            scheme = path.split(":", 1)[0]
            if scheme == "file":
                path = "/" + path.split(":", 1)[1].lstrip("/")
            else:
                path = None  # non-local URI: in-memory records only
        self.path = path
        self.partition_detail = partition_detail
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)
        self.records: list[dict] = []

    def log(self, **record) -> dict:
        record.setdefault("ts", time.time())
        self.records.append(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record, default=str) + "\n")
        return record

    def log_stage(self, stage: str, df: DataFrame, wall_sec: float | None = None,
                  **extra) -> dict:
        """Row count + per-partition distribution in ONE aggregation pass."""
        rec: dict = {"stage": stage, "event": "stage_complete"}
        if wall_sec is not None:
            rec["wall_sec"] = round(wall_sec, 3)
        if self.partition_detail:
            parts = (
                df.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count(F.lit(1)).alias("rows"))
                .agg(
                    F.count(F.lit(1)).alias("n_partitions"),
                    F.sum("rows").alias("n_rows"),
                    F.min("rows").alias("p_min"),
                    F.max("rows").alias("p_max"),
                    F.expr("percentile_approx(rows, 0.5)").alias("p_median"),
                )
                .collect()[0]
            )
            rec.update(
                n_rows=parts["n_rows"], n_partitions=parts["n_partitions"],
                partition_rows_min=parts["p_min"],
                partition_rows_max=parts["p_max"],
                partition_rows_median=parts["p_median"],
                skew_ratio=(
                    float(parts["p_max"]) / max(float(parts["p_median"] or 1), 1.0)
                    if parts["p_max"] is not None else None
                ),
            )
        else:
            rec["n_rows"] = df.count()
        rec.update(extra)
        return self.log(**rec)
