"""Resumability chaos test (north rule: every stage resumes from its last
checkpoint): a SUBPROCESS driver runs the pipeline through
comparison_vectors materialization and is then killed (os._exit — no
graceful stop, no predict). A fresh linker over the same checkpoint dir
must resume nodes/blocked_pairs/comparison_vectors from parquet (asserted
via the lineage log's resume_from_checkpoint events — no recompute events)
and its final predict must match an uninterrupted no-checkpoint run."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

SETTINGS_SRC = textwrap.dedent("""
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    def make_settings():
        return Settings(
            comparisons=(
                Comparison("name", "name", (
                    ComparisonLevel("null"),
                    ComparisonLevel("exact", m=0.9, u=0.02),
                    ComparisonLevel("levenshtein", threshold=2,
                                    m=0.07, u=0.05),
                    ComparisonLevel("else", m=0.03, u=0.93),
                )),
                Comparison("city", "city", (
                    ComparisonLevel("null"),
                    ComparisonLevel("exact", m=0.8, u=0.2),
                    ComparisonLevel("else", m=0.2, u=0.8),
                )),
            ),
            blocking_rules=(block_on("grp"),),
            probability_two_random_records_match=0.05,
        )
""")


def _write_input(spark, path: str) -> None:
    rows = [(str(i), f"g{i % 12}",
             ["ann", "anne", "bob", "carol", "dave"][i % 5],
             ["ely", "rye", None][i % 3]) for i in range(240)]
    spark.createDataFrame(
        rows, "unique_id string, grp string, name string, city string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_resume_after_driver_kill(spark, tmp_path):
    input_path = str(tmp_path / "input")
    ckpt = str(tmp_path / "ckpt")
    _write_input(spark, input_path)

    # --- phase 1: subprocess driver, killed right after cv materializes
    script = SETTINGS_SRC + textwrap.dedent(f"""
        import os, sys
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.session.timeZone", "UTC")
                 .getOrCreate())
        from memory_optimized_splink_spark.linker import SparkLinker
        nodes = spark.read.parquet({input_path!r})
        lk = SparkLinker(spark, nodes, make_settings(),
                         checkpoint_dir={ckpt!r}, enable_checkpoints=True)
        lk.comparison_vectors()   # stage() materializes to parquet
        print("CV_DONE", flush=True)
        os._exit(1)               # driver dies: predict never runs
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": "/root/repo"}, timeout=420)
    assert "CV_DONE" in proc.stdout, proc.stderr[-2000:]
    assert proc.returncode == 1

    # the first three stages completed durably; predict never did
    done = {d for d in os.listdir(ckpt) if os.path.isdir(os.path.join(ckpt, d))}
    assert {"nodes", "blocked_pairs", "comparison_vectors"} <= done
    assert "predict" not in done

    lineage = os.path.join(ckpt, "lineage.jsonl")
    n_before = sum(1 for _ in open(lineage))

    # --- phase 2: fresh linker, same checkpoint dir -> resume + predict
    from memory_optimized_splink_spark.linker import SparkLinker
    ns = {}
    exec(SETTINGS_SRC, ns)
    settings = ns["make_settings"]()
    nodes = spark.read.parquet(input_path)
    lk = SparkLinker(spark, nodes, settings, checkpoint_dir=ckpt,
                     enable_checkpoints=True)
    resumed = lk.predict().select(
        "unique_id_l", "unique_id_r", "match_weight").collect()
    got = {(r["unique_id_l"], r["unique_id_r"]): round(r["match_weight"], 9)
           for r in resumed}
    assert got

    events = [json.loads(ln) for ln in open(lineage)][n_before:]
    by_stage = {}
    for e in events:
        by_stage.setdefault(e.get("stage"), []).append(e.get("event"))
    # the killed driver's stages are READ BACK, not recomputed
    for st in ("nodes", "blocked_pairs", "comparison_vectors"):
        assert by_stage.get(st) == ["resume_from_checkpoint"], (st, by_stage)
    # predict had no checkpoint -> computed (a stage_complete-style event,
    # never a resume)
    assert "predict" in by_stage
    assert "resume_from_checkpoint" not in by_stage["predict"]

    # --- phase 3: uninterrupted run (no checkpoints) must hash-match
    lk2 = SparkLinker(spark, nodes, settings, enable_checkpoints=False)
    clean = lk2.predict().select(
        "unique_id_l", "unique_id_r", "match_weight").collect()
    want = {(r["unique_id_l"], r["unique_id_r"]): round(r["match_weight"], 9)
            for r in clean}
    assert got == want


def test_checkpoint_registry_on_file_uri(spark, tmp_path):
    """has()/stage() work when base_dir is a non-local file:/ URI — the
    _SUCCESS probe must go through the Hadoop FileSystem API, not
    os.path.exists (which can't parse the URI and would recompute every
    stage on every run)."""
    from memory_optimized_splink_spark.plans.checkpoint import (
        CheckpointRegistry,
    )

    base = (tmp_path / "reg").as_uri().replace("file:///", "file:/")
    reg = CheckpointRegistry(spark, base)
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).selectExpr("id", "id * 2 AS v")

    cfg = {"x": 1}
    a = reg.stage("s1", cfg, build)
    assert a.count() == 5 and calls == [1]
    assert reg.has("s1", cfg)
    b = reg.stage("s1", cfg, build)      # second call: read-back, no build
    assert b.count() == 5 and calls == [1]
    assert not reg.has("s1", {"x": 2})


def test_metrics_log_normalizes_uri_paths(tmp_path):
    """MetricsLog is a driver-local log: file:/ URIs normalize to the local
    path; non-local URIs (hdfs:/s3a:) keep records in memory instead of
    open()-ing a mangled cwd-relative './hdfs:...' directory."""
    import os

    from memory_optimized_splink_spark.plans.metrics import MetricsLog

    local = tmp_path / "lineage.jsonl"
    m = MetricsLog(f"file://{local}")
    m.log(stage="s", event="e")
    assert local.exists() and m.records
    m2 = MetricsLog("hdfs://nn/logs/lineage.jsonl")
    m2.log(stage="s", event="e")
    assert m2.path is None and m2.records
    assert not os.path.exists("hdfs:")
