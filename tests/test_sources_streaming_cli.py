"""Sources registry, streaming incremental linking, CLI stage wiring."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_register_any(spark, tmp_path):
    from memory_optimized_splink_spark.sources.registry import (
        read_any, register_multiple_tables, write_output,
    )

    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    lod = [{"a": 3, "b": "z"}]
    sdf = spark.createDataFrame(pdf)
    regs = register_multiple_tables(spark, [pdf, lod, sdf],
                                    ["t_pdf", "t_lod", "t_sdf"])
    assert spark.table("t_pdf").count() == 2
    assert spark.table("t_lod").count() == 1
    p = str(tmp_path / "out.parquet")
    write_output(regs["t_pdf"], p)
    assert read_any(spark, p).count() == 2
    c = str(tmp_path / "out.csv")
    write_output(regs["t_pdf"], c, fmt="csv")
    assert read_any(spark, c).count() == 2


def test_incremental_link_stream(spark, repo_nodes, basic_settings, tmp_path):
    from memory_optimized_splink_spark.linker import SparkLinker
    from memory_optimized_splink_spark.streaming.incremental import (
        incremental_link_stream,
    )

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    src_dir = str(tmp_path / "stream_src")
    new = repo_nodes.limit(2).withColumn(
        "unique_id", F.concat(F.col("unique_id"), F.lit("_s")))
    new.write.parquet(src_dir)
    stream = spark.readStream.schema(new.schema).parquet(src_dir)
    got = []
    q = incremental_link_stream(
        linker, stream, lambda df, bid: got.append(df.count()),
        threshold_match_probability=0.5,
        checkpoint_location=str(tmp_path / "stream_ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert sum(got) >= 2  # each copied row matches its original


def test_cli_predict_and_cluster(spark, repo_nodes, basic_settings, tmp_path):
    from memory_optimized_splink_spark.cli import main

    inp = str(tmp_path / "input.parquet")
    repo_nodes.write.parquet(inp)
    settings_path = str(tmp_path / "model.json")
    with open(settings_path, "w") as f:
        f.write(basic_settings.to_json())
    out = str(tmp_path / "pred.parquet")
    main(["predict", "--input", inp, "--settings", settings_path,
          "--checkpoint-dir", str(tmp_path / "ck"), "--output", out])
    pred = spark.read.parquet(out)
    assert pred.count() > 0 and "match_weight" in pred.columns
    out2 = str(tmp_path / "clusters.parquet")
    main(["cluster", "--input", inp, "--settings", settings_path,
          "--checkpoint-dir", str(tmp_path / "ck"), "--output", out2,
          "--threshold", "0.9"])
    clusters = spark.read.parquet(out2)
    assert "cluster_id" in clusters.columns
    assert clusters.count() == repo_nodes.count()


def test_cli_evaluate_labels_column(spark, repo_nodes, basic_settings,
                                    tmp_path):
    from memory_optimized_splink_spark.cli import main

    inp = str(tmp_path / "input_lc.parquet")
    repo_nodes.write.parquet(inp)  # repo_nodes carries a `cluster` column
    settings_path = str(tmp_path / "model_lc.json")
    with open(settings_path, "w") as f:
        f.write(basic_settings.to_json())
    out = str(tmp_path / "ts.parquet")
    main(["evaluate", "--input", inp, "--settings", settings_path,
          "--checkpoint-dir", str(tmp_path / "ck_lc"),
          "--labels-column", "cluster", "--output", out])
    ts = spark.read.parquet(out)
    assert {"truth_threshold", "tp", "fp", "fn", "tn",
            "precision", "recall", "f1"} <= set(ts.columns)
    assert ts.count() >= 1


def test_streaming_entity_assignment_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState entity assignment: same-sha records share the
    first-seen entity id, and the sha->entity state is restored from the
    stream checkpoint across a query restart."""
    import time

    from memory_optimized_splink_spark.streaming.incremental import (
        streaming_entity_assignment,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "key string, unique_id string, content_sha string"
    batch1 = spark.createDataFrame(
        [("k1", "a1", "X"), ("k1", "a2", "X"), ("k1", "b1", "Y"),
         ("k2", "c1", "X")], schema)
    batch1.write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(batch1.schema).parquet(src)
        q = streaming_entity_assignment(stream) \
            .writeStream.format("parquet").option("path", out) \
            .option("checkpointLocation", ckpt) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)
        return {r["unique_id"]: r["entity_id"]
                for r in spark.read.parquet(out).collect()}

    got1 = run()
    assert got1["a1"] == got1["a2"] == "a1"   # same sha, same key
    assert got1["b1"] == "b1"                 # new sha -> new entity
    assert got1["c1"] == "c1"                 # same sha, DIFFERENT key

    # append a later batch: a3 repeats sha X in k1 -> must resolve to a1
    # via state RESTORED from the checkpoint (fresh query restart)
    spark.createDataFrame([("k1", "a3", "X"), ("k1", "d1", "Z")], schema) \
        .write.mode("append").parquet(src)
    got2 = run()
    assert got2["a3"] == "a1"                 # restored state used
    assert got2["d1"] == "d1"
    assert len(got2) == 6                     # cumulative file sink


def test_streaming_edge_clustering_merges_late_bridge(spark, tmp_path):
    """A late edge bridging two EXISTING clusters must merge them, and the
    final membership must equal batch CC over all edges (min-member-id
    labels). Two availableNow runs against one checkpoint force the bridge
    to arrive after the clusters exist."""
    from memory_optimized_splink_spark.operators.cluster import (
        solve_connected_components,
    )
    from memory_optimized_splink_spark.streaming.incremental import (
        read_current_membership, streaming_edge_clustering,
    )
    from pyspark.sql import Window, functions as F

    src = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    # membership_dir as a non-local file:/ URI: the _CURRENT pointer must
    # go through the Hadoop FileSystem API (a driver-local open() would
    # write a file literally named "file:/..." relative to the cwd)
    mdir = (tmp_path / "membership").as_uri().replace("file:///", "file:/")
    schema = "unique_id_l string, unique_id_r string"

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_edge_clustering(
            stream, mdir, checkpoint_location=ckpt, trigger_once=True)
        q.awaitTermination(120)
        return {r["node_id"]: r["cluster_id"] for r in
                read_current_membership(spark, mdir).collect()}

    batch1 = [("a", "b"), ("c", "d"), ("x", "y")]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)
    got1 = run()
    assert got1 == {"a": "a", "b": "a", "c": "c", "d": "c",
                    "x": "x", "y": "x"}

    # late edges: b-c BRIDGES clusters {a,b} and {c,d}; y-z extends {x,y}
    batch2 = [("b", "c"), ("y", "z")]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    got2 = run()
    assert got2 == {"a": "a", "b": "a", "c": "a", "d": "a",
                    "x": "x", "y": "x", "z": "x"}

    # equals batch CC over ALL edges with the same min-member-id labels
    all_edges = spark.createDataFrame(batch1 + batch2, schema)
    nodes = all_edges.select(F.col("unique_id_l").alias("node_id")) \
        .union(all_edges.select("unique_id_r")).distinct()
    batch_cc = solve_connected_components(
        nodes, all_edges, node_col="node_id")
    w = Window.partitionBy("cluster_id")
    batch_cc = {r["node_id"]: r["cluster_id"] for r in batch_cc.select(
        "node_id", F.min("node_id").over(w).alias("cluster_id")).collect()}
    assert got2 == batch_cc

    # the pointer itself lives on the Hadoop FS at the URI, not on the
    # driver's cwd-relative local disk (a local open() of the file:/ URI
    # would have created a mangled ./file:/... artifact instead)
    assert (tmp_path / "membership" / "_CURRENT").exists()


def test_membership_pointer_goes_through_hadoop_fs(spark, tmp_path):
    """_write_pointer/_read_pointer round-trip through the Hadoop
    FileSystem layer: write-then-swap (no partial pointer), overwrite on
    recommit, readable on a file:/ URI the local open() path can't see."""
    from memory_optimized_splink_spark.streaming.incremental import (
        _hadoop_fs, _read_pointer, _write_pointer,
    )

    mdir = (tmp_path / "m").as_uri().replace("file:///", "file:/")
    assert _read_pointer(spark, mdir) is None
    _write_pointer(spark, mdir, "v0")
    assert _read_pointer(spark, mdir) == "v0"
    _write_pointer(spark, mdir, "v7")          # overwrite commit
    assert _read_pointer(spark, mdir) == "v7"
    fs, ptr = _hadoop_fs(spark, f"{mdir}/_CURRENT")
    assert fs.exists(ptr)
    # no leftover tmp after the swap
    _, tmp = _hadoop_fs(spark, f"{mdir}/_CURRENT.tmp")
    assert not fs.exists(tmp)
    assert (tmp_path / "m" / "_CURRENT").read_text().strip() == "v7"
