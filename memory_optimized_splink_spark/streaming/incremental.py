"""Incremental linking via Structured Streaming (engine extension).

The reference has no streaming surface; its closest analogue is
find_matches_to_new_records (inference.py:770-926) — a batch API this
engine exposes on SparkLinker. This module lifts that API onto a stream:
micro-batches of new records are linked against the existing node table via
foreachBatch, appending scored matches to a sink. Stateless per batch (the
node table is the state), so no watermark is required; an optional
event-time dedup window is provided for at-least-once sources.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F


def incremental_link_stream(
    linker,
    new_records_stream: DataFrame,
    sink: Callable[[DataFrame, int], None] | str,
    threshold_match_probability: float = 0.5,
    checkpoint_location: str | None = None,
    trigger_once: bool = False,
):
    """Wire a streaming DataFrame of new records into the linker.

    sink: either a callable (matches_df, batch_id) -> None, or an output
    path (parquet append). Returns the StreamingQuery.
    """
    if isinstance(sink, str):
        out_path = sink

        def sink_fn(df: DataFrame, batch_id: int) -> None:
            df.withColumn("_batch_id", F.lit(batch_id)) \
              .write.mode("append").parquet(out_path)
    else:
        sink_fn = sink

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matches = linker.find_matches_to_new_records(
            batch_df, threshold_match_probability=threshold_match_probability
        )
        sink_fn(matches, batch_id)

    writer = new_records_stream.writeStream.foreachBatch(process)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_dedup(events: DataFrame, ts_col: str, key_cols: list[str],
                         watermark: str = "10 minutes") -> DataFrame:
    """Watermarked exact-dedup for at-least-once streaming sources:
    dropDuplicates within the watermark horizon (stateful operator)."""
    return events.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(key_cols)


def streaming_edge_clustering(
    edges_stream: DataFrame,
    membership_dir: str,
    checkpoint_location: str | None = None,
    trigger_once: bool = False,
    edge_l: str = "unique_id_l",
    edge_r: str = "unique_id_r",
):
    """Incremental connected components over a stream of accepted edges,
    with CORRECT cluster merging: a late edge that bridges two existing
    clusters merges them (the merged cluster keeps the smaller cluster id,
    so labels are stable under merge).

    Mechanism (foreachBatch): the current membership table is re-expressed
    as edges (node -> its cluster id) and unioned with the micro-batch's
    new edges; the batch large-star/small-star CC re-closes transitivity
    over the union, so prior clusters act as super-nodes — the per-batch
    cost scales with |membership| + |new edges|, fully distributed, no
    driver-side state. Membership versions are written to
    `membership_dir/v<batch_id>` with a `_CURRENT` pointer file
    (write-then-swap: a version is never overwritten while readable, and a
    crashed batch leaves the pointer on the previous good version).

    Returns the StreamingQuery. Read results with
    `read_current_membership(spark, membership_dir)`.
    """
    from ..operators.cluster import solve_connected_components

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new_edges = batch_df.select(F.col(edge_l).alias("_l"),
                                    F.col(edge_r).alias("_r"))
        prior = read_current_membership(spark, membership_dir)
        if prior is not None:
            prior_edges = prior.where(
                F.col("node_id") != F.col("cluster_id")).select(
                F.col("node_id").alias("_l"),
                F.col("cluster_id").alias("_r"))
            all_edges = new_edges.unionByName(prior_edges)
            nodes = new_edges.select(F.col("_l").alias("node_id")) \
                .union(new_edges.select("_r")) \
                .union(prior.select("node_id")).distinct()
        else:
            all_edges = new_edges
            nodes = new_edges.select(F.col("_l").alias("node_id")) \
                .union(new_edges.select("_r")).distinct()
        membership = solve_connected_components(
            nodes, all_edges, node_col="node_id",
            edge_l="_l", edge_r="_r")
        # normalize labels to the MIN member id: deterministic across
        # reruns (the raw CC rep is nid-ordered, i.e. arbitrary) and stable
        # under merge — the merged cluster keeps the smallest member's id
        from pyspark.sql import Window
        w = Window.partitionBy("cluster_id")
        membership = membership.select(
            "node_id", F.min("node_id").over(w).alias("cluster_id"))
        out = f"{membership_dir}/v{batch_id}"
        membership.write.mode("overwrite").parquet(out)
        _write_pointer(spark, membership_dir, f"v{batch_id}")

    writer = edges_stream.writeStream.foreachBatch(process)
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path) for a path string, resolved through the session's
    Hadoop configuration — so `membership_dir` may live on HDFS, S3A, or a
    file:/ URI, exactly like the parquet versions Spark writes next to it.
    A driver-local `open()`/`os.replace` would silently put the commit
    pointer on the driver's local disk on any real cluster."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _write_pointer(spark, membership_dir: str, version: str) -> None:
    """Commit `version` to `<membership_dir>/_CURRENT` with write-then-swap
    through the Hadoop FileSystem API: the tmp file is fully written and
    closed before it replaces the pointer, so a crash mid-commit leaves the
    previous good version readable. The swap is atomic on HDFS/posix
    (FileContext rename with OVERWRITE); on S3A rename is copy+delete —
    non-atomic but still last-writer-wins on a single small object."""
    jvm = spark._jvm
    fs, tmp = _hadoop_fs(spark, f"{membership_dir}/_CURRENT.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{membership_dir}/_CURRENT")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(version.encode("utf-8")))
    finally:
        out.close()
    try:
        # atomic overwriting rename where the filesystem supports it
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            spark._jsc.hadoopConfiguration())
        overwrite = getattr(jvm.org.apache.hadoop.fs.Options, "Rename") \
            .OVERWRITE
        fc.rename(tmp, final, _to_jarray(jvm, overwrite))
    except Exception:
        # fallback: delete + rename (brief pointer-absent window)
        if fs.exists(final):
            fs.delete(final, False)
        fs.rename(tmp, final)


def _to_jarray(jvm, rename_option):
    arr = jvm.py4j.reflection.ReflectionUtil.classForName(
        "org.apache.hadoop.fs.Options$Rename")
    jarr = jvm.java.lang.reflect.Array.newInstance(arr, 1)
    jarr[0] = rename_option
    return jarr


def _read_pointer(spark, membership_dir: str) -> str | None:
    fs, ptr = _hadoop_fs(spark, f"{membership_dir}/_CURRENT")
    if not fs.exists(ptr):
        return None
    stream = fs.open(ptr)
    try:
        # commons-io ships with every Spark distribution
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8").strip()
    finally:
        stream.close()


def read_current_membership(spark, membership_dir: str) -> DataFrame | None:
    """(node_id, cluster_id) of the latest committed clustering version, or
    None before the first batch. The `_CURRENT` pointer is read through the
    Hadoop FileSystem API so `membership_dir` may be any Hadoop-supported
    URI (HDFS, S3A, file:/), matching where the versions were written."""
    version = _read_pointer(spark, membership_dir)
    if version is None:
        return None
    return spark.read.parquet(f"{membership_dir}/{version}") \
        .select("node_id", "cluster_id")


def streaming_entity_assignment(
    stream: DataFrame,
    key_col: str = "key",
    id_col: str = "unique_id",
    sha_col: str = "content_sha",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    incremental exact-entity resolution. Per blocking key, GroupState holds
    the content_sha -> canonical-entity-id map; every incoming record is
    assigned the entity id of the FIRST record seen with its sha (min id
    within a micro-batch for determinism), new shas open new entities. The
    state survives query restarts via the stream checkpoint — the streaming
    analogue of exact_dedup + find_matches_to_new_records.

    Output: (key, id, sha, entity_id), append mode.
    """
    import pandas as pd

    out_schema = (f"{key_col} string, {id_col} string, {sha_col} string, "
                  "entity_id string")
    state_schema = "shas array<string>, ids array<string>"

    def assign(key, pdfs, state):
        if state.exists:
            shas, ids = state.get
            mapping = dict(zip(shas, ids))
        else:
            mapping = {}
        # a group's micro-batch may arrive as SEVERAL Arrow chunks:
        # concatenate before sorting, otherwise "min id within the batch"
        # would only hold per-chunk (first-seen across chunks is arbitrary)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(id_col)  # deterministic first-seen
        ents = []
        for sha, uid in zip(pdf[sha_col], pdf[id_col]):
            if sha not in mapping:
                mapping[sha] = uid
            ents.append(mapping[sha])
        pdf = pdf.assign(entity_id=pd.Series(ents, index=pdf.index))
        state.update((list(mapping.keys()), list(mapping.values())))
        yield pdf[[key_col, id_col, sha_col, "entity_id"]]

    return stream.groupBy(key_col).applyInPandasWithState(
        assign, out_schema, state_schema, "append", "NoTimeout")
