"""Physical-plan audits (the reference's join-type test generalized:
tests/test_join_type_for_estimate_u_and_predict_are_efficient.py).
Column pruning and filter pushdown must reach the parquet scan; candidate
generation must never be a nested-loop/cartesian join."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from memory_optimized_splink_spark import entry_queries as EQ

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_reaches_scan(spark):
    plan = _plan(EQ.q_token_counts(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}  # lang/source/n_chars pruned


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet") \
        .where(F.col("lang") == "en").select("doc_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_predict_plan_has_no_cartesian(spark):
    plan = _plan(EQ._spark_predict(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blocking_key_columns_only_in_join(spark):
    """content never rides the blocking shuffle: the join input schema is
    ids + blocking keys only."""
    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    s = EQ.entry_settings()
    nodes = EQ.nodes_df(spark, SF)
    pairs = block_using_rules(nodes, s)
    plan = _plan(pairs)
    for line in plan.splitlines():
        if "content#" in line:
            # content may appear only as INPUT to the sha2 key derivation,
            # never as a carried column in an exchange/join
            assert "sha2" in line, line
        if "Exchange" in line:
            assert "content#" not in line, line


def test_tf_join_is_broadcast(spark, repo_nodes):
    from dataclasses import replace

    from memory_optimized_splink_spark.operators.nodes import join_tf_columns

    s = replace(EQ.entry_settings(), tf_columns=("lang",))
    joined, _ = join_tf_columns(repo_nodes, s)
    assert "BroadcastHashJoin" in _plan(joined)


def test_lsh_bucket_cap_is_broadcast_anti_join(spark):
    """The bucket-size cap must exclude hot buckets via a BROADCAST anti
    join (the hot-key list is tiny); the big banded table shuffles once.
    The cap is set BELOW the doc count so the guard cannot be skipped as a
    provable no-op (see test_lsh_bucket_cap_skipped_when_provably_noop)."""
    from memory_optimized_splink_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"document text number {i}") for i in range(50)],
        "doc_id long, text string")
    plan = _plan(minhash_lsh_pairs(docs, "doc_id", "text",
                                   max_bucket_size=10))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_lsh_bucket_cap_skipped_when_provably_noop(spark):
    """When rows-per-band (= docs with a signature) cannot exceed the cap,
    no bucket can either: the count aggregate + anti-join must vanish from
    the plan — small inputs don't pay two stages for a guard that cannot
    fire — and the pair set must equal the capped plan's exactly."""
    from memory_optimized_splink_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"document text number {i}") for i in range(50)],
        "doc_id long, text string")
    capped = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket_size=100)
    assert "LeftAnti" not in _plan(capped)
    uncapped = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket_size=None)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(capped) == key(uncapped)


def test_bridges_plan_no_driver_collect(spark):
    """bridges() is a single groupBy-applyInPandas — FlatMapGroupsInPandas
    in the plan, no cartesian/collect shape."""
    from memory_optimized_splink_spark.operators.cluster import bridges

    member = spark.createDataFrame(
        [("a", "c1"), ("b", "c1")], "node_id string, cluster_id string")
    edges = spark.createDataFrame(
        [("a", "b")], "unique_id_l string, unique_id_r string")
    plan = _plan(bridges(member, edges))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_phonetic_level_plan_has_no_python_on_pairs(spark):
    """A dmetaphone level must NOT put a Python stage in the pair-scoring
    plan: dm codes are precomputed on the node table (encode-distinct-join)
    and the level is a native column equality. With dm_* already on the
    nodes the whole cv plan is Python-free."""
    from memory_optimized_splink_spark.functions.phonetic import (
        with_phonetic_column,
    )
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )
    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors, needs_python_metrics,
    )

    rows = [(str(i), "k", n) for i, n in
            enumerate(["smith", "smyth", "jones", "jonas"])]
    df = spark.createDataFrame(rows, "unique_id string, k string, name string")
    s = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.01),
                ComparisonLevel("dmetaphone", m=0.5, u=0.05),
                ComparisonLevel("else", m=0.1, u=0.9),
            )),
        ),
        blocking_rules=(block_on("k"),),
        probability_two_random_records_match=0.1,
    )
    assert not needs_python_metrics(s)  # no per-pair Python repartition
    # lazy node lineage: the encoder may appear in the plan, but only over
    # bare node values (the distinct-encode side), never over pair columns
    cv = compute_comparison_vectors(block_using_rules(df, s), df, s)
    for line in _plan(cv).splitlines():
        if "ArrowEvalPython" in line or "BatchEvalPython" in line:
            assert "_l#" not in line and "_r#" not in line, line
    # materialized node stage (the linker checkpoint path): Python-free plan
    nodes = with_phonetic_column(df, "name").localCheckpoint()
    cv = compute_comparison_vectors(block_using_rules(nodes, s), nodes, s)
    plan = _plan(cv)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_bucketed_nodes_join_avoids_exchange(spark, repo_nodes, tmp_path):
    """A node table bucketed on unique_id joins the pair table without an
    Exchange on the bucketed side (co-located join — the repeated shuffle
    the bucketing exists to eliminate)."""
    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.sources.registry import (
        read_bucketed, write_bucketed_nodes,
    )

    import shutil

    spark.sql("DROP TABLE IF EXISTS bucketed_nodes_test")
    shutil.rmtree("spark-warehouse/bucketed_nodes_test", ignore_errors=True)
    write_bucketed_nodes(repo_nodes.select("unique_id", "path"),
                         "bucketed_nodes_test", "unique_id", n_buckets=8)
    nodes = read_bucketed(spark, "bucketed_nodes_test")
    pairs = repo_nodes.select(
        F.col("unique_id").alias("unique_id_l")).limit(500)
    # force SMJ (a broadcast join would moot bucketing and hide the effect)
    joined = pairs.hint("merge").join(
        nodes.withColumnRenamed("unique_id", "unique_id_l"),
        on="unique_id_l")
    plan = _plan(joined)
    assert "Bucketed: true" in plan        # scan reads bucket metadata
    assert "SelectedBucketsCount" in plan
    # exactly ONE join-key exchange: the non-bucketed pair side shuffles to
    # the bucketed side's partitioning; the node table is never re-shuffled
    import re
    join_exchanges = re.findall(
        r"Exchange hashpartitioning\(unique_id_l", plan)
    assert len(join_exchanges) == 1


def test_non_null_counts_is_one_job(spark):
    """The per-field non-null counts behind TF adjustment must be ONE
    aggregate pass (one Spark job), not k+1 full scans — and identical to
    the naive per-column counts."""
    from memory_optimized_splink_spark.operators.nodes import non_null_counts

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, "x"), (3, "b", "y"), (4, None, None)],
        "unique_id int, first string, second string").localCheckpoint()
    tracker = spark.sparkContext.statusTracker()

    def jobs_during(fn):
        spark.sparkContext.setJobGroup("nnc", "count jobs")
        try:
            out = fn()
        finally:
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        return out, len(tracker.getJobIdsForGroup("nnc"))

    counts, n_batched = jobs_during(
        lambda: non_null_counts(df, ["first", "second"], include_total=True))
    assert counts == {"first": 2, "second": 2, "__total__": 4}

    spark.sparkContext.setJobGroup("nnc_naive", "naive")
    try:
        naive = {c: df.where(F.col(c).isNotNull()).count()
                 for c in ("first", "second")}
        naive["__total__"] = df.count()
    finally:
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
    n_naive = len(tracker.getJobIdsForGroup("nnc_naive"))
    assert naive == counts
    # one aggregate job (AQE may add a stage-materialization job, never k+1)
    assert n_batched < n_naive and n_batched <= 2, (n_batched, n_naive)


def test_pair_node_join_broadcast_beyond_catalyst_threshold(spark, repo_nodes):
    """The pair->nodes join must stay a broadcast even when the node
    projection exceeds Catalyst's autoBroadcastJoinThreshold (the silent
    flip to sort-merge re-shuffles the much larger pair table twice —
    measured 6.6x per-pair at 169M pairs). The explicit hint carries it up
    to settings.broadcast_node_join_max_bytes; cap=0 restores Catalyst's
    choice."""
    from dataclasses import replace

    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        pairs_with_columns,
    )

    s = EQ.entry_settings()
    pairs = block_using_rules(repo_nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # make Catalyst refuse every broadcast on size grounds
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")

        def node_join_lines(plan: str) -> list[str]:
            return [ln for ln in plan.splitlines()
                    if "Join [unique_id_l" in ln or "Join [unique_id_r" in ln]

        lines = node_join_lines(_plan(pairs_with_columns(pairs, repo_nodes, s)))
        assert lines and all("BroadcastHashJoin" in ln for ln in lines), lines
        # cap 0 disables the hint -> Catalyst's (non-broadcast) strategy
        s0 = replace(s, broadcast_node_join_max_bytes=0)
        lines0 = node_join_lines(
            _plan(pairs_with_columns(pairs, repo_nodes, s0)))
        assert lines0 and not any("BroadcastHashJoin" in ln
                                  for ln in lines0), lines0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_measured_size_sees_through_aggregation(spark):
    """_plan_size_bytes of a checkpointed distinct still reports the origin
    plan's pre-aggregation estimate (PySpark 4.1.2 behavior — a 15-row
    distinct of 200k rows looks ~13000x too big), which is why the
    dedupe-metric broadcast decision must use _measured_size_bytes: one
    aggregate over the cached blocks, scaling with the DISTINCT rows."""
    from memory_optimized_splink_spark.operators.vectors import (
        _measured_size_bytes,
        _plan_size_bytes,
    )

    big = spark.range(200_000).select(
        (F.col("id") % 15).cast("string").alias("v_l"),
        ((F.col("id") + 1) % 15).cast("string").alias("v_r"),
    )
    dist = big.distinct().localCheckpoint(eager=True)
    measured = _measured_size_bytes(dist)
    n = dist.count()
    assert measured is not None
    # 15 distinct rows x (2 short strings + overhead): well under 8 KiB
    assert measured < 8192, measured
    assert measured >= n * 8  # and not absurdly small either
    est = _plan_size_bytes(dist)
    if est is not None:  # the defect this guards against: est >> measured
        assert est > measured * 100, (est, measured)
    # unsupported (array) schema declines rather than guessing
    arr = spark.range(5).select(F.array(F.col("id")).alias("a"))
    assert _measured_size_bytes(arr.localCheckpoint(eager=True)) is None


def test_dedupe_metric_join_back_is_broadcast(spark, repo_nodes):
    """With dedupe_metric_values=True the per-value-pair metric table must
    join back via BroadcastHashJoin even when Catalyst's own threshold
    would refuse it — the explicit hint fires from the MEASURED
    materialized size (plan stats would report the pre-distinct size and
    never fire)."""
    from dataclasses import replace

    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        pairs_with_columns,
        with_comparison_metrics,
    )

    s = replace(EQ.entry_settings(), dedupe_metric_values=True)
    pairs = block_using_rules(repo_nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        withcols = pairs_with_columns(pairs, repo_nodes, s)
        plan = _plan(with_comparison_metrics(withcols, s, dedupe_inputs=True))
        joins = [ln for ln in plan.splitlines()
                 if "_dk_l" in ln and "Join" in ln]
        assert joins and all("BroadcastHashJoin" in ln for ln in joins), joins
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cc_idmap_compaction_joins_are_broadcast(spark):
    """The CC string->long compaction must broadcast the (materialized,
    measured) idmap into both edge joins even when Catalyst's own
    threshold refuses — otherwise the edge table is shuffled+sorted twice
    by 64-char string keys before CC starts (measured at the 518M-pair
    run). broadcast_idmap_max_bytes=0 restores Catalyst's choice."""
    from memory_optimized_splink_spark.operators.cluster import (
        _checkpoint, _compact_edges, solve_connected_components,
    )

    nodes = spark.range(500).selectExpr("sha2(string(id), 256) AS unique_id")
    edges = nodes.alias("a").crossJoin(nodes.alias("b")).selectExpr(
        "a.unique_id AS unique_id_l", "b.unique_id AS unique_id_r"
    ).where("unique_id_l < unique_id_r").limit(2000)
    idmap = _checkpoint(
        nodes.selectExpr("unique_id AS node_id")
        .distinct().withColumn("nid", F.monotonically_increasing_id()))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")

        def compaction_joins(e):
            plan = e._jdf.queryExecution().executedPlan().toString()
            return [ln for ln in plan.splitlines()
                    if "Join" in ln and ("node_l" in ln or "node_r" in ln)]

        e = _compact_edges(idmap, edges, "unique_id_l", "unique_id_r",
                           1 << 30)
        lines = compaction_joins(e)
        assert lines and all("BroadcastHashJoin" in ln for ln in lines), lines
        e0 = _compact_edges(idmap, edges, "unique_id_l", "unique_id_r", 0)
        lines0 = compaction_joins(e0)
        assert lines0 and not any("BroadcastHashJoin" in ln
                                  for ln in lines0), lines0
        # correctness unchanged by the hint (full CC, both cap settings)
        m = solve_connected_components(nodes, edges)
        m0 = solve_connected_components(nodes, edges,
                                        broadcast_idmap_max_bytes=0)
        assert m.count() == m0.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_geo_array_gamma_ladders_stay_jvm_side(spark):
    """The new level kinds (distance_in_km, date_diff_seconds, abs/pct
    diff, array_intersect/subset, columns_reversed, literal,
    pairwise_levenshtein, qgram_jaccard) are all native Column exprs —
    the comparison-vector plans must contain NO Python eval stage."""
    for fn in (EQ.q_geo_time_numeric_vectors, EQ.q_array_name_vectors):
        plan = _plan(fn(spark, SF))
        assert "ArrowEvalPython" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
        assert "CartesianProduct" not in plan


def test_pairwise_metrics_single_arrow_stage(spark):
    """Pairwise array metrics must compute in ONE ArrowEvalPython stage on
    the pair table (one metric column per (comparison, kind), reused by
    every threshold level), never one stage per level, and never a
    row-at-a-time BatchEvalPython."""
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )
    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors,
    )

    rows = [(str(i), "k", ["smith", "smyth"]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "unique_id string, k string, aliases array<string>")
    s = Settings(
        comparisons=(
            Comparison("aliases", "aliases", (
                ComparisonLevel("null"),
                ComparisonLevel("pairwise_jaro_winkler", threshold=0.95,
                                m=0.9, u=0.01),
                ComparisonLevel("pairwise_jaro_winkler", threshold=0.7,
                                m=0.5, u=0.05),
                ComparisonLevel("else", m=0.1, u=0.9),
            )),
        ),
        blocking_rules=(block_on("k"),),
        probability_two_random_records_match=0.1,
    )
    cv = compute_comparison_vectors(block_using_rules(df, s), df, s)
    plan = _plan(cv)
    assert "BatchEvalPython" not in plan
    arrow_stages = [ln for ln in plan.splitlines()
                    if "ArrowEvalPython" in ln]
    assert len(arrow_stages) == 1, plan
    # both threshold levels share the single metric column: exactly one
    # pairwise UDF invocation in the stage
    assert arrow_stages[0].count("pairwise_jaro_winkler_udf") == 1
