"""Multi-threshold clustering, one-to-one clustering, unlinkables,
profiling, blocking-rule suggestion."""

from __future__ import annotations

import networkx as nx
import pandas as pd
import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.operators.cluster_extras import (
    cluster_at_multiple_thresholds,
    one_to_one_clustering,
)


@pytest.fixture(scope="module")
def weighted_graph(spark):
    nodes = spark.createDataFrame(
        [(i,) for i in range(12)], "unique_id long")
    edges = spark.createDataFrame(
        [(0, 1, 0.95), (1, 2, 0.7), (2, 3, 0.55),
         (4, 5, 0.99), (6, 7, 0.6), (8, 9, 0.92), (9, 10, 0.91)],
        "unique_id_l long, unique_id_r long, match_probability double")
    return nodes, edges


def _partition(rows):
    out = {}
    for r in rows:
        out.setdefault(r["cluster_id"], set()).add(r["node_id"])
    return {frozenset(v) for v in out.values()}


def test_multi_threshold_matches_independent_cc(spark, weighted_graph):
    nodes, edges = weighted_graph
    thresholds = [0.5, 0.8, 0.9]
    multi = cluster_at_multiple_thresholds(nodes, edges, thresholds)
    for t in thresholds:
        got = _partition(multi.where(F.col("threshold") == t).collect())
        g = nx.Graph()
        g.add_nodes_from(range(12))
        for r in edges.collect():
            if r["match_probability"] >= t:
                g.add_edge(r["unique_id_l"], r["unique_id_r"])
        expected = {frozenset(c) for c in nx.connected_components(g)}
        assert got == expected, f"threshold {t}"


def test_multi_threshold_summary_stats(spark, weighted_graph):
    nodes, edges = weighted_graph
    stats = cluster_at_multiple_thresholds(
        nodes, edges, [0.5, 0.9], output_cluster_summary_stats=True).collect()
    by_t = {r["threshold"]: r for r in stats}
    assert by_t[0.5]["num_clusters"] < by_t[0.9]["num_clusters"]


def test_one_to_one_constraint(spark):
    # two datasets; edges would transitively merge a1-b1-a2 (two 'a' records)
    nodes = spark.createDataFrame(
        [("a1", "a"), ("a2", "a"), ("b1", "b"), ("b2", "b")],
        "unique_id string, source_dataset string")
    edges = spark.createDataFrame(
        [("a1", "b1", 0.99), ("a2", "b1", 0.98), ("a2", "b2", 0.6)],
        "unique_id_l string, unique_id_r string, match_probability double")
    got = one_to_one_clustering(nodes, edges,
                                duplicate_free_datasets=["a", "b"])
    clusters = {}
    rows = {r["node_id"]: r["cluster_id"] for r in got.collect()}
    for n, c in rows.items():
        clusters.setdefault(c, []).append(n)
    # constraint: never two records of the same dataset in one cluster
    for members in clusters.values():
        ds = [m[0] for m in members]
        assert len(ds) == len(set(ds)), clusters
    # the strongest link a1-b1 must be accepted
    assert rows["a1"] == rows["b1"]
    # a2 pairs with b2 (b1 is taken)
    assert rows["a2"] == rows["b2"]


def test_unlinkables(spark, repo_nodes, basic_settings):
    from memory_optimized_splink_spark.linker import SparkLinker

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    rows = linker.unlinkables().orderBy("match_weight").collect()
    assert abs(rows[-1]["cum_prop"] - 1.0) < 1e-9
    # self-links agree on every level -> all weights high & positive
    assert rows[0]["match_weight"] > 0


def test_profile_columns(spark, repo_nodes):
    from memory_optimized_splink_spark.operators.profiling import (
        completeness_data, profile_columns, value_frequency_percentiles,
    )

    prof = {r["column"]: r for r in
            profile_columns(repo_nodes, ["repo", "lang"]).collect()}
    assert prof["repo"]["n_non_null"] == repo_nodes.count()
    assert prof["lang"]["n_distinct_approx"] <= 10
    top_repo = prof["repo"]["top_values"][0]
    assert top_repo["value"] == "org0/repo0"  # planted hot key
    pct = value_frequency_percentiles(repo_nodes, "repo").collect()
    assert max(r["percentile"] for r in pct) == 1.0
    comp = {r["column_name"]: r["completeness"]
            for r in completeness_data(repo_nodes, columns=["repo", "path"]).collect()}
    assert comp["repo"] == 1.0


def test_blocking_rule_suggestion(spark, repo_nodes):
    from memory_optimized_splink_spark.operators.brs import (
        count_comparisons_for_keys, suggest_blocking_rules,
    )

    n = repo_nodes.count()
    full = count_comparisons_for_keys(repo_nodes, ("'x'",))
    assert full == n * (n - 1) // 2  # constant key = cartesian
    chosen = suggest_blocking_rules(
        repo_nodes, ["repo", "lang", "content_sha"],
        max_comparisons=20_000, max_rules=2)
    assert chosen, "should find at least one rule under threshold"
    for r in chosen:
        assert r["comparison_count"] <= 20_000
    # content_sha (near-unique) should be among the cheapest picks
    assert any("content_sha" in r["keys"] or "repo" in r["keys"] for r in chosen)


def test_blocking_rule_suggestion_random_restarts(spark):
    """Randomized restarts are deterministic under a seed and never worse
    than plain greedy (they keep the best-cost set)."""
    from memory_optimized_splink_spark.operators.brs import (
        rule_set_cost, suggest_blocking_rules,
    )

    rows = [(str(i), f"a{i % 3}", f"b{i % 5}", f"c{i % 2}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "unique_id string, a string, b string, c string")
    cols = ["a", "b", "c"]
    greedy = suggest_blocking_rules(df, cols, max_comparisons=2000)
    r1 = suggest_blocking_rules(df, cols, max_comparisons=2000,
                                random_restarts=5, seed=3)
    r2 = suggest_blocking_rules(df, cols, max_comparisons=2000,
                                random_restarts=5, seed=3)
    assert r1 == r2  # seeded determinism
    assert rule_set_cost(r1, cols) <= rule_set_cost(greedy, cols)
