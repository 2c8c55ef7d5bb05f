"""Connected components vs networkx oracle (the reference's property-test
strategy, /root/reference/tests/test_cc_random_graphs.py:13-42 and
cc_testing_utils.py:11-53): Erdos-Renyi graphs, plus path graphs (worst case
for min-propagation depth) and star graphs (worst case for skew)."""

from __future__ import annotations

import networkx as nx
import pandas as pd
import pytest

from memory_optimized_splink_spark.fixtures import (
    erdos_renyi_edges,
    path_graph_edges,
    star_graph_edges,
)
from memory_optimized_splink_spark.operators.cluster import (
    solve_connected_components,
)


def _partition_from_membership(rows):
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster_id"], set()).add(r["node_id"])
    return {frozenset(v) for v in clusters.values()}


def _oracle_partition(n_nodes, edges_pdf):
    g = nx.Graph()
    g.add_nodes_from(range(n_nodes))
    g.add_edges_from(edges_pdf.itertuples(index=False))
    return {frozenset(c) for c in nx.connected_components(g)}


def _run(spark, n_nodes: int, edges_pdf: pd.DataFrame):
    nodes = spark.createDataFrame(
        pd.DataFrame({"unique_id": range(n_nodes)})
    )
    if len(edges_pdf):
        edges = spark.createDataFrame(edges_pdf)
    else:
        edges = spark.createDataFrame([], "unique_id_l long, unique_id_r long")
    got = solve_connected_components(nodes, edges).collect()
    assert len(got) == n_nodes
    return _partition_from_membership(got)


@pytest.mark.parametrize("seed", range(8))
def test_erdos_renyi_vs_networkx(spark, seed):
    n = 500
    e = erdos_renyi_edges(n, 0.001, seed=seed)
    assert _run(spark, n, e) == _oracle_partition(n, e)


def test_path_graph(spark):
    n = 300  # diameter 299: would need ~300 min-propagation rounds
    e = path_graph_edges(n)
    assert _run(spark, n, e) == {frozenset(range(n))}


def test_star_graph(spark):
    n = 400
    e = star_graph_edges(n)
    assert _run(spark, n, e) == {frozenset(range(n))}


def test_isolated_nodes_are_singletons(spark):
    part = _run(spark, 5, pd.DataFrame({"unique_id_l": [0], "unique_id_r": [1]}))
    assert part == {frozenset({0, 1}), frozenset({2}), frozenset({3}), frozenset({4})}


def test_duplicate_and_reversed_edges(spark):
    e = pd.DataFrame({"unique_id_l": [0, 1, 1, 2], "unique_id_r": [1, 0, 2, 1]})
    part = _run(spark, 4, e)
    assert part == {frozenset({0, 1, 2}), frozenset({3})}


def test_cc_stats_round_count(spark):
    """stats dict receives the star-round count: >=1 on any non-empty edge
    set, 0 on an empty one, and O(log^2 n)-small even on a 300-node path
    (diameter 299 — min-propagation would need ~300 rounds)."""
    n = 300
    nodes = spark.createDataFrame(pd.DataFrame({"unique_id": range(n)}))
    edges = spark.createDataFrame(path_graph_edges(n))
    stats: dict = {}
    solve_connected_components(nodes, edges, stats=stats).count()
    assert 1 <= stats["rounds"] <= 12

    empty = spark.createDataFrame([], "unique_id_l long, unique_id_r long")
    stats2: dict = {}
    solve_connected_components(nodes, empty, stats=stats2).count()
    assert stats2["rounds"] == 0


def test_cc_star_rounds_use_edge_sized_partitions(spark):
    """Star rounds must NOT inherit the session shuffle-partition setting
    (sized for the upstream pair table) nor the input's inflated partition
    layout: at 63.8M edges that combination produced ~5M shuffle-file
    commits all serialized through IndexShuffleBlockResolver's lock.
    round_partitions must come from _star_partitions(edge count) — the
    defaultParallelism floor here, far below both the session setting and
    the input's partition count."""
    from memory_optimized_splink_spark.operators.cluster import (
        _star_partitions,
        connected_components_long,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "197")
    try:
        edges = spark.createDataFrame(
            erdos_renyi_edges(400, 0.02, seed=7),
        ).repartition(151).selectExpr("unique_id_l as u", "unique_id_r as v")
        stats: dict = {}
        out = connected_components_long(edges, stats=stats)
        out.count()
        expect = _star_partitions(edges.count(), spark)
        assert expect < 151 and expect < 197
        assert stats["round_partitions"][0] == expect
        # the fixpoint edge set (and so the assignments) carry at most the
        # edge-sized layout (AQE may coalesce further), never the
        # 197-reducer session default
        assert out.rdd.getNumPartitions() <= expect
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_cc_bounds_inherited_map_width(spark):
    """A checkpointed edge table arriving with far more partitions than the
    star rounds need (the broadcast-compaction path: the narrow BHJ output
    inherits the upstream pair join's layout) must be coalesced down before
    round 1, so round 1's shuffle-file count is (star parts)^2-ish, not
    (inherited maps) x (star parts). coalesce is narrow — no extra shuffle."""
    from memory_optimized_splink_spark.operators.cluster import (
        _star_partitions,
        connected_components_long,
    )

    edges = spark.createDataFrame(
        erdos_renyi_edges(400, 0.02, seed=11),
    ).repartition(173).selectExpr("unique_id_l as u", "unique_id_r as v")
    stats: dict = {}
    out = connected_components_long(edges, stats=stats)
    out.count()
    expect = _star_partitions(edges.count(), spark)
    # the inflated input layout is recorded, and the fixpoint never ran a
    # round wider than the edge-sized layout
    assert stats["input_partitions"] >= 173
    assert stats["map_partitions"] == expect
    assert stats["round_partitions"][0] == expect
    assert out.rdd.getNumPartitions() <= expect


def test_star_partitions_scales_with_edges(spark):
    from memory_optimized_splink_spark.operators.cluster import _star_partitions

    dp = spark.sparkContext.defaultParallelism
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _star_partitions(10, spark) == min(dp, cap)
    # 63.8M edges -> ~86 partitions (~50 MB each), well under a
    # pair-table-sized session setting of 1024
    assert 64 <= _star_partitions(63_800_000, spark) <= min(128, cap) or cap < 64
    # monotone and capped
    assert _star_partitions(10**9, spark) <= max(cap, 4096)


def test_md5_cluster_ids_stable_across_parallelism(spark):
    from pyspark.sql import functions as F

    n = 100
    e = erdos_renyi_edges(n, 0.02, seed=1)
    nodes = spark.createDataFrame(pd.DataFrame({"unique_id": range(n)}))
    edges = spark.createDataFrame(e)
    a = solve_connected_components(nodes, edges, with_md5_ids=True)
    b = solve_connected_components(
        nodes.repartition(7), edges.repartition(3), with_md5_ids=True
    )
    ra = {r["node_id"]: r["cluster_id"] for r in a.collect()}
    rb = {r["node_id"]: r["cluster_id"] for r in b.collect()}
    assert ra == rb


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_bridges_vs_networkx(spark, seed):
    """Per-cluster Tarjan bridges == networkx.bridges on random graphs
    (reference graph_metrics.py:139-235 computes these with igraph)."""
    import networkx as nx

    from memory_optimized_splink_spark.fixtures import erdos_renyi_edges
    from memory_optimized_splink_spark.operators.cluster import (
        bridges, solve_connected_components,
    )

    pdf = erdos_renyi_edges(n=120, p=0.02, seed=seed)
    pdf = pdf.assign(
        unique_id_l=("n" + pdf["unique_id_l"].astype(str)),
        unique_id_r=("n" + pdf["unique_id_r"].astype(str)))
    g = nx.Graph()
    g.add_nodes_from(f"n{i}" for i in range(120))
    g.add_edges_from(zip(pdf["unique_id_l"], pdf["unique_id_r"]))
    expected = {frozenset((u, v)) for u, v in nx.bridges(g)}

    edges = spark.createDataFrame(pdf)
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(120)], "unique_id string")
    member = solve_connected_components(nodes, edges)
    out = bridges(member, edges).collect()
    got = {frozenset((r["unique_id_l"], r["unique_id_r"]))
           for r in out if r["is_bridge"]}
    assert got == expected
    # every input edge is classified
    assert len(out) == len(pdf)


def test_bridges_long_node_ids(spark):
    """Schema is derived from input types: long ids (the compacted-long CC
    path) must round-trip, not hit an Arrow string/long mismatch."""
    from memory_optimized_splink_spark.operators.cluster import (
        bridges, solve_connected_components,
    )

    rows = [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(rows, "unique_id_l long, unique_id_r long")
    nodes = spark.createDataFrame(
        [(n,) for n in (1, 2, 3, 10, 11, 12)], "unique_id long")
    member = solve_connected_components(nodes, edges)
    got = {(r["unique_id_l"], r["unique_id_r"]): r["is_bridge"]
           for r in bridges(member, edges).collect()}
    assert got[(1, 2)] and got[(2, 3)]
    assert not any(got[e] for e in [(10, 11), (11, 12), (10, 12)])


def test_bridges_path_and_cycle(spark):
    from memory_optimized_splink_spark.operators.cluster import (
        bridges, solve_connected_components,
    )

    # path a-b-c (both edges bridges) + triangle x-y-z (no bridges)
    rows = [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"), ("x", "z")]
    edges = spark.createDataFrame(rows, "unique_id_l string, unique_id_r string")
    nodes = spark.createDataFrame(
        [(n,) for n in "abcxyz"], "unique_id string")
    member = solve_connected_components(nodes, edges)
    got = {(r["unique_id_l"], r["unique_id_r"]): r["is_bridge"]
           for r in bridges(member, edges).collect()}
    assert got == {("a", "b"): True, ("b", "c"): True,
                   ("x", "y"): False, ("y", "z"): False, ("x", "z"): False}
