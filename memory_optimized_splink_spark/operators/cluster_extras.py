"""Clustering extensions: multi-threshold incremental clustering and
one-to-one constrained clustering.

Reference semantics:
- multi-threshold (/root/reference/splink/internals/clustering.py:346-600):
  cluster at the lowest threshold once; for each higher threshold only the
  clusters that contain an edge BELOW the new threshold can split, so CC is
  re-run only on that shrinking "in-play" subgraph. Output: per-node
  membership per threshold.
- one-to-one (/root/reference/splink/internals/one_to_one_clustering.py:
  14-237): clusters may contain at most one record from each duplicate-free
  source dataset. Iterative: rank candidate links, accept merges that keep
  the constraint, recompute, repeat to fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .cluster import _free_checkpoint, solve_connected_components


def cluster_at_multiple_thresholds(
    nodes: DataFrame,
    predictions: DataFrame,
    thresholds: list[float],
    node_col: str = "unique_id",
    output_cluster_summary_stats: bool = False,
) -> DataFrame:
    """Per-node membership at each threshold:
    (threshold, node_id, cluster_id). Ascending thresholds; each step
    re-clusters only clusters broken by the raised threshold."""
    thresholds = sorted(thresholds)
    edges_all = predictions.select(
        "unique_id_l", "unique_id_r",
        F.col("match_probability").alias("p"))
    members = solve_connected_components(
        nodes, edges_all.where(F.col("p") >= thresholds[0]),
        node_col=node_col)
    outs = [members.withColumn("threshold", F.lit(float(thresholds[0])))]
    for t in thresholds[1:]:
        # clusters holding an edge now below t are "in play" and may split
        weak = edges_all.where((F.col("p") >= thresholds[0]) & (F.col("p") < t))
        affected = (
            weak.join(members.withColumnRenamed("node_id", "unique_id_l"),
                      on="unique_id_l")
            .select("cluster_id").distinct()
        )
        in_play = members.join(affected, on="cluster_id") \
            .select("node_id").localCheckpoint(eager=True)
        stable = members.join(affected, on="cluster_id", how="left_anti")
        strong = edges_all.where(F.col("p") >= t) \
            .join(in_play.withColumnRenamed("node_id", "unique_id_l"),
                  on="unique_id_l")
        re_clustered = solve_connected_components(
            in_play.withColumnRenamed("node_id", node_col), strong,
            node_col=node_col)
        members = stable.unionByName(re_clustered).localCheckpoint(eager=True)
        # this threshold's membership is materialized; the in-play node
        # subset fed the re-cluster solve and has no remaining consumer
        # (each threshold's members stay cached — the output unions them)
        _free_checkpoint(in_play)
        outs.append(members.withColumn("threshold", F.lit(float(t))))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    if output_cluster_summary_stats:
        return out.groupBy("threshold", "cluster_id") \
            .agg(F.count(F.lit(1)).alias("n")) \
            .groupBy("threshold").agg(
                F.count(F.lit(1)).alias("num_clusters"),
                F.max("n").alias("max_cluster_size"),
                F.avg("n").alias("avg_cluster_size"))
    return out


def one_to_one_clustering(
    nodes: DataFrame,
    predictions: DataFrame,
    node_col: str = "unique_id",
    source_dataset_col: str = "source_dataset",
    duplicate_free_datasets: list[str] | None = None,
    threshold_match_probability: float | None = None,
    max_iterations: int = 25,
) -> DataFrame:
    """Greedy constrained clustering: accept the strongest mutual-best links
    whose merge keeps <=1 record per duplicate-free dataset per cluster;
    iterate to fixpoint. Deterministic (ties broken on node ids)."""
    edges = predictions.select(
        "unique_id_l", "unique_id_r",
        F.col("match_probability").alias("p"))
    if threshold_match_probability is not None:
        edges = edges.where(F.col("p") >= threshold_match_probability)
    if duplicate_free_datasets is None:
        duplicate_free_datasets = [
            r[0] for r in nodes.select(source_dataset_col).distinct().collect()
        ]
    nbrs = edges.select(
        F.col("unique_id_l").alias("node_id"),
        F.col("unique_id_r").alias("neighbour"), "p",
    ).unionByName(edges.select(
        F.col("unique_id_r").alias("node_id"),
        F.col("unique_id_l").alias("neighbour"), "p",
    )).localCheckpoint(eager=True)

    reps = nodes.select(
        F.col(node_col).alias("node_id"),
        F.col(node_col).alias("rep"),
        F.col(source_dataset_col).alias("_ds"),
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        flags = reps.groupBy("rep").agg(*[
            F.max((F.col("_ds") == F.lit(sd)).cast("int")).alias(f"_has_{i}")
            for i, sd in enumerate(duplicate_free_datasets)
        ])
        r_node = reps.select(F.col("node_id"), F.col("rep").alias("rep_l")) \
            .join(flags.withColumnRenamed("rep", "rep_l"), on="rep_l")
        r_nbr = reps.select(F.col("node_id").alias("neighbour"),
                            F.col("rep").alias("rep_r")) \
            .join(flags.withColumnRenamed("rep", "rep_r"), on="rep_r")
        for i in range(len(duplicate_free_datasets)):
            r_nbr = r_nbr.withColumnRenamed(f"_has_{i}", f"_rhas_{i}")
        cand = nbrs.join(r_node, on="node_id").join(r_nbr, on="neighbour") \
            .where(F.col("rep_l") != F.col("rep_r"))
        conflict = F.lit(False)
        for i in range(len(duplicate_free_datasets)):
            conflict = conflict | (
                (F.col(f"_has_{i}") == 1) & (F.col(f"_rhas_{i}") == 1))
        cand = cand.where(~conflict).select("rep_l", "rep_r", "p").distinct()
        if cand.isEmpty():
            break
        # strongest link per cluster, accepted when mutual-best
        w = Window.partitionBy("rep_l").orderBy(F.desc("p"), F.asc("rep_r"))
        best = cand.select("*", F.row_number().over(w).alias("rn")) \
            .where(F.col("rn") == 1).drop("rn")
        rev = best.select(F.col("rep_l").alias("rep_r"),
                          F.col("rep_r").alias("rep_l"),
                          F.col("p").alias("p2"))
        mutual = best.join(rev, on=["rep_l", "rep_r"]) \
            .where(F.col("rep_l") < F.col("rep_r")) \
            .select("rep_l", "rep_r")
        if mutual.isEmpty():
            break
        mapping = mutual.select(F.col("rep_r").alias("rep"),
                                F.col("rep_l").alias("_new_rep"))
        prev_reps = reps
        reps = reps.join(mapping, on="rep", how="left") \
            .select("node_id",
                    F.coalesce("_new_rep", "rep").alias("rep"), "_ds") \
            .localCheckpoint(eager=True)
        # the new reps table is materialized; the previous iteration's
        # checkpoint has no remaining consumer — free it so the accept
        # loop's block-store footprint stays O(1) iterations (same pattern
        # as the CC star loop)
        _free_checkpoint(prev_reps)
    return reps.select("node_id", F.col("rep").alias("cluster_id"))


def unlinkables_data(self_link_predictions: DataFrame,
                     round_dp: int = 2) -> DataFrame:
    """Share of records un-linkable below each self-match weight
    (reference: unlinkables.py / linker.py:505-564 — each record scored
    against itself; records whose self-score is low can never exceed a
    threshold)."""
    total = self_link_predictions.count()
    per_w = self_link_predictions.select(
        F.round("match_weight", round_dp).alias("match_weight")
    ).groupBy("match_weight").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("match_weight").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return per_w.select(
        "match_weight",
        (F.col("n") / F.lit(float(total))).alias("prop"),
        (F.sum("n").over(w) / F.lit(float(total))).alias("cum_prop"),
    )
