#!/usr/bin/env python
"""Capture .explain('formatted') for the bench query paths (round-6 evidence).

Usage: python plans/r06/capture_plans.py <suffix>   # writes <query>_<suffix>.txt
Run from the repo root. Plans are captured at bench shape (sf0.1, the same
operator entry points bench.py times), with AQE initial plans.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..")))

from contextlib import redirect_stdout

from pyspark.sql import functions as F

from bench import build_bench_nodes
from memory_optimized_splink_spark import entry_queries as EQ
from memory_optimized_splink_spark.operators.blocking import block_using_rules
from memory_optimized_splink_spark.operators.dedup import (
    embedding_cosine_pairs, minhash_lsh_pairs,
)
from memory_optimized_splink_spark.operators.score import predict as predict_op
from memory_optimized_splink_spark.operators.vectors import (
    compute_comparison_vectors,
)
from memory_optimized_splink_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    here = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plans-r06", master="local[4]",
                      shuffle_partitions=32)
    s = EQ.entry_settings()
    par = spark.sparkContext.defaultParallelism * 2
    nodes = build_bench_nodes(spark, sf_dir, 40).repartition(par) \
        .localCheckpoint(eager=True)
    pairs = block_using_rules(nodes, s).localCheckpoint(eager=True)

    plans = {}
    plans["blocking"] = block_using_rules(nodes, s)
    cv = compute_comparison_vectors(pairs, nodes, s)
    plans["score_predict"] = predict_op(cv, s) \
        .agg(F.count(F.lit(1)), F.sum("match_weight"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plans["minhash_lsh"] = minhash_lsh_pairs(docs, "doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plans["embedding_srp"] = embedding_cosine_pairs(
        emb, "vec_id", "embedding", threshold=0.9)
    plans["ann_topk"] = EQ.QUERIES["ann_topk"](spark, sf_dir)
    plans["exact_dedup"] = EQ.QUERIES["exact_dedup"](spark, sf_dir)
    plans["text_quality"] = EQ.QUERIES["text_quality"](spark, sf_dir)
    plans["largest_blocks"] = EQ.QUERIES["largest_blocks"](spark, sf_dir)

    for name, df in plans.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(here, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, suffix)

    # cluster_cc: the star-round inner plan (one large+small star round) —
    # the loop's per-round plan is the part that matters; capture round 1's
    # DataFrame plan plus the full membership plan.
    from memory_optimized_splink_spark.operators import cluster as C
    pred = predict_op(compute_comparison_vectors(pairs, nodes, s), s) \
        .select("unique_id_l", "unique_id_r", "match_probability") \
        .localCheckpoint(eager=True)
    edges = pred.where(F.col("match_probability") >= 0.9) \
        .select("unique_id_l", "unique_id_r")
    idmap = C._checkpoint(
        nodes.select(F.col("unique_id").alias("node_id")).distinct()
        .withColumn("nid", F.monotonically_increasing_id()))
    e = C._compact_edges(idmap, edges, "unique_id_l", "unique_id_r", 1 << 30)
    e = C._checkpoint(e.select("u", "v").where(F.col("u") != F.col("v")))
    n_edges = e.count()
    npart = C._star_partitions(n_edges, spark)
    # capture the loop's EXACT fused round shape (falling back through the
    # older signatures so the same script can run at earlier commits)
    try:
        round1 = C._small_star(C._large_star(e, npart, dedupe=False), npart,
                               assume_normalized=True, dedupe_output=False)
    except TypeError:
        try:
            round1 = C._small_star(C._large_star(e, npart, dedupe=False),
                                   npart, assume_normalized=True)
        except TypeError:
            round1 = C._small_star(C._large_star(e, npart), npart)
    member = C.solve_connected_components(nodes, edges)
    for name, df in [("cluster_cc_round", round1),
                     ("cluster_cc_membership", member)]:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(here, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
