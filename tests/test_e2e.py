"""End-to-end dedupe on the repo_files fixture + scoring invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from memory_optimized_splink_spark.model import prob_to_bayes_factor
from memory_optimized_splink_spark.operators.blocking import block_using_rules
from memory_optimized_splink_spark.operators.cluster import (
    cluster_pairwise_predictions_at_threshold,
)
from memory_optimized_splink_spark.operators.score import predict
from memory_optimized_splink_spark.operators.vectors import (
    compute_comparison_vectors,
)


def pairwise_f1(membership, pred_col="cluster_id", truth_col="cluster"):
    tp = membership.groupBy(pred_col, truth_col).count() \
        .selectExpr("sum(count*(count-1)/2) v").collect()[0][0] or 0.0
    p = membership.groupBy(pred_col).count() \
        .selectExpr("sum(count*(count-1)/2) v").collect()[0][0] or 0.0
    t = membership.groupBy(truth_col).count() \
        .selectExpr("sum(count*(count-1)/2) v").collect()[0][0] or 0.0
    return 2.0 * tp / (p + t) if (p + t) else 1.0


def test_end_to_end_f1(repo_nodes, basic_settings):
    pairs = block_using_rules(repo_nodes, basic_settings)
    cv = compute_comparison_vectors(pairs, repo_nodes, basic_settings)
    pred = predict(cv, basic_settings)
    clusters = cluster_pairwise_predictions_at_threshold(
        repo_nodes, pred, basic_settings, 0.9
    )
    f1 = pairwise_f1(clusters.select("unique_id", "cluster_id", "cluster"))
    assert f1 >= 0.99


def test_match_weight_math(repo_nodes, basic_settings):
    """match_weight = log2(prior_bf * prod m_k/u_k) for the realized gammas;
    match_probability = sigmoid."""
    pairs = block_using_rules(repo_nodes, basic_settings)
    cv = compute_comparison_vectors(pairs, repo_nodes, basic_settings)
    rows = predict(cv, basic_settings).limit(50).collect()
    comps = {c.name: c for c in basic_settings.comparisons}
    prior_bf = prob_to_bayes_factor(
        basic_settings.probability_two_random_records_match
    )
    for r in rows:
        bf = prior_bf
        for name, comp in comps.items():
            gamma = r[f"gamma_{name}"]
            if gamma == -1:
                continue
            lv = dict(comp.graded_levels)[gamma]
            bf *= lv.m / lv.u
        assert abs(r["match_weight"] - math.log2(bf)) < 1e-9
        assert abs(r["match_probability"] - bf / (1 + bf)) < 1e-9


def test_threshold_filter(repo_nodes, basic_settings):
    pairs = block_using_rules(repo_nodes, basic_settings)
    cv = compute_comparison_vectors(pairs, repo_nodes, basic_settings)
    pred = predict(cv, basic_settings, threshold_match_probability=0.9)
    assert pred.where(F.col("match_probability") < 0.9).count() == 0


def test_only_help_clamps_m(basic_settings):
    from dataclasses import replace

    from memory_optimized_splink_spark.operators.score import apply_only_help

    comp = basic_settings.comparisons[1]
    levels = tuple(
        replace(lv, only_help=True) for lv in comp.levels
    )
    s = replace(
        basic_settings,
        comparisons=(basic_settings.comparisons[0], replace(comp, levels=levels)),
    )
    clamped = apply_only_help(s)
    for lv in clamped.comparisons[1].levels:
        if lv.m is not None and lv.u is not None:
            assert lv.m >= lv.u  # bayes factor >= 1: can never hurt a match


def test_content_sha_invariant(repo_nodes):
    """Per-row invariant vs the reference: content_sha = sha2(content,256)
    (BASELINE.json input_hint)."""
    import hashlib

    rows = repo_nodes.select("content", "content_sha").limit(20).collect()
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha"]
