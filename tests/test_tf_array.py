"""Array-column TF adjustment (fork delta, inference.py:335-550)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
)
from memory_optimized_splink_spark.operators.nodes import compute_tf_table
from memory_optimized_splink_spark.operators.score import predict
from memory_optimized_splink_spark.operators.tf_array import (
    apply_tf_array_adjustments,
    tf_array_adjustment,
)
from memory_optimized_splink_spark.operators.vectors import (
    compute_comparison_vectors,
)


@pytest.fixture(scope="module")
def token_nodes(spark):
    rows = [
        ("1", ["acme", "corp"]),
        ("2", ["acme", "corp"]),
        ("3", ["acme", "widgets"]),
        ("4", ["rare_co"]),
        ("5", ["rare_co"]),
        ("6", ["acme"]),
    ]
    return spark.createDataFrame(rows, "unique_id string, toks array<string>").cache()


def _settings():
    return Settings(
        comparisons=(
            Comparison("toks", "toks", (
                ComparisonLevel("null"),
                ComparisonLevel("array_intersect", threshold=1, m=0.9, u=0.01),
                ComparisonLevel("else", m=0.1, u=0.99),
            )),
        ),
        blocking_rules=(block_on("'all'", label="cartesianish"),),
        probability_two_random_records_match=0.1,
    )


def test_tf_array_adjustment_values(spark, token_nodes):
    s = _settings()
    tf = compute_tf_table(token_nodes, "toks", is_array=True)
    tf_counts = {r["toks"]: r["tf_toks"] for r in tf.collect()}
    assert tf_counts == {"acme": 4.0, "corp": 2.0, "widgets": 1.0, "rare_co": 2.0}

    from memory_optimized_splink_spark.operators.blocking import block_using_rules
    pairs = block_using_rules(token_nodes, s)
    pw = compute_comparison_vectors(pairs, token_nodes, s,
                                    retain_columns=True)
    n = token_nodes.count()
    adj = tf_array_adjustment(pw, tf, "toks", "gamma_toks", [1],
                              n_records=float(n), log_base=2.0)
    got = {(r["unique_id_l"], r["unique_id_r"]): r["tf_adjustment_toks"]
           for r in adj.collect()}
    # pair (1,2): common terms acme(4), corp(2) -> sorted [2,4]
    expected_12 = n / 2.0 + (math.log(2.0) / 4.0) * (n / math.log(2.0))
    assert abs(got[("1", "2")] - expected_12) < 1e-9
    # pair (4,5): rare_co(2) -> n/2
    assert abs(got[("4", "5")] - n / 2.0) < 1e-9
    # pair (1,3): acme only -> n/4
    assert abs(got[("1", "3")] - n / 4.0) < 1e-9


def test_tf_array_in_predict(spark, token_nodes):
    s = _settings()
    tf = compute_tf_table(token_nodes, "toks", is_array=True)
    from memory_optimized_splink_spark.operators.blocking import block_using_rules
    pairs = block_using_rules(token_nodes, s)
    pw = compute_comparison_vectors(pairs, token_nodes, s,
                                    retain_columns=True)
    n = float(token_nodes.count())
    adj = tf_array_adjustment(pw, tf, "toks", "gamma_toks", [1], n_records=n)
    cv_adj = apply_tf_array_adjustments(pw, {"toks": adj})
    pred = predict(cv_adj, s, keep_bf_columns=True)
    rows = {(r["unique_id_l"], r["unique_id_r"]): r for r in pred.collect()}
    # rare-pair (4,5) must outscore common-pair (1,3): same gamma, rarer term
    assert rows[("4", "5")]["match_weight"] > rows[("1", "3")]["match_weight"]
    # non-intersecting pair gets adjustment 1.0 (left-join coalesce)
    assert rows[("3", "4")]["bf_tf_adj_toks"] == 1.0
    # weight math: log2(prior_bf * bf_gamma * tf_adj)
    import math as m
    r45 = rows[("4", "5")]
    expected = m.log2((0.1 / 0.9) * (0.9 / 0.01) * (n / 2.0))
    assert abs(r45["match_weight"] - expected) < 1e-9


def test_tf_array_via_linker(spark, token_nodes):
    from dataclasses import replace

    from memory_optimized_splink_spark.linker import SparkLinker

    s = replace(_settings(), tf_array_columns=("toks",))
    linker = SparkLinker(spark, token_nodes, s)
    rows = {(r["unique_id_l"], r["unique_id_r"]): r
            for r in linker.predict().collect()}
    assert rows[("4", "5")]["match_weight"] > rows[("1", "3")]["match_weight"]


def test_tf_array_fuzzy(spark, token_nodes):
    import math

    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.tf_array import (
        tf_array_adjustment_fuzzy,
    )

    rows = [
        ("a", ["acme_corp"]), ("b", ["acme_corq"]),  # jw('acme_corp','acme_corq')>=.95
        ("c", ["zzz"]),
    ]
    nodes = spark.createDataFrame(rows, "unique_id string, toks array<string>")
    s = _settings()
    pairs = block_using_rules(nodes, s)
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors,
    )
    pw = compute_comparison_vectors(pairs, nodes, s, retain_columns=True)
    tf = compute_tf_table(nodes, "toks", is_array=True)
    adj = tf_array_adjustment_fuzzy(
        pw, tf, "toks", "gamma_toks", [0, 1], n_records=3.0)
    got = {(r["unique_id_l"], r["unique_id_r"]): r["tf_adjustment_toks"]
           for r in adj.collect()}
    # (a,b): fuzzy term match, tf_value = greatest(1,1) = 1 -> N/1 = 3
    assert abs(got[("a", "b")] - 3.0) < 1e-9
    assert ("a", "c") not in got  # no fuzzy-similar terms
