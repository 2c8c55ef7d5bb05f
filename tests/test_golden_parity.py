"""Golden-output parity vs the reference's own test datasets
(/root/reference/tests/datasets/ — the same fixtures its
test_compare_splink2.py and test_correctness_of_convergence.py consume).

These are DATA fixtures produced by an independent implementation
(Splink 2): matching them is direct evidence this engine computes the same
Fellegi-Sunter quantities as the reference lineage."""

from __future__ import annotations

import pandas as pd
import pytest

from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
    bayes_factor_to_prob, prob_to_bayes_factor,
)

DATA = "/root/reference/tests/datasets"


def _basic_settings():
    """tests/basic_settings.py:5-130 re-expressed in this engine's model."""
    glo = bayes_factor_to_prob(prob_to_bayes_factor(0.3) / (0.9 / 0.1))
    two_level = lambda name: Comparison(name, name, (
        ComparisonLevel("null"),
        ComparisonLevel("exact", m=0.9, u=0.1),
        ComparisonLevel("else", m=0.1, u=0.9)))
    return Settings(
        comparisons=(
            Comparison("first_name", "first_name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.7, u=0.1, tf_adjustment=True,
                                tf_adjustment_weight=0.6),
                ComparisonLevel("levenshtein", threshold=2, m=0.2, u=0.1),
                ComparisonLevel("else", m=0.1, u=0.8))),
            two_level("surname"), two_level("dob"),
            two_level("email"), two_level("city"),
        ),
        blocking_rules=(block_on("surname"),),
        probability_two_random_records_match=glo,
        em_convergence=0.001, max_iterations=20,
    )


@pytest.fixture(scope="module")
def fake_1000(spark):
    pdf = pd.read_csv(f"{DATA}/fake_1000_from_splink_demos.csv")
    return spark.createDataFrame(
        pdf.astype({"unique_id": "int64", "cluster": "int64"})).cache()


def test_em_lambda_history_matches_splink2_golden(spark, fake_1000):
    """splink2_proportion_of_matches_history_*.csv: lambda trajectory of EM
    blocked on surname, fixed u, TF-weighted E-step."""
    from memory_optimized_splink_spark.train import (
        estimate_parameters_using_em_with_tf,
    )

    _, hist = estimate_parameters_using_em_with_tf(
        fake_1000, _basic_settings(), block_on("surname"), fix_u=True)
    golden = pd.read_csv(
        f"{DATA}/splink2_proportion_of_matches_history_fixed_u.csv")
    mine = {h["iteration"]: h["lambda"] for h in hist}
    for _, row in golden.iterrows():
        assert mine[int(row["iteration"])] == pytest.approx(row["λ"]), row


def test_known_params_match_probability(spark):
    """known_params_comparison_vectors.csv: gamma patterns generated from
    known m/u/lambda with the generator's own match probability. Our
    predict must reproduce true_match_probability exactly."""
    from memory_optimized_splink_spark.operators.score import predict

    pdf = pd.read_csv(f"{DATA}/known_params_comparison_vectors.csv")
    cv = spark.createDataFrame(
        pdf[["unique_id_l", "unique_id_r", "gamma_col_1", "gamma_col_2",
             "gamma_col_3", "true_match_probability_l"]])
    mu = {"col_1": (0.7, 0.1), "col_2": (0.9, 0.025), "col_3": (0.95, 0.2)}
    mu0 = {"col_1": (0.3, 0.9), "col_2": (0.1, 0.975), "col_3": (0.05, 0.8)}
    settings = Settings(
        comparisons=tuple(
            Comparison(c, c, (
                ComparisonLevel("exact", m=mu[c][0], u=mu[c][1]),
                ComparisonLevel("else", m=mu0[c][0], u=mu0[c][1]),
            )) for c in ("col_1", "col_2", "col_3")
        ),
        blocking_rules=(block_on("x"),),
        probability_two_random_records_match=0.5,
    )
    got = predict(cv, settings).select(
        "true_match_probability_l", "match_probability").collect()
    for r in got:
        assert r["match_probability"] == pytest.approx(
            r["true_match_probability_l"], rel=1e-9)


def test_em_recovers_generator_params_from_golden_cvs(spark):
    """The reference's test_correctness_of_convergence: EM over the golden
    comparison-vector table recovers the generating m/u/lambda."""
    from memory_optimized_splink_spark.train import expectation_maximisation

    pdf = pd.read_csv(f"{DATA}/known_params_comparison_vectors.csv")
    patterns = (
        pdf.groupby(["gamma_col_1", "gamma_col_2", "gamma_col_3"])
        .size().reset_index(name="agreement_pattern_count"))
    comps = [
        Comparison(c, c, (
            ComparisonLevel("exact"), ComparisonLevel("else"),
        )).with_defaults()
        for c in ("col_1", "col_2", "col_3")
    ]
    trained, lam, _ = expectation_maximisation(
        patterns, comps, lam=0.2, em_convergence=1e-7, max_iterations=300,
        fix_u=False)
    true = {"col_1": (0.7, 0.1), "col_2": (0.9, 0.025), "col_3": (0.95, 0.2)}
    got = {c.name: dict(c.graded_levels) for c in trained}
    assert lam == pytest.approx(0.5, abs=0.02)
    for c, (m, u) in true.items():
        assert got[c][1].m == pytest.approx(m, abs=0.02), c
        assert got[c][1].u == pytest.approx(u, abs=0.02), c


def test_predict_479_481_matches_splink2_golden(spark, fake_1000):
    """splink2_479_vs_481.csv: exact match weight of one golden pair through
    the full predict path, upstream-ratio TF on first_name."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.linker import SparkLinker

    golden = pd.read_csv(f"{DATA}/splink2_479_vs_481.csv").iloc[0]
    base = _basic_settings()
    # the splink2 run used lambda=0.3 and no surname comparison (it is the
    # blocking key), upstream TF semantics
    s = replace(
        base,
        comparisons=tuple(c for c in base.comparisons if c.name != "surname"),
        probability_two_random_records_match=0.3,
        tf_style="upstream_ratio",
        tf_columns=("first_name",),
    )
    linker = SparkLinker(spark, fake_1000, s)
    pred = linker.predict()
    row = pred.where((F.col("unique_id_l") == 479)
                     & (F.col("unique_id_r") == 481)).collect()[0]
    assert row["match_weight"] == pytest.approx(golden["match_weight"])
    assert row["match_probability"] == pytest.approx(golden["match_probability"])
