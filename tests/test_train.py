"""Training correctness (the reference's analytic approach:
tests/test_correctness_of_convergence.py, test_u_train.py, test_m_train.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
)
from memory_optimized_splink_spark.train import (
    estimate_m_from_pairwise_labels,
    estimate_parameters_using_em,
    estimate_u_using_random_sampling,
    expectation_maximisation,
)


def _two_col_settings(cols=("a", "b")):
    return Settings(
        comparisons=tuple(
            Comparison(c, c, (
                ComparisonLevel("null"), ComparisonLevel("exact"),
                ComparisonLevel("else"),
            )) for c in cols
        ),
        blocking_rules=(block_on("block"),),
        probability_two_random_records_match=0.2,
    )


def _synthetic_patterns(params, lam, n=400_000, seed=0):
    """Generate agreement-pattern counts directly from known m/u/lambda.
    params: {col: (m, u)}. NB: a latent-class model needs >=3 conditionally
    independent indicators to be identifiable."""
    rng = np.random.default_rng(seed)
    is_match = rng.random(n) < lam
    data = {}
    for col, (m, u) in params.items():
        data[f"gamma_{col}"] = np.where(
            rng.random(n) < np.where(is_match, m, u), 1, 0)
    df = pd.DataFrame(data)
    out = df.value_counts().reset_index(name="agreement_pattern_count")
    return out


def test_em_recovers_known_parameters():
    true = {"a": (0.93, 0.04), "b": (0.85, 0.11), "c": (0.75, 0.02)}
    lam = 0.3
    patterns = _synthetic_patterns(true, lam)
    comps = list(_two_col_settings(("a", "b", "c")).with_defaults().comparisons)
    trained, lam_hat, history = expectation_maximisation(
        patterns, comps, lam=0.5, em_convergence=1e-8, max_iterations=500,
        fix_u=False,
    )
    assert abs(lam_hat - lam) < 0.02
    got = {c.name: dict(c.graded_levels) for c in trained}
    for col, (m, u) in true.items():
        assert abs(got[col][1].m - m) < 0.03, col
        assert abs(got[col][1].u - u) < 0.03, col
    assert history[-1]["max_delta"] < 1e-8


def test_em_is_deterministic():
    patterns = _synthetic_patterns({"a": (0.9, 0.05), "b": (0.8, 0.1)}, 0.25)
    comps = list(_two_col_settings().with_defaults().comparisons)
    r1 = expectation_maximisation(patterns, comps, lam=0.4)
    r2 = expectation_maximisation(patterns, comps, lam=0.4)
    assert r1[1] == r2[1]
    assert [lv.m for c in r1[0] for _, lv in c.graded_levels] == \
           [lv.m for c in r2[0] for _, lv in c.graded_levels]


@pytest.fixture(scope="module")
def person_nodes(spark):
    """Three-column table with a block key and known duplicates (>=3
    indicators keeps the latent-class model identifiable)."""
    rng = np.random.default_rng(7)
    rows = []
    for e in range(150):
        a = f"a{e}"
        # moduli coprime to the block modulus: within-block collision rates
        # stay at their global rates (conditional independence, which the
        # Fellegi-Sunter model assumes)
        b = f"b{(e * 7 + 3) % 41}"
        c = f"c{(e * 11 + 5) % 29}"
        block = f"blk{e % 10}"
        rows.append((f"{e}-0", a, b, c, block, e))
        if e % 2 == 0:  # duplicate with b/c sometimes perturbed
            b2 = b if rng.random() < 0.8 else "bX"
            c2 = c if rng.random() < 0.9 else "cX"
            rows.append((f"{e}-1", a, b2, c2, block, e))
    return spark.createDataFrame(
        rows,
        "unique_id string, a string, b string, c string, block string, cluster long",
    ).cache()


def test_u_estimation_deterministic_and_sane(spark, person_nodes):
    s = _two_col_settings(("a", "b", "c"))
    s1 = estimate_u_using_random_sampling(person_nodes, s, max_pairs=5e4)
    s2 = estimate_u_using_random_sampling(person_nodes, s, max_pairs=5e4)
    for c1, c2 in zip(s1.comparisons, s2.comparisons):
        for lv1, lv2 in zip(c1.levels, c2.levels):
            assert lv1.u == lv2.u  # seeded => run-to-run identical
    # u(exact on a) should be small: 'a' has ~150 distinct values
    ua = dict(s1.comparisons[0].graded_levels)[1].u
    assert ua < 0.05


def test_em_on_spark_pipeline_improves_m(spark, person_nodes):
    s = _two_col_settings(("a", "b", "c"))
    s = estimate_u_using_random_sampling(person_nodes, s, max_pairs=5e4)
    trained, history = estimate_parameters_using_em(
        person_nodes, s, block_on("block"), fix_u=True
    )
    got = {c.name: dict(c.graded_levels) for c in trained.comparisons}
    # exact-match m for the stable column should be high
    assert got["a"][1].m > 0.5
    assert len(history) >= 1


def test_m_from_labels(spark, person_nodes):
    from pyspark.sql import functions as F

    s = _two_col_settings(("a", "b", "c")).with_defaults()
    dups = person_nodes.groupBy("cluster").count().where("count = 2")
    pos = (
        person_nodes.alias("l")
        .join(person_nodes.alias("r"),
              (F.col("l.cluster") == F.col("r.cluster"))
              & (F.col("l.unique_id") < F.col("r.unique_id")))
        .select(F.col("l.unique_id").alias("unique_id_l"),
                F.col("r.unique_id").alias("unique_id_r"),
                F.lit(1.0).alias("clerical_match_score"))
    )
    trained = estimate_m_from_pairwise_labels(person_nodes, s, pos)
    got = {c.name: dict(c.graded_levels) for c in trained.comparisons}
    assert got["a"][1].m > 0.95  # 'a' always agrees within an entity
    assert 0.7 < got["b"][1].m < 0.95  # 'b' perturbed ~20% of the time


def test_m_from_label_column_matches_pairwise(spark, person_nodes):
    """Blocking on the label column generates exactly the intra-cluster
    pairs, so the label-column and pairwise-label paths must train
    identical m (reference linker_components/training.py:353)."""
    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.train import (
        estimate_m_from_label_column,
    )

    s = _two_col_settings(("a", "b", "c")).with_defaults()
    via_col = estimate_m_from_label_column(person_nodes, s, "cluster")
    pos = (
        person_nodes.alias("l")
        .join(person_nodes.alias("r"),
              (F.col("l.cluster") == F.col("r.cluster"))
              & (F.col("l.unique_id") < F.col("r.unique_id")))
        .select(F.col("l.unique_id").alias("unique_id_l"),
                F.col("r.unique_id").alias("unique_id_r"))
    )
    via_pairs = estimate_m_from_pairwise_labels(person_nodes, s, pos)
    for c1, c2 in zip(via_col.comparisons, via_pairs.comparisons):
        for (_, lv1), (_, lv2) in zip(c1.graded_levels, c2.graded_levels):
            assert lv1.m == lv2.m
            assert lv1.u == lv2.u  # u untouched in both
    # m(exact on a) must be high: duplicates nearly always agree on a
    got = {c.name: dict(c.graded_levels) for c in via_col.comparisons}
    assert got["a"][1].m > 0.9


def test_expression_blocking_key_does_not_deactivate():
    """substr(first_name,1,2) does not force first_name agreement — only
    exact equi-join keys deactivate a comparison during EM
    (em_training_session.py:104-124)."""
    from memory_optimized_splink_spark.train import _rule_columns

    r = block_on("substr(a,1,2)", "b")
    assert _rule_columns(r) == {"b"}
