"""The reference's tutorial flow, verbatim API, on the reference's own
fake_1000 demo dataset (the same CSV the golden-parity tests use):
SettingsCreator with PascalCase library comparisons (default TF on
names), block_on rules, u-training, EM, predict, cluster, ground-truth
cluster quality, and a reference-JSON model round-trip — the end-to-end
'a reference user can switch' demonstration."""

from __future__ import annotations

import pandas as pd
import pytest

from memory_optimized_splink_spark import (
    SettingsCreator,
    SparkLinker,
    block_on,
)
import memory_optimized_splink_spark.comparison_library as cl

DATA = "/root/reference/tests/datasets"


@pytest.fixture(scope="module")
def fake_1000(spark):
    pdf = pd.read_csv(f"{DATA}/fake_1000_from_splink_demos.csv").astype(
        {"unique_id": "int64", "cluster": "int64"})
    df = spark.createDataFrame(pdf)
    df.cache()
    df.count()
    return df


def test_demo_walkthrough(spark, fake_1000, tmp_path):
    settings = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[
            cl.NameComparison("first_name"),
            cl.NameComparison("surname"),
            cl.DateOfBirthComparison("dob", input_is_string=True),
            cl.ExactMatch("city").configure(
                term_frequency_adjustments=True),
            cl.EmailComparison("email"),
        ],
        blocking_rules_to_generate_predictions=[
            block_on("first_name"), block_on("surname")],
        probability_two_random_records_match=0.01,
    )
    linker = SparkLinker(spark, fake_1000, settings)
    # default TF flags on the library comparisons were auto-collected
    assert {"first_name", "surname", "city"} <= set(
        linker.settings.tf_columns)

    linker.estimate_u_using_random_sampling(max_pairs=2e5)
    linker.estimate_parameters_using_expectation_maximisation(
        block_on("first_name"))
    pred = linker.predict(threshold_match_probability=0.5)
    n_pred = pred.count()
    assert n_pred > 0

    membership = linker.cluster(threshold_match_probability=0.9)

    # ground truth: the CSV's `cluster` column (cluster() returns the
    # node table joined with membership, so it is already present)
    import pyspark.sql.functions as F
    joined = membership.select("cluster_id", "cluster")
    # within each predicted cluster, the dominant true cluster should own
    # nearly all members
    purity = (joined.groupBy("cluster_id", "cluster")
              .agg(F.count(F.lit(1)).alias("n"))
              .groupBy("cluster_id")
              .agg((F.max("n") / F.sum("n")).alias("purity"))
              .agg(F.avg("purity")).collect()[0][0])
    assert purity > 0.9

    # recall proxy: predicted non-singleton clusters must cover most of
    # the rows belonging to true multi-member clusters
    true_dups = (fake_1000.groupBy("cluster")
                 .agg(F.count(F.lit(1)).alias("n")).where("n > 1"))
    n_dup_rows = fake_1000.join(true_dups.select("cluster"),
                                on="cluster").count()
    pred_sizes = membership.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"))
    n_clustered = membership.join(
        pred_sizes.where("n > 1").select("cluster_id"),
        on="cluster_id").count()
    assert n_clustered > 0.5 * n_dup_rows

    # model round-trips through the reference JSON format
    out = tmp_path / "model.json"
    linker.save_model_to_json(str(out))
    relinked = SparkLinker(spark, fake_1000, str(out))
    pred2 = relinked.predict(threshold_match_probability=0.5)
    assert abs(pred2.count() - n_pred) <= 0.02 * n_pred
