"""Linker-API parity tail vs the reference's linker components:
deterministic_link (inference.py:63-157), explicit-table clustering +
single-best-links (clustering.py:43-320), table management
(table_management.py:99-366), query_sql (misc.py:54-92), and the
unlinkables / completeness / cumulative-comparisons chart specs
(charts.py:356-410)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.linker import SparkLinker
from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
)


def test_deterministic_link(spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    det = linker.deterministic_link()
    # one row per blocked pair, carrying gammas but NO score columns
    assert det.count() == linker.blocked_pairs().count()
    assert "gamma_content_sha" in det.columns
    assert "match_probability" not in det.columns
    # deterministic output clusters with threshold=None (edges as-is)
    clustered = linker.cluster_pairwise_predictions_at_threshold(det, None)
    assert clustered.select("cluster_id").distinct().count() < repo_nodes.count()


def test_cluster_explicit_table_matches_linker_cluster(
        spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    pred = linker.predict()
    a = linker.cluster(0.9).select("unique_id", "cluster_id")
    b = linker.cluster_pairwise_predictions_at_threshold(pred, 0.9) \
        .select("unique_id", "cluster_id")
    # same partition of the nodes (representatives are min-ids both ways)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_cluster_explicit_table_threshold_requires_probability(
        spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    det = linker.deterministic_link()
    with pytest.raises(ValueError, match="match_probability"):
        linker.cluster_pairwise_predictions_at_threshold(det, 0.5)


def _link_settings() -> Settings:
    return Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.01),
                ComparisonLevel("else", m=0.1, u=0.99),
            )),
        ),
        blocking_rules=(block_on("grp"),),
        probability_two_random_records_match=0.1,
        link_type="link_only",
        source_dataset_column_name="source_dataset",
    )


def test_cluster_using_single_best_links(spark):
    rows = [
        ("a1", "a", "g", "alice"), ("a2", "a", "g", "alice"),
        ("b1", "b", "g", "alice"), ("b2", "b", "g", "alicia"),
    ]
    df = spark.createDataFrame(
        rows, "unique_id string, source_dataset string, grp string, name string")
    linker = SparkLinker(spark, df, _link_settings())
    out = linker.cluster_using_single_best_links(
        duplicate_free_datasets=["a", "b"],
        threshold_match_probability=0.5)
    clusters: dict[str, list[str]] = {}
    for r in out.select("unique_id", "cluster_id", "source_dataset").collect():
        clusters.setdefault(r["cluster_id"], []).append(r["source_dataset"])
    for ds in clusters.values():
        assert len(ds) == len(set(ds)), clusters

    linker_no_sd = SparkLinker(
        spark, df.drop("source_dataset"),
        Settings(comparisons=_link_settings().comparisons,
                 blocking_rules=(block_on("grp"),),
                 probability_two_random_records_match=0.1))
    with pytest.raises(ValueError, match="source_dataset"):
        linker_no_sd.cluster_using_single_best_links()


def test_register_table_and_query_sql(spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    linker.register_table(
        [{"unique_id": "x", "note": "keep"},
         {"unique_id": "y", "note": "drop"}],
        "my_notes", overwrite=True)
    out = linker.query_sql(
        "SELECT unique_id FROM my_notes WHERE note = 'keep'")
    assert [r["unique_id"] for r in out.collect()] == ["x"]
    pdf = linker.query_sql("SELECT count(*) AS n FROM my_notes",
                           output_type="pandas")
    assert int(pdf["n"].iloc[0]) == 2
    with pytest.raises(ValueError, match="output_type"):
        linker.query_sql("SELECT 1", output_type="arrow")
    with pytest.raises(ValueError, match="already registered"):
        linker.register_table([{"unique_id": "z"}], "my_notes")


def test_register_table_predict_feeds_cluster(spark, repo_nodes,
                                              basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    pred = linker.predict().localCheckpoint(eager=True)
    linker2 = SparkLinker(spark, repo_nodes, basic_settings)
    linker2.register_table_predict(pred, overwrite=True)
    assert linker2.predict() is pred  # no recomputation
    a = linker.cluster(0.9).select("unique_id", "cluster_id")
    b = linker2.cluster(0.9).select("unique_id", "cluster_id")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _tf_settings() -> Settings:
    return Settings(
        comparisons=(
            Comparison("city", "city", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.6, u=0.1, tf_adjustment=True),
                ComparisonLevel("else", m=0.4, u=0.9),
            )),
        ),
        blocking_rules=(block_on("grp"),),
        probability_two_random_records_match=0.1,
        tf_columns=("city",),
    )


@pytest.fixture()
def city_nodes(spark):
    rows = [(str(i), "g", ["ely", "ely", "ely", "rye", "rye", "ack"][i % 6])
            for i in range(12)]
    return spark.createDataFrame(
        rows, "unique_id string, grp string, city string")


def test_register_term_frequency_lookup(spark, city_nodes):
    linker = SparkLinker(spark, city_nodes, _tf_settings())
    # registered counts override the ones computed from the input
    lookup = [{"city": "ely", "tf_city": 2.0},
              {"city": "rye", "tf_city": 4.0},
              {"city": "ack", "tf_city": 6.0}]
    linker.register_term_frequency_lookup(lookup, "city")
    got = {r["city"]: r["tf_city"]
           for r in linker.nodes().select("city", "tf_city").distinct().collect()}
    assert got == {"ely": 2.0, "rye": 4.0, "ack": 6.0}
    # TF adjustment responds: an ely-ely pair now gets multiplier N/2, so
    # its weight exceeds a rye-rye pair's (N/4) despite ely being more
    # frequent in the raw input
    pred = linker.predict()
    w = (pred.join(city_nodes.select(F.col("unique_id").alias("unique_id_l"),
                                     F.col("city").alias("city_l")),
                   on="unique_id_l")
         .groupBy("city_l").agg(F.max("match_weight").alias("w")).collect())
    weights = {r["city_l"]: r["w"] for r in w}
    assert weights["ely"] > weights["rye"]

    with pytest.raises(ValueError, match="already registered"):
        linker.register_term_frequency_lookup(lookup, "city")
    with pytest.raises(ValueError, match="must have columns"):
        linker.register_term_frequency_lookup(
            [{"city": "ely", "freq": 1.0}], "city", overwrite=True)


def test_register_tf_lookup_proportions(spark, city_nodes):
    linker = SparkLinker(spark, city_nodes, _tf_settings())
    linker.register_term_frequency_lookup(
        [{"city": "ely", "tf_city": 0.5},
         {"city": "rye", "tf_city": 1 / 3},
         {"city": "ack", "tf_city": 1 / 6}],
        "city", values_are_proportions=True)
    got = {r["city"]: r["tf_city"]
           for r in linker.nodes().select("city", "tf_city").distinct().collect()}
    # 12 non-null city rows: proportions scale back to counts
    assert got["ely"] == pytest.approx(6.0)
    assert got["rye"] == pytest.approx(4.0)
    assert got["ack"] == pytest.approx(2.0)


def test_invalidate_cache_recomputes(spark, repo_nodes, basic_settings,
                                     tmp_path):
    ckpt = str(tmp_path / "ckpt")
    linker = SparkLinker(spark, repo_nodes, basic_settings,
                         checkpoint_dir=ckpt, enable_checkpoints=True)
    n1 = linker.predict().count()
    done1 = [r for r in linker.metrics.records
             if r.get("event") == "stage_complete"]
    linker.invalidate_cache()
    n2 = linker.predict().count()
    assert n1 == n2
    done2 = [r for r in linker.metrics.records
             if r.get("event") == "stage_complete"]
    # every stage re-ran under a new config hash; nothing resumed
    assert len(done2) > len(done1)
    resumed = [r for r in linker.metrics.records
               if r.get("event") == "resume_from_checkpoint"]
    assert not resumed
    new_hashes = {r["config_hash"] for r in done2[len(done1):]}
    old_hashes = {r["config_hash"] for r in done1}
    assert new_hashes.isdisjoint(old_hashes)


def test_delete_tables_removes_checkpoints(spark, repo_nodes, basic_settings,
                                           tmp_path):
    ckpt = str(tmp_path / "ckpt")
    linker = SparkLinker(spark, repo_nodes, basic_settings,
                         checkpoint_dir=ckpt, enable_checkpoints=True)
    linker.predict().count()
    assert os.path.exists(os.path.join(ckpt, "blocked_pairs"))
    linker.delete_tables_created_by_splink_from_db()
    assert not os.path.exists(ckpt)


def test_unlinkables_chart_spec(spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    spec = linker.unlinkables_chart()
    values = spec["data"]["values"]
    assert values and abs(values[-1]["cum_prop"] - 1.0) < 1e-9
    # derived probability is the logistic of the rounded weight
    for v in values:
        bf = 2.0 ** v["match_weight"]
        assert v["match_probability"] == pytest.approx(bf / (1 + bf),
                                                       abs=1e-4)
    spec_p = linker.unlinkables_chart(x_col="match_probability")
    assert spec_p["layer"][0]["encoding"]["x"]["field"] == "match_probability"
    with pytest.raises(ValueError):
        linker.unlinkables_chart(x_col="weight")


def test_completeness_and_cumulative_charts(spark, repo_nodes,
                                            basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    spec = linker.completeness_chart()
    vals = {v["column_name"]: v["completeness"]
            for v in spec["data"]["values"]}
    assert set(vals) == {"content_sha", "path"}
    assert all(0.0 <= v <= 1.0 for v in vals.values())

    cc = linker.cumulative_comparisons_chart()
    rows = cc["data"]["values"]
    assert rows[-1]["cumulative_rows"] == sum(r["row_count"] for r in rows)
    assert rows[-1]["cumulative_rows"] == linker.blocked_pairs().count()
