"""Evaluation-parity tail vs the reference's evaluation / clustering /
training / misc linker components: extended accuracy metrics
(accuracy.py:254-283), accuracy_analysis_from_labels_* dispatchers
(evaluation.py:90-298), prediction_errors_from_labels_* (evaluation.py:38,
299), compute_graph_metrics (clustering.py:480), compute_tf_table +
register_table_input_nodes_concat_with_tf (table_management.py:31,125),
training-name aliases (training.py:34,210,316), save_model_to_json
(misc.py:21), and the dashboard writer methods."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.accuracy import (
    ACCURACY_METRICS, add_accuracy_metrics,
)
from memory_optimized_splink_spark.linker import SparkLinker


@pytest.fixture(scope="module")
def labels_df(spark, repo_nodes):
    from memory_optimized_splink_spark.fixtures import labeled_pairs_pandas

    pdf = repo_nodes.select("unique_id", "cluster", "repo").toPandas()
    labels = labeled_pairs_pandas(
        pdf[["repo", "cluster"]].assign(
            path="", commit="", lang="", content=""),
        pdf["unique_id"],
    )
    return spark.createDataFrame(labels)


def test_add_accuracy_metrics_formulas(spark):
    # hand-checkable confusion counts
    rows = [
        {"truth_threshold": 1.0, "tp": 8.0, "fp": 2.0, "fn": 2.0, "tn": 8.0},
        {"truth_threshold": 0.0, "tp": 10.0, "fp": 10.0, "fn": 0.0, "tn": 0.0},
    ]
    out = {r["truth_threshold"]: r.asDict() for r in
           add_accuracy_metrics(spark.createDataFrame(rows)).collect()}
    r = out[1.0]
    assert r["specificity"] == pytest.approx(0.8)
    assert r["npv"] == pytest.approx(0.8)
    assert r["accuracy"] == pytest.approx(0.8)
    assert r["f1"] == pytest.approx(2 * 8 / (2 * 8 + 2 + 2))
    assert r["f2"] == pytest.approx(5 * 8 / (5 * 8 + 4 * 2 + 2))
    assert r["f0_5"] == pytest.approx(1.25 * 8 / (1.25 * 8 + 0.25 * 2 + 2))
    assert r["p4"] == pytest.approx(4 * 64 / (4 * 64 + 16 * 4))
    # phi via the textbook MCC formula
    phi = (8 * 8 - 2 * 2) / math.sqrt(10 * 10 * 10 * 10)
    assert r["phi"] == pytest.approx(phi)
    # degenerate margins: N = 0 -> phi clamps to 0, npv to 1
    d = out[0.0]
    assert d["phi"] == 0.0
    assert d["npv"] == 1.0
    with pytest.raises(ValueError, match="invalid metrics"):
        add_accuracy_metrics(spark.createDataFrame(rows), ["nope"])


def test_accuracy_analysis_from_labels_table_outputs(
        spark, repo_nodes, basic_settings, labels_df):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    ts = linker.accuracy_analysis_from_labels_table(
        labels_df, output_type="table", add_metrics=["f2", "phi"])
    cols = set(ts.columns)
    assert {"truth_threshold", "precision", "recall", "f2", "phi"} <= cols
    assert "p4" not in cols  # only requested metrics added
    for ot in ("roc", "precision_recall", "accuracy", "threshold_selection"):
        spec = linker.accuracy_analysis_from_labels_table(
            labels_df, output_type=ot, add_metrics=["f1"])
        assert isinstance(spec, dict) and "$schema" in spec
    # threshold_selection carries the slider param
    sel = linker.accuracy_analysis_from_labels_table(
        labels_df, output_type="threshold_selection")
    assert sel["params"][0]["name"] == "threshold"
    with pytest.raises(ValueError, match="output_type"):
        linker.accuracy_analysis_from_labels_table(labels_df,
                                                   output_type="bogus")


def test_accuracy_analysis_from_labels_column(spark, repo_nodes,
                                              basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    ts = linker.accuracy_analysis_from_labels_column(
        "cluster", output_type="table", add_metrics=["accuracy"])
    rows = ts.orderBy(F.desc("truth_threshold")).collect()
    assert rows and rows[0]["precision"] >= 0.99
    assert all(0.0 <= r["accuracy"] <= 1.0 for r in rows)
    spec = linker.accuracy_analysis_from_labels_column(
        "cluster", output_type="accuracy", add_metrics=["f2"])
    metrics = {v["metric"] for v in spec["data"]["values"]}
    assert metrics == {"precision", "recall", "f2"}


def test_prediction_errors_from_labels_table_flags(
        spark, repo_nodes, basic_settings, labels_df):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    errs = linker.prediction_errors_from_labels_table(labels_df)
    kinds = {r["error_type"] for r in errs.select("error_type")
             .distinct().collect()}
    assert kinds <= {"FP", "FN"}
    only_fn = linker.prediction_errors_from_labels_table(
        labels_df, include_false_positives=False)
    assert only_fn.where(F.col("error_type") == "FP").count() == 0
    only_fp = linker.prediction_errors_from_labels_table(
        labels_df, include_false_negatives=False)
    assert only_fp.where(F.col("error_type") == "FN").count() == 0
    # the two partitions sum to the whole
    assert errs.count() == only_fn.count() + only_fp.count()


def test_prediction_errors_from_labels_column_finds_unblocked_fns(spark):
    """A true pair the model's blocking never generates must surface as FN
    (reference scores it 'not found by blocking rules')."""
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    rows = [
        {"unique_id": "a", "name": "ann", "city": "aa", "ent": "x"},
        {"unique_id": "b", "name": "ann", "city": "bb", "ent": "x"},
        # pair (c, d): same entity but blocking key (name) differs -> the
        # model never scores it; only the label-extended blocking finds it
        {"unique_id": "c", "name": "carol", "city": "cc", "ent": "y"},
        {"unique_id": "d", "name": "karol", "city": "cc", "ent": "y"},
        {"unique_id": "e", "name": "erin", "city": "ee", "ent": "z"},
    ]
    settings = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.01),
                ComparisonLevel("else", m=0.1, u=0.99),
            )),
        ),
        blocking_rules=(block_on("name"),),
        probability_two_random_records_match=0.2,
    )
    linker = SparkLinker(spark, spark.createDataFrame(rows), settings)
    errs = linker.prediction_errors_from_labels_column("ent").collect()
    fns = {(r["unique_id_l"], r["unique_id_r"]) for r in errs
           if r["error_type"] == "FN"}
    assert ("c", "d") in fns or ("d", "c") in fns
    by_pair = {(r["unique_id_l"], r["unique_id_r"]): r for r in errs}
    cd = by_pair.get(("c", "d")) or by_pair.get(("d", "c"))
    assert cd["found_by_blocking_rules"] is False


def test_compute_graph_metrics(spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    gm = linker.compute_graph_metrics(threshold_match_probability=0.9)
    assert {"node_id", "cluster_id", "node_degree"} <= set(gm.nodes.columns)
    assert {"cluster_id", "n_nodes", "n_edges", "density",
            "cluster_centralisation"} <= set(gm.clusters.columns)
    assert "is_bridge" in gm.edges.columns
    # degree sums to 2x edge count within every cluster
    deg = gm.nodes.groupBy("cluster_id").agg(
        F.sum("node_degree").alias("sum_deg"))
    joined = deg.join(gm.clusters, on="cluster_id").where(
        F.col("sum_deg") != 2 * F.col("n_edges"))
    assert joined.count() == 0


def test_compute_tf_table_and_register_nodes(spark, repo_nodes,
                                             basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    tf = linker.compute_tf_table("repo", ordered=True)
    rows = tf.collect()
    assert rows and rows[0]["tf_repo"] == max(r["tf_repo"] for r in rows)
    # counts, not proportions (the engine's TF unit)
    total = sum(r["tf_repo"] for r in rows)
    n_non_null = repo_nodes.where(F.col("repo").isNotNull()).count()
    assert total == n_non_null

    # register a precomputed nodes table: nodes() must return it verbatim
    nodes_df = linker.nodes()
    linker2 = SparkLinker(spark, repo_nodes, basic_settings)
    out = linker2.register_table_input_nodes_concat_with_tf(nodes_df)
    assert linker2.nodes() is out
    with pytest.raises(ValueError, match="overwrite"):
        linker2.register_table_input_nodes_concat_with_tf(nodes_df)
    # and the registration is fingerprinted into the stage config
    assert "__nodes__" in linker2._registered_tf_fp
    with pytest.raises(ValueError, match="missing input columns"):
        SparkLinker(spark, repo_nodes, basic_settings) \
            .register_table_input_nodes_concat_with_tf(
                nodes_df.drop("path"))


def test_training_name_aliases(spark, repo_nodes, basic_settings):
    from memory_optimized_splink_spark.model import block_on

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    lam0 = linker.settings.probability_two_random_records_match
    linker.estimate_probability_two_random_records_match(
        [block_on("content_sha")], recall=0.9)
    assert linker.settings.probability_two_random_records_match != lam0

    hist = linker.estimate_parameters_using_expectation_maximisation(
        block_on("repo"))
    assert hist and "lambda" in hist[0]

    # m from pairwise labels: exact-sha pairs are true matches
    pred = linker.predict()
    labels = pred.where(F.col("gamma_content_sha") == 1).select(
        "unique_id_l", "unique_id_r",
        F.lit(1.0).alias("clerical_match_score"))
    m0 = linker.settings.comparisons[1].levels[1].m
    linker.estimate_m_from_pairwise_labels(labels)
    m1 = linker.settings.comparisons[1].levels[1].m
    assert m1 is not None and m1 != m0
    assert any("pairwise labels" in d for d, _ in linker._parameter_estimates)


def test_save_model_to_json(tmp_path, spark, repo_nodes, basic_settings):
    import json

    from memory_optimized_splink_spark.interop import (
        settings_from_splink_dict,
    )

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    out = tmp_path / "model.json"
    d = linker.save_model_to_json(str(out))
    assert json.loads(out.read_text()) == d
    with pytest.raises(FileExistsError):
        linker.save_model_to_json(str(out))
    d2 = linker.save_model_to_json(str(out), overwrite=True)
    # round-trips through the importer
    s2 = settings_from_splink_dict(d2)
    assert len(s2.comparisons) == len(basic_settings.comparisons)


def test_dashboard_writer_methods(tmp_path, spark, repo_nodes,
                                  basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    cv = tmp_path / "cv.html"
    linker.comparison_viewer_dashboard(str(cv))
    assert cv.read_text().startswith("<!DOCTYPE html>")
    with pytest.raises(FileExistsError):
        linker.comparison_viewer_dashboard(str(cv))

    cs = tmp_path / "cs.html"
    linker.cluster_studio_dashboard(0.9, str(cs))
    assert "cluster" in cs.read_text().lower()

    rec = {c: None for c in repo_nodes.columns}
    sample = repo_nodes.limit(1).collect()[0].asDict()
    rec.update({k: sample[k] for k in ("repo", "path", "content_sha")})
    lt = tmp_path / "lt.html"
    linker.labelling_tool_for_specific_record(rec, str(lt))
    assert "clerical_match_score" in lt.read_text()


def test_accuracy_metrics_vs_duckdb(spark, repo_nodes, basic_settings,
                                    labels_df):
    """The extended metrics must match an independent DuckDB computation
    of the reference's own SQL formulas (accuracy.py:274-283) over the
    same confusion counts."""
    import duckdb

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    ts = linker.accuracy_analysis_from_labels_table(
        labels_df, output_type="table",
        add_metrics=list(ACCURACY_METRICS))
    pdf = ts.toPandas()
    base = pdf[["truth_threshold", "tp", "fp", "fn", "tn"]]
    got = duckdb.sql("""
        select truth_threshold,
          cast(TN as double)/(TN+FP) as specificity,
          case when TN+FN=0 then 1 else cast(TN as double)/(TN+FN) end as npv,
          cast(TP+TN as double)/(TP+FN+TN+FP) as accuracy,
          cast(2.0*TP/(2*TP + FN + FP) as double) as f1,
          cast(5.0*TP/(5*TP + 4*FN + FP) as double) as f2,
          cast(1.25*TP/(1.25*TP + 0.25*FN + FP) as double) as f0_5,
          cast(4.0*TP*TN/((4.0*TP*TN) + ((TP + TN)*(FP + FN))) as double)
            as p4,
          case when TN+FN=0 or TP+FP=0 or TP+FN=0 or TN+FP=0 then 0
            else cast((TP*TN)-(FP*FN) as double)
              / sqrt((TP+FP)*(TP+FN)*(TN+FP)*(TN+FN)) end as phi
        from base order by truth_threshold
    """).df()
    ours = pdf.sort_values("truth_threshold").reset_index(drop=True)
    for m in ACCURACY_METRICS:
        for a, b in zip(ours[m], got[m]):
            assert a == pytest.approx(b, abs=1e-12), m


def test_profile_columns_chart(spark):
    """Golden check of the profiler panels on a hand-built frame."""
    from memory_optimized_splink_spark.exploratory import profile_columns

    rows = ([{"name": "aa", "city": "x"}] * 4
            + [{"name": "bb", "city": "x"}] * 2
            + [{"name": "cc", "city": "x"}]
            + [{"name": None, "city": "x"}])
    spec = profile_columns(spark.createDataFrame(rows), columns=["name"],
                           top_n=2, bottom_n=2)
    assert len(spec["vconcat"]) == 1
    dist, top, bottom = spec["vconcat"][0]["hconcat"]
    # percentile rows: one per distinct frequency (1, 2, 4)
    pct = {r["value_count"]: r for r in dist["data"]["values"]}
    assert set(pct) == {1, 2, 4}
    assert pct[1]["n_values"] == 1
    assert pct[1]["total_rows_inc_nulls"] == 8
    assert pct[1]["total_non_null_rows"] == 7
    assert pct[1]["distinct_value_count"] == 3
    # cumulative non-null row share: 1/7, then (1+2)/7, then 7/7
    assert pct[1]["percentile_ex_nulls"] == pytest.approx(1 / 7)
    assert pct[2]["percentile_ex_nulls"] == pytest.approx(3 / 7)
    assert pct[4]["percentile_ex_nulls"] == pytest.approx(1.0)
    assert [r["value"] for r in top["data"]["values"]] == ["aa", "bb"]
    assert [r["value"] for r in bottom["data"]["values"]] == ["cc", "bb"]
    # bottom panel y-domain pinned to the top count (reference parity)
    assert bottom["encoding"]["y"]["scale"]["domain"] == [0, 4]
