"""Chart-data emitters: waterfall rows for a known pair must equal
hand-computed Bayes factors (golden-style, reference waterfall_chart.py)."""

from __future__ import annotations

import math

import pytest

from memory_optimized_splink_spark.charts import (
    comparison_viewer_data,
    m_u_parameters_chart_data,
    match_weights_chart_data,
    waterfall_chart_data,
)
from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
)

PRIOR = 0.2
M_A, U_A = 0.9, 0.01   # exact level of comparison a
M_B, U_B = 0.7, 0.25   # exact level of comparison b


@pytest.fixture(scope="module")
def settings():
    return Settings(
        comparisons=(
            Comparison("a", "a", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=M_A, u=U_A),
                ComparisonLevel("else", m=0.1, u=0.99),
            )),
            Comparison("b", "b", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=M_B, u=U_B),
                ComparisonLevel("else", m=0.3, u=0.75),
            )),
        ),
        blocking_rules=(block_on("a"),),
        probability_two_random_records_match=PRIOR,
    )


def test_match_weights_chart_records(settings):
    recs = match_weights_chart_data(settings)
    prior = recs[0]
    assert prior["label_for_charts"].startswith("Starting match weight")
    assert abs(prior["log2_bayes_factor"] - math.log2(PRIOR / (1 - PRIOR))) < 1e-12
    by = {(r["comparison_name"], r["comparison_vector_value"]): r
          for r in recs[1:]}
    assert abs(by[("a", 1)]["bayes_factor"] - M_A / U_A) < 1e-12
    assert abs(by[("b", 1)]["log2_bayes_factor"] - math.log2(M_B / U_B)) < 1e-12
    # every graded level of both comparisons is present (2 each)
    assert len(by) == 4


def test_m_u_parameter_records(settings):
    recs = m_u_parameters_chart_data(settings)
    assert len(recs) == 8  # 4 levels x m/u
    m_rec = next(r for r in recs if r["comparison_name"] == "a"
                 and r["comparison_vector_value"] == 1
                 and r["probability_type"] == "m_probability")
    assert m_rec["probability"] == M_A


def test_waterfall_hand_computed(settings):
    # pair agrees on a (gamma_a=1), disagrees on b (gamma_b=0)
    row = {
        "unique_id_l": "x", "unique_id_r": "y",
        "gamma_a": 1, "gamma_b": 0,
        "a_l": "v", "a_r": "v", "b_l": "p", "b_r": "q",
        "match_weight": math.log2(
            (PRIOR / (1 - PRIOR)) * (M_A / U_A) * (0.3 / 0.75)),
    }
    charts = waterfall_chart_data([row], settings)
    assert len(charts) == 1
    recs = charts[0]
    assert recs[0]["column_name"] == "Prior"
    assert recs[-1]["column_name"] == "Final score"
    bars = {r["column_name"]: r for r in recs}
    assert abs(bars["a"]["bayes_factor"] - M_A / U_A) < 1e-12
    assert abs(bars["b"]["bayes_factor"] - 0.3 / 0.75) < 1e-12
    assert bars["a"]["value_l"] == "v" and bars["b"]["value_r"] == "q"
    # the waterfall must telescope: sum of log2 bars == final score
    total = sum(r["log2_bayes_factor"] for r in recs[:-1])
    assert abs(total - recs[-1]["log2_bayes_factor"]) < 1e-12
    assert [r["bar_sort_order"] for r in recs] == list(range(len(recs)))


def test_waterfall_null_level(settings):
    row = {
        "gamma_a": -1, "gamma_b": 1,
        "a_l": None, "a_r": "v", "b_l": "p", "b_r": "p",
        "match_weight": math.log2((PRIOR / (1 - PRIOR)) * (M_B / U_B)),
    }
    recs = waterfall_chart_data([row], settings)[0]
    bars = {r["column_name"]: r for r in recs}
    assert bars["a"]["bayes_factor"] == 1.0  # null level is neutral
    total = sum(r["log2_bayes_factor"] for r in recs[:-1])
    assert abs(total - recs[-1]["log2_bayes_factor"]) < 1e-12


def test_vegalite_specs_golden(settings):
    """Vega-Lite spec emitters: valid v5 shape, data = the record layer,
    waterfall transforms reconstruct the hand-checked cumulative bars."""
    import math

    from memory_optimized_splink_spark.charts import (
        m_u_parameters_chart_spec, match_weights_chart_spec,
        waterfall_chart_spec,
    )

    spec = match_weights_chart_spec(settings)
    assert spec["$schema"].endswith("vega-lite/v5.json")
    assert spec["data"]["values"] == match_weights_chart_data(settings)
    assert spec["encoding"]["x"]["field"] == "log2_bayes_factor"
    assert spec["encoding"]["row"]["field"] == "comparison_name"

    mu = m_u_parameters_chart_spec(settings)
    assert mu["data"]["values"] == m_u_parameters_chart_data(settings)
    assert mu["encoding"]["column"]["field"] == "probability_type"

    row = {
        "gamma_a": 1, "gamma_b": 0,
        "a_l": "v", "a_r": "v", "b_l": "p", "b_r": "q",
        "match_weight": math.log2(
            (PRIOR / (1 - PRIOR)) * (M_A / U_A) * (0.3 / 0.75)),
    }
    recs = waterfall_chart_data([row], settings)[0]
    wf = waterfall_chart_spec(recs)
    assert wf["data"]["values"] == recs
    assert wf["encoding"]["y2"]["field"] == "bar_top"
    # replay the spec's transforms in python: bars must telescope to the
    # final score, and the Final bar must anchor at 0
    cum = 0.0
    for r in recs[:-1]:
        bottom, top = cum, cum + r["log2_bayes_factor"]
        cum = top
    assert abs(cum - row["match_weight"]) < 1e-12
    assert any(t.get("calculate", "").startswith(
        "datum.column_name === 'Final score' ? 0") for t in wf["transform"])


def test_comparison_viewer_data(spark, settings):
    rows = [
        ("1", "2", 1, 1), ("1", "3", 1, 0), ("2", "3", 1, 0), ("4", "5", 0, 0),
    ]
    pred = spark.createDataFrame(
        rows, "unique_id_l string, unique_id_r string, gamma_a int, gamma_b int")
    out = comparison_viewer_data(pred, settings, example_rows_per_pattern=1)
    got = {(r["gamma_a"], r["gamma_b"]): r["pattern_count"]
           for r in out.collect()}
    assert got == {(1, 1): 1, (1, 0): 2, (0, 0): 1}


def test_cluster_studio_data(spark):
    from memory_optimized_splink_spark.charts import cluster_studio_data

    member = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2"), ("e", "c2"),
         ("f", "c3")],
        "node_id string, cluster_id string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")],
        "unique_id_l string, unique_id_r string")
    mem, e = cluster_studio_data(member, edges, sample_clusters=1)
    assert {r["node_id"] for r in mem.collect()} == {"a", "b", "c"}
    assert {(r["unique_id_l"], r["unique_id_r"]) for r in e.collect()} \
        == {("a", "b"), ("b", "c")}


def test_cluster_studio_dashboard_html(spark, tmp_path):
    """Single-file HTML: embedded JSON payload round-trips, vanilla-JS core
    + vega-embed CDN reference present, sample clusters in the payload."""
    import json
    import re

    from memory_optimized_splink_spark.dashboards import (
        cluster_studio_dashboard,
    )

    member = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2"), ("e", "c2"),
         ("f", "c3")],
        "node_id string, cluster_id string")
    edges = spark.createDataFrame(
        [("a", "b", 0.97), ("b", "c", 0.91), ("d", "e", 0.88)],
        "unique_id_l string, unique_id_r string, match_probability double")
    out = tmp_path / "studio.html"
    html = cluster_studio_dashboard(member, edges, sample_clusters=2,
                                    out_path=str(out))
    assert out.read_text() == html
    assert html.startswith("<!DOCTYPE html>")
    assert "vega-embed" in html
    m = re.search(
        r'<script id="splink-data" type="application/json">(.*?)</script>',
        html, re.S)
    assert m, "embedded JSON payload missing"
    payload = json.loads(m.group(1))
    clusters = {r["cluster_id"] for r in payload["membership"]}
    assert clusters == {"c1", "c2"}  # two largest non-singleton clusters
    assert {(e["unique_id_l"], e["unique_id_r"])
            for e in payload["edges"]} == {("a", "b"), ("b", "c"),
                                           ("d", "e")}
    # the vanilla-JS graph renderer is inline (works offline)
    assert "createElementNS" in html and "cluster-select" in html
    # syntax-check the inline script when node is available
    import shutil
    import subprocess

    if shutil.which("node"):
        js = re.search(r"<script>\n(.*?)</script>\n</body>", html,
                       re.S).group(1)
        p = tmp_path / "inline.js"
        p.write_text(js)
        res = subprocess.run(["node", "--check", str(p)],
                             capture_output=True, text=True)
        assert res.returncode == 0, res.stderr


def test_comparison_viewer_and_match_weights_dashboards(
        spark, tmp_path, settings):
    import json
    import re

    from memory_optimized_splink_spark.dashboards import (
        comparison_viewer_dashboard, match_weights_dashboard,
    )

    s = settings
    pred = spark.createDataFrame(
        [("1", "2", 1, 1, 5.0, 0.97), ("1", "3", 1, 0, 1.0, 0.67),
         ("2", "3", 1, 0, 1.1, 0.68), ("4", "5", 0, 0, -3.0, 0.11)],
        "unique_id_l string, unique_id_r string, gamma_a int, gamma_b int, "
        "match_weight double, match_probability double")
    html = comparison_viewer_dashboard(pred, s, example_rows_per_pattern=1)
    m = re.search(
        r'<script id="splink-data" type="application/json">(.*?)</script>',
        html, re.S)
    payload = json.loads(m.group(1))
    assert payload["gamma_columns"] == ["gamma_a", "gamma_b"]
    counts = {(r["gamma_a"], r["gamma_b"]): r["pattern_count"]
              for r in payload["rows"]}
    assert counts == {("1", "1"): "1", ("1", "0"): "2", ("0", "0"): "1"}

    out = tmp_path / "mw.html"
    mw = match_weights_dashboard(s, out_path=str(out))
    payload = json.loads(re.search(
        r'<script id="splink-data" type="application/json">(.*?)</script>',
        mw, re.S).group(1))
    assert payload["spec"]["$schema"].startswith(
        "https://vega.github.io/schema")
    assert out.read_text() == mw


def test_labelling_tool_dashboard(spark, tmp_path, settings):
    """Labelling tool HTML (reference labelling_tool.py:62-114): candidate
    pairs become side-by-side cards with Match/Not match/Unsure buttons;
    embedded payload carries the comparison columns and, optionally, the
    model's predictions (blind mode strips the flag)."""
    import json
    import re

    from memory_optimized_splink_spark.dashboards import (
        labelling_tool_dashboard,
    )

    matches = spark.createDataFrame(
        [("t", "2", "x", "x", "p", "q", 5.0, 0.97),
         ("t", "3", "x", "y", "p", "p", -1.0, 0.33)],
        "unique_id_l string, unique_id_r string, a_l string, a_r string, "
        "b_l string, b_r string, match_weight double, "
        "match_probability double")
    out = tmp_path / "label.html"
    html = labelling_tool_dashboard(matches, settings, out_path=str(out))
    assert out.read_text() == html
    m = re.search(
        r'<script id="splink-data" type="application/json">(.*?)</script>',
        html, re.S)
    payload = json.loads(m.group(1))
    assert payload["columns"] == ["a", "b"]
    assert payload["show_predictions"] is True
    # ordered by descending match_weight
    assert [r["unique_id_r"] for r in payload["rows"]] == ["2", "3"]
    assert payload["rows"][0]["a_l"] == "x"
    assert "clerical_match_score" in html and "Not match" in html
    # record values are untrusted: cells must be built via
    # createElement/textContent, never innerHTML, and label keys must be
    # JSON arrays (a "|" join corrupts ids containing "|")
    assert "innerHTML" not in html
    assert "JSON.stringify([r.unique_id_l, r.unique_id_r])" in html

    blind = labelling_tool_dashboard(matches, settings,
                                     show_predictions=False)
    payload2 = json.loads(re.search(
        r'<script id="splink-data" type="application/json">(.*?)</script>',
        blind, re.S).group(1))
    assert payload2["show_predictions"] is False

    import shutil
    import subprocess

    if shutil.which("node"):
        js = re.search(r"<script>\n(.*?)</script>\n</body>", html,
                       re.S).group(1)
        p = tmp_path / "label_inline.js"
        p.write_text(js)
        res = subprocess.run(["node", "--check", str(p)],
                             capture_output=True, text=True)
        assert res.returncode == 0, res.stderr


def test_generate_labelling_tool_comparisons(spark):
    """End-to-end: a target record scored against a small linker's nodes,
    thresholded on match WEIGHT (reference default -4)."""
    from memory_optimized_splink_spark.dashboards import (
        generate_labelling_tool_comparisons,
    )
    from memory_optimized_splink_spark.linker import SparkLinker
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    s = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.01),
                ComparisonLevel("else", m=0.1, u=0.99),
            )),
        ),
        blocking_rules=(block_on("city"),),
        probability_two_random_records_match=0.01,
    )
    nodes = spark.createDataFrame(
        [("1", "ann", "ely"), ("2", "bob", "ely"), ("3", "ann", "rye")],
        "unique_id string, name string, city string")
    lk = SparkLinker(spark, nodes, s)
    got = generate_labelling_tool_comparisons(
        lk, {"name": "ann", "city": "ely"}, match_weight_threshold=-999)
    rows = {r["unique_id_r"] for r in got.collect()} | \
        {r["unique_id_l"] for r in got.collect()}
    # blocking on city=ely pairs the target with records 1 and 2 only
    assert "__labelling_target__" in rows
    assert "3" not in rows
    got2 = generate_labelling_tool_comparisons(
        lk, {"name": "ann", "city": "ely"}, match_weight_threshold=0.0)
    assert all(r["match_weight"] >= 0 for r in got2.collect())


def test_match_weights_histogram_golden(spark):
    """Bin width from the reference ladder (nearest (max-min)/target_bins,
    first minimum on ties), bins = w*floor(mw/w), counts per bin."""
    from memory_optimized_splink_spark.charts import (
        _histogram_bin_width,
        match_weights_histogram_data,
        match_weights_histogram_spec,
    )

    # range 10 over 30 bins -> rough 0.333 -> nearest ladder width 0.25
    assert _histogram_bin_width(-5.0, 5.0, 30) == 0.25
    assert _histogram_bin_width(0.0, 300.0, 30) == 5
    assert _histogram_bin_width(0.0, 0.3, 30) == 0.01
    # tie: rough 0.15 is equidistant from 0.1 and 0.2 -> first (0.1) wins
    assert _histogram_bin_width(0.0, 4.5, 30) == 0.1

    pred = spark.createDataFrame(
        [(float(v),) for v in [-5, -4.9, -4.9, 0.1, 4.74, 4.9]],
        "match_weight double")
    rows = {r["splink_score_bin_low"]: r for r in
            match_weights_histogram_data(pred, target_bins=30).collect()}
    assert all(r["binwidth"] == 0.25 for r in rows.values())
    assert rows[-5.0]["count_rows"] == 3            # -5, -4.9, -4.9
    assert rows[0.0]["count_rows"] == 1             # 0.1
    assert rows[4.5]["count_rows"] == 1             # 4.74
    assert rows[4.75]["count_rows"] == 1            # 4.9
    assert rows[4.5]["splink_score_bin_high"] == 4.75

    spec = match_weights_histogram_spec(pred)
    assert spec["mark"] == "bar"
    assert spec["encoding"]["x"]["bin"] == "binned"
    assert len(spec["data"]["values"]) == len(rows)

    # empty predictions -> empty histogram, schema intact
    empty = pred.where("match_weight > 99")
    assert match_weights_histogram_data(empty).count() == 0


def test_parameter_estimate_comparisons(settings):
    from dataclasses import replace

    from memory_optimized_splink_spark.charts import (
        parameter_estimate_comparisons_chart_spec,
        parameter_estimate_comparisons_data,
    )

    s2 = replace(settings, comparisons=tuple(
        replace(c, levels=tuple(
            replace(lv, m=(lv.m or 0) * 0.5 if lv.m else lv.m)
            for lv in c.levels))
        for c in settings.comparisons))
    ests = [("EM blocked on a", settings), ("labels", s2)]
    recs = parameter_estimate_comparisons_data(ests)
    # m only by default: one record per (session, graded level with m)
    assert all(r["m_or_u"] == "m" for r in recs)
    assert {r["estimate_description"] for r in recs} == \
        {"EM blocked on a", "labels"}
    a_exact = [r for r in recs if r["comparison_name"] == "a"
               and r["comparison_vector_value"] == 1]
    assert {round(r["estimated_probability"], 6) for r in a_exact} == \
        {M_A, M_A * 0.5}
    for r in a_exact:
        p = r["estimated_probability"]
        assert r["estimated_probability_as_log_odds"] == \
            pytest.approx(math.log2(p / (1 - p)))
    both = parameter_estimate_comparisons_data(ests, include_u=True)
    assert {r["m_or_u"] for r in both} == {"m", "u"}
    spec = parameter_estimate_comparisons_chart_spec(ests)
    assert spec["data"]["values"] == recs
    assert spec["encoding"]["color"]["field"] == "estimate_description"


def test_tf_adjustment_chart_matches_predict(spark):
    """2**log2_bf_tf from the chart data must equal the bf_tf_adj column
    predict(keep_bf_columns=True) computes for a pair matching on that
    value — same model shape as the oracle-green predict_tf query
    (exact level with tf_adjustment on a low-cardinality column)."""
    from memory_optimized_splink_spark.charts import (
        tf_adjustment_chart_data,
        tf_adjustment_chart_spec,
    )
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )
    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.nodes import (
        compute_tf_table, join_tf_columns,
    )
    from memory_optimized_splink_spark.operators.score import (
        predict as predict_op,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors,
    )
    from pyspark.sql import functions as F

    s = Settings(
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
    rows = [(str(i), "g", ["ely", "ely", "ely", "rye", "rye", "ack"][i % 6])
            for i in range(12)]
    nodes = spark.createDataFrame(
        rows, "unique_id string, grp string, city string")
    tf = compute_tf_table(nodes, "city")
    n = float(nodes.count())

    recs = tf_adjustment_chart_data(tf, s.comparisons[0], n)
    assert {r["value"] for r in recs} == {"ely", "rye", "ack"}
    by_val = {r["value"]: r for r in recs}
    # fork_count exact multiplier = N / tf_count (ely 6x, rye 4x, ack 2x)
    assert 2 ** by_val["ely"]["log2_bf_tf"] == pytest.approx(12 / 6)
    assert 2 ** by_val["rye"]["log2_bf_tf"] == pytest.approx(12 / 4)
    assert 2 ** by_val["ack"]["log2_bf_tf"] == pytest.approx(12 / 2)
    assert by_val["ely"]["most_freq_rank"] == 0
    assert by_val["ely"]["log2_bf"] == pytest.approx(math.log2(0.6 / 0.1))
    assert by_val["ely"]["log2_bf_final"] == pytest.approx(
        math.log2(0.6 / 0.1) + math.log2(2.0))

    # parity with the actual predict pipeline, bit-for-bit
    nodes_tf, _ = join_tf_columns(nodes, s)
    pairs = block_using_rules(nodes_tf, s)
    cv = compute_comparison_vectors(pairs, nodes_tf, s)
    pred = predict_op(cv, s, n_records=n, keep_bf_columns=True)
    matched = pred.where("gamma_city = 1").join(
        nodes.select(F.col("unique_id").alias("unique_id_l"),
                     F.col("city").alias("value")), on="unique_id_l")
    for row in matched.select("value", "bf_tf_adj_city").distinct().collect():
        assert 2 ** by_val[row["value"]]["log2_bf_tf"] == \
            row["bf_tf_adj_city"], row

    spec = tf_adjustment_chart_spec(tf, s.comparisons[0], n)
    assert spec["layer"][1]["mark"]["type"] == "rule"
    assert len(spec["data"]["values"]) == 3

    # raises on a comparison without TF adjustment
    plain = Comparison("x", "x", (ComparisonLevel("exact", m=0.5, u=0.1),
                                  ComparisonLevel("else", m=0.5, u=0.9)))
    with pytest.raises(ValueError):
        tf_adjustment_chart_data(tf, plain, n)


def test_roc_and_precision_recall_specs():
    from memory_optimized_splink_spark.charts import (
        precision_recall_chart_spec,
        roc_chart_spec,
    )

    ts = [
        {"truth_threshold": -2.0, "tp": 10, "fp": 5, "fn": 0, "tn": 0,
         "precision": 10 / 15, "recall": 1.0},
        {"truth_threshold": 0.0, "tp": 8, "fp": 2, "fn": 2, "tn": 3,
         "precision": 0.8, "recall": 0.8},
        {"truth_threshold": 3.0, "tp": 4, "fp": 0, "fn": 6, "tn": 5,
         "precision": 1.0, "recall": 0.4},
    ]
    spec = roc_chart_spec(ts)
    vals = {v["truth_threshold"]: v for v in spec["data"]["values"]}
    assert vals[0.0]["tp_rate"] == pytest.approx(0.8)
    assert vals[0.0]["fp_rate"] == pytest.approx(2 / 5)
    assert vals[3.0]["fp_rate"] == 0.0
    assert vals[-2.0]["fp_rate"] == 1.0        # fp=5, tn=0
    assert spec["mark"]["type"] == "line"

    pr = precision_recall_chart_spec(ts)
    assert pr["encoding"]["x"]["field"] == "recall"
    assert pr["encoding"]["y"]["field"] == "precision"
    assert len(pr["data"]["values"]) == 3


def test_linker_chart_tail_methods(spark):
    """Linker-level glue for the round-5 chart tail: histogram spec over
    its own predict(), session-recorded parameter estimates, TF chart for
    a TF-adjusted column (refusal for others), ROC/PR from labels."""
    from memory_optimized_splink_spark.linker import SparkLinker
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    s = Settings(
        comparisons=(
            Comparison("city", "city", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.6, u=0.1, tf_adjustment=True),
                ComparisonLevel("else", m=0.4, u=0.9),
            )),
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.8, u=0.05),
                ComparisonLevel("else", m=0.2, u=0.95),
            )),
        ),
        blocking_rules=(block_on("grp"),),
        probability_two_random_records_match=0.1,
        tf_columns=("city",),
    )
    rows = [(str(i), "g", ["ely", "ely", "rye"][i % 3],
             ["ann", "bob"][i % 2]) for i in range(8)]
    nodes = spark.createDataFrame(
        rows, "unique_id string, grp string, city string, name string")
    lk = SparkLinker(spark, nodes, s, enable_checkpoints=False)

    hist = lk.match_weights_histogram()
    assert hist["data"]["values"] and \
        hist["encoding"]["x"]["field"] == "splink_score_bin_low"

    tfc = lk.tf_adjustment_chart("city")
    assert {v["value"] for v in tfc["data"]["values"]} == {"ely", "rye"}
    with pytest.raises(ValueError):
        lk.tf_adjustment_chart("name")

    lk.estimate_u(max_pairs=1e4)
    pe = lk.parameter_estimate_comparisons_chart(include_u=True)
    descs = {v["estimate_description"] for v in pe["data"]["values"]}
    assert descs == {"u from random sampling"}

    labels = spark.createDataFrame(
        [("1", "3", 1.0), ("1", "2", 0.0)],
        "unique_id_l string, unique_id_r string, clerical_match_score double")
    roc = lk.roc_chart(labels)
    assert all("tp_rate" in v and "fp_rate" in v
               for v in roc["data"]["values"])
    pr = lk.precision_recall_chart(labels)
    assert pr["encoding"]["y"]["field"] == "precision"
