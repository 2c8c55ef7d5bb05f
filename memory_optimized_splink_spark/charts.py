"""Chart-DATA emitters: the record dicts the reference's visualization layer
consumes (match-weights bars, per-pair waterfall decomposition, comparison
viewer patterns). Rendering (Altair/Vega/HTML) is out of scope for the
engine — these functions return exactly the rows a chart front-end needs.

Reference shapes:
- match-weights / m-u parameter bars: per-level records with
  m/u/bayes_factor/log2_bayes_factor (charts.py:81; the records come from
  the settings object's detailed parameter records).
- waterfall: prior record -> one record per comparison (level picked by the
  pair's gamma) [-> TF record when the comparison is TF-adjusted] -> final
  score record (waterfall_chart.py:11-155).
- comparison viewer: distinct gamma patterns with counts + example pairs
  (splink_comparison_viewer.py).
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame, Window, functions as F

from .model import Comparison, Settings, prob_to_bayes_factor


def _level_bf(m: float | None, u: float | None) -> float:
    if m is None or u is None:
        return 1.0
    return (m / u) if u > 0 else math.inf


def match_weights_chart_data(settings: Settings) -> list[dict[str, Any]]:
    """One record per comparison level (plus the prior): the bars of the
    reference's match_weights_chart (charts.py:81)."""
    settings = settings.with_defaults()
    prior_bf = prob_to_bayes_factor(settings.probability_two_random_records_match)
    records: list[dict[str, Any]] = [{
        "comparison_name": "probability_two_random_records_match",
        "label_for_charts": "Starting match weight (prior)",
        "comparison_vector_value": None,
        "m_probability": None,
        "u_probability": None,
        "bayes_factor": prior_bf,
        "log2_bayes_factor": math.log2(prior_bf),
    }]
    for comp in settings.comparisons:
        for gamma, lv in sorted(comp.graded_levels, key=lambda t: -t[0]):
            bf = _level_bf(lv.m, lv.u)
            records.append({
                "comparison_name": comp.name,
                "label_for_charts": lv.describe(),
                "comparison_vector_value": gamma,
                "m_probability": lv.m,
                "u_probability": lv.u,
                "bayes_factor": bf,
                "log2_bayes_factor": math.log2(bf) if bf > 0 else -math.inf,
            })
    return records


def m_u_parameters_chart_data(settings: Settings) -> list[dict[str, Any]]:
    """m/u probability bars: two records (one per probability) per level."""
    out = []
    for rec in match_weights_chart_data(settings):
        if rec["comparison_vector_value"] is None:
            continue
        for kind in ("m", "u"):
            out.append({
                "comparison_name": rec["comparison_name"],
                "label_for_charts": rec["label_for_charts"],
                "comparison_vector_value": rec["comparison_vector_value"],
                "probability_type": f"{kind}_probability",
                "probability": rec[f"{kind}_probability"],
            })
    return out


def _comparison_waterfall_records(row: dict[str, Any], comp: Comparison
                                  ) -> list[dict[str, Any]]:
    gamma = row[comp.gamma_column]
    lv = next((l for g, l in comp.graded_levels if g == gamma), None)
    if lv is None and gamma == -1:
        lv = comp.null_level
    m = lv.m if lv is not None else None
    u = lv.u if lv is not None else None
    bf = 1.0 if gamma == -1 else _level_bf(m, u)
    col = comp.column
    recs = [{
        "column_name": comp.name,
        "label_for_charts": lv.describe() if lv is not None else "null",
        "comparison_vector_value": gamma,
        "m_probability": m if gamma != -1 else None,
        "u_probability": u if gamma != -1 else None,
        "bayes_factor": bf,
        "log2_bayes_factor": math.log2(bf) if bf > 0 else -math.inf,
        "value_l": str(row.get(f"{col}_l", "")),
        "value_r": str(row.get(f"{col}_r", "")),
        "term_frequency_adjustment": False,
    }]
    tf_col = f"bf_tf_adj_{comp.name}"
    if any(l.tf_adjustment for _, l in comp.graded_levels):
        tf_bf = float(row.get(tf_col, 1.0) or 1.0)
        recs.append({
            "column_name": f"tf_{comp.name}",
            "label_for_charts": f"Term freq adjustment on {col}",
            "comparison_vector_value": gamma,
            "m_probability": None,
            "u_probability": None,
            "bayes_factor": tf_bf,
            "log2_bayes_factor": math.log2(tf_bf) if tf_bf > 0 else -math.inf,
            "value_l": str(row.get(f"{col}_l", "")),
            "value_r": str(row.get(f"{col}_r", "")),
            "term_frequency_adjustment": True,
        })
    return recs


def waterfall_chart_data(rows: list[dict[str, Any]], settings: Settings
                         ) -> list[list[dict[str, Any]]]:
    """Per scored pair: prior -> per-comparison bars -> final score
    (waterfall_chart.py:141-155). `rows` are collected predict() rows as
    dicts (predict with keep_bf_columns=True to include TF bars)."""
    settings = settings.with_defaults()
    prior_bf = prob_to_bayes_factor(settings.probability_two_random_records_match)
    out = []
    for row in rows:
        recs = [{
            "column_name": "Prior",
            "label_for_charts": "Starting match weight (prior)",
            "comparison_vector_value": None,
            "m_probability": None,
            "u_probability": None,
            "bayes_factor": prior_bf,
            "log2_bayes_factor": math.log2(prior_bf),
            "value_l": "",
            "value_r": "",
            "term_frequency_adjustment": None,
        }]
        for comp in settings.comparisons:
            recs.extend(_comparison_waterfall_records(row, comp))
        recs.append({
            "column_name": "Final score",
            "label_for_charts": "Final score",
            "comparison_vector_value": None,
            "m_probability": None,
            "u_probability": None,
            "bayes_factor": 2.0 ** row["match_weight"],
            "log2_bayes_factor": row["match_weight"],
            "value_l": "",
            "value_r": "",
            "term_frequency_adjustment": None,
        })
        for i, r in enumerate(recs):
            r["bar_sort_order"] = i
        out.append(recs)
    return out


# ------------------------------------------------------- Vega-Lite specs
# The reference renders these with Altair (charts.py:73-110); the engine
# emits plain Vega-Lite v5 dicts over the record layer above — no chart
# dependency, directly renderable by any Vega front-end / notebook.

_VL_SCHEMA = "https://vega.github.io/schema/vega-lite/v5.json"


def _vegalite(title: str, values: list[dict], mark, encoding: dict,
              **extra) -> dict:
    return {"$schema": _VL_SCHEMA, "title": title,
            "data": {"values": values}, "mark": mark,
            "encoding": encoding, **extra}


def match_weights_chart_spec(settings: Settings) -> dict:
    """Rendered-spec equivalent of the reference's match_weights_chart: one
    bar per comparison level (log2 Bayes factor), row-faceted by
    comparison."""
    return _vegalite(
        "Model parameters (match weights)",
        match_weights_chart_data(settings),
        {"type": "bar"},
        {
            "x": {"field": "log2_bayes_factor", "type": "quantitative",
                  "title": "Match weight (log2 Bayes factor)"},
            "y": {"field": "label_for_charts", "type": "nominal",
                  "sort": None, "title": None},
            "row": {"field": "comparison_name", "type": "nominal",
                    "sort": None},
            "color": {"field": "log2_bayes_factor", "type": "quantitative",
                      "scale": {"scheme": "redyellowgreen", "domainMid": 0},
                      "legend": None},
            "tooltip": [
                {"field": "comparison_name"}, {"field": "label_for_charts"},
                {"field": "m_probability"}, {"field": "u_probability"},
                {"field": "bayes_factor"}, {"field": "log2_bayes_factor"},
            ],
        },
        resolve={"scale": {"y": "independent"}},
    )


def m_u_parameters_chart_spec(settings: Settings) -> dict:
    """m/u probability bars, column-faceted by probability type."""
    return _vegalite(
        "m and u probabilities",
        m_u_parameters_chart_data(settings),
        {"type": "bar"},
        {
            "x": {"field": "probability", "type": "quantitative"},
            "y": {"field": "label_for_charts", "type": "nominal",
                  "sort": None, "title": None},
            "row": {"field": "comparison_name", "type": "nominal",
                    "sort": None},
            "column": {"field": "probability_type", "type": "nominal"},
            "tooltip": [{"field": "comparison_name"},
                        {"field": "label_for_charts"},
                        {"field": "probability"}],
        },
        resolve={"scale": {"y": "independent"}},
    )


def waterfall_chart_spec(pair_records: list[dict]) -> dict:
    """Waterfall decomposition of ONE scored pair (the reference's
    waterfall_chart): floating bars from cumulative match weight, built with
    Vega-Lite window/calculate transforms over the record layer
    (waterfall_chart_data()[i])."""
    spec = _vegalite(
        "Match weight waterfall",
        pair_records,
        {"type": "bar"},
        {
            "x": {"field": "column_name", "type": "nominal", "sort": None,
                  "title": None},
            "y": {"field": "bar_bottom", "type": "quantitative",
                  "title": "Cumulative match weight"},
            "y2": {"field": "bar_top"},
            "color": {"field": "log2_bayes_factor", "type": "quantitative",
                      "scale": {"scheme": "redyellowgreen", "domainMid": 0},
                      "legend": None},
            "tooltip": [
                {"field": "column_name"}, {"field": "label_for_charts"},
                {"field": "value_l"}, {"field": "value_r"},
                {"field": "bayes_factor"}, {"field": "log2_bayes_factor"},
            ],
        },
    )
    # the Final score record is the total, not an increment: anchor it at 0
    spec["transform"] = [
        {"window": [{"op": "sum", "field": "log2_bayes_factor",
                     "as": "bar_top"}],
         "sort": [{"field": "bar_sort_order"}],
         "frame": [None, 0]},
        {"calculate": "datum.column_name === 'Final score' ? 0 : "
                      "datum.bar_top - datum.log2_bayes_factor",
         "as": "bar_bottom"},
        {"calculate": "datum.column_name === 'Final score' ? "
                      "datum.log2_bayes_factor : datum.bar_top",
         "as": "bar_top"},
    ]
    return spec


_HIST_BIN_WIDTHS = (0.01, 0.1, 0.2, 0.25, 0.5, 1.0, 2.0, 5.0)


def _histogram_bin_width(min_w: float, max_w: float, target_bins: int
                         ) -> float:
    """Reference _bins ladder (match_weights_histogram.py:11-32): the fixed
    width nearest (max-min)/target_bins; first minimum wins (= smallest
    width among ties, the ladder being ascending)."""
    rough = (max_w - min_w) / target_bins
    best, best_diff = _HIST_BIN_WIDTHS[0], abs(_HIST_BIN_WIDTHS[0] - rough)
    for w in _HIST_BIN_WIDTHS[1:]:
        d = abs(w - rough)
        if d < best_diff:
            best, best_diff = w, d
    return best


def match_weights_histogram_data(pred: DataFrame, target_bins: int = 30
                                 ) -> DataFrame:
    """Histogram of predict() match weights (reference
    visualisations.py:112 / match_weights_histogram.py:66-96): bin width
    chosen from the fixed ladder, then ONE distributed groupBy on
    floor(match_weight / width). Driver-side work is a 2-scalar min/max
    aggregate; the histogram itself never leaves the cluster until its
    ≤O(range/width) bin rows are read."""
    spark = pred.sparkSession
    schema = ("splink_score_bin_low double, binwidth double, "
              "count_rows bigint, splink_score_bin_high double")
    row = pred.agg(F.min("match_weight").alias("mn"),
                   F.max("match_weight").alias("mx")).collect()[0]
    if row["mn"] is None:
        return spark.createDataFrame([], schema)
    w = _histogram_bin_width(float(row["mn"]), float(row["mx"]), target_bins)
    low = F.lit(w) * F.floor(F.col("match_weight") / F.lit(w)).cast("double")
    return (pred.groupBy(low.alias("splink_score_bin_low"))
            .agg(F.count(F.lit(1)).alias("count_rows"))
            .select("splink_score_bin_low",
                    F.lit(w).alias("binwidth"),
                    "count_rows",
                    (F.col("splink_score_bin_low") + F.lit(w))
                    .alias("splink_score_bin_high"))
            .orderBy("splink_score_bin_low"))


def match_weights_histogram_spec(pred: DataFrame, target_bins: int = 30,
                                 width: int = 600, height: int = 250) -> dict:
    """Vega-Lite spec over match_weights_histogram_data (reference chart def
    files/chart_defs/match_weight_histogram.json shape: binned bars with
    explicit bin_low/bin_high)."""
    records = [r.asDict() for r in
               match_weights_histogram_data(pred, target_bins).collect()]
    spec = _vegalite(
        "Histogram of match weights",
        records,
        "bar",
        {
            "x": {"field": "splink_score_bin_low", "type": "quantitative",
                  "bin": "binned", "axis": {"title": "Match weight"}},
            "x2": {"field": "splink_score_bin_high"},
            "y": {"field": "count_rows", "type": "quantitative",
                  "axis": {"title": "Count of record comparisons in bin"}},
            "tooltip": [{"field": "count_rows", "title": "Count in bin",
                         "type": "quantitative"}],
        },
    )
    spec["width"], spec["height"] = width, height
    return spec


def parameter_estimate_comparisons_data(
    estimates: list[tuple[str, Settings]],
    include_m: bool = True,
    include_u: bool = False,
) -> list[dict[str, Any]]:
    """Records comparing m/u estimates across training sessions (reference
    visualisations.py:146 / comparison_level.py:839-862): one record per
    (session, comparison level, m-or-u). `estimates` pairs a description of
    each estimation session ("EM blocked on first_name", "u from random
    sampling", ...) with the Settings it produced — the same list
    train.combine_sessions_median consumes."""
    to_retain = ([] if not include_m else ["m"]) + \
        ([] if not include_u else ["u"])
    records: list[dict[str, Any]] = []
    for description, s in estimates:
        for comp in s.comparisons:
            for gamma, lv in sorted(comp.graded_levels, key=lambda t: -t[0]):
                for m_or_u, p in (("m", lv.m), ("u", lv.u)):
                    if m_or_u not in to_retain or p is None:
                        continue
                    records.append({
                        "comparison_name": comp.name,
                        "comparison_level_label": lv.describe(),
                        "comparison_vector_value": gamma,
                        "m_or_u": m_or_u,
                        "estimated_probability": p,
                        "estimated_probability_as_log_odds":
                            math.log2(p / (1 - p)) if 0.0 < p < 1.0 else None,
                        "estimate_description": description,
                    })
    return records


def parameter_estimate_comparisons_chart_spec(
    estimates: list[tuple[str, Settings]],
    include_m: bool = True,
    include_u: bool = False,
) -> dict:
    """Point chart of parameter estimates across sessions (reference chart
    def parameter_estimate_comparisons.json shape: points colored/shaped by
    session, row-faceted by comparison, x = log odds)."""
    return _vegalite(
        "Comparison of parameter estimates across training sessions",
        parameter_estimate_comparisons_data(estimates, include_m, include_u),
        {"type": "point", "filled": False, "opacity": 0.7, "size": 100},
        {
            "x": {"field": "estimated_probability_as_log_odds",
                  "type": "quantitative", "title": "Estimate (log odds)"},
            "y": {"field": "comparison_level_label", "type": "nominal",
                  "sort": None, "title": None},
            "row": {"field": "comparison_name", "type": "nominal",
                    "sort": None},
            "column": {"field": "m_or_u", "type": "nominal", "title": None},
            "color": {"field": "estimate_description", "type": "nominal"},
            "shape": {"field": "estimate_description", "type": "nominal",
                      "scale": {"range": ["circle", "square", "triangle",
                                          "diamond"]}},
            "tooltip": [{"field": "comparison_name"},
                        {"field": "estimate_description"},
                        {"field": "estimated_probability",
                         "type": "quantitative"}],
        },
        resolve={"scale": {"y": "independent"}},
    )


def tf_adjustment_chart_data(
    tf_table: DataFrame,
    comp: Comparison,
    n_records: float | dict,
    tf_style: str = "fork_count",
    n_most_freq: int = 10,
    n_least_freq: int = 10,
    vals_to_include: list[str] | None = None,
) -> list[dict[str, Any]]:
    """Per-value TF-adjustment records for one comparison (reference
    term_frequencies.py:291-360): for every TF-adjusted level, the log2
    Bayes-factor adjustment each distinct value would contribute, ranked by
    frequency, keeping the n most/least frequent plus any requested values.

    Parity by construction: the multiplier column is the EXACT
    score.tf_adjustment_column expression predict() applies — the tf table's
    count is aliased to both pair sides and the level's gamma substituted —
    so 2**log2_bf_tf equals predict(keep_bf_columns=True)'s bf_tf_adj for a
    pair matching on that value (test-asserted against the oracle-green
    predict_tf model)."""
    from .operators.score import bf_lookup, tf_adjustment_column

    tf_levels = [(g, lv) for g, lv in comp.graded_levels
                 if lv.tf_adjustment and lv.kind != "else"]
    if not tf_levels:
        raise ValueError(
            f"comparison {comp.name} has no term-frequency-adjusted level")
    bfs = bf_lookup(comp)
    parts = []
    for gamma, lv in tf_levels:
        c = lv.column or comp.column
        synth = (tf_table
                 .select(F.col(c).alias("value"),
                         F.col(f"tf_{c}").alias("tf_count"))
                 .where(F.col("value").isNotNull())
                 .select("value", "tf_count",
                         F.col("tf_count").alias(f"tf_{c}_l"),
                         F.col("tf_count").alias(f"tf_{c}_r"),
                         F.lit(gamma).alias(comp.gamma_column)))
        mult = tf_adjustment_column(comp, n_records, tf_style=tf_style)
        lb = math.log2(bfs[gamma]) if bfs[gamma] > 0 else -math.inf
        parts.append(synth.select(
            "value", "tf_count",
            F.lit(gamma).alias("gamma"),
            F.lit(lv.describe()).alias("label_for_charts"),
            F.lit(lb).alias("log2_bf"),
            F.log2(mult).alias("log2_bf_tf"),
        ))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df = df.withColumn("log2_bf_final",
                       F.col("log2_bf") + F.col("log2_bf_tf"))
    w_most = Window.partitionBy("gamma").orderBy(
        F.desc("tf_count"), "value")
    w_least = Window.partitionBy("gamma").orderBy(
        F.asc("tf_count"), "value")
    df = df.select("*",
                   (F.row_number().over(w_most) - 1).alias("most_freq_rank"),
                   (F.row_number().over(w_least) - 1).alias("least_freq_rank"))
    keep = F.lit(False)
    if n_most_freq:
        keep = keep | (F.col("most_freq_rank") < n_most_freq)
    if n_least_freq:
        keep = keep | (F.col("least_freq_rank") < n_least_freq)
    if vals_to_include:
        keep = keep | F.col("value").isin(list(vals_to_include))
    if not n_most_freq and not n_least_freq and not vals_to_include:
        keep = F.lit(True)
    return [r.asDict() for r in
            df.where(keep).orderBy("gamma", "most_freq_rank").collect()]


def tf_adjustment_chart_spec(
    tf_table: DataFrame,
    comp: Comparison,
    n_records: float | dict,
    tf_style: str = "fork_count",
    n_most_freq: int = 10,
    n_least_freq: int = 10,
    vals_to_include: list[str] | None = None,
) -> dict:
    """Bar chart of per-value TF-adjusted match weights with a rule at the
    level's base weight (reference tf_adjustment_chart rendering)."""
    records = tf_adjustment_chart_data(
        tf_table, comp, n_records, tf_style,
        n_most_freq, n_least_freq, vals_to_include)
    spec = _vegalite(
        f"Term frequency adjustments on {comp.name}",
        records,
        {"type": "bar"},
        {
            "x": {"field": "value", "type": "nominal",
                  "sort": {"field": "most_freq_rank"}},
            "y": {"field": "log2_bf_final", "type": "quantitative",
                  "title": "Match weight (log2 Bayes factor)"},
            "color": {"field": "log2_bf_tf", "type": "quantitative",
                      "scale": {"scheme": "redyellowgreen", "domainMid": 0},
                      "legend": None},
            "row": {"field": "label_for_charts", "type": "nominal",
                    "title": None},
            "tooltip": [
                {"field": "value"}, {"field": "tf_count"},
                {"field": "log2_bf"}, {"field": "log2_bf_tf"},
                {"field": "log2_bf_final"},
            ],
        },
        resolve={"scale": {"x": "independent"}},
    )
    # dashed rule at the level's un-adjusted weight, layered per facet
    spec["layer"] = [
        {"mark": spec.pop("mark"), "encoding": spec.pop("encoding")},
        {"mark": {"type": "rule", "strokeDash": [4, 4]},
         "encoding": {"y": {"field": "log2_bf", "type": "quantitative",
                            "aggregate": "mean"}}},
    ]
    return spec


def _truth_space_records(truth_space: DataFrame | list[dict]
                         ) -> list[dict[str, Any]]:
    if isinstance(truth_space, DataFrame):
        rows = [r.asDict() for r in
                truth_space.orderBy("truth_threshold").collect()]
    else:
        rows = [dict(r) for r in truth_space]
    for r in rows:
        pos = (r["tp"] or 0) + (r["fn"] or 0)
        neg = (r["fp"] or 0) + (r["tn"] or 0)
        r["tp_rate"] = (r["tp"] / pos) if pos else 0.0
        r["fp_rate"] = (r["fp"] / neg) if neg else 0.0
    return rows


def roc_chart_spec(truth_space: DataFrame | list[dict]) -> dict:
    """ROC curve over the truth-space table (reference roc_chart,
    charts.py:202 / chart def roc.json): FP rate vs TP rate, one point per
    truth threshold. Input is the oracle-checked truth_space_table output
    (one row per distinct threshold — already driver-sized)."""
    return _vegalite(
        "Receiver operating characteristic curve",
        _truth_space_records(truth_space),
        {"type": "line", "clip": True, "point": True},
        {
            "x": {"field": "fp_rate", "type": "quantitative",
                  "title": "False positive rate", "sort": None},
            "y": {"field": "tp_rate", "type": "quantitative",
                  "title": "True positive rate (recall)"},
            "tooltip": [
                {"field": "truth_threshold", "type": "quantitative",
                 "format": ".4f"},
                {"field": "fp_rate", "type": "quantitative", "format": ".4f",
                 "title": "FP_rate"},
                {"field": "tp_rate", "type": "quantitative", "format": ".4f",
                 "title": "TP_rate"},
                {"field": "tp", "type": "quantitative", "format": ",.0f"},
                {"field": "fp", "type": "quantitative", "format": ",.0f"},
                {"field": "fn", "type": "quantitative", "format": ",.0f"},
                {"field": "tn", "type": "quantitative", "format": ",.0f"},
            ],
        },
        width=500, height=500,
    )


def precision_recall_chart_spec(truth_space: DataFrame | list[dict]) -> dict:
    """Precision-recall curve over the truth-space table (reference
    precision_recall_chart, charts.py:220)."""
    return _vegalite(
        "Precision-recall curve",
        _truth_space_records(truth_space),
        {"type": "line", "clip": True, "point": True},
        {
            "x": {"field": "recall", "type": "quantitative",
                  "title": "Recall", "sort": None},
            "y": {"field": "precision", "type": "quantitative",
                  "title": "Precision"},
            "tooltip": [
                {"field": "truth_threshold", "type": "quantitative",
                 "format": ".4f"},
                {"field": "precision", "type": "quantitative",
                 "format": ".4f"},
                {"field": "recall", "type": "quantitative", "format": ".4f"},
            ],
        },
        width=500, height=500,
    )


def cluster_studio_data(membership: DataFrame, edges: DataFrame,
                        sample_clusters: int = 10,
                        edge_l: str = "unique_id_l",
                        edge_r: str = "unique_id_r"
                        ) -> tuple[DataFrame, DataFrame]:
    """The data payload behind the reference's cluster studio dashboard
    (cluster_studio.py renders HTML; the engine emits the record sets):
    the `sample_clusters` largest non-singleton clusters' membership rows
    and their internal edges."""
    top = (membership.groupBy("cluster_id")
           .agg(F.count(F.lit(1)).alias("n"))
           .where(F.col("n") >= 2)
           .orderBy(F.desc("n"), "cluster_id")
           .limit(sample_clusters)
           .select("cluster_id"))
    mem = membership.join(F.broadcast(top), on="cluster_id")
    e = edges.join(
        mem.select(F.col("node_id").alias(edge_l), "cluster_id"), on=edge_l)
    return mem, e


def comparison_viewer_data(pred: DataFrame, settings: Settings,
                           example_rows_per_pattern: int = 2) -> DataFrame:
    """Distinct comparison-vector patterns with counts and example pairs
    (splink_comparison_viewer.py semantics): the data behind the comparison
    viewer dashboard. Runs as one groupBy + one ranked-window pass."""
    settings = settings.with_defaults()
    gcols = [c.gamma_column for c in settings.comparisons]
    counts = pred.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("pattern_count"))
    w = Window.partitionBy(*gcols).orderBy("unique_id_l", "unique_id_r")
    examples = pred.select(
        "*", F.row_number().over(w).alias("example_rank")
    ).where(F.col("example_rank") <= example_rows_per_pattern)
    return examples.join(counts, on=gcols)


def unlinkables_chart_spec(unlinkables: DataFrame | list[dict],
                           x_col: str = "match_weight") -> dict:
    """Cumulative share of un-linkable records vs self-match threshold
    (reference charts.py:356 `unlinkables_chart`, data from
    unlinkables.py). Accepts the unlinkables_data() frame
    (match_weight, prop, cum_prop); match_probability is derived from the
    rounded weight (p = 2^w / (1 + 2^w)) exactly as the threshold
    conversion does."""
    if x_col not in ("match_weight", "match_probability"):
        raise ValueError(
            f"{x_col} must be 'match_weight' or 'match_probability'")
    if isinstance(unlinkables, DataFrame):
        records = [r.asDict() for r in
                   unlinkables.orderBy("match_weight").collect()]
    else:
        records = list(unlinkables)
    for r in records:
        if "match_probability" not in r:
            bf = 2.0 ** r["match_weight"]
            r["match_probability"] = round(bf / (1.0 + bf), 5)
    titles = {"match_weight": "Threshold match weight",
              "match_probability": "Threshold match probability"}
    enc_x = {"field": x_col, "type": "quantitative",
             "axis": {"title": titles[x_col]}}
    enc_y = {"field": "cum_prop", "type": "quantitative",
             "axis": {"title": "Percentage of unlinkable records",
                      "format": ".1%"}}
    tooltip = [{"field": "match_weight", "type": "quantitative"},
               {"field": "match_probability", "type": "quantitative"},
               {"field": "cum_prop", "type": "quantitative",
                "format": ".2%", "title": "cumulative share"}]
    return {
        "$schema": _VL_SCHEMA,
        "title": {"text": "Unlinkable records",
                  "subtitle": "Records with insufficient information to "
                              "exceed the threshold, even against "
                              "themselves"},
        "data": {"values": records},
        "layer": [
            {"mark": {"type": "line", "interpolate": "step-after"},
             "encoding": {"x": enc_x, "y": enc_y, "tooltip": tooltip}},
            {"mark": {"type": "point", "size": 30},
             "encoding": {"x": enc_x, "y": enc_y, "tooltip": tooltip}},
        ],
        "width": 400, "height": 300,
    }


def completeness_chart_spec(completeness: DataFrame | list[dict]) -> dict:
    """Per-column (and per-source-dataset, when present) non-null share as
    a heatmap (reference charts.py:391 `completeness_chart`, data from
    completeness.py / operators.profiling.completeness_data)."""
    if isinstance(completeness, DataFrame):
        records = [r.asDict() for r in completeness.collect()]
    else:
        records = list(completeness)
    has_sd = any("source_dataset" in r for r in records)
    enc = {
        "x": {"field": "column_name", "type": "nominal", "sort": None,
              "title": "Column"},
        "color": {"field": "completeness", "type": "quantitative",
                  "scale": {"domain": [0, 1], "scheme": "greens"},
                  "legend": {"format": ".0%"}},
        "tooltip": [{"field": "column_name"},
                    {"field": "completeness", "format": ".2%"}],
    }
    if has_sd:
        enc["y"] = {"field": "source_dataset", "type": "nominal",
                    "title": "Source dataset"}
        enc["tooltip"].insert(0, {"field": "source_dataset"})
    return _vegalite("Data completeness", records, {"type": "rect"}, enc,
                     width=400)


def cumulative_comparisons_chart_spec(
        cumulative: DataFrame | list[dict]) -> dict:
    """Comparisons generated per blocking rule, cumulative (reference
    charts.py:401 `cumulative_blocking_rule_comparisons_generated`; data is
    the oracle-checked cumulative_comparisons table)."""
    if isinstance(cumulative, DataFrame):
        records = [r.asDict() for r in cumulative.collect()]
    else:
        records = list(cumulative)
    return _vegalite(
        "Comparisons generated by blocking rule (cumulative)",
        records,
        {"type": "bar"},
        {
            "x": {"field": "row_count", "type": "quantitative",
                  "title": "Comparisons generated"},
            "y": {"field": "match_key", "type": "nominal", "sort": None,
                  "title": "Blocking rule (match_key)"},
            "tooltip": [{"field": "match_key"},
                        {"field": "row_count", "type": "quantitative"},
                        {"field": "cumulative_rows",
                         "type": "quantitative"}],
        },
        width=450,
    )


def accuracy_chart_spec(truth_space: DataFrame | list[dict],
                        add_metrics: list[str] | None = None) -> dict:
    """Accuracy metrics vs threshold (reference accuracy_chart,
    charts.py:236 / chart def accuracy_chart_*.json): precision and recall
    always; extra metrics from add_accuracy_metrics folded into the same
    long-format line chart. Input is the (driver-sized) truth-space
    table."""
    from .accuracy import ACCURACY_METRICS

    extra = list(add_metrics or [])
    bad = [m for m in extra if m not in ACCURACY_METRICS]
    if bad:
        raise ValueError(
            f"invalid metrics {bad}; allowed: {', '.join(ACCURACY_METRICS)}")
    rows = _truth_space_records(truth_space)
    series = ["precision", "recall"] + extra
    long: list[dict] = []
    for r in rows:
        for m in series:
            if m in r and r[m] is not None:
                long.append({"truth_threshold": r["truth_threshold"],
                             "metric": m, "value": float(r[m])})
    return _vegalite(
        "Accuracy metrics vs match-weight threshold",
        long,
        {"type": "line", "clip": True, "interpolate": "monotone"},
        {
            "x": {"field": "truth_threshold", "type": "quantitative",
                  "title": "Threshold match weight"},
            "y": {"field": "value", "type": "quantitative",
                  "scale": {"domain": [0, 1]}, "title": "Metric value"},
            "color": {"field": "metric", "type": "nominal",
                      "title": "Metric"},
            "tooltip": [
                {"field": "truth_threshold", "type": "quantitative",
                 "format": ".4f"},
                {"field": "metric", "type": "nominal"},
                {"field": "value", "type": "quantitative", "format": ".4f"},
            ],
        },
        width=500, height=350,
    )


def threshold_selection_tool_spec(truth_space: DataFrame | list[dict],
                                  add_metrics: list[str] | None = None
                                  ) -> dict:
    """Interactive threshold-selection spec (reference
    threshold_selection_tool, charts.py:252 / chart def
    threshold_selection_tool_with_mw_vector.json): the accuracy-vs-
    threshold line chart plus a bound slider parameter that positions a
    rule mark at the chosen threshold, with the confusion counts in the
    tooltip. Pure Vega-Lite (params + binding) — no JS runtime needed
    beyond vega-embed."""
    base = accuracy_chart_spec(truth_space, add_metrics)
    rows = _truth_space_records(truth_space)
    lo = min((r["truth_threshold"] for r in rows), default=0.0)
    hi = max((r["truth_threshold"] for r in rows), default=1.0)
    spec = {
        "$schema": _VL_SCHEMA,
        "title": {"text": "Threshold selection tool",
                  "subtitle": "Drag the slider to move the candidate "
                              "threshold; lines show metric trade-offs"},
        "params": [{
            "name": "threshold",
            "value": (lo + hi) / 2.0,
            "bind": {"input": "range", "min": lo, "max": hi,
                     "step": max((hi - lo) / 200.0, 1e-6),
                     "name": "Match-weight threshold: "},
        }],
        "layer": [
            {"data": base["data"], "mark": base["mark"],
             "encoding": base["encoding"]},
            {"data": {"values": [{}]},
             "mark": {"type": "rule", "color": "#888", "strokeDash": [4, 4]},
             "encoding": {"x": {"datum": {"expr": "threshold"},
                                "type": "quantitative"}}},
        ],
        "width": 500, "height": 350,
    }
    return spec


def profile_columns_chart_spec(df: DataFrame,
                               columns: list[str] | None = None,
                               top_n: int = 10, bottom_n: int = 10) -> dict:
    """Multi-panel column profiler (reference profile_data.py:82-238
    profile_columns / files/chart_defs/profile_data.json): per column, an
    hconcat of (1) the value-frequency percentile distribution — aggregated
    by distinct frequency so the payload is bounded by the count-histogram
    size, not column cardinality — (2) top-n values by count, (3) bottom-n
    values by count; columns vconcat'd into one spec."""
    from .operators.profiling import profile_panel_data

    columns = columns or [c for c, t in df.dtypes if t == "string"]
    panels = []
    for col in columns:
        percentile, top, bottom = profile_panel_data(df, col, top_n,
                                                     bottom_n)
        if not percentile:
            continue
        meta = percentile[0]
        null_rows = meta["total_rows_inc_nulls"] - meta["total_non_null_rows"]
        sub = (f"{null_rows:,} null rows; "
               f"{meta['distinct_value_count']:,} distinct values")
        dist = {
            "data": {"values": percentile},
            "mark": {"type": "line", "interpolate": "step-after"},
            "title": {
                "text": f"Distribution of counts of values in column {col}",
                "subtitle": sub},
            "encoding": {
                "x": {"field": "percentile_ex_nulls", "type": "quantitative",
                      "sort": "descending",
                      "title": "Percentile (of non-null rows)"},
                "y": {"field": "value_count", "type": "quantitative",
                      "scale": {"type": "symlog"},
                      "title": "Count of records in value"},
                "tooltip": [
                    {"field": "value_count", "type": "quantitative"},
                    {"field": "n_values", "type": "quantitative",
                     "title": "values with this count"},
                    {"field": "percentile_ex_nulls", "type": "quantitative",
                     "format": ".2%"},
                ],
            },
            "width": 300, "height": 200,
        }

        def _bar(values, title):
            return {
                "data": {"values": values},
                "mark": {"type": "bar"},
                "title": title,
                "encoding": {
                    "x": {"field": "value", "type": "nominal", "sort": None,
                          "title": None},
                    "y": {"field": "value_count", "type": "quantitative",
                          "title": "value count"},
                    "tooltip": [{"field": "value"},
                                {"field": "value_count",
                                 "type": "quantitative"}],
                },
                "width": 200, "height": 200,
            }

        bottom_panel = _bar(bottom, f"Bottom {len(bottom)} values by count")
        if top:
            bottom_panel["encoding"]["y"]["scale"] = {
                "domain": [0, top[0]["value_count"]]}
        panels.append({"hconcat": [
            dist,
            _bar(top, f"Top {len(top)} values by count"),
            bottom_panel,
        ]})
    return {
        "$schema": _VL_SCHEMA,
        "title": "Column profiles",
        "vconcat": panels,
        "config": {"view": {"continuousWidth": 400,
                            "continuousHeight": 300}},
    }
