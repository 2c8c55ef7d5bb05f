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
