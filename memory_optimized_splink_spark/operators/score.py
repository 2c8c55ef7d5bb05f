"""Fellegi-Sunter scoring: gamma -> Bayes factors -> match weight/probability.

Reference semantics:
- per-comparison BF CASE on gamma (m/u; u=0 -> Infinity; gamma=-1 -> 1.0)
  (/root/reference/splink/internals/comparison_level.py:635-642,402-411).
- fork TF-adjustment multiplier columns: exact level -> N / max(tf_l,
  tf_minimum_u_value); fuzzy level -> sim*N/sqrt(tf_l*tf_r) +
  (1-sim)*max_eps*N^2/(tf_l*tf_r); null/else/non-tf -> 1.0
  (comparison_level.py:644-745). N = total records in the field
  (fork's hardcoded `total_records_in_field`, parameterized here).
- `only_help` clamp m := max(m, u) pre-predict (inference.py:158-175).
- combine: bf_total = prior_bf * prod(bf terms); match_weight = log2;
  match_probability = bf/(1+bf) with the any-term-Infinity -> 1.0 guard
  (predict.py:104-133,199-214).

Everything here is literal arithmetic on gamma/tf columns — pure Catalyst
expressions, whole-stage codegen, no Python.
"""

from __future__ import annotations

import math
from dataclasses import replace

from pyspark.sql import Column, DataFrame, functions as F

from ..model import Comparison, Settings, prob_to_bayes_factor


def apply_only_help(settings: Settings) -> Settings:
    """Fork's pre-predict clamp: a flagged level can never count against a
    match (m := u when u > m). inference.py:158-175."""
    new_comps = []
    for comp in settings.comparisons:
        new_levels = []
        for lv in comp.levels:
            if lv.only_help and lv.m is not None and lv.u is not None \
                    and lv.u > lv.m:
                lv = replace(lv, m=lv.u)
            new_levels.append(lv)
        new_comps.append(replace(comp, levels=tuple(new_levels)))
    return replace(settings, comparisons=tuple(new_comps))


def bf_lookup(comp: Comparison) -> dict[int, float]:
    """gamma value -> Bayes factor (m/u)."""
    out = {-1: 1.0}
    for gamma, lv in comp.graded_levels:
        m, u = lv.m, lv.u
        if m is None or u is None:
            raise ValueError(
                f"comparison {comp.name} level {lv.describe()} missing m/u; "
                "call settings.with_defaults() or train first"
            )
        out[gamma] = (m / u) if u > 0 else math.inf
    return out


def bf_column(comp: Comparison) -> Column:
    expr = None
    for gamma, bf in sorted(bf_lookup(comp).items()):
        lit = F.lit(float("inf")) if math.isinf(bf) else F.lit(float(bf))
        cond = F.col(comp.gamma_column) == F.lit(gamma)
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    return expr.cast("double").alias(comp.bf_column)


def tf_adjustment_column(comp: Comparison, n_records,
                         tf_style: str = "fork_count") -> Column | None:
    """Multiplier column bf_tf_adj_<comp>, or None if no level is TF-adjusted.

    n_records: the fork's per-field `total_records_in_field`
    (comparison_level.py:30-42) — pass {column: non-null count} (a single
    float is accepted and applied to every column).

    tf_style="upstream_ratio": (u / tf_proportion)^tf_adjustment_weight —
    upstream Splink semantics, validated against the Splink-2 golden record
    (tests/datasets/splink2_479_vs_481.csv); tf_proportion = tf_count / N."""
    def n_for(col: str) -> float:
        if isinstance(n_records, dict):
            return float(n_records[col])
        return float(n_records or 0.0)

    expr = None
    has_any = False
    for gamma, lv in comp.graded_levels:
        if not lv.tf_adjustment or lv.kind == "else":
            continue
        has_any = True
        c = lv.column or comp.column
        n = n_for(c)
        tf_l, tf_r = F.col(f"tf_{c}_l"), F.col(f"tf_{c}_r")
        if tf_style == "upstream_ratio":
            val = F.when(
                tf_l.isNotNull(),
                F.pow(F.lit(lv.u) * F.lit(n) / tf_l,
                      F.lit(lv.tf_adjustment_weight)),
            ).otherwise(F.lit(1.0))
        elif lv.kind == "exact":
            divisor = tf_l
            if lv.tf_minimum_u_value > 0.0:
                divisor = F.when(
                    tf_l > F.lit(lv.tf_minimum_u_value), tf_l
                ).otherwise(F.lit(lv.tf_minimum_u_value))
            mult = F.lit(n) / divisor
            val = F.when(tf_l.isNotNull(), mult).otherwise(F.lit(1.0))
        else:
            sim = lv.fuzzy_similarity_value if lv.fuzzy_similarity_value is not None else 0.9
            eps = lv.fuzzy_max_epsilon if lv.fuzzy_max_epsilon is not None else 0.0
            prod = tf_l * tf_r
            score = F.lit(sim * n) / F.sqrt(prod)
            second = (1.0 - sim) * eps * n ** 2
            if second != 0:
                score = score + F.lit(second) / prod
            val = F.when(prod.isNotNull(), score).otherwise(F.lit(1.0))
        cond = F.col(comp.gamma_column) == F.lit(gamma)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    if not has_any:
        return None
    return expr.otherwise(F.lit(1.0)).cast("double").alias(f"bf_tf_adj_{comp.name}")


def predict(
    cv: DataFrame,
    settings: Settings,
    n_records: float | dict | None = None,
    threshold_match_probability: float | None = None,
    threshold_match_weight: float | None = None,
    keep_bf_columns: bool = False,
) -> DataFrame:
    """Comparison vectors -> match_weight / match_probability."""
    settings = apply_only_help(settings)
    comps = list(settings.comparisons)

    bf_cols = [bf_column(c) for c in comps]
    tf_cols = []
    for c in comps:
        tfc = tf_adjustment_column(c, n_records,
                                   tf_style=settings.tf_style)
        if tfc is not None:
            if n_records is None:
                raise ValueError("n_records required for TF adjustments")
            tf_cols.append(tfc)
    stage1 = cv.select("*", *bf_cols, *tf_cols)

    terms = [c.bf_column for c in comps] + [
        f"bf_tf_adj_{c.name}" for c in comps
        if any(lv.tf_adjustment and lv.kind != "else" for lv in c.levels)
    ]
    # array-TF adjustment columns pre-joined by apply_tf_array_adjustments
    # (operators/tf_array.py) multiply into the same product
    terms += [c for c in cv.columns
              if c.startswith("bf_tf_adj_") and c not in terms]
    prior_bf = prob_to_bayes_factor(settings.probability_two_random_records_match)
    total = F.lit(float(prior_bf))
    for t in terms:
        total = total * F.col(t)
    any_inf = None
    for t in terms:
        c = F.col(t) == F.lit(float("inf"))
        any_inf = c if any_inf is None else (any_inf | c)
    mw = F.log2(total).alias("match_weight")
    mp = F.when(any_inf, F.lit(1.0)).otherwise(total / (F.lit(1.0) + total)) \
        .alias("match_probability")

    out = stage1.select(mw, mp, "*")
    if not keep_bf_columns:
        out = out.drop(*terms)
    if threshold_match_weight is None and threshold_match_probability is not None:
        p = threshold_match_probability
        # p == 0 keeps everything (log2(0) is -inf, i.e. no filter)
        if p > 0.0:
            threshold_match_weight = math.log2(prob_to_bayes_factor(p))
    if threshold_match_weight is not None:
        out = out.where(F.col("match_weight") >= F.lit(threshold_match_weight))
    return out
