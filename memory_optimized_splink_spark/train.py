"""Parameter training: u by random sampling, m/lambda by EM, m from labels.

Reference semantics:
- u estimation (/root/reference/splink/internals/estimate_u.py:68-253):
  sample n rows with n(n-1)/2 ~= max_pairs, cartesian self-join, comparison
  vectors, match_probability := 0, u_k = level proportions. Sampling is
  seeded & deterministic (regression for the reference's seed bug,
  CHANGELOG.md:25).
- EM (/root/reference/splink/internals/expectation_maximisation.py):
  comparison vectors for the training blocking rule are collapsed to
  **agreement-pattern counts** (groupBy over the gamma columns,
  expectation_maximisation.py:27-41) — the fork's key speedup: every EM
  iteration then runs over O(#patterns) rows on the driver instead of
  O(#pairs) on the cluster. E-step scores patterns; M-step re-estimates
  m_k / u_k / lambda; convergence = max abs param change < em_convergence
  (<=25 iterations, settings.py:211-212). Unobserved levels get the 1e-6
  sentinel (comparison_level.py:273-296).
- EM sessions deactivate comparisons whose columns appear in the training
  blocking rule (em_training_session.py:104-124); multi-session m/u are
  combined by **median** (comparison_level.py:363-376).
- m from labels (m_training.py:26-100): p := 1.0 on labeled pairs, one
  M-step.
"""

from __future__ import annotations

import statistics
from dataclasses import replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .model import Comparison, Settings, prob_to_bayes_factor
from .operators.blocking import block_using_rules, cartesian_pairs
from .operators.vectors import compute_comparison_vectors

LEVEL_NOT_OBSERVED = 1e-6


# ------------------------------------------------------------- u estimation

def estimate_u_using_random_sampling(
    nodes: DataFrame, settings: Settings, max_pairs: float = 1e6,
    seed: int | None = None,
) -> Settings:
    seed = settings.seed if seed is None else seed
    n = nodes.count()
    if n < 2:
        return settings
    target_rows = min(n, int((2.0 * max_pairs) ** 0.5) + 1)
    fraction = min(1.0, 1.5 * target_rows / n)  # oversample, then trim
    sample = nodes.sample(fraction=fraction, seed=seed).limit(target_rows)
    pairs = cartesian_pairs(sample, settings)
    cv = compute_comparison_vectors(pairs, sample, settings,
                                    retain_columns=False)
    gcols = [c.gamma_column for c in settings.comparisons]
    counts = cv.groupBy(*gcols).agg(F.count(F.lit(1)).alias("cnt")).toPandas()
    new_comps = []
    for comp in settings.comparisons:
        g = comp.gamma_column
        non_null = counts[counts[g] >= 0]
        total = non_null["cnt"].sum()
        by_level = non_null.groupby(g)["cnt"].sum()
        new_levels = []
        for lv in comp.levels:
            if lv.kind == "null":
                new_levels.append(lv)
                continue
            gamma = next(gv for gv, l2 in comp.graded_levels if l2 is lv)
            cnt = float(by_level.get(gamma, 0.0))
            u = cnt / total if total > 0 else None
            if u is not None and u <= 0:
                u = LEVEL_NOT_OBSERVED
            new_levels.append(replace(lv, u=u))
        new_comps.append(replace(comp, levels=tuple(new_levels)))
    return replace(settings, comparisons=tuple(new_comps))


# ----------------------------------------------------- agreement-pattern EM

def agreement_pattern_counts(cv: DataFrame, comparisons: list[Comparison]
                             ) -> pd.DataFrame:
    gcols = [c.gamma_column for c in comparisons]
    return (
        cv.groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("agreement_pattern_count"))
        .toPandas()
    )


def _bf_vector(patterns: pd.DataFrame, comparisons: list[Comparison],
               lam: float) -> np.ndarray:
    bf = np.full(len(patterns), prob_to_bayes_factor(lam), dtype=np.float64)
    for comp in comparisons:
        g = patterns[comp.gamma_column].to_numpy()
        lut = {-1: 1.0}
        for gamma, lv in comp.graded_levels:
            lut[gamma] = (lv.m / lv.u) if lv.u > 0 else np.inf
        factors = np.array([lut[int(x)] for x in g])
        bf *= factors
    return bf


def _e_step(patterns: pd.DataFrame, comparisons: list[Comparison],
            lam: float) -> np.ndarray:
    bf = _bf_vector(patterns, comparisons, lam)
    with np.errstate(invalid="ignore"):
        p = bf / (1.0 + bf)
    return np.where(np.isinf(bf), 1.0, p)


def _m_step(patterns: pd.DataFrame, comparisons: list[Comparison],
            p: np.ndarray, fix_u: bool) -> tuple[list[Comparison], float]:
    cnt = patterns["agreement_pattern_count"].to_numpy().astype(np.float64)
    lam = float((p * cnt).sum() / cnt.sum())
    new_comps = []
    for comp in comparisons:
        g = patterns[comp.gamma_column].to_numpy()
        active = g >= 0
        m_tot = (p * cnt)[active].sum()
        u_tot = ((1 - p) * cnt)[active].sum()
        new_levels = []
        for lv in comp.levels:
            if lv.kind == "null":
                new_levels.append(lv)
                continue
            gamma = next(gv for gv, l2 in comp.graded_levels if l2 is lv)
            sel = active & (g == gamma)
            m_k = (p * cnt)[sel].sum() / m_tot if m_tot > 0 else LEVEL_NOT_OBSERVED
            u_k = ((1 - p) * cnt)[sel].sum() / u_tot if u_tot > 0 else LEVEL_NOT_OBSERVED
            m_k = max(m_k, LEVEL_NOT_OBSERVED)
            u_k = max(u_k, LEVEL_NOT_OBSERVED)
            new_levels.append(replace(lv, m=m_k, u=(lv.u if fix_u else u_k)))
        new_comps.append(replace(comp, levels=tuple(new_levels)))
    return new_comps, lam


def _params_vector(comps: list[Comparison], lam: float) -> np.ndarray:
    out = [lam]
    for c in comps:
        for _, lv in c.graded_levels:
            out += [lv.m or 0.0, lv.u or 0.0]
    return np.array(out)


def expectation_maximisation(
    patterns: pd.DataFrame,
    comparisons: list[Comparison],
    lam: float,
    em_convergence: float = 1e-4,
    max_iterations: int = 25,
    fix_u: bool = False,
) -> tuple[list[Comparison], float, list[dict]]:
    """Driver-side EM over the (tiny) agreement-pattern table. Returns
    (trained comparisons, trained lambda, iteration history)."""
    history: list[dict] = []
    prev = _params_vector(comparisons, lam)
    for it in range(max_iterations):
        p = _e_step(patterns, comparisons, lam)
        comparisons, lam = _m_step(patterns, comparisons, p, fix_u=fix_u)
        cur = _params_vector(comparisons, lam)
        delta = float(np.abs(cur - prev).max())
        history.append({"iteration": it + 1, "lambda": lam, "max_delta": delta})
        prev = cur
        if delta < em_convergence:
            break
    return comparisons, lam, history


def _rule_columns(rule) -> set[str]:
    """Columns the training rule EXACTLY equi-joins on — only those force
    full agreement, so only those deactivate a comparison during EM
    (reference em_training_session.py:104-124 compares the join columns,
    not every identifier). An expression key like substr(first_name,1,2)
    does NOT force first_name to agree and must not deactivate it."""
    import re

    cols = set()
    for k in (rule.keys or ()):
        k = k.strip()
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", k):
            cols.add(k)
    return cols


def estimate_parameters_using_em(
    nodes: DataFrame,
    settings: Settings,
    training_rule,
    fix_u: bool = True,
) -> tuple[Settings, list[dict]]:
    """One EM training session blocked on `training_rule`.

    Comparisons whose columns appear in the rule are deactivated (their
    gammas are forced to agree by blocking, so EM over this subset cannot
    estimate them — em_training_session.py:104-124). Their params pass
    through unchanged.
    """
    settings = settings.with_defaults()
    blocked_cols = _rule_columns(training_rule)
    active = [c for c in settings.comparisons
              if (c.column not in blocked_cols)]
    inactive = [c for c in settings.comparisons if c not in active]
    train_settings = replace(
        settings, comparisons=tuple(active),
        blocking_rules=(training_rule,),
    )
    # blocking-adjusted session lambda (em_training_session.py:375-405):
    # within blocked pairs, the deactivated comparisons agree by
    # construction, so the prior's Bayes factor is multiplied by each
    # deactivated comparison's exact-level m/u
    adj_bf = prob_to_bayes_factor(
        settings.probability_two_random_records_match)
    for comp in inactive:
        exact = next((lv for _, lv in comp.graded_levels
                      if lv.kind == "exact"), None)
        if exact is not None and exact.u:
            adj_bf *= exact.m / exact.u
    lam0 = adj_bf / (1 + adj_bf)

    pairs = block_using_rules(nodes, train_settings)
    cv = compute_comparison_vectors(pairs, nodes, train_settings,
                                    retain_columns=False)
    patterns = agreement_pattern_counts(cv, active)
    trained, lam, history = expectation_maximisation(
        patterns, active,
        lam=lam0,
        em_convergence=settings.em_convergence,
        max_iterations=settings.max_iterations,
        fix_u=fix_u,
    )
    by_name = {c.name: c for c in trained}
    new_comps = tuple(
        by_name.get(c.name, c) for c in settings.comparisons
    )
    return replace(settings, comparisons=new_comps), history


def combine_sessions_median(settings: Settings,
                            sessions: list[Settings]) -> Settings:
    """Median of trained m/u across sessions (comparison_level.py:363-376)."""
    new_comps = []
    for i, comp in enumerate(settings.comparisons):
        new_levels = []
        for j, lv in enumerate(comp.levels):
            if lv.kind == "null":
                new_levels.append(lv)
                continue
            ms = [s.comparisons[i].levels[j].m for s in sessions
                  if s.comparisons[i].levels[j].m is not None]
            us = [s.comparisons[i].levels[j].u for s in sessions
                  if s.comparisons[i].levels[j].u is not None]
            new_levels.append(replace(
                lv,
                m=statistics.median(ms) if ms else lv.m,
                u=statistics.median(us) if us else lv.u,
            ))
        new_comps.append(replace(comp, levels=tuple(new_levels)))
    return replace(settings, comparisons=tuple(new_comps))


# ------------------------------------------------------------ m from labels

def estimate_m_from_pairwise_labels(
    nodes: DataFrame, settings: Settings, labels: DataFrame,
) -> Settings:
    """labels: (unique_id_l, unique_id_r[, clerical_match_score]). Pairs with
    score >= 0.5 (or all, if no score column) get p := 1.0; one M-step."""
    if "clerical_match_score" in labels.columns:
        labels = labels.where(F.col("clerical_match_score") >= 0.5)
    pairs = labels.select(
        F.lit("0").alias("match_key"), "unique_id_l", "unique_id_r"
    )
    cv = compute_comparison_vectors(pairs, nodes, settings,
                                    retain_columns=False)
    patterns = agreement_pattern_counts(cv, list(settings.comparisons))
    p = np.ones(len(patterns))
    comps, _ = _m_step(patterns, list(settings.comparisons), p, fix_u=True)
    return replace(settings, comparisons=tuple(comps))


def estimate_m_from_label_column(
    nodes: DataFrame, settings: Settings, label_column: str,
) -> Settings:
    """m from a ground-truth LABEL COLUMN (reference
    linker_components/training.py:353 -> m_training.py:26-100 via
    block_from_labels.py): pairs agreeing on `label_column` are treated as
    true matches (match_probability := 1.0) and a single M-step re-estimates
    every m. u passes through unchanged (fix_u)."""
    from .model import block_on

    settings = settings.with_defaults()
    s = replace(settings, blocking_rules=(block_on(label_column),))
    pairs = block_using_rules(nodes, s)
    cv = compute_comparison_vectors(pairs, nodes, s, retain_columns=False)
    patterns = agreement_pattern_counts(cv, list(settings.comparisons))
    p = np.ones(len(patterns))
    comps, _ = _m_step(patterns, list(settings.comparisons), p, fix_u=True)
    return replace(settings, comparisons=tuple(comps))


def estimate_probability_two_random_records_match(
    nodes: DataFrame, settings: Settings, deterministic_rules: list,
    recall: float,
) -> float:
    """lambda ~= (#pairs matched by deterministic rules / recall) / #cartesian
    (/root/reference/splink/internals/linker_components/training.py:34-158)."""
    s = replace(settings, blocking_rules=tuple(deterministic_rules))
    n_matches = block_using_rules(nodes, s).count() / recall
    n = nodes.count()
    cart = n * (n - 1) / 2
    return max(min(n_matches / cart, 1.0 - 1e-12), 1e-12)


# --------------------------------------------------- EM with TF adjustments

def estimate_parameters_using_em_with_tf(
    nodes: DataFrame,
    settings: Settings,
    training_rule,
    fix_u: bool = True,
) -> tuple[Settings, list[dict]]:
    """EM whose E-step includes upstream-Splink term-frequency adjustments:
    for an exact level with tf_adjustment, the pair's Bayes factor is
    multiplied by (u / tf_term)^tf_adjustment_weight (validated bit-exact
    against the reference's Splink-2 golden lambda history,
    tests/datasets/splink2_proportion_of_matches_history_*.csv).

    The agreement-pattern collapse extends with the tf proportion of the
    adjusted column (distinct-term cardinality keeps the pattern table
    small), so iterations still never rescan the pair table.
    """
    settings = settings.with_defaults()
    blocked_cols = _rule_columns(training_rule)
    active = [c for c in settings.comparisons if c.column not in blocked_cols]
    inactive = [c for c in settings.comparisons if c not in active]

    # tf-adjusted exact levels among active comparisons
    tf_specs = []  # (comparison, gamma_value, u, weight, column)
    for comp in active:
        for gamma, lv in comp.graded_levels:
            if lv.tf_adjustment and lv.kind == "exact":
                tf_specs.append((comp, gamma, lv.u, lv.tf_adjustment_weight,
                                 lv.column or comp.column))

    adj_bf = prob_to_bayes_factor(
        settings.probability_two_random_records_match)
    for comp in inactive:
        exact = next((lv for _, lv in comp.graded_levels
                      if lv.kind == "exact"), None)
        if exact is not None and exact.u:
            adj_bf *= exact.m / exact.u
    lam0 = adj_bf / (1 + adj_bf)

    from .operators.nodes import compute_tf_table, non_null_counts

    n_rows = non_null_counts(nodes, {c for *_, c in tf_specs})
    nodes_tf = nodes
    for _, _, _, _, col in tf_specs:
        tf = compute_tf_table(nodes, col).withColumn(
            f"tf_{col}", F.col(f"tf_{col}") / F.lit(float(n_rows[col])))
        nodes_tf = nodes_tf.join(F.broadcast(tf), on=col, how="left")

    train_settings = replace(
        settings, comparisons=tuple(active), blocking_rules=(training_rule,),
        tf_columns=tuple({c for *_, c in tf_specs}),
    )
    pairs = block_using_rules(nodes_tf, train_settings)
    cv = compute_comparison_vectors(pairs, nodes_tf, train_settings,
                                    retain_columns=False)
    gcols = [c.gamma_column for c in active]
    tf_cols = [f"tf_{c}_l" for *_, c in tf_specs]
    patterns = (
        cv.groupBy(*gcols, *tf_cols)
        .agg(F.count(F.lit(1)).alias("agreement_pattern_count"))
        .toPandas()
    )

    import numpy as np

    def e_step_tf(pats, comps, lam):
        bf = _bf_vector(pats, comps, lam)
        for comp, gamma, u, w, col in tf_specs:
            g = pats[comp.gamma_column].to_numpy()
            tfv = pats[f"tf_{col}_l"].to_numpy(dtype=float)
            adj = np.where((g == gamma) & ~np.isnan(tfv),
                           (u / tfv) ** w, 1.0)
            bf = bf * adj
        with np.errstate(invalid="ignore"):
            out = bf / (1 + bf)
        return np.where(np.isinf(bf), 1.0, out)

    comparisons = list(active)
    lam = lam0
    history: list[dict] = [{"iteration": 0, "lambda": lam}]
    prev = _params_vector(comparisons, lam)
    for it in range(settings.max_iterations):
        p = e_step_tf(patterns, comparisons, lam)
        comparisons, lam = _m_step(patterns, comparisons, p, fix_u=fix_u)
        cur = _params_vector(comparisons, lam)
        delta = float(np.abs(cur - prev).max())
        history.append({"iteration": it + 1, "lambda": lam,
                        "max_delta": delta})
        prev = cur
        if delta < settings.em_convergence:
            break
    by_name = {c.name: c for c in comparisons}
    new_comps = tuple(by_name.get(c.name, c) for c in settings.comparisons)
    return replace(settings, comparisons=new_comps), history
