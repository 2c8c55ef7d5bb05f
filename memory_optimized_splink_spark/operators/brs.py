"""Blocking-rule auto-suggestion: cost-based search over candidate key sets.

Reference (/root/reference/splink/internals/
find_brs_with_comparison_counts_below_threshold.py:87-214,
cost_of_blocking_rules.py:9-53, optimise_cost_of_brs.py:16-123): enumerate
column combinations, estimate comparison counts via groupBy-count, prune
combos over the threshold, then pick a rule SET minimizing a weighted cost
(comparisons, rule count, per-field "freedom": each field should be allowed
to disagree by at least one rule).

The count estimation is the distributed part (one groupBy per candidate);
the search is driver-side Python over a handful of numbers, exactly like
the reference.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, functions as F


def count_comparisons_for_keys(nodes: DataFrame, keys: tuple[str, ...]) -> int:
    """Dedupe comparison count for an equi rule: sum over key groups of
    C(n,2) (blocking_analysis.py:89-185)."""
    cond = F.expr(keys[0]).isNotNull()
    for k in keys[1:]:
        cond = cond & F.expr(k).isNotNull()
    row = (
        nodes.where(cond).groupBy(*[F.expr(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("c"))
        .collect()[0]
    )
    return int(row["c"] or 0)


def count_comparisons_for_keys_link(nodes_l: DataFrame, nodes_r: DataFrame,
                                    keys: tuple[str, ...]) -> int:
    """Two-dataset (link_only) comparison count for an equi rule: sum over
    shared key groups of n_l * n_r (reference blocking_analysis.py:89-185,
    two-dataset branch). Two groupBy aggregates + a join of the (small)
    per-key count tables — the node tables are never pair-joined."""
    def key_counts(df: DataFrame, out: str) -> DataFrame:
        cond = F.expr(keys[0]).isNotNull()
        for k in keys[1:]:
            cond = cond & F.expr(k).isNotNull()
        named = [F.expr(k).alias(f"_k{j}") for j, k in enumerate(keys)]
        return df.where(cond).groupBy(*named).agg(
            F.count(F.lit(1)).alias(out))

    joined = key_counts(nodes_l, "_n_l").join(
        key_counts(nodes_r, "_n_r"),
        on=[f"_k{j}" for j in range(len(keys))])
    row = joined.agg(
        F.sum(F.col("_n_l") * F.col("_n_r")).alias("c")).collect()[0]
    return int(row["c"] or 0)


def count_comparisons_for_rule(nodes: DataFrame, rule,
                               uid: str = "unique_id",
                               nodes_r: DataFrame | None = None) -> int:
    """Exact comparison count for ANY BlockingRule — equi, exploding, or
    raw-SQL theta; dedupe (one table) or link (pass nodes_r) — by running
    the real single-rule blocking join and counting (reference
    blocking_analysis.count_comparisons_from_blocking_rule handles
    arbitrary rule SQL the same way: the join IS the estimator). For plain
    equi dedupe rules prefer count_comparisons_for_keys — an aggregate,
    no pair join."""
    from ..model import Settings
    from .blocking import block_using_rules

    if nodes_r is None:
        s = Settings(comparisons=(), blocking_rules=(rule,),
                     unique_id_column_name=uid)
        return block_using_rules(nodes, s).count()
    df = cumulative_comparisons_link(nodes, nodes_r, [rule], uid=uid)
    rows = df.collect()
    return int(rows[0]["row_count"]) if rows else 0


def cumulative_comparisons_link(nodes_l: DataFrame, nodes_r: DataFrame,
                                rules, uid: str = "unique_id") -> DataFrame:
    """Exact cumulative comparison counts per blocking rule for a two-dataset
    link_only job (reference blocking_analysis.
    cumulative_comparisons_to_be_scored_from_blocking_rules, link branch):
    runs the real blocking join (cross-dataset pairs only, NOT-prior-rule
    exclusion) and counts per match_key. Output: (match_key, row_count,
    cumulative_rows) — the same shape as the dedupe cumulative query.

    uids are made globally unique by prefixing the dataset tag, so input
    datasets may share id values (the usual case in link jobs)."""
    from pyspark.sql import Window

    from ..model import Settings
    from .blocking import block_using_rules

    def mark(df: DataFrame, tag: str) -> DataFrame:
        return df.withColumn("_ds", F.lit(tag)).withColumn(
            "_uid", F.concat(F.lit(tag), F.lit(":"),
                             F.col(uid).cast("string")))

    # link inputs routinely carry different column sets (the reference
    # vertically concatenates only the needed columns) — union the superset
    # and let absent columns become NULL, which never equi-matches
    marked = mark(nodes_l, "l").unionByName(mark(nodes_r, "r"),
                                            allowMissingColumns=True)
    s = Settings(comparisons=(), blocking_rules=tuple(rules),
                 unique_id_column_name="_uid", link_type="link_only",
                 source_dataset_column_name="_ds")
    pairs = block_using_rules(marked, s)
    per = pairs.groupBy("match_key").agg(F.count(F.lit(1)).alias("row_count"))
    # order by the RULE INDEX, not the string key: with 10+ rules '10'
    # sorts before '2' lexically and the cumulative would disagree with the
    # NOT-prior-rule exclusion order
    w = Window.orderBy(F.col("match_key").cast("int")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per.select(
        "match_key", "row_count",
        F.sum("row_count").over(w).alias("cumulative_rows"))


def find_rules_below_threshold(
    nodes: DataFrame,
    columns: list[str],
    max_comparisons: int,
    max_keys: int = 2,
) -> list[dict]:
    """All 1..max_keys column combos whose comparison count stays under the
    threshold, with counts. Combos whose PREFIX already fits are skipped
    (adding keys only shrinks blocks — same pruning as the reference's
    tree search)."""
    results: list[dict] = []
    fitting: set[tuple[str, ...]] = set()
    for r in range(1, max_keys + 1):
        for combo in combinations(sorted(columns), r):
            if any(set(prev) < set(combo) for prev in fitting):
                continue  # a subset already fits; superset is redundant
            c = count_comparisons_for_keys(nodes, combo)
            if c <= max_comparisons:
                fitting.add(combo)
                results.append({"keys": combo, "comparison_count": c})
    return sorted(results, key=lambda d: (-d["comparison_count"], d["keys"]))


def rule_set_cost(rules: list[dict], all_fields: list[str],
                  comparison_weight: float = 1e-6,
                  rule_weight: float = 1.0,
                  unfree_field_weight: float = 10.0) -> float:
    """Weighted cost of a rule set (cost_of_blocking_rules.py:9-53): total
    comparisons + #rules + penalty per field that every rule blocks on
    (such a field can never disagree between matched records)."""
    total_comparisons = sum(r["comparison_count"] for r in rules)
    unfree = sum(
        1 for f in all_fields
        if rules and all(f in r["keys"] for r in rules)
    )
    return (comparison_weight * total_comparisons
            + rule_weight * len(rules)
            + unfree_field_weight * unfree)


def suggest_blocking_rules(
    nodes: DataFrame,
    columns: list[str],
    max_comparisons: int,
    max_rules: int = 3,
    max_keys: int = 2,
    random_restarts: int = 0,
    seed: int = 42,
) -> list[dict]:
    """Greedy set selection: among rules under threshold, repeatedly add the
    rule that lowers cost the most (deterministic tie-breaks). Returns
    [{keys, comparison_count}] ready to wrap in block_on(*keys).

    random_restarts > 0 mirrors the reference's randomized heuristic runs
    (optimise_cost_of_brs.py:16-123 localised_shuffle): each restart
    PERTURBS the selection itself (at every greedy step it picks randomly
    among the 2 lowest-cost candidates, not just a reshuffled scan order —
    a pure reshuffle only changes the result on exact cost ties) and the
    lowest-cost set over all runs wins. Pure driver-side Python over the
    already collected counts (no extra Spark work), deterministic under
    `seed`."""
    import random

    candidates = find_rules_below_threshold(
        nodes, columns, max_comparisons, max_keys)

    def greedy(rng: "random.Random | None" = None) -> list[dict]:
        chosen: list[dict] = []
        cands = list(candidates)
        while len(chosen) < max_rules and cands:
            scored = sorted(
                ((rule_set_cost(chosen + [c], columns), i, c)
                 for i, c in enumerate(cands)),
                key=lambda t: (t[0], t[1]))
            if rng is not None and len(scored) > 1:
                cost, _, best = scored[rng.randrange(2)]
            else:
                cost, _, best = scored[0]
            if chosen and cost >= rule_set_cost(chosen, columns):
                break
            chosen.append(best)
            cands = [c for c in cands if c is not best]
        return chosen

    best_set = greedy()
    rng = random.Random(seed)
    for _ in range(random_restarts):
        alt = greedy(rng)
        if rule_set_cost(alt, columns) < rule_set_cost(best_set, columns):
            best_set = alt
    return best_set
