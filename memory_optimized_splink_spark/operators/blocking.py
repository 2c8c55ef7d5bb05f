"""Blocking: candidate-pair generation with explicit skew handling.

Reference semantics (re-expressed Spark-first, not translated):
- self-join on each rule with `uid_l < uid_r` and NOT-any-preceding-rule
  exclusion, emitting (match_key, unique_id_l, unique_id_r)
  (/root/reference/splink/internals/blocking.py:102-122,187-219,687-774).
- static salting UNION over ceil(salt*k)=s buckets (blocking.py:340-401).
  Here salting is a *join-key extension*: the left side carries a
  deterministic salt, the right side is exploded to all k salts, so hot-key
  blocks split into k co-partitioned tasks with identical output.
- skew measurement mirrors blocking_analysis.py:89-185,684-741 (per-key
  counts); keys whose block exceeds `hot_key_threshold` rows are split
  explicitly (north rule), everything else rides the hash join whose shuffle
  IS the repartition-by-blocking-key, plus AQE skew-join as backstop.

Scale notes: only the id + blocking-key columns ever enter the join (never
`content`); exclusion of prior rules re-evaluates prior key equalities as
filters (stateless — no extra shuffle, vs. the fork's materialized
exclude-pairs anti-join, blocking.py:124-164).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..model import BlockingRule, Settings


def _bk(i: int, j: int) -> str:
    return f"_bk_{i}_{j}"


def _with_rule_keys(nodes: DataFrame, rules: list[BlockingRule]) -> DataFrame:
    """Precompute every equi rule's key expressions once (one projection)."""
    out = nodes
    for i, rule in enumerate(rules):
        if rule.keys:
            for j, k in enumerate(rule.keys):
                out = out.withColumn(_bk(i, j), F.expr(k))
    return out


def _all_not_null(keys: list[str]):
    cond = F.col(keys[0]).isNotNull()
    for k in keys[1:]:
        cond = cond & F.col(k).isNotNull()
    return cond


def _exclusion_filter(i: int, rules: list[BlockingRule]):
    """NOT (coalesce(rule_0, false) OR ...) over preceding rules
    (blocking.py:102-122): drop pairs an earlier rule already produced."""
    cond = None
    for j in range(i):
        r = rules[j]
        if r.keys:
            c = None
            for k, key_expr in enumerate(r.keys):
                lcol, rcol = F.col(f"l.{_bk(j, k)}"), F.col(f"r.{_bk(j, k)}")
                if key_expr in r.explode_columns:
                    # an exploding rule matched the pair iff the arrays
                    # share any term (blocking.py:581-684 marginal pairs)
                    eq = F.arrays_overlap(lcol, rcol)
                else:
                    eq = lcol == rcol
                c = eq if c is None else (c & eq)
        else:
            c = F.expr(r.sql)
        c = F.coalesce(c, F.lit(False))
        cond = c if cond is None else (cond | c)
    return None if cond is None else ~cond


def measure_key_counts(nodes_k: DataFrame, rule_idx: int,
                       rule: BlockingRule) -> DataFrame:
    """Per-key row counts for one equi rule (block size of a dedupe
    self-join is ~count^2/2). blocking_analysis.py:89-185."""
    keys = [_bk(rule_idx, j) for j in range(len(rule.keys))]
    return (
        nodes_k.where(_all_not_null(keys))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("key_count"))
    )


def n_largest_blocks(nodes: DataFrame, rule: BlockingRule, n: int = 10) -> DataFrame:
    """Top-n keys by comparison count (blocking_analysis.py:684-741)."""
    nk = _with_rule_keys(nodes, [rule])
    counts = measure_key_counts(nk, 0, rule)
    named = counts
    for j, expr in enumerate(rule.keys):
        named = named.withColumnRenamed(_bk(0, j), f"key_{j}")
    return (
        named.withColumn(
            "comparison_count",
            (F.col("key_count") * (F.col("key_count") - 1) / 2).cast("long"),
        )
        .orderBy(F.desc("comparison_count"), *[f"key_{j}" for j in range(len(rule.keys))])
        .limit(n)
    )


def _project_pairs(joined: DataFrame, i: int, rules: list[BlockingRule],
                   uid: str, link_only_col: str | None = None) -> DataFrame:
    """Apply pair ordering + preceding-rule exclusion, project to id pairs.
    Must run while l./r. qualifiers are still resolvable."""
    joined = joined.where(F.col(f"l.{uid}") < F.col(f"r.{uid}"))
    if link_only_col:
        # link_only: only cross-dataset pairs (the reference splits the
        # concat into left/right tables, vertically_concatenate.py:213-249;
        # the filter expresses the same pair set)
        joined = joined.where(
            F.col(f"l.{link_only_col}") != F.col(f"r.{link_only_col}"))
    excl = _exclusion_filter(i, rules)
    if excl is not None:
        joined = joined.where(excl)
    return joined.select(
        F.lit(str(i)).alias("match_key"),
        F.col(f"l.{uid}").alias("unique_id_l"),
        F.col(f"r.{uid}").alias("unique_id_r"),
    )


def _equi_rule_pairs(
    nodes_k: DataFrame,
    i: int,
    rule: BlockingRule,
    uid: str,
    rules: list[BlockingRule],
    link_only_col: str | None = None,
) -> DataFrame:
    keys = [_bk(i, j) for j in range(len(rule.keys))]
    base = nodes_k.where(_all_not_null(keys))

    hot_keys = None
    if rule.hot_key_threshold:
        counts = measure_key_counts(nodes_k, i, rule)
        hot = counts.where(F.col("key_count") > rule.hot_key_threshold).select(*keys)
        if hot.limit(1).count() > 0:
            hot_keys = hot

    def join_on(l: DataFrame, r: DataFrame, extra=None) -> DataFrame:
        cond = F.col(f"l.{keys[0]}") == F.col(f"r.{keys[0]}")
        for k in keys[1:]:
            cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
        if extra is not None:
            cond = cond & extra
        return l.alias("l").join(r.alias("r"), cond, "inner")

    def salted_join(l_side: DataFrame, r_side: DataFrame, k_salt: int
                    ) -> DataFrame:
        """Salt-extended equi-join: the left side carries a deterministic
        per-row salt, the right side is exploded to all k salts, so each
        key's block splits into k co-partitioned tasks with identical output
        (every pair is found exactly once, at the left row's salt)."""
        l_s = l_side.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(uid)), F.lit(k_salt)).cast("int"))
        r_s = r_side.withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(s).cast("int") for s in range(k_salt)])))
        return join_on(l_s, r_s, extra=(F.col("l._salt") == F.col("r._salt")))

    if hot_keys is None:
        if rule.salting_partitions > 1:
            # static user-declared salting (reference blocking.py:340-401):
            # honored whenever no measured hot-key split handled the rule —
            # previously a salting_partitions set without hot_key_threshold
            # was silently ignored
            return _project_pairs(
                salted_join(base, base, rule.salting_partitions),
                i, rules, uid, link_only_col)
        return _project_pairs(join_on(base, base), i, rules, uid, link_only_col)

    flagged = base.join(
        F.broadcast(hot_keys.withColumn("_hot", F.lit(True))), on=keys, how="left"
    )
    cold = flagged.where(F.col("_hot").isNull()).drop("_hot")
    hot = flagged.where(F.col("_hot").isNotNull()).drop("_hot")
    k_salt = max(rule.salting_partitions, 8)
    cold_pairs = _project_pairs(join_on(cold, cold), i, rules, uid,
                                link_only_col)
    hot_pairs = _project_pairs(salted_join(hot, hot, k_salt),
                               i, rules, uid, link_only_col)
    # cold x hot pairs: keys differ by construction, so no pairs are lost.
    return cold_pairs.unionByName(hot_pairs)


def block_using_rules(nodes: DataFrame, settings: Settings) -> DataFrame:
    """All rules UNION'd with match_key + preceding-rule exclusion.
    Output: (match_key string, unique_id_l, unique_id_r), each pair once."""
    uid = settings.unique_id_column_name
    rules = list(settings.blocking_rules)
    has_theta = any(r.sql for r in rules)
    link_only_col = (settings.source_dataset_column_name
                     if settings.link_type == "link_only" else None)
    nodes_k = _with_rule_keys(nodes, rules)
    if not has_theta:
        keep = [uid] + [
            _bk(i, j)
            for i, r in enumerate(rules) if r.keys
            for j in range(len(r.keys))
        ]
        if link_only_col:
            keep.append(link_only_col)
        nodes_k = nodes_k.select(*keep)

    outs: list[DataFrame] = []
    for i, rule in enumerate(rules):
        if rule.keys and rule.explode_columns:
            # exploding rule (blocking.py:404-543): unnest the array key(s)
            # so the equi-join runs on scalar terms; a pair sharing several
            # terms appears once per term -> dedupe on the id pair
            nodes_e = nodes_k
            for j, k in enumerate(rule.keys):
                if k in rule.explode_columns:
                    nodes_e = nodes_e.withColumn(_bk(i, j),
                                                 F.explode(F.col(_bk(i, j))))
            outs.append(
                _equi_rule_pairs(nodes_e, i, rule, uid, rules,
                                 link_only_col).distinct())
        elif rule.keys:
            outs.append(_equi_rule_pairs(nodes_k, i, rule, uid, rules,
                                         link_only_col))
        else:
            joined = nodes_k.alias("l").join(nodes_k.alias("r"), F.expr(rule.sql),
                                             "inner")
            outs.append(_project_pairs(joined, i, rules, uid, link_only_col))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def cartesian_pairs(nodes: DataFrame, settings: Settings) -> DataFrame:
    """Blocking-free fallback (`1=1`), used by u-estimation over a bounded
    sample (/root/reference/splink/internals/blocking.py:751-756)."""
    uid = settings.unique_id_column_name
    l = nodes.select(F.col(uid))
    r = nodes.select(F.col(uid))
    return (
        l.alias("l").crossJoin(r.alias("r"))
        .where(F.col(f"l.{uid}") < F.col(f"r.{uid}"))
        .select(
            F.lit("0").alias("match_key"),
            F.col(f"l.{uid}").alias("unique_id_l"),
            F.col(f"r.{uid}").alias("unique_id_r"),
        )
    )
