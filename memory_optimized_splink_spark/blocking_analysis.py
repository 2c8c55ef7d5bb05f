"""Reference-parity `blocking_analysis` module — the four module-level
functions a reference user calls before building a linker
(/root/reference/splink/blocking_analysis.py re-exporting
internals/blocking_analysis.py:231-741), re-expressed Spark-first:

- pre-filter counts are AGGREGATES over per-key block sizes (sum of n^2 /
  n_l*n_r), never a pair join;
- post-filter counts run the real blocking join (the join IS the
  estimator, exactly like the reference) and count;
- `db_api` is accepted for signature parity and ignored — Spark
  DataFrames carry their own session.

Accepted rule forms match the reference: a model.BlockingRule (incl.
blocking_rule_library outputs), a raw SQL string over l./r., or a
settings-dict {"blocking_rule": ..., "sql_dialect": ...}.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .model import BlockingRule, Settings

__all__ = [
    "count_comparisons_from_blocking_rule",
    "cumulative_comparisons_to_be_scored_from_blocking_rules_chart",
    "cumulative_comparisons_to_be_scored_from_blocking_rules_data",
    "n_largest_blocks",
]


def _resolve_rule(blocking_rule) -> BlockingRule:
    if isinstance(blocking_rule, BlockingRule):
        return blocking_rule
    if isinstance(blocking_rule, (str, dict)):
        from .interop import _parse_blocking_rule
        return _parse_blocking_rule(blocking_rule)
    raise TypeError(
        f"blocking_rule must be a BlockingRule, SQL string, or dict; got "
        f"{type(blocking_rule)}")


def _resolve_tables(table_or_tables) -> list[DataFrame]:
    tables = (list(table_or_tables)
              if isinstance(table_or_tables, (list, tuple))
              else [table_or_tables])
    for t in tables:
        if not isinstance(t, DataFrame):
            raise TypeError(
                "table_or_tables must be Spark DataFrame(s); register "
                "other formats with sources.registry first")
    return tables


def _combined_nodes(tables: list[DataFrame], link_type: str, uid: str,
                    sds: str | None) -> tuple[DataFrame, Settings]:
    """One node table + Settings matching the reference's input handling:
    multi-table inputs are vertically concatenated with a dataset tag and
    globally-unique ids (blocking_analysis._process_unique_id_columns)."""
    if len(tables) == 1 and link_type == "dedupe_only":
        return tables[0], Settings(
            comparisons=(), blocking_rules=(), unique_id_column_name=uid)
    if len(tables) == 1:
        if not sds:
            raise ValueError(
                f"link_type={link_type!r} with one table needs "
                "source_dataset_column_name")
        return tables[0], Settings(
            comparisons=(), blocking_rules=(), unique_id_column_name=uid,
            link_type=link_type, source_dataset_column_name=sds)

    def mark(df: DataFrame, tag: str) -> DataFrame:
        return df.withColumn("_ds", F.lit(tag)).withColumn(
            "_uid", F.concat(F.lit(tag), F.lit(":"),
                             F.col(uid).cast("string")))

    marked = mark(tables[0], "0")
    for i, t in enumerate(tables[1:], start=1):
        marked = marked.unionByName(mark(t, str(i)),
                                    allowMissingColumns=True)
    return marked, Settings(
        comparisons=(), blocking_rules=(), unique_id_column_name="_uid",
        link_type=link_type, source_dataset_column_name="_ds")


def _cartesian(tables: list[DataFrame], link_type: str) -> int:
    ns = [t.count() for t in tables]
    if link_type == "link_only" and len(ns) >= 2:
        total = 0
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                total += ns[i] * ns[j]
        return total
    n = sum(ns)
    return n * (n - 1) // 2


def _pre_filter_count(nodes: DataFrame, rule: BlockingRule,
                      link_type: str, tables: list[DataFrame]) -> int:
    """Comparisons the raw block join would emit BEFORE filter conditions
    (uid ordering / link-type / theta conjuncts): sum over key groups of
    n^2, one aggregate — reference blocking_analysis.py:231-300 semantics,
    no pair join."""
    if not rule.keys:
        # pure theta rule: the whole rule is a filter condition over the
        # raw join, exactly how the reference classifies it — the raw
        # self-join emits n^2 rows (dedupe) / n_l*n_r (two-dataset link)
        ns = [t.count() for t in tables]
        if link_type == "link_only" and len(ns) == 2:
            return ns[0] * ns[1]
        return sum(ns) ** 2
    if link_type == "link_only" and len(tables) == 2:
        # raw two-dataset equi join: sum over shared key groups of n_l*n_r
        from .operators.brs import count_comparisons_for_keys_link
        return count_comparisons_for_keys_link(tables[0], tables[1],
                                               tuple(rule.keys))
    # null keys never equi-match: exclude them like the reference's
    # group-by-USING-key count does (blocking_analysis.py:157+)
    cond = F.expr(rule.keys[0]).isNotNull()
    for k in rule.keys[1:]:
        cond = cond & F.expr(k).isNotNull()
    grouped = nodes.where(cond).groupBy(
        *[F.expr(k).alias(f"_k{j}") for j, k in enumerate(rule.keys)]).agg(
        F.count(F.lit(1)).alias("n"))
    row = grouped.agg(F.sum(F.col("n") * F.col("n")).alias("c")).collect()[0]
    return int(row["c"] or 0)


def count_comparisons_from_blocking_rule(
    *,
    table_or_tables,
    blocking_rule,
    link_type: str,
    db_api=None,
    unique_id_column_name: str = "unique_id",
    source_dataset_column_name: str | None = None,
    compute_post_filter_count: bool = True,
    max_rows_limit: int = int(1e9),
) -> dict:
    """Reference blocking_analysis.py:231: pre/post-filter comparison
    counts for one rule, same output keys."""
    from .operators.blocking import block_using_rules

    rule = _resolve_rule(blocking_rule)
    tables = _resolve_tables(table_or_tables)
    nodes, settings = _combined_nodes(tables, link_type,
                                      unique_id_column_name,
                                      source_dataset_column_name)
    equi = " AND ".join(f"l.{k} = r.{k}" for k in (rule.keys or ()))
    out = {
        "number_of_comparisons_generated_pre_filter_conditions":
            _pre_filter_count(nodes, rule, link_type, tables),
        "number_of_comparisons_to_be_scored_post_filter_conditions":
            "not computed",
        "filter_conditions_identified": rule.sql or "",
        "equi_join_conditions_identified": equi,
        "link_type_join_condition": (
            "l.source_dataset != r.source_dataset"
            if link_type == "link_only" else ""),
    }
    if not compute_post_filter_count:
        return out
    pre = out["number_of_comparisons_generated_pre_filter_conditions"]
    if pre >= max_rows_limit:
        # reference blocking_analysis.py:514-524: warn and report, don't
        # raise — the pre-filter count is the answer the caller needed
        import warnings
        warnings.warn(
            f"Computation of the post-filter count was skipped: the rule "
            f"generates {pre:.3e} comparisons pre-filter, over "
            f"max_rows_limit={max_rows_limit:.2e}. Raise max_rows_limit "
            f"above {pre:.3e} to force it.")
        out["number_of_comparisons_to_be_scored_post_filter_conditions"] = \
            "exceeded max_rows_limit, see warning"
        return out
    from dataclasses import replace
    pairs = block_using_rules(nodes, replace(settings,
                                             blocking_rules=(rule,)))
    out["number_of_comparisons_to_be_scored_post_filter_conditions"] = \
        pairs.count()
    return out


def cumulative_comparisons_to_be_scored_from_blocking_rules_data(
    *,
    table_or_tables,
    blocking_rules,
    link_type: str,
    db_api=None,
    unique_id_column_name: str = "unique_id",
    max_rows_limit: int = int(1e9),
    source_dataset_column_name: str | None = None,
) -> pd.DataFrame:
    """Reference blocking_analysis.py:598: one row per rule with marginal
    and cumulative counts (NOT-prior-rule exclusion via the real
    match_key attribution), reference column order."""
    from dataclasses import replace

    from .operators.blocking import block_using_rules

    rules = [_resolve_rule(b) for b in blocking_rules]
    tables = _resolve_tables(table_or_tables)
    nodes, settings = _combined_nodes(tables, link_type,
                                      unique_id_column_name,
                                      source_dataset_column_name)
    for r in rules:
        pre = _pre_filter_count(nodes, r, link_type, tables)
        if pre >= max_rows_limit:
            # reference blocking_analysis.py:306-313 raises before running
            # the join — the safety valve for overly loose rules
            raise ValueError(
                f"Blocking rule {r.label or r.sql!r} would create {pre} "
                f"comparisons pre-filter.\nThis exceeds the max_rows_limit "
                f"of {max_rows_limit}.\nPlease tighten the blocking rule "
                "or increase the max_rows_limit.")
    pairs = block_using_rules(nodes, replace(settings,
                                             blocking_rules=tuple(rules)))
    per = (pairs.groupBy("match_key")
           .agg(F.count(F.lit(1)).alias("row_count"))
           .toPandas())
    per["match_key"] = per["match_key"].astype(int)
    spine = pd.DataFrame({
        "match_key": range(len(rules)),
        "blocking_rule": [
            r.sql or " AND ".join(f"l.{k} = r.{k}" for k in r.keys)
            for r in rules],
    })
    df = spine.merge(per, on="match_key", how="left").fillna(
        {"row_count": 0})
    df["row_count"] = df["row_count"].astype(int)
    df["cumulative_rows"] = df["row_count"].cumsum().astype(int)
    df["start"] = df["cumulative_rows"] - df["row_count"]
    df["cartesian"] = _cartesian(tables, link_type)
    df["match_key"] = df["match_key"].astype(str)
    return df[["blocking_rule", "row_count", "cumulative_rows",
               "cartesian", "match_key", "start"]]


def cumulative_comparisons_to_be_scored_from_blocking_rules_chart(
    *,
    table_or_tables,
    blocking_rules,
    link_type: str,
    db_api=None,
    unique_id_column_name: str = "unique_id",
    max_rows_limit: int = int(1e9),
    source_dataset_column_name: str | None = None,
) -> dict:
    """Vega-Lite bar spec over the cumulative data (reference
    blocking_analysis.py:644)."""
    data = cumulative_comparisons_to_be_scored_from_blocking_rules_data(
        table_or_tables=table_or_tables, blocking_rules=blocking_rules,
        link_type=link_type, db_api=db_api,
        unique_id_column_name=unique_id_column_name,
        max_rows_limit=max_rows_limit,
        source_dataset_column_name=source_dataset_column_name)
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": "Comparisons to be scored, cumulative by blocking rule",
        "data": {"values": data.to_dict("records")},
        "mark": "bar",
        "encoding": {
            "x": {"field": "start", "type": "quantitative",
                  "title": "Comparisons"},
            "x2": {"field": "cumulative_rows"},
            "y": {"field": "blocking_rule", "type": "nominal", "sort": None},
            "color": {"field": "match_key", "type": "nominal"},
            "tooltip": [
                {"field": "blocking_rule"}, {"field": "row_count"},
                {"field": "cumulative_rows"}, {"field": "cartesian"}],
        },
    }


def n_largest_blocks(
    *,
    table_or_tables,
    blocking_rule,
    link_type: str,
    db_api=None,
    n_largest: int = 5,
) -> DataFrame:
    """Reference blocking_analysis.py:684: the key values generating the
    biggest blocks (pre filter conditions)."""
    from .operators.blocking import n_largest_blocks as _nlb

    rule = _resolve_rule(blocking_rule)
    if not rule.keys:
        raise ValueError(
            "n_largest_blocks needs an equi-join rule (key-based); a pure "
            "theta rule has no blocks")
    tables = _resolve_tables(table_or_tables)
    if len(tables) == 1:
        # block sizes are a pre-filter notion: the link-type condition
        # never enters, so a single table is analysed directly
        nodes = tables[0]
    else:
        # block counting groups by the rule keys only — no id column is
        # needed, so a plain name-union suffices for any table schemas
        nodes = tables[0]
        for t in tables[1:]:
            nodes = nodes.unionByName(t, allowMissingColumns=True)
    return _nlb(nodes, rule, n_largest)
