"""Reference-parity `blocking_rule_library` (brl) — mirrors
/root/reference/splink/internals/blocking_rule_library.py:22-199
(ExactMatchRule, CustomRule, And/Or/Not combinators, block_on) over this
engine's model.BlockingRule.

Spark-first semantics: key-based rules stay native equi-joins (hash join
on computed keys); And of key-based rules merges key lists so the
composite is STILL an equi-join; Or/Not fall back to a theta-join SQL
rule exactly like the reference's combinators do — prefer multiple
separate rules over Or for scale (the multi-rule union is
equi-joinable, the Or theta-join is not)."""

from __future__ import annotations

import re

from .model import BlockingRule, block_on

__all__ = ["ExactMatchRule", "CustomRule", "And", "Or", "Not", "block_on"]

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def ExactMatchRule(col_name: str) -> BlockingRule:
    """Single-column equality (reference blocking_rule_library.py:22)."""
    return BlockingRule(keys=(col_name,), label=col_name)


def CustomRule(blocking_rule: str, sql_dialect: str = "duckdb"
               ) -> BlockingRule:
    """Raw blocking SQL over l./r. aliases (reference
    blocking_rule_library.py:40), routed through the settings importer so
    conjunctions of same-expression equalities come back as native
    equi-KEY rules rather than theta joins."""
    from .interop import _parse_blocking_rule
    return _parse_blocking_rule(
        {"blocking_rule": blocking_rule, "sql_dialect": sql_dialect})


def _rule_sql(rule: BlockingRule) -> str:
    """The rule as theta-join SQL over l./r. (for Or/Not composition).
    Only identifier keys can be qualified mechanically; expression keys
    (SUBSTR(...), salted/exploded rules) must stay native."""
    if rule.sql:
        return rule.sql
    if rule.keys is None:
        raise ValueError(f"rule {rule.label!r} has neither keys nor sql")
    if rule.explode_columns:
        # qualifying an array key as `l.col = r.col` would silently turn
        # per-element matching into whole-array equality
        raise ValueError(
            f"cannot compose exploding rule {rule.label!r} into a theta "
            "rule (per-element semantics are lost); use separate blocking "
            "rules instead of Or/Not here")
    parts = []
    for k in rule.keys:
        if not _IDENT.match(k):
            raise ValueError(
                f"cannot compose expression key {k!r} into a theta rule; "
                "use separate blocking rules instead of Or/Not here")
        parts.append(f"l.{k} = r.{k}")
    return " AND ".join(parts)


def And(*rules: BlockingRule) -> BlockingRule:
    """Conjunction (reference _Merge:116/And:172). Key-based inputs merge
    into one multi-key rule — still a native hash join."""
    if not rules:
        raise ValueError("And() needs at least one rule")
    if all(r.keys is not None and not r.sql for r in rules):
        keys: list[str] = []
        explode: list[str] = []
        for r in rules:
            keys.extend(k for k in r.keys if k not in keys)
            # propagate per-element (exploding) semantics and skew knobs
            # instead of silently dropping them: the merged multi-key rule
            # explodes the same array keys, and the strongest salting /
            # hot-key setting carries over (perf knobs — the pair set is
            # identical with or without them)
            explode.extend(c for c in r.explode_columns if c not in explode)
        return BlockingRule(
            keys=tuple(keys), label="_and_".join(r.label for r in rules),
            explode_columns=tuple(explode),
            salting_partitions=max(r.salting_partitions for r in rules),
            hot_key_threshold=min(
                (r.hot_key_threshold for r in rules
                 if r.hot_key_threshold is not None), default=None),
        )
    sql = " AND ".join(f"({_rule_sql(r)})" for r in rules)
    return BlockingRule(sql=sql, label="and")


def Or(*rules: BlockingRule) -> BlockingRule:
    """Disjunction as ONE rule (reference Or:176) — a theta join. At scale
    prefer passing the rules separately to blocking_rules (the engine
    unions equi-join outputs with match_key attribution) — identical pair
    set, shuffle-friendly plan."""
    if not rules:
        raise ValueError("Or() needs at least one rule")
    if len(rules) == 1:
        return rules[0]
    sql = " OR ".join(f"({_rule_sql(r)})" for r in rules)
    return BlockingRule(sql=sql, label="or")


def Not(rule: BlockingRule) -> BlockingRule:
    """Negation (reference Not:180): pairs NOT matched by the rule. Always
    a theta join — meaningful mainly inside And(...) to carve exceptions
    out of a broader key rule."""
    return BlockingRule(sql=f"NOT ({_rule_sql(rule)})",
                        label=f"not_{rule.label}")
