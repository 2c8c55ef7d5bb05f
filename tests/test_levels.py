"""Literal-level gamma tests (the reference's literal harness pattern,
/root/reference/tests/literal_utils.py): for each level kind, rows of
(value_l, value_r, expected_gamma)."""

from __future__ import annotations

import pytest

from memory_optimized_splink_spark.model import Comparison, ComparisonLevel, Settings, block_on
from memory_optimized_splink_spark.operators.vectors import (
    compute_comparison_vectors,
    gamma_column,
    with_comparison_metrics,
)


def _gammas(spark, comp: Comparison, rows: list[tuple], types="string"):
    df = spark.createDataFrame(
        [(str(i), a, b) for i, (a, b, _) in enumerate(rows)],
        f"pair_id string, {comp.column}_l {types}, {comp.column}_r {types}",
    )
    df = with_comparison_metrics(df, Settings(
        comparisons=(comp,), blocking_rules=(block_on("x"),)))
    out = df.select("pair_id", gamma_column(comp)).collect()
    got = {r["pair_id"]: r[comp.gamma_column] for r in out}
    return [got[str(i)] for i in range(len(rows))]


def test_exact_null_else(spark):
    comp = Comparison("c", "c", (
        ComparisonLevel("null"), ComparisonLevel("exact"), ComparisonLevel("else"),
    ))
    rows = [("a", "a", 1), ("a", "b", 0), (None, "a", -1), (None, None, -1)]
    assert _gammas(spark, comp, rows) == [g for _, _, g in rows]


def test_jaro_winkler_levels(spark):
    comp = Comparison("c", "c", (
        ComparisonLevel("null"),
        ComparisonLevel("exact"),
        ComparisonLevel("jaro_winkler", threshold=0.9401),
        ComparisonLevel("jaro_winkler", threshold=0.8801),
        ComparisonLevel("else"),
    ))
    rows = [
        ("martha", "martha", 3),
        ("martha", "marhta", 2),   # 0.9611
        ("dixon", "dicksonx", 0),  # 0.8133
        ("dwayne", "duane", 0),    # 0.84
        ("prefix_abc", "prefix_abd", 2),  # jw 0.94+
        (None, "x", -1),
    ]
    assert _gammas(spark, comp, rows) == [g for _, _, g in rows]


def test_levenshtein_levels(spark):
    comp = Comparison("c", "c", (
        ComparisonLevel("null"),
        ComparisonLevel("levenshtein", threshold=1),
        ComparisonLevel("levenshtein", threshold=3),
        ComparisonLevel("else"),
    ))
    rows = [("kitten", "kitten", 2), ("kitten", "mitten", 2),
            ("kitten", "sitting", 1), ("abc", "zzzzzz", 0)]
    assert _gammas(spark, comp, rows) == [g for _, _, g in rows]


def test_array_intersect_level(spark):
    comp = Comparison("c", "c", (
        ComparisonLevel("null"),
        ComparisonLevel("array_intersect", threshold=2),
        ComparisonLevel("array_intersect", threshold=1),
        ComparisonLevel("else"),
    ))
    rows = [
        (["a", "b", "c"], ["b", "c"], 2),
        (["a", "b"], ["b"], 1),
        (["a"], ["b"], 0),
        (None, ["a"], -1),
    ]
    assert _gammas(spark, comp, rows, types="array<string>") == [g for _, _, g in rows]


def test_abs_diff_and_pct_diff(spark):
    comp = Comparison("c", "c", (
        ComparisonLevel("null"),
        ComparisonLevel("abs_diff", threshold=1.5),
        ComparisonLevel("pct_diff", threshold=0.5),
        ComparisonLevel("else"),
    ))
    rows = [(10.0, 11.0, 2), (10.0, 14.0, 1), (10.0, 100.0, 0), (None, 1.0, -1)]
    assert _gammas(spark, comp, rows, types="double") == [g for _, _, g in rows]


def test_jaccard_chars_level(spark):
    import duckdb

    comp = Comparison("c", "c", (
        ComparisonLevel("null"),
        ComparisonLevel("jaccard_chars", threshold=0.7),
        ComparisonLevel("else"),
    ))
    rows = [("abc", "abd", None), ("abc", "abc", None), ("abc", "xyz", None)]
    duck = duckdb.connect().execute(
        "select jaccard('abc','abd'), jaccard('abc','abc'), jaccard('abc','xyz')"
    ).fetchall()[0]
    expected = [1 if d >= 0.7 else 0 for d in duck]
    assert _gammas(spark, comp, [(a, b, None) for a, b, _ in rows]) == expected


def test_custom_level(spark):
    comp = Comparison("c", "c", (
        ComparisonLevel("null"),
        ComparisonLevel("custom", sql_condition="substring(c_l,1,3) = substring(c_r,1,3)"),
        ComparisonLevel("else"),
    ))
    rows = [("abcdef", "abcxyz", 1), ("abc", "xbc", 0)]
    assert _gammas(spark, comp, rows) == [g for _, _, g in rows]


def test_gamma_values_descend_best_first():
    comp = Comparison("c", "c", (
        ComparisonLevel("null"),
        ComparisonLevel("exact"),
        ComparisonLevel("jaro_winkler", threshold=0.9),
        ComparisonLevel("else"),
    ))
    assert [g for g, _ in comp.graded_levels] == [2, 1, 0]


def test_settings_json_roundtrip(basic_settings):
    from memory_optimized_splink_spark.model import Settings

    s2 = Settings.from_json(basic_settings.to_json())
    assert s2 == basic_settings


def test_dedupe_metric_values_identical_output(spark):
    """dedupe_metric_values=True (python metrics over DISTINCT value pairs,
    null-safe join-back) must produce EXACTLY the inline path's comparison
    vectors — including null inputs and repeated value pairs."""
    from dataclasses import replace

    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )

    rows = []
    names = ["smith", "smyth", "jones", None, "smith"]
    for i in range(40):
        rows.append((str(i), "k", names[i % 5]))
    df = spark.createDataFrame(rows, "unique_id string, k string, name string")
    s = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.01),
                ComparisonLevel("jaro_winkler", threshold=0.88, m=0.6, u=0.05),
                ComparisonLevel("else", m=0.1, u=0.9),
            )),
        ),
        blocking_rules=(block_on("k"),),
        probability_two_random_records_match=0.1,
    )
    pairs = block_using_rules(df, s)

    def cv_set(settings):
        return {(r["unique_id_l"], r["unique_id_r"], r["gamma_name"])
                for r in compute_comparison_vectors(pairs, df, settings)
                .collect()}

    inline = cv_set(s)
    deduped = cv_set(replace(s, dedupe_metric_values=True))
    assert inline == deduped and len(inline) == 40 * 39 // 2
