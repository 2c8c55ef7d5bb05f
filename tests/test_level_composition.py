"""And / Or / Not comparison-level composition (reference
comparison_level_composition.py): batch gamma equivalence vs the same
condition written as a custom-SQL level, null-level propagation, realtime
LocalScorer parity, sub-level metric precompute, and reference-format
export."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.comparison_library import And, Not, Or
from memory_optimized_splink_spark.linker import SparkLinker
from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
)

ROWS = [
    {"unique_id": "1", "first": "rob", "last": "jones", "city": "leeds"},
    {"unique_id": "2", "first": "rob", "last": "jones", "city": "york"},
    {"unique_id": "3", "first": "rob", "last": "janes", "city": "leeds"},
    {"unique_id": "4", "first": "bob", "last": "jones", "city": "leeds"},
    {"unique_id": "5", "first": None, "last": "jones", "city": "leeds"},
    {"unique_id": "6", "first": "rob", "last": None, "city": "leeds"},
    {"unique_id": "7", "first": "robert", "last": "joness", "city": "leeds"},
    {"unique_id": "8", "first": "rob", "last": "jones", "city": "leeds"},
]


def _settings(comp: Comparison, retain: tuple = ()) -> Settings:
    return Settings(comparisons=(comp,), blocking_rules=(block_on("city"),),
                    probability_two_random_records_match=0.1,
                    additional_columns_to_retain=retain)


def _gammas(spark, comp: Comparison, retain: tuple = ()) -> dict[tuple, int]:
    lk = SparkLinker(spark, spark.createDataFrame(ROWS),
                     _settings(comp, retain))
    cv = lk.comparison_vectors()
    g = f"gamma_{comp.name}"
    return {(r["unique_id_l"], r["unique_id_r"]): r[g]
            for r in cv.select("unique_id_l", "unique_id_r", g).collect()}


def test_and_or_not_match_custom_sql_equivalent(spark):
    composed = Comparison("nm", "first", (
        Or(ComparisonLevel("null", column="first"),
           ComparisonLevel("null", column="last")),
        And(ComparisonLevel("exact", column="first"),
            ComparisonLevel("exact", column="last")),
        And(ComparisonLevel("jaro_winkler", column="first", threshold=0.88),
            Not(ComparisonLevel("levenshtein", column="last", threshold=3))),
        ComparisonLevel("else"),
    ))
    custom = Comparison("nm", "first", (
        ComparisonLevel("custom", sql_condition=(
            "first_l IS NULL OR first_r IS NULL OR "
            "last_l IS NULL OR last_r IS NULL"), label="null"),
        ComparisonLevel("custom", sql_condition=(
            "first_l = first_r AND last_l = last_r")),
        ComparisonLevel("custom", sql_condition=(
            "jaro_winkler(first_l, first_r) >= 0.88 "
            "AND NOT (levenshtein(last_l, last_r) <= 3)")),
        ComparisonLevel("else"),
    ))
    # the custom variant can't mark a null level by kind; compare graded
    # gammas only where the composed one isn't null (-1). Custom SQL
    # references `last` which isn't any custom level's declared column —
    # the documented contract is to retain it explicitly.
    a = _gammas(spark, composed)
    b = _gammas(spark, custom, retain=("last",))
    assert a.keys() == b.keys() and len(a) > 3
    for k, ga in a.items():
        if ga == -1:
            # custom variant has 4 graded levels; its null-as-custom level
            # is the top one (gamma 3)
            assert b[k] == 3
        else:
            # custom has 3 graded levels (incl. the null-as-custom top one)
            assert b[k] == ga, k
    # the Or-of-nulls acted as the null level: pairs touching 5 or 6
    nulls = {k for k, v in a.items() if v == -1}
    assert nulls and all("5" in k or "6" in k for k in nulls)


def test_composed_null_level_is_null(spark):
    comp = Comparison("nm", "first", (
        Or(ComparisonLevel("null", column="first"),
           ComparisonLevel("null", column="last")),
        ComparisonLevel("exact", column="first"),
        ComparisonLevel("else"),
    ))
    assert comp.null_level is comp.levels[0]
    assert [lv.kind for _, lv in comp.graded_levels] == ["exact", "else"]
    # Not() of a null level is NOT a null level
    comp2 = Comparison("nm", "first", (
        ComparisonLevel("null", column="first"),
        Not(ComparisonLevel("null", column="last")),
        ComparisonLevel("else"),
    ))
    assert comp2.null_level is comp2.levels[0]
    assert len(comp2.graded_levels) == 2


def test_sub_level_metrics_are_precomputed(spark):
    """A jaro_winkler nested inside And() must get its metric column
    computed — the composed condition references it."""
    comp = Comparison("nm", "first", (
        ComparisonLevel("null", column="first"),
        And(ComparisonLevel("jaro_winkler", column="first", threshold=0.9),
            ComparisonLevel("exact", column="last")),
        ComparisonLevel("else"),
    ))
    g = _gammas(spark, comp)
    # (1,3): first exact (jw=1.0 >= .9) but last jones/janes differ -> else
    assert g[("1", "3")] == 0
    # (1,8): first exact, last exact -> the And level
    assert g[("1", "8")] == 1


def test_realtime_parity_with_batch(spark):
    comp = Comparison("nm", "first", (
        Or(ComparisonLevel("null", column="first"),
           ComparisonLevel("null", column="last")),
        And(ComparisonLevel("exact", column="first"),
            ComparisonLevel("exact", column="last")),
        Or(ComparisonLevel("jaro_winkler", column="first", threshold=0.88),
           Not(ComparisonLevel("levenshtein", column="last", threshold=2))),
        ComparisonLevel("else"),
    ))
    from memory_optimized_splink_spark.realtime import LocalScorer

    lk = SparkLinker(spark, spark.createDataFrame(ROWS), _settings(comp))
    batch = _gammas(spark, comp)
    scorer = LocalScorer(lk.settings)
    by_id = {r["unique_id"]: r for r in ROWS}
    s = lk.settings.comparisons[0]
    for (l, r), gb in batch.items():
        gl = scorer.gamma(s, by_id[l], by_id[r])
        assert gl == gb, (l, r, gl, gb)


def test_export_to_reference_sql(spark):
    from memory_optimized_splink_spark.interop import settings_to_splink_dict

    comp = Comparison("nm", "first", (
        Or(ComparisonLevel("null", column="first"),
           ComparisonLevel("null", column="last")),
        And(ComparisonLevel("exact", column="first"),
            Not(ComparisonLevel("exact", column="last")), m=0.7, u=0.1),
        ComparisonLevel("else"),
    ))
    d = settings_to_splink_dict(_settings(comp).with_defaults())
    levels = d["comparisons"][0]["comparison_levels"]
    assert levels[0]["is_null_level"] is True
    assert "OR" in levels[0]["sql_condition"]
    assert levels[1]["sql_condition"] == \
        '("first_l" = "first_r") AND (NOT ("last_l" = "last_r"))'
    assert levels[1]["m_probability"] == 0.7


def test_composition_validation():
    with pytest.raises(ValueError, match="sub_levels"):
        ComparisonLevel("and")
    with pytest.raises(ValueError, match="exactly 1"):
        ComparisonLevel("not", sub_levels=(
            ComparisonLevel("exact", column="a"),
            ComparisonLevel("exact", column="b")))
