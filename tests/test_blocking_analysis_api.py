"""Module-level blocking_analysis / exploratory API parity (reference
splink/blocking_analysis.py, splink/exploratory.py re-exports)."""

from __future__ import annotations

import pytest

from memory_optimized_splink_spark import block_on
from memory_optimized_splink_spark.blocking_analysis import (
    count_comparisons_from_blocking_rule,
    cumulative_comparisons_to_be_scored_from_blocking_rules_chart,
    cumulative_comparisons_to_be_scored_from_blocking_rules_data,
    n_largest_blocks,
)
from memory_optimized_splink_spark.exploratory import completeness_chart


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
        (4, "b", "y"), (5, "b", "y"), (6, None, "z"),
    ]
    return spark.createDataFrame(
        rows, "unique_id int, city string, grp string")


def test_count_comparisons_dedupe(people):
    out = count_comparisons_from_blocking_rule(
        table_or_tables=people, blocking_rule=block_on("city"),
        link_type="dedupe_only")
    # pre-filter: raw self equi join = sum n^2 = 3^2 + 2^2; the NULL-city
    # group never equi-matches so it is excluded (reference semantics)
    assert out["number_of_comparisons_generated_pre_filter_conditions"] \
        == 9 + 4
    # post-filter: C(3,2) + C(2,2) = 3 + 1 (null key never equi-matches)
    assert out[
        "number_of_comparisons_to_be_scored_post_filter_conditions"] == 4
    assert out["equi_join_conditions_identified"] == "l.city = r.city"

    skip = count_comparisons_from_blocking_rule(
        table_or_tables=people, blocking_rule=block_on("city"),
        link_type="dedupe_only", compute_post_filter_count=False)
    assert skip[
        "number_of_comparisons_to_be_scored_post_filter_conditions"] \
        == "not computed"

    # over the limit: warn and skip the post-filter join, like the
    # reference (blocking_analysis.py:514-524) — never raise here
    with pytest.warns(UserWarning, match="max_rows_limit"):
        capped = count_comparisons_from_blocking_rule(
            table_or_tables=people, blocking_rule=block_on("city"),
            link_type="dedupe_only", max_rows_limit=3)
    assert capped[
        "number_of_comparisons_to_be_scored_post_filter_conditions"] \
        == "exceeded max_rows_limit, see warning"


def test_cumulative_data_raises_over_limit(people):
    with pytest.raises(ValueError, match="max_rows_limit"):
        cumulative_comparisons_to_be_scored_from_blocking_rules_data(
            table_or_tables=people, blocking_rules=[block_on("city")],
            link_type="dedupe_only", max_rows_limit=3)


def test_count_comparisons_accepts_sql_string(people):
    out = count_comparisons_from_blocking_rule(
        table_or_tables=people, blocking_rule="l.city = r.city",
        link_type="dedupe_only")
    assert out[
        "number_of_comparisons_to_be_scored_post_filter_conditions"] == 4


def test_count_comparisons_link_only(people, spark):
    other = spark.createDataFrame(
        [(10, "a"), (11, "b"), (12, "c")], "unique_id int, city string")
    out = count_comparisons_from_blocking_rule(
        table_or_tables=[people, other], blocking_rule=block_on("city"),
        link_type="link_only")
    # pre-filter: sum over shared city groups of n_l * n_r = 3*1 + 2*1
    assert out["number_of_comparisons_generated_pre_filter_conditions"] == 5
    assert out[
        "number_of_comparisons_to_be_scored_post_filter_conditions"] == 5


def test_cumulative_data_and_chart(people):
    df = cumulative_comparisons_to_be_scored_from_blocking_rules_data(
        table_or_tables=people,
        blocking_rules=[block_on("city"), block_on("grp")],
        link_type="dedupe_only")
    assert list(df.columns) == ["blocking_rule", "row_count",
                                "cumulative_rows", "cartesian",
                                "match_key", "start"]
    # rule 0 (city): 4 pairs; rule 1 (grp) adds pairs not already matched:
    # grp x: (1,2) dup; grp y: (3,4),(3,5),(4,5) -> (4,5) dup -> +2; z: 0
    assert df.loc[0, "row_count"] == 4
    assert df.loc[1, "row_count"] == 2
    assert df.loc[1, "cumulative_rows"] == 6
    assert df.loc[1, "start"] == 4
    assert (df["cartesian"] == 15).all()  # C(6,2)

    spec = cumulative_comparisons_to_be_scored_from_blocking_rules_chart(
        table_or_tables=people,
        blocking_rules=[block_on("city"), block_on("grp")],
        link_type="dedupe_only")
    assert spec["mark"] == "bar"
    assert len(spec["data"]["values"]) == 2


def test_n_largest_blocks(people):
    top = n_largest_blocks(
        table_or_tables=people, blocking_rule=block_on("city"),
        link_type="dedupe_only", n_largest=1).collect()
    assert len(top) == 1
    assert top[0]["key_0"] == "a" and top[0]["comparison_count"] == 3
    with pytest.raises(ValueError, match="equi-join"):
        n_largest_blocks(
            table_or_tables=people,
            blocking_rule="substr(l.city,1,1) < substr(r.city,1,1)",
            link_type="dedupe_only")


def test_completeness_chart_multi_table(people, spark):
    other = spark.createDataFrame(
        [(10, "a"), (11, None)], "unique_id int, city string")
    spec = completeness_chart([people, other],
                              table_names_for_chart=["left", "right"])
    vals = spec["data"]["values"]
    by = {(v["source_dataset"], v["column_name"]): v["completeness"]
          for v in vals}
    assert by[("left", "city")] == pytest.approx(5 / 6)
    assert by[("right", "city")] == pytest.approx(1 / 2)
    # grp is absent from `other`: union fills nulls -> completeness 0
    assert by[("right", "grp")] == 0.0
