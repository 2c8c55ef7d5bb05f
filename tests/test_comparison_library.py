"""Composite comparisons, extra level kinds, link_only blocking,
ColumnExpression chain."""

from __future__ import annotations

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark import comparison_library as cl
from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
)
from memory_optimized_splink_spark.operators.vectors import (
    compute_comparison_vectors, gamma_column, with_comparison_metrics,
)


def _gammas(spark, comp, rows, schema):
    df = spark.createDataFrame(
        [(str(i), *vals) for i, (*vals, _) in enumerate(rows)],
        f"pair_id string, {schema}")
    df = with_comparison_metrics(df, Settings(
        comparisons=(comp,), blocking_rules=(block_on("x"),)))
    got = {r["pair_id"]: r[comp.gamma_column]
           for r in df.select("pair_id", gamma_column(comp)).collect()}
    return [got[str(i)] for i in range(len(rows))]


def test_columns_reversed_level(spark):
    comp = Comparison("names", "fn", (
        ComparisonLevel("null"),
        ComparisonLevel("custom", sql_condition="fn_l = fn_r AND sn_l = sn_r"),
        ComparisonLevel("columns_reversed", column="fn", column2="sn"),
        ComparisonLevel("else"),
    ))
    rows = [
        ("john", "smith", "john", "smith", 2),
        ("john", "smith", "smith", "john", 1),
        ("john", "smith", "mary", "jones", 0),
        (None, "x", "y", "z", -1),
    ]
    df_rows = [(a, c, b, d, g) for a, b, c, d, g in rows]  # interleave l/r
    got = _gammas(spark, comp,
                  [(a, b, c, d, g) for a, b, c, d, g in rows],
                  "fn_l string, fn_r string, sn_l string, sn_r string")
    # careful: row tuples are (fn_l, fn_r, sn_l, sn_r)
    expected = [2, 1, 0, -1]
    fixed_rows = [
        ("john", "john", "smith", "smith", 2),
        ("john", "smith", "smith", "john", 1),
        ("john", "mary", "smith", "jones", 0),
        (None, "y", "x", "z", -1),
    ]
    got = _gammas(spark, comp, fixed_rows,
                  "fn_l string, fn_r string, sn_l string, sn_r string")
    assert got == expected


def test_distance_in_km_level(spark):
    comp = cl.distance_in_km_at_thresholds("lat", "lng", (10, 500))
    # London (51.5,-0.12) vs London-ish (51.51,-0.13): ~1.3km; vs Paris ~344km
    rows = [
        (51.5, 51.51, -0.12, -0.13, 2),
        (51.5, 48.86, -0.12, 2.35, 1),
        (51.5, -33.87, -0.12, 151.2, 0),  # Sydney
        (None, 1.0, 1.0, 1.0, -1),
    ]
    got = _gammas(spark, comp, rows,
                  "lat_l double, lat_r double, lng_l double, lng_r double")
    assert got == [g for *_, g in rows]


def test_pairwise_levenshtein_level(spark):
    comp = Comparison("toks", "toks", (
        ComparisonLevel("null"),
        ComparisonLevel("pairwise_levenshtein", threshold=1),
        ComparisonLevel("else"),
    ))
    rows = [
        (["alpha", "beta"], ["betta", "zzz"], 1),   # beta~betta = 1
        (["alpha"], ["zzzzz"], 0),
        (None, ["x"], -1),
    ]
    got = _gammas(spark, comp, rows,
                  "toks_l array<string>, toks_r array<string>")
    assert got == [g for *_, g in rows]


def test_email_and_name_comparisons(spark):
    from memory_optimized_splink_spark.functions.similarity import register_udfs
    register_udfs(spark)
    email = cl.email_comparison("email")
    rows = [
        ("a@x.com", "a@x.com", 4),
        ("a@x.com", "a@y.com", 3),   # same username
        ("john.smith@x.com", "john.smyth@y.com", 2),  # full jw .95
        # username jw .9733 >= .88 while full jw .8469 < .88
        ("catherine.jones@aa.com",
         "catherine.jomes@wholly-unrelated-domain-inc.org", 1),
        ("a@x.com", "qqqqqqq@x.com", 0),  # same domain is NOT a level
        ("a@x.com", "zz@qq.org", 0),
        (None, "a@x.com", -1),
    ]
    got = _gammas(spark, email, rows, "email_l string, email_r string")
    assert got == [g for *_, g in rows]

    name = cl.name_comparison("nm")
    rows2 = [("robert", "robert", 4), ("robert", "roberto", None),
             ("robert", "zzz", 0)]
    got2 = _gammas(spark, name, [(a, b, None) for a, b, _ in rows2],
                   "nm_l string, nm_r string")
    assert got2[0] == 4 and got2[1] in (2, 3) and got2[2] == 0


def test_forename_surname_reversed(spark):
    from memory_optimized_splink_spark.functions.similarity import register_udfs
    register_udfs(spark)
    comp = cl.forename_surname_comparison("fn", "sn")
    rows = [
        ("john", "john", "smith", "smith", 5),
        ("john", "smith", "smith", "john", 4),  # reversed
        ("zzz", "qqq", "smith", "smith", 2),    # surname only
    ]
    got = _gammas(spark, comp, rows,
                  "fn_l string, fn_r string, sn_l string, sn_r string")
    assert got == [g for *_, g in rows]


def test_postcode_comparison(spark):
    comp = cl.postcode_comparison("pc")
    rows = [
        ("SW1A 1AA", "SW1A 1AA", 4),
        ("SW1A 1AA", "SW1A 2BB", 3),  # same sector SW1A 1 vs 2? sector=SW1A 1
        ("SW1A 1AA", "SW2B 9ZZ", 1),  # same area SW
        ("SW1A 1AA", "N1 9GU", 0),
        (None, "N1 9GU", -1),
    ]
    got = _gammas(spark, comp, rows, "pc_l string, pc_r string")
    assert got[0] == 4 and got[3] == 0 and got[4] == -1
    assert got[1] in (2, 3)
    assert got[2] in (1,)


def test_link_only_blocking(spark):
    nodes = spark.createDataFrame(
        [("1", "k", "ds_a"), ("2", "k", "ds_a"), ("3", "k", "ds_b")],
        "unique_id string, key string, source_dataset string")
    s = Settings(
        comparisons=(cl.exact_match("key"),),
        blocking_rules=(block_on("key"),),
        link_type="link_only",
        source_dataset_column_name="source_dataset",
    )
    from memory_optimized_splink_spark.operators.blocking import block_using_rules
    pairs = {(r["unique_id_l"], r["unique_id_r"])
             for r in block_using_rules(nodes, s).collect()}
    assert pairs == {("1", "3"), ("2", "3")}  # no intra-dataset pair (1,2)


def test_column_expression_chain(spark):
    from memory_optimized_splink_spark.functions.column_expression import (
        ColumnExpression,
    )

    df = spark.createDataFrame(
        [("JOHN.SMITH@X.COM", ["zeta", "alpha"])], "email string, arr array<string>")
    ce = ColumnExpression("email").lower().regex_extract(r"@(.+)$", 1)
    assert df.select(ce.to_column().alias("v")).collect()[0]["v"] == "x.com"
    first = ColumnExpression("arr").access_extreme_array_element(first=True)
    assert df.select(first.to_column().alias("v")).collect()[0]["v"] == "alpha"
