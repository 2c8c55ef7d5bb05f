"""SettingsCreator authoring-surface parity (reference
settings_creator.py:18-135): library-object and dict-form comparisons,
string/dict blocking rules, from_path_or_dict, and SparkLinker accepting
every settings form the reference Linker accepts (linker.py:75,143-146)."""

from __future__ import annotations

import json

import pytest

from memory_optimized_splink_spark import (
    SettingsCreator,
    SparkLinker,
    block_on,
)
from memory_optimized_splink_spark import comparison_library as cl
from memory_optimized_splink_spark.interop import settings_from_splink_json
from memory_optimized_splink_spark.model import Settings
from memory_optimized_splink_spark.settings_creator import resolve_settings

DEMO = "/root/reference/docs/demos/demo_settings/saved_model_from_demo.json"


def _creator():
    return SettingsCreator(
        link_type="dedupe_only",
        comparisons=[
            cl.exact_match("content_sha"),
            cl.jaro_winkler_at_thresholds("path", (0.94,)),
        ],
        blocking_rules_to_generate_predictions=[
            block_on("content_sha"),
            "l.repo = r.repo",
        ],
        probability_two_random_records_match=0.01,
    )


def test_to_settings_maps_fields_and_rules():
    s = _creator().to_settings()
    assert isinstance(s, Settings)
    assert s.link_type == "dedupe_only"
    assert s.probability_two_random_records_match == 0.01
    assert [c.name for c in s.comparisons] == ["content_sha", "path"]
    # the string rule is recognised as a native equi-key join
    assert s.blocking_rules[1].keys == ("repo",)
    # dedupe_only drops source_dataset (matches the importer's behavior)
    assert s.source_dataset_column_name is None


def test_dict_form_comparison_routes_through_interop():
    s = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[{
            "output_column_name": "path",
            "comparison_levels": [
                {"sql_condition": '"path_l" IS NULL OR "path_r" IS NULL',
                 "is_null_level": True},
                {"sql_condition": '"path_l" = "path_r"',
                 "m_probability": 0.9, "u_probability": 0.01},
                {"sql_condition": "ELSE",
                 "m_probability": 0.1, "u_probability": 0.99},
            ],
        }],
        blocking_rules_to_generate_predictions=["l.path = r.path"],
    ).to_settings()
    comp = s.comparisons[0]
    assert comp.name == "path"
    kinds = [lv.kind for lv in comp.levels]
    assert kinds == ["null", "exact", "else"]
    assert comp.levels[1].m == 0.9


def test_tf_adjustment_collected_from_library_objects():
    s = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[cl.exact_match("source", tf_adjustment=True)],
        blocking_rules_to_generate_predictions=[block_on("source")],
    ).to_settings()
    assert s.tf_columns == ("source",)


def test_prefix_overrides_refuse_loudly():
    c = _creator()
    c.bayes_factor_column_prefix = "bayes_"
    with pytest.raises(ValueError, match="bayes_factor_column_prefix"):
        c.to_settings()


def test_from_path_or_dict_matches_full_importer():
    via_creator = SettingsCreator.from_path_or_dict(DEMO).to_settings()
    via_interop = settings_from_splink_json(open(DEMO).read())
    assert [c.name for c in via_creator.comparisons] == \
        [c.name for c in via_interop.comparisons]
    assert via_creator.blocking_rules == via_interop.blocking_rules
    assert via_creator.probability_two_random_records_match == \
        via_interop.probability_two_random_records_match


def test_resolve_settings_accepts_all_reference_forms():
    s0 = _creator().to_settings()
    assert resolve_settings(s0) is s0
    assert isinstance(resolve_settings(_creator()), Settings)
    d = json.load(open(DEMO))
    from_dict = resolve_settings(d)
    from_path = resolve_settings(DEMO)
    assert from_dict.to_json() == from_path.to_json()
    with pytest.raises(ValueError, match="valid file"):
        resolve_settings("/no/such/model.json")
    with pytest.raises(TypeError):
        resolve_settings(42)


def test_linker_accepts_creator_and_predict_matches_settings(
        spark, repo_nodes):
    creator = _creator()
    via_creator = (
        SparkLinker(spark, repo_nodes, creator)
        .predict()
        .select("unique_id_l", "unique_id_r", "match_probability")
        .toPandas()
        .sort_values(["unique_id_l", "unique_id_r"])
        .reset_index(drop=True))
    via_settings = (
        SparkLinker(spark, repo_nodes, creator.to_settings())
        .predict()
        .select("unique_id_l", "unique_id_r", "match_probability")
        .toPandas()
        .sort_values(["unique_id_l", "unique_id_r"])
        .reset_index(drop=True))
    assert len(via_creator) > 0
    assert via_creator.equals(via_settings)


def test_retain_intermediate_calculation_columns_keeps_bf(
        spark, repo_nodes, basic_settings):
    from dataclasses import replace

    pred_default = SparkLinker(spark, repo_nodes, basic_settings).predict()
    assert not any(c.startswith("bf_") for c in pred_default.columns)

    s = replace(basic_settings,
                retain_intermediate_calculation_columns=True)
    pred_keep = SparkLinker(spark, repo_nodes, s).predict()
    bf_cols = [c for c in pred_keep.columns if c.startswith("bf_")]
    assert set(bf_cols) == {"bf_content_sha", "bf_path"}
    # values unchanged by retention
    import pyspark.sql.functions as F
    a = pred_default.agg(F.sum("match_probability")).collect()[0][0]
    b = pred_keep.agg(F.sum("match_probability")).collect()[0][0]
    assert abs(a - b) < 1e-9


def test_linker_accepts_multiple_input_tables(spark):
    """Reference Linker takes a list of tables for link jobs
    (linker.py:75): SparkLinker concatenates with a dataset tag and
    prefixes ids so datasets may share id values."""
    left = spark.createDataFrame(
        [(1, "smith", "a"), (2, "jones", "b")],
        "unique_id int, name string, blk string")
    right = spark.createDataFrame(
        [(1, "smith", "a"), (3, "taylor", "b")],  # id 1 collides
        "unique_id int, name string, blk string")
    settings = SettingsCreator(
        link_type="link_only",
        comparisons=[cl.exact_match("name")],
        blocking_rules_to_generate_predictions=[block_on("blk")],
    )
    pred = SparkLinker(spark, [left, right], settings).predict().toPandas()
    # one cross-dataset pair per blk value; no within-dataset pairs
    assert len(pred) == 2
    pairs = {tuple(sorted((r.unique_id_l, r.unique_id_r)))
             for r in pred.itertuples()}
    assert pairs == {
        ("__splink__input_table_0:1", "__splink__input_table_1:1"),
        ("__splink__input_table_0:2", "__splink__input_table_1:3")}
    by_pair = {tuple(sorted((r.unique_id_l, r.unique_id_r))):
               r.match_probability for r in pred.itertuples()}
    exact = by_pair[("__splink__input_table_0:1",
                     "__splink__input_table_1:1")]
    fuzzy = by_pair[("__splink__input_table_0:2",
                     "__splink__input_table_1:3")]
    assert exact > fuzzy  # name agrees only on the id-1 pair

    named = SparkLinker(spark, {"cust": left, "supp": right},
                        settings).predict().toPandas()
    assert {u.split(":")[0] for u in named.unique_id_l} <= {"cust", "supp"}

    with pytest.raises(ValueError, match="link_type"):
        SparkLinker(spark, [left, right], SettingsCreator(
            link_type="dedupe_only",
            comparisons=[cl.exact_match("name")],
            blocking_rules_to_generate_predictions=[block_on("blk")]))
