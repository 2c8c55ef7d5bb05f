"""Reference-format settings import: load the reference's own saved
model.json (docs/demos/demo_settings/saved_model_from_demo.json — a trained
DuckDB model over the fake_1000 demo dataset) and reproduce its predict()
probabilities with this engine against an independent DuckDB oracle that
evaluates the JSON's own sql_conditions + Fellegi-Sunter math in
pandas/DuckDB."""

from __future__ import annotations

import json
import math
import re

import duckdb
import pandas as pd
import pytest

from memory_optimized_splink_spark.interop import (
    UnsupportedSettingsError,
    settings_from_splink_dict,
    settings_from_splink_json,
    settings_to_splink_dict,
)

DEMO = "/root/reference/docs/demos/demo_settings/saved_model_from_demo.json"
H50K = "/root/reference/docs/demos/demo_settings/model_h50k.json"
DATA = "/root/reference/tests/datasets"


@pytest.fixture(scope="module")
def demo_model() -> dict:
    with open(DEMO) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fake_1000_pdf() -> pd.DataFrame:
    return pd.read_csv(f"{DATA}/fake_1000_from_splink_demos.csv").astype(
        {"unique_id": "int64", "cluster": "int64"})


def test_demo_model_parses_to_native_kinds(demo_model):
    s = settings_from_splink_dict(demo_model)
    assert s.link_type == "dedupe_only"
    assert s.unique_id_column_name == "unique_id"
    assert s.probability_two_random_records_match == pytest.approx(
        demo_model["probability_two_random_records_match"])
    assert [tuple(r.keys) for r in s.blocking_rules] == [
        ("first_name", "city"), ("surname",)]
    by_name = {c.name: c for c in s.comparisons}
    assert set(by_name) == {"first_name", "surname", "dob", "city", "email"}
    fn = by_name["first_name"]
    kinds = [lv.kind for lv in fn.levels]
    assert kinds == ["null", "exact", "jaro_winkler", "jaro_winkler",
                     "jaro_winkler", "else"]
    assert fn.levels[2].threshold == 0.92
    assert fn.levels[1].tf_adjustment and fn.column == "first_name"
    # trained m/u carried through verbatim
    assert fn.levels[1].m == pytest.approx(
        demo_model["comparisons"][0]["comparison_levels"][1]["m_probability"])
    # the email username level is an expression -> custom, translated SQL
    email = by_name["email"]
    custom = [lv for lv in email.levels if lv.kind == "custom"]
    # username equality + JW over the username EXPRESSION (stays custom:
    # only whole-column comparator calls map to native kinds)
    assert len(custom) == 2
    assert "regexp_extract(email_l" in custom[0].sql_condition
    assert custom[1].sql_condition.startswith("jaro_winkler(")
    assert all('"' not in lv.sql_condition for lv in custom)
    # TF columns collected from tf_adjustment_column (quoted in the file)
    assert "email" in s.tf_columns


def _requalify(sql: str) -> str:
    """JSON sql_condition ("col_l" op "col_r") -> duckdb over aliases l/r.
    Older demo files (real_time_settings.json) use UNQUOTED identifiers —
    handle both (the quoted pass runs first, so its output, which keeps the
    column quoted without the _l/_r suffix, is not re-matched)."""
    sql = re.sub(r'"([A-Za-z_][A-Za-z0-9_]*)_l"', r'l."\1"', sql)
    sql = re.sub(r'"([A-Za-z_][A-Za-z0-9_]*)_r"', r'r."\1"', sql)
    sql = re.sub(r'\b([A-Za-z_][A-Za-z0-9_]*)_l\b', r'l."\1"', sql)
    return re.sub(r'\b([A-Za-z_][A-Za-z0-9_]*)_r\b', r'r."\1"', sql)


def _oracle_predict(pdf: pd.DataFrame, model: dict) -> pd.DataFrame:
    """Independent predict: DuckDB evaluates the model's own (duckdb-
    dialect) sql_conditions for blocking + gammas; pandas does the FS math
    from the JSON's m/u + the fork's N/tf exact-level TF adjustment."""
    con = duckdb.connect()
    con.register("df", pdf)
    rules = [_requalify_rule(b["blocking_rule"] if isinstance(b, dict)
                             else b)
             for b in model["blocking_rules_to_generate_predictions"]]
    gamma_cases, tf_info = [], {}
    for comp in model["comparisons"]:
        name = comp["output_column_name"]
        levels = comp["comparison_levels"]
        nulls = [lv for lv in levels if lv.get("is_null_level")]
        graded = [lv for lv in levels if not lv.get("is_null_level")]
        n = len(graded)
        case = "CASE"
        for lv in nulls:
            case += f" WHEN {_requalify(lv['sql_condition'])} THEN -1"
        for i, lv in enumerate(graded):
            if lv["sql_condition"].strip().upper() == "ELSE":
                continue
            case += f" WHEN {_requalify(lv['sql_condition'])} THEN {n-1-i}"
        gamma_cases.append(case + f" ELSE 0 END AS gamma_{name}")
        for i, lv in enumerate(graded):
            if lv.get("tf_adjustment_column"):
                col = lv["tf_adjustment_column"].strip('"')
                tf_info[name] = (n - 1 - i, col)
    pairs = con.execute(f"""
        SELECT least(l.unique_id, r.unique_id) uid_l,
               greatest(l.unique_id, r.unique_id) uid_r,
               {', '.join(gamma_cases)},
               {', '.join(f'l."{c}" AS val_{c}' for _, c in tf_info.values())}
        FROM df l JOIN df r
          ON l.unique_id < r.unique_id AND (({') OR ('.join(rules)}))
    """).fetchdf()

    lam = model["probability_two_random_records_match"]
    bf = {}
    for comp in model["comparisons"]:
        name = comp["output_column_name"]
        graded = [lv for lv in comp["comparison_levels"]
                  if not lv.get("is_null_level")]
        n = len(graded)
        # the demo file ships ONE untrained m (email JW-over-username
        # level); the engine fills Comparison.with_defaults() semantics
        # (m = 0.05/(n-1) for non-top levels) — mirror that here
        bf[name] = {
            n - 1 - i:
                lv.get("m_probability",
                       0.95 if i == 0 else 0.05 / max(n - 1, 1))
                / lv["u_probability"]
            for i, lv in enumerate(graded)}
    counts = {c: pdf[c].value_counts() for _, c in tf_info.values()}
    n_nonnull = {c: int(pdf[c].notna().sum()) for _, c in tf_info.values()}

    probs = []
    for row in pairs.itertuples(index=False):
        total = lam / (1 - lam)
        for name, gmap in bf.items():
            g = getattr(row, f"gamma_{name}")
            if g >= 0:
                total *= gmap[g]
            if name in tf_info:
                g_tf, col = tf_info[name]
                if g == g_tf:
                    total *= n_nonnull[col] / counts[col][
                        getattr(row, f"val_{col}")]
        probs.append(total / (1 + total))
    pairs["match_probability"] = probs
    return pairs[["uid_l", "uid_r", "match_probability"]]


def _requalify_rule(sql: str) -> str:
    return sql  # already over aliases l/r with quoted identifiers


def test_demo_model_predict_matches_duckdb_oracle(
        spark, demo_model, fake_1000_pdf):
    """Full predict on fake_1000 through the IMPORTED settings must equal
    the independent DuckDB/pandas oracle computed from the JSON itself."""
    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.linker import SparkLinker

    s = settings_from_splink_dict(demo_model)
    sdf = spark.createDataFrame(fake_1000_pdf)
    pred = SparkLinker(spark, sdf, s).predict().select(
        F.least("unique_id_l", "unique_id_r").alias("uid_l"),
        F.greatest("unique_id_l", "unique_id_r").alias("uid_r"),
        "match_probability").toPandas()
    oracle = _oracle_predict(fake_1000_pdf, demo_model)
    merged = pred.merge(oracle, on=["uid_l", "uid_r"],
                        suffixes=("_spark", "_oracle"), how="outer",
                        indicator=True)
    assert (merged["_merge"] == "both").all(), \
        merged[merged._merge != "both"].head()
    diff = (merged.match_probability_spark
            - merged.match_probability_oracle).abs().max()
    assert len(merged) > 1000 and diff < 1e-9, diff


def test_h50k_model_imports_and_translates(spark):
    """model_h50k.json exercises the expression surface: strptime date
    levels (duckdb try_strptime/EPOCH -> Spark try_to_timestamp/
    unix_timestamp with %-format conversion), postcode regex levels,
    damerau_levenshtein, and SUBSTR-expression blocking rules. Import must
    succeed, expression rules must become equi KEYS (hash-joinable), and
    every translated condition must evaluate in Spark SQL."""
    from pyspark.sql import functions as F

    with open(H50K) as f:
        model = json.load(f)
    s = settings_from_splink_dict(model)
    assert {c.name for c in s.comparisons} == {
        "first_name", "surname", "dob", "postcode_fake", "birth_place",
        "occupation"}
    # every blocking rule in this model is an equi conjunction (incl. the
    # SUBSTR prefix rules) -> keys, never theta SQL
    assert all(r.keys for r in s.blocking_rules)
    assert ("substr(first_name, 1, 3)", "substr(surname, 1, 4)") in [
        tuple(r.keys) for r in s.blocking_rules]
    dob = next(c for c in s.comparisons if c.name == "dob")
    assert dob.levels[0].kind == "null" and dob.levels[0].sql_condition
    assert "try_to_timestamp" in dob.levels[0].sql_condition
    assert "yyyy-MM-dd" in dob.levels[0].sql_condition
    assert dob.levels[2].kind == "damerau_levenshtein"
    assert dob.levels[2].threshold == 1

    # translated null/custom conditions evaluate in Spark and give the
    # expected truth values on a crafted pair
    pair = spark.createDataFrame(
        [("1990-01-02", "1990-01-15", "SW1A 1AA", "SW1B 2BB"),
         ("not-a-date", "1990-01-02", None, "SW1A 1AA")],
        "dob_l string, dob_r string, postcode_fake_l string, "
        "postcode_fake_r string")
    null_cond, within_month = dob.levels[0], dob.levels[3]
    assert within_month.kind == "custom"
    pc = next(c for c in s.comparisons if c.name == "postcode_fake")
    area_level = pc.levels[4]  # ^[A-Za-z]{1,2} prefix equality
    assert area_level.kind == "custom"
    got = pair.select(
        F.expr(null_cond.sql_condition).alias("is_null"),
        F.expr(within_month.sql_condition).alias("month"),
        F.expr(area_level.sql_condition).alias("area"),
    ).collect()
    assert [r["is_null"] for r in got] == [False, True]
    assert got[0]["month"] is True      # 13 days < 1 month
    assert got[0]["area"] is True       # SW == SW


def test_round_trip_export_import():
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    s = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.8, u=0.01, tf_adjustment=True),
                ComparisonLevel("jaro_winkler", threshold=0.9, m=0.1,
                                u=0.05),
                ComparisonLevel("else", m=0.1, u=0.94))),
            Comparison("age", "age", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.1),
                ComparisonLevel("else", m=0.1, u=0.9))),
        ),
        blocking_rules=(block_on("name"), block_on("name", "age")),
        probability_two_random_records_match=0.01,
        tf_columns=("name",),
    )
    d = settings_to_splink_dict(s)
    s2 = settings_from_splink_dict(d)
    assert [c.name for c in s2.comparisons] == ["name", "age"]
    assert [[lv.kind for lv in c.levels] for c in s2.comparisons] == \
        [["null", "exact", "jaro_winkler", "else"],
         ["null", "exact", "else"]]
    assert s2.comparisons[0].levels[1].tf_adjustment
    assert s2.comparisons[0].levels[2].threshold == 0.9
    assert s2.comparisons[0].levels[2].m == 0.1
    assert [tuple(r.keys) for r in s2.blocking_rules] == \
        [("name",), ("name", "age")]
    assert s2.tf_columns == ("name",)


def test_unsupported_function_refuses_loudly():
    model = {
        "sql_dialect": "duckdb",
        "comparisons": [{
            "output_column_name": "name",
            "comparison_levels": [
                {"sql_condition": '"name_l" IS NULL OR "name_r" IS NULL',
                 "is_null_level": True},
                {"sql_condition":
                 'dmetaphone_madeup("name_l") = dmetaphone_madeup("name_r")'},
                {"sql_condition": "ELSE"},
            ]}],
        "blocking_rules_to_generate_predictions": [],
    }
    with pytest.raises(UnsupportedSettingsError, match="dmetaphone_madeup"):
        settings_from_splink_dict(model)


def test_unsupported_options_refuse_loudly():
    lv = {"sql_condition": '"a_l" = "a_r"', "tf_modifier_custom_sql": "x"}
    model = {"comparisons": [{"output_column_name": "a",
                              "comparison_levels": [lv]}]}
    with pytest.raises(UnsupportedSettingsError, match="tf_modifier"):
        settings_from_splink_dict(model)


def test_settings_from_splink_json_string(demo_model):
    s = settings_from_splink_json(json.dumps(demo_model))
    assert len(s.comparisons) == 5


RT = "/root/reference/docs/demos/demo_settings/real_time_settings.json"


def test_real_time_settings_predict_matches_duckdb_oracle(
        spark, fake_1000_pdf):
    """Second real reference model (real_time_settings.json — the older
    demo format: UNQUOTED identifiers, plain-string blocking rules,
    levenshtein levels): import must map to native kinds and full predict
    on fake_1000 must equal the independent DuckDB oracle evaluating the
    JSON's own sql_conditions."""
    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.linker import SparkLinker

    with open(RT) as f:
        model = json.load(f)
    s = settings_from_splink_dict(model)
    by_name = {c.name: c for c in s.comparisons}
    assert set(by_name) == {"first_name", "surname", "dob", "city", "email"}
    assert [lv.kind for lv in by_name["first_name"].levels] == \
        ["null", "exact", "levenshtein", "else"]
    assert by_name["first_name"].levels[2].threshold == 2
    assert by_name["first_name"].levels[1].tf_adjustment
    assert [tuple(r.keys) for r in s.blocking_rules] == \
        [("surname",), ("first_name",)]

    sdf = spark.createDataFrame(fake_1000_pdf)
    pred = SparkLinker(spark, sdf, s).predict().select(
        F.least("unique_id_l", "unique_id_r").alias("uid_l"),
        F.greatest("unique_id_l", "unique_id_r").alias("uid_r"),
        "match_probability").toPandas()
    oracle = _oracle_predict(fake_1000_pdf, model)
    merged = pred.merge(oracle, on=["uid_l", "uid_r"],
                        suffixes=("_spark", "_oracle"), how="outer",
                        indicator=True)
    assert (merged["_merge"] == "both").all(), \
        merged[merged._merge != "both"].head()
    diff = (merged.match_probability_spark
            - merged.match_probability_oracle).abs().max()
    assert len(merged) > 1000 and diff < 1e-9, diff


def _h50k_pdf(n_entities: int = 120) -> pd.DataFrame:
    """Deterministic synthetic data in the h50k model's column shape
    (historical-records style: first_name/surname/dob/postcode_fake/
    birth_place/occupation), with within-entity perturbations chosen to
    fire every level type the model has: JW bands, Damerau-Levenshtein,
    month/year/decade date differences, postcode sector/district/area
    regex levels, and nulls."""
    import random

    rng = random.Random(20260817)
    first = ["john", "mary", "peter", "susan", "george", "emma", "harry",
             "alice", "thomas", "sarah"]
    last = ["smith", "jones", "taylor", "brown", "wilson", "evans",
            "thomas", "roberts"]
    places = ["london", "leeds", "york", "bath", "hull", None]
    occs = ["baker", "smith", "clerk", "farmer", "weaver", None]
    rows = []
    uid = 0
    for _ in range(n_entities):
        fn, sn = rng.choice(first), rng.choice(last)
        dob = (f"{1850 + rng.randrange(60):04d}-"
               f"{1 + rng.randrange(12):02d}-{1 + rng.randrange(28):02d}")
        pc = (f"{rng.choice(['SW', 'N', 'E', 'LS', 'YO'])}"
              f"{rng.randrange(1, 10)}{rng.choice(['A', ''])} "
              f"{rng.randrange(10)}{rng.choice('AB')}{rng.choice('CD')}")
        bp, oc = rng.choice(places), rng.choice(occs)
        for j in range(rng.randrange(1, 5)):
            r = dict(unique_id=uid, first_name=fn, surname=sn, dob=dob,
                     postcode_fake=pc, birth_place=bp, occupation=oc)
            uid += 1
            if j:
                which = rng.randrange(6)
                if which == 0:      # JW-band typo
                    r["first_name"] = fn[:-1] + rng.choice("aeiou")
                elif which == 1:    # DL<=1 digit swap in day
                    d = list(dob)
                    d[9] = str((int(dob[9]) + 1) % 10)
                    r["dob"] = "".join(d)
                elif which == 2:    # month/year/decade date difference
                    r["dob"] = (f"{int(dob[:4]) + rng.choice([0, 1, 9])}-"
                                f"{1 + rng.randrange(12):02d}-15")
                elif which == 3:    # postcode unit/sector drift
                    r["postcode_fake"] = pc[:-1] + rng.choice("XYZ")
                elif which == 4:
                    r["dob"] = None
            rows.append(r)
    return pd.DataFrame(rows).astype({"unique_id": "int64"})


def test_h50k_predict_matches_duckdb_oracle(spark):
    """Third real reference model with full predict parity: model_h50k.json
    (strptime date-difference customs, postcode regex levels,
    damerau_levenshtein, JW bands, SUBSTR blocking) on deterministic
    synthetic data of its column shape. The oracle runs the JSON's own
    duckdb-dialect sql_conditions verbatim, so parity proves the
    duckdb->Spark translation end to end."""
    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.linker import SparkLinker

    with open(H50K) as f:
        model = json.load(f)
    s = settings_from_splink_dict(model)
    pdf = _h50k_pdf()
    sdf = spark.createDataFrame(pdf)
    pred = SparkLinker(spark, sdf, s).predict().select(
        F.least("unique_id_l", "unique_id_r").alias("uid_l"),
        F.greatest("unique_id_l", "unique_id_r").alias("uid_r"),
        "match_probability").toPandas()
    oracle = _oracle_predict(pdf, model)
    merged = pred.merge(oracle, on=["uid_l", "uid_r"],
                        suffixes=("_spark", "_oracle"), how="outer",
                        indicator=True)
    assert (merged["_merge"] == "both").all(), \
        merged[merged._merge != "both"].head()
    # every gamma level type must actually fire somewhere in the test set
    diff = (merged.match_probability_spark
            - merged.match_probability_oracle).abs().max()
    assert len(merged) > 500 and diff < 1e-9, (len(merged), diff)


def test_export_validates_against_reference_jsonschema():
    """settings_to_splink_dict output must validate against the
    reference's OWN published settings schema
    (splink/internals/files/settings_jsonschema.json —
    additionalProperties=false, typed fields): both a natively-built
    Settings and the round-trip of every demo model. This is the export
    side of interop completeness — a dict we emit is loadable by the
    reference."""
    import jsonschema

    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    schema = json.load(open(
        "/root/reference/splink/internals/files/settings_jsonschema.json"))
    validator = jsonschema.Draft7Validator(schema)

    s = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.8, u=0.01, tf_adjustment=True),
                ComparisonLevel("jaro_winkler", threshold=0.9, m=0.1,
                                u=0.05),
                ComparisonLevel("else", m=0.1, u=0.94))),
        ),
        blocking_rules=(block_on("name"),),
        probability_two_random_records_match=0.01,
        tf_columns=("name",),
    )
    errs = list(validator.iter_errors(settings_to_splink_dict(s)))
    assert not errs, [e.message for e in errs[:5]]

    for path in (DEMO, H50K, RT):
        with open(path) as f:
            model = json.load(f)
        rt = settings_to_splink_dict(settings_from_splink_dict(model))
        errs = list(validator.iter_errors(rt))
        assert not errs, (path, [e.message for e in errs[:5]])


def test_pairwise_levels_roundtrip_reference_format():
    """Pairwise string-distance levels export in the reference's own
    emitted SQL shape (comparison_level_library.py:598-692) and re-import
    to the native kinds."""
    import json

    from memory_optimized_splink_spark.interop import (
        settings_from_splink_json, settings_to_splink_dict,
    )
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    s = Settings(
        comparisons=(Comparison("aliases", "aliases", (
            ComparisonLevel("null"),
            ComparisonLevel("pairwise_jaro_winkler", threshold=0.9,
                            m=0.8, u=0.01),
            ComparisonLevel("pairwise_damerau_levenshtein", threshold=2,
                            m=0.5, u=0.05),
            ComparisonLevel("else", m=0.1, u=0.9),
        )),),
        blocking_rules=(block_on("blk"),),
    )
    d = settings_to_splink_dict(s)
    lvls = d["comparisons"][0]["comparison_levels"]
    assert "list_max(list_transform(flatten" in lvls[1]["sql_condition"]
    assert "jaro_winkler_similarity(pair[1], pair[2]))) >= 0.9" in \
        lvls[1]["sql_condition"]
    back = settings_from_splink_json(json.dumps(d))
    kinds = [lv.kind for lv in back.comparisons[0].levels]
    assert kinds == ["null", "pairwise_jaro_winkler",
                     "pairwise_damerau_levenshtein", "else"]
    assert back.comparisons[0].levels[1].threshold == 0.9
    assert back.comparisons[0].levels[1].m == 0.8


def test_pairwise_import_reference_emitted_whitespace():
    """The reference emits the pairwise SQL as a multiline f-string with
    heavy indentation (comparison_level_library.py:640-670) — import must
    recognise it regardless of whitespace, for both 1-based (duckdb) and
    0-based (spark) pair indexing and dialect function names."""
    from memory_optimized_splink_spark.interop import _parse_level

    duck_sql = """list_min(
                    list_transform(
                        flatten(
                            list_transform(
                                "aliases_l",
                                x -> list_transform(
                                    "aliases_r",
                                    y -> [x, y]
                                )
                            )
                        ),
                        pair -> levenshtein(
                            pair[1],
                            pair[2]
                        )
                    )
                ) <= 2"""
    lv = _parse_level({"sql_condition": duck_sql}, "duckdb")
    assert lv.kind == "pairwise_levenshtein"
    assert lv.column == "aliases" and lv.threshold == 2.0

    spark_sql = ("array_min(transform(flatten(transform(aliases_l, "
                 "x -> transform(aliases_r, y -> [x, y]))), "
                 "pair -> jaro_winkler(pair[0], pair[1]))) >= 0.88")
    lv = _parse_level({"sql_condition": spark_sql}, "spark")
    assert lv.kind == "pairwise_jaro_winkler" and lv.threshold == 0.88
