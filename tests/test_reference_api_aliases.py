"""PascalCase reference-API aliases (cl/cll/brl) and the pairwise
string-distance kernels: reference comparison_library.py:14-1193,
comparison_level_library.py:82-1024, blocking_rule_library.py:22-199."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import memory_optimized_splink_spark.blocking_rule_library as brl
import memory_optimized_splink_spark.comparison_level_library as cll
import memory_optimized_splink_spark.comparison_library as cl
from memory_optimized_splink_spark.functions.similarity import (
    edit_distance_np,
    jaro_winkler_np,
    pairwise_best_np,
)
from memory_optimized_splink_spark.model import ComparisonLevel, Settings


# ------------------------------------------------------------ kernels

def _brute_best(l, r, fn, reduce):
    vals = [fn(x, y) for x in l for y in r
            if x is not None and y is not None]
    return reduce(vals) if vals else float("nan")


def test_pairwise_best_matches_bruteforce():
    rng = np.random.default_rng(7)
    words = ["smith", "smyth", "jones", "jonson", "taylor", "tailor", ""]
    a1, a2 = [], []
    for _ in range(200):
        a1.append(list(rng.choice(words, rng.integers(0, 4))))
        a2.append(list(rng.choice(words, rng.integers(0, 4))))
    a1[0], a2[1] = None, None  # null sides

    got = pairwise_best_np(pd.Series(a1), pd.Series(a2), "jaro_winkler")
    jw = lambda x, y: float(jaro_winkler_np(pd.Series([x]),
                                            pd.Series([y]))[0])
    for i in range(len(a1)):
        want = (_brute_best(a1[i], a2[i], jw, max)
                if a1[i] is not None and a2[i] is not None
                else float("nan"))
        if np.isnan(want):
            assert np.isnan(got[i])
        else:
            assert got[i] == pytest.approx(want, abs=1e-12)

    got_dl = pairwise_best_np(pd.Series(a1), pd.Series(a2),
                              "damerau_levenshtein")
    dl = lambda x, y: float(edit_distance_np(pd.Series([x]), pd.Series([y]),
                                             damerau=True)[0])
    for i in range(2, 40):
        want = _brute_best(a1[i], a2[i], dl, min)
        if np.isnan(want):
            assert np.isnan(got_dl[i])
        else:
            assert got_dl[i] == want


def test_pairwise_empty_arrays_are_nan():
    got = pairwise_best_np(pd.Series([[], ["a"]]),
                           pd.Series([["b"], []]), "jaro")
    assert np.isnan(got).all()


# ------------------------------------------------- comparison aliases

def test_exact_match_and_configure():
    c = cl.ExactMatch("city").configure(
        term_frequency_adjustments=True,
        m_probabilities=[0.9, 0.1], u_probabilities=[0.02, 0.98])
    exact = c.levels[1]
    assert exact.kind == "exact" and exact.tf_adjustment
    assert exact.m == 0.9 and exact.u == 0.02
    assert c.levels[2].m == 0.1 and c.levels[2].u == 0.98
    with pytest.raises(ValueError, match="non-null levels"):
        cl.ExactMatch("x").configure(m_probabilities=[0.5])


def test_threshold_aliases_accept_scalar_or_list():
    assert [lv.kind for lv in
            cl.LevenshteinAtThresholds("name", 2).levels] == \
        ["null", "exact", "levenshtein", "else"]
    c = cl.JaroWinklerAtThresholds("name", [0.95, 0.8])
    assert [lv.threshold for lv in c.levels[2:4]] == [0.95, 0.8]


def test_pairwise_comparison_alias_kinds():
    c = cl.PairwiseStringDistanceFunctionAtThresholds(
        "aliases", "jaro_winkler", [0.9, 0.7])
    assert [lv.kind for lv in c.levels] == \
        ["null", "exact", "pairwise_jaro_winkler",
         "pairwise_jaro_winkler", "else"]
    with pytest.raises(ValueError, match="distance_function_name"):
        cl.PairwiseStringDistanceFunctionAtThresholds("a", "hamming", 1)


def test_time_difference_alias_converts_metrics():
    c = cl.AbsoluteDateDifferenceAtThresholds(
        "dob", input_is_string=False, metrics=["day", "month"],
        thresholds=[1, 3])
    diffs = [lv for lv in c.levels if lv.kind == "date_diff_seconds"]
    assert diffs[0].threshold == 86400.0
    assert diffs[1].threshold == pytest.approx(3 * 86400 * 365.25 / 12)
    with pytest.raises(ValueError, match="ascending"):
        cl.AbsoluteDateDifferenceAtThresholds(
            "dob", input_is_string=False, metrics=["year", "day"],
            thresholds=[1, 1])


def test_time_difference_alias_string_inputs():
    c = cl.AbsoluteTimeDifferenceAtThresholds(
        "ts", input_is_string=True, metrics="hour", thresholds=1)
    null_lv = c.levels[0]
    assert null_lv.kind == "null" and "try_to_timestamp" in \
        null_lv.sql_condition
    assert "<= 3600" in c.levels[2].sql_condition


def test_custom_comparison_accepts_levels_and_dicts():
    c = cl.CustomComparison(
        comparison_levels=[
            cll.NullLevel("email"),
            {"sql_condition": '"email_l" = "email_r"',
             "m_probability": 0.8, "u_probability": 0.01},
            cll.ElseLevel(),
        ],
        output_column_name="email")
    assert c.name == "email"
    assert c.levels[1].kind == "exact" and c.levels[1].m == 0.8


def test_date_of_birth_comparison_has_dl_level():
    """Reference DOB levels (comparison_library.py:784-827): null, exact,
    DL<=1 on the date string, graded date diffs, else."""
    c = cl.DateOfBirthComparison("dob", input_is_string=True)
    kinds = [lv.kind for lv in c.levels]
    assert kinds[2] == "damerau_levenshtein"  # right after exact
    assert c.levels[2].threshold == 1
    # date input: DL runs on the string CAST (rendered custom SQL)
    c2 = cl.DateOfBirthComparison("dob", input_is_string=False)
    assert c2.levels[2].kind == "custom"
    assert "CAST(dob_l AS STRING)" in c2.levels[2].sql_condition


def test_forename_surname_alias_shape():
    """Reference shape (comparison_library.py:1134-1189): And-of-nulls,
    exact-both, symmetrical columns-reversed, JW-both levels, TF'd
    surname-only / forename-only exacts, else."""
    c = cl.ForenameSurnameComparison("first", "last")
    kinds = [lv.kind for lv in c.levels]
    assert kinds[0] == "and" and c.levels[0].is_null_level
    assert kinds[2] == "columns_reversed"
    assert kinds[3] == "and"  # JW-both composed level
    assert kinds[-3:] == ["exact", "exact", "else"]
    assert c.levels[-3].tf_adjustment and c.levels[-2].tf_adjustment
    # null fires only when BOTH parts are null
    subs = [s.column for s in c.levels[0].sub_levels]
    assert subs == ["first", "last"]


# ------------------------------------------------------ level aliases

def test_level_aliases_produce_native_kinds():
    cases = [
        (cll.ExactMatchLevel("a", term_frequency_adjustments=True),
         "exact", True),
        (cll.LevenshteinLevel("a", 2), "levenshtein", False),
        (cll.DamerauLevenshteinLevel("a", 2), "damerau_levenshtein", False),
        (cll.JaroWinklerLevel("a", 0.9), "jaro_winkler", False),
        (cll.JaroLevel("a", 0.9), "jaro", False),
        (cll.JaccardLevel("a", 0.9), "jaccard_chars", False),
        (cll.CosineSimilarityLevel("a", 0.9), "cosine", False),
        (cll.ArrayIntersectLevel("a", 2), "array_intersect", False),
        (cll.ArraySubsetLevel("a"), "array_subset", False),
        (cll.PercentageDifferenceLevel("a", 0.1), "pct_diff", False),
        (cll.AbsoluteDifferenceLevel("a", 5), "abs_diff", False),
    ]
    for lv, kind, tf in cases:
        assert lv.kind == kind, lv
        assert lv.tf_adjustment == tf
    assert cll.DistanceInKMLevel("lat", "lng", 10).lat_column == "lat"
    assert cll.PairwiseStringDistanceFunctionLevel(
        "a", "jaro", 0.9).kind == "pairwise_jaro"


def test_null_level_with_valid_pattern_and_custom_level():
    lv = cll.NullLevel("postcode", valid_string_pattern=r"^[A-Z]{1,2}\d")
    assert lv.kind == "null" and "RLIKE" in lv.sql_condition
    cu = cll.CustomLevel('LENGTH("name_l") > 3')
    assert cu.kind == "custom" and "length" in cu.sql_condition.lower()


def test_columns_reversed_symmetrical():
    """Reference cll:385-388: default is ONE-directional a_l = b_r;
    symmetrical=True is the both-directions AND (the native kind)."""
    plain = cll.ColumnsReversedLevel("a", "b")
    assert plain.kind == "custom"
    assert plain.sql_condition == "a_l = b_r"
    sym = cll.ColumnsReversedLevel("a", "b", symmetrical=True)
    assert sym.kind == "columns_reversed" and sym.column2 == "b"


# ------------------------------------------------- blocking rule aliases

def test_blocking_rule_aliases():
    assert brl.ExactMatchRule("city").keys == ("city",)
    cr = brl.CustomRule("l.city = r.city AND l.dob = r.dob")
    assert cr.keys == ("city", "dob")  # recognised as native equi keys
    a = brl.And(brl.ExactMatchRule("city"), brl.ExactMatchRule("dob"))
    assert a.keys == ("city", "dob")  # still a hash join
    o = brl.Or(brl.ExactMatchRule("city"), brl.ExactMatchRule("dob"))
    assert o.keys is None and "OR" in o.sql
    n = brl.Not(brl.ExactMatchRule("city"))
    assert n.sql == "NOT (l.city = r.city)"
    with pytest.raises(ValueError, match="expression key"):
        brl.Or(brl.ExactMatchRule("city"),
               brl.CustomRule("SUBSTR(l.name,1,2) = SUBSTR(r.name,1,2)"))


# --------------------------------------------- end-to-end on Spark

def test_pairwise_jw_level_through_operator_path(spark):
    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors,
    )

    rows = [
        (1, "g", ["smith", "smythe"]), (2, "g", ["smyth"]),
        (3, "g", ["jones"]), (4, "g", None), (5, "g", []),
        (6, "g", ["taylor"]), (7, "g", ["tailor", "zzz"]),
    ]
    df = spark.createDataFrame(rows, "unique_id int, blk string, "
                                     "aliases array<string>")
    s = Settings(
        comparisons=(cl.PairwiseStringDistanceFunctionAtThresholds(
            "aliases", "jaro_winkler", 0.9),),
        blocking_rules=(brl.ExactMatchRule("blk"),),
    ).with_defaults()
    pairs = block_using_rules(df, s)
    cv = compute_comparison_vectors(pairs, df, s).toPandas().set_index(
        ["unique_id_l", "unique_id_r"])
    g = cv["gamma_aliases"]
    jw = lambda x, y: float(jaro_winkler_np(pd.Series([x]),
                                            pd.Series([y]))[0])
    assert jw("smyth", "smythe") >= 0.9
    assert g.loc[(1, 2)] == 1      # smyth~smythe above 0.9
    assert g.loc[(1, 3)] == 0      # no close pair
    assert g.loc[(1, 4)] == -1     # null side
    assert g.loc[(1, 5)] == -1 or g.loc[(1, 5)] == 0  # empty side: no pair
    assert g.loc[(6, 7)] == 1      # taylor~tailor


def test_pairwise_local_scorer_parity(spark):
    from memory_optimized_splink_spark.realtime import LocalScorer

    s = Settings(
        comparisons=(cl.PairwiseStringDistanceFunctionAtThresholds(
            "aliases", "jaro_winkler", 0.9),),
        blocking_rules=(brl.ExactMatchRule("blk"),),
    )
    scorer = LocalScorer(s)
    comp = scorer.settings.comparisons[0]
    assert scorer.gamma(comp, {"aliases": ["smythe"]},
                        {"aliases": ["smyth"]}) == 1
    assert scorer.gamma(comp, {"aliases": ["smythe"]},
                        {"aliases": ["jones"]}) == 0
    assert scorer.gamma(comp, {"aliases": None},
                        {"aliases": ["jones"]}) == -1
    assert scorer.gamma(comp, {"aliases": []},
                        {"aliases": ["jones"]}) == 0


# ------------------------------------------ ColumnExpression in creators

def test_column_expression_in_creators_matches_materialized(spark):
    """cl/cll creators accept a ColumnExpression (reference
    comparison_creator renders the expression into level SQL); gammas
    must equal running the plain creator on a pre-materialized column."""
    import pyspark.sql.functions as F

    from memory_optimized_splink_spark.functions.column_expression import (
        ColumnExpression,
    )
    from memory_optimized_splink_spark.functions.similarity import (
        register_udfs,
    )
    from memory_optimized_splink_spark.operators.blocking import (
        block_using_rules,
    )
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors,
    )

    register_udfs(spark)
    rows = [(1, "k", "John.Smith@x.com"), (2, "k", "john.smith@y.org"),
            (3, "k", "JANE.DOE@x.com"), (4, "k", None),
            (5, "k", "jon.smith@z.net")]
    df = spark.createDataFrame(rows, "unique_id int, k string, email string")

    ce = ColumnExpression("email").lower().regex_extract(r"^[^@]+", 0)
    assert ce.output_column_name == "email_lower_regex_extract"
    assert ce.sql_expression("email_l") == \
        "regexp_extract(lower(email_l), '^[^@]+', 0)"

    def gammas(settings, nodes):
        s = Settings(comparisons=(settings,), blocking_rules=(
            __import__("memory_optimized_splink_spark.model",
                       fromlist=["block_on"]).block_on("k"),))
        pairs = block_using_rules(nodes, s)
        cv = compute_comparison_vectors(pairs, nodes, s)
        gcol = f"gamma_{settings.name}"
        return (cv.select("unique_id_l", "unique_id_r",
                          F.col(gcol).alias("g"))
                .toPandas().set_index(["unique_id_l", "unique_id_r"])["g"]
                .sort_index())

    got = gammas(cl.JaroWinklerAtThresholds(ce, [0.95]), df)
    materialized = df.withColumn("username", ce.to_column())
    want = gammas(cl.JaroWinklerAtThresholds("username", [0.95]),
                  materialized)
    assert list(got.values) == list(want.values)
    # null email -> null level fires on the expression too
    assert got.loc[(1, 4)] == -1


def test_column_expression_exact_match_creator(spark):
    from memory_optimized_splink_spark.functions.column_expression import (
        ColumnExpression,
    )

    ce = ColumnExpression("email").lower()
    c = cl.ExactMatch(ce)
    assert c.name == "email_lower" and c.column == "email"
    assert c.levels[1].kind == "custom"
    assert c.levels[1].sql_condition == "(lower(email_l)) = (lower(email_r))"
    with pytest.raises(ValueError, match="raw column"):
        import memory_optimized_splink_spark.comparison_level_library as _cll
        _cll.ExactMatchLevel(ce, term_frequency_adjustments=True)


def test_pairwise_budget_slicing_preserves_results(monkeypatch):
    """Cross-products bigger than the flat budget split across kernel
    flushes (bounded peak memory at any array width); per-row bests must
    merge across flush boundaries exactly."""
    import memory_optimized_splink_spark.functions.similarity as sim

    rng = np.random.default_rng(11)
    words = ["smith", "smyth", "jones", "jonson", "taylor"]
    a1 = [list(rng.choice(words, rng.integers(1, 6))) for _ in range(60)]
    a2 = [list(rng.choice(words, rng.integers(1, 6))) for _ in range(60)]
    want = sim.pairwise_best_np(pd.Series(a1), pd.Series(a2),
                                "jaro_winkler")
    monkeypatch.setattr(sim, "_PAIRWISE_FLAT_BUDGET", 7)  # force splits
    got = sim.pairwise_best_np(pd.Series(a1), pd.Series(a2),
                               "jaro_winkler")
    assert np.allclose(got, want, equal_nan=True)

    want_dl = sim.pairwise_best_np(pd.Series(a1), pd.Series(a2),
                                   "damerau_levenshtein")
    monkeypatch.setattr(sim, "_PAIRWISE_FLAT_BUDGET", 3)
    got_dl = sim.pairwise_best_np(pd.Series(a1), pd.Series(a2),
                                  "damerau_levenshtein")
    assert np.allclose(got_dl, want_dl, equal_nan=True)


def test_composite_oracle_queries_exercise_every_level(spark):
    """The composite EQ queries must keep all gamma levels non-vacuous —
    a hash match over a ladder that never fires is no evidence (these
    comparisons were review-fixed this round)."""
    import memory_optimized_splink_spark.entry_queries as eq

    df = eq.QUERIES["email_dob_vectors"](
        spark, "/root/testdata/sf0.001").cache()
    dob = {r[0] for r in df.select("gamma_dob").distinct().collect()}
    email = {r[0] for r in df.select("gamma_email").distinct().collect()}
    assert dob == {-1, 0, 1, 2, 3, 4, 5}
    assert email == {-1, 0, 1, 2, 3, 4}

    fs = eq.QUERIES["forename_surname_vectors"](
        spark, "/root/testdata/sf0.001")
    got = {r[0] for r in
           fs.select("gamma_forename_surname").distinct().collect()}
    assert got == {-1, 0, 1, 2, 3, 4, 5, 6}
