"""Blocking semantics: pair dedupe across rules, uid ordering, hot-key
salting equivalence (the reference's salted-vs-unsalted invariant,
/root/reference/tests/test_salting_len.py:10-55)."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from memory_optimized_splink_spark.model import BlockingRule, Settings, block_on
from memory_optimized_splink_spark.operators.blocking import (
    block_using_rules,
    cartesian_pairs,
    n_largest_blocks,
)


def _pair_set(df):
    return {(r["unique_id_l"], r["unique_id_r"], r["match_key"])
            for r in df.collect()}


def _ids_only(pairs):
    return {(a, b) for a, b, _ in pairs}


def test_pairs_unique_and_ordered(repo_nodes, basic_settings):
    pairs = block_using_rules(repo_nodes, basic_settings)
    rows = pairs.collect()
    seen = set()
    for r in rows:
        assert r["unique_id_l"] < r["unique_id_r"]
        key = (r["unique_id_l"], r["unique_id_r"])
        assert key not in seen, "pair emitted by more than one rule"
        seen.add(key)


def test_multi_rule_equals_union_of_single_rules(repo_nodes, basic_settings):
    multi = _ids_only(_pair_set(block_using_rules(repo_nodes, basic_settings)))
    singles = set()
    for rule in basic_settings.blocking_rules:
        s = replace(basic_settings, blocking_rules=(replace(rule, hot_key_threshold=None),))
        singles |= _ids_only(_pair_set(block_using_rules(repo_nodes, s)))
    assert multi == singles


def test_salted_equals_unsalted(repo_nodes, basic_settings):
    """Hot-key splitting is a pure parallelism transform: identical pair set."""
    rule = block_on("repo")
    salted = replace(rule, hot_key_threshold=10, salting_partitions=4)
    s_plain = replace(basic_settings, blocking_rules=(rule,))
    s_salt = replace(basic_settings, blocking_rules=(salted,))
    p1 = _pair_set(block_using_rules(repo_nodes, s_plain))
    p2 = _pair_set(block_using_rules(repo_nodes, s_salt))
    assert p1 == p2


def test_static_salting_equals_unsalted(repo_nodes, basic_settings):
    """salting_partitions WITHOUT hot_key_threshold must salt statically
    (reference blocking.py:340-401 semantics) — it was silently ignored
    before; the pair set is identical either way."""
    rule = block_on("repo")
    s_plain = replace(basic_settings, blocking_rules=(rule,))
    s_salt = replace(basic_settings, blocking_rules=(
        replace(rule, salting_partitions=4),))
    p1 = _pair_set(block_using_rules(repo_nodes, s_plain))
    p2 = _pair_set(block_using_rules(repo_nodes, s_salt))
    assert p1 == p2 and len(p1) > 0


def test_link_comparison_counts_vs_duckdb(spark):
    """Two-dataset blocking analysis: per-rule and cumulative link_only
    counts match a DuckDB oracle on the same fixture."""
    import duckdb
    import pandas as pd

    from memory_optimized_splink_spark.operators.brs import (
        count_comparisons_for_keys_link, cumulative_comparisons_link,
    )

    # ids deliberately OVERLAP between the datasets (the usual link case)
    pl = pd.DataFrame({
        "unique_id": [str(i) for i in range(40)],
        "city": [f"c{i % 5}" for i in range(40)],
        "band": [f"b{i % 3}" for i in range(40)],
    })
    pr = pd.DataFrame({
        "unique_id": [str(i) for i in range(25)],
        "city": [f"c{i % 4}" for i in range(25)],
        "band": [f"b{i % 3}" for i in range(25)],
    })
    dl, dr = spark.createDataFrame(pl), spark.createDataFrame(pr)

    con = duckdb.connect()
    con.register("tl", pl)
    con.register("tr", pr)
    want_city = con.sql("""
        SELECT COALESCE(SUM(l.n*r.n), 0) FROM
        (SELECT city, COUNT(*) n FROM tl GROUP BY city) l
        JOIN (SELECT city, COUNT(*) n FROM tr GROUP BY city) r
        USING (city)""").fetchone()[0]
    assert count_comparisons_for_keys_link(dl, dr, ("city",)) == want_city

    # cumulative with NOT-prior-rule exclusion: rule 0 = city, rule 1 = band
    want = con.sql("""
        WITH p0 AS (
          SELECT l.unique_id, r.unique_id FROM tl l JOIN tr r USING (city)),
        p1 AS (
          SELECT l.unique_id, r.unique_id FROM tl l JOIN tr r USING (band)
          WHERE NOT COALESCE(l.city = r.city, FALSE))
        SELECT (SELECT COUNT(*) FROM p0), (SELECT COUNT(*) FROM p1)
    """).fetchone()
    from memory_optimized_splink_spark.model import block_on as bo
    got = {r["match_key"]: (r["row_count"], r["cumulative_rows"])
           for r in cumulative_comparisons_link(
               dl, dr, [bo("city"), bo("band")]).collect()}
    assert got["0"] == (want[0], want[0])
    assert got["1"] == (want[1], want[0] + want[1])


def test_count_comparisons_for_theta_rule(spark):
    """Arbitrary-SQL (theta) rule counts: the exact single-rule join count
    must match a DuckDB oracle, for dedupe and for link."""
    import duckdb
    import pandas as pd

    from memory_optimized_splink_spark.operators.brs import (
        count_comparisons_for_rule,
    )

    pdf = pd.DataFrame({
        "unique_id": [str(i) for i in range(30)],
        "n": [i % 7 for i in range(30)],
    })
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql("""
        SELECT COUNT(*) FROM t l JOIN t r
        ON abs(l.n - r.n) <= 1 AND l.unique_id < r.unique_id
    """).fetchone()[0]
    theta = BlockingRule(sql="abs(l.n - r.n) <= 1")
    assert count_comparisons_for_rule(df, theta) == want

    pr = pdf.iloc[:12]
    con.register("tr2", pr)
    want_link = con.sql("""
        SELECT COUNT(*) FROM t l JOIN tr2 r ON abs(l.n - r.n) <= 1
    """).fetchone()[0]
    got_link = count_comparisons_for_rule(
        df, theta, nodes_r=spark.createDataFrame(pr))
    assert got_link == want_link


def test_null_keys_never_block(spark, basic_settings):
    df = spark.createDataFrame(
        [("1", None), ("2", None), ("3", "k"), ("4", "k")],
        "unique_id string, repo string",
    )
    s = replace(basic_settings, blocking_rules=(block_on("repo"),))
    pairs = block_using_rules(df, s)
    assert _ids_only(_pair_set(pairs)) == {("3", "4")}


def test_theta_rule(spark, basic_settings):
    df = spark.createDataFrame(
        [("1", "aa"), ("2", "ab"), ("3", "zz")], "unique_id string, repo string"
    )
    s = replace(
        basic_settings,
        blocking_rules=(BlockingRule(sql="substring(l.repo,1,1) = substring(r.repo,1,1)"),),
    )
    pairs = block_using_rules(df, s)
    assert _ids_only(_pair_set(pairs)) == {("1", "2")}


def test_cartesian_pairs_count(spark, basic_settings):
    df = spark.createDataFrame([(str(i),) for i in range(20)], "unique_id string")
    assert cartesian_pairs(df, basic_settings).count() == 20 * 19 // 2


def test_n_largest_blocks(repo_nodes):
    top = n_largest_blocks(repo_nodes, block_on("repo"), n=3).collect()
    assert len(top) == 3
    assert top[0]["key_0"] == "org0/repo0"  # the planted hot repo
    assert top[0]["comparison_count"] >= top[1]["comparison_count"]


def test_no_cartesian_product_in_equi_plan(repo_nodes, basic_settings):
    """Plan audit (reference: tests/test_join_type_for_estimate_u_and_
    predict_are_efficient.py): equi blocking must hash/merge join."""
    pairs = block_using_rules(repo_nodes, basic_settings)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exploding_blocking_rule(spark, basic_settings):
    from dataclasses import replace

    from memory_optimized_splink_spark.model import BlockingRule

    df = spark.createDataFrame(
        [("1", ["a", "b"]), ("2", ["b", "c"]), ("3", ["c"]), ("4", [])],
        "unique_id string, terms array<string>")
    rule = BlockingRule(keys=("terms",), explode_columns=("terms",))
    s = replace(basic_settings, blocking_rules=(rule,))
    pairs = _ids_only(_pair_set(block_using_rules(df, s)))
    assert pairs == {("1", "2"), ("2", "3")}  # shared terms; each pair once


def test_exploding_rule_exclusion_downstream(spark, basic_settings):
    """A later scalar rule must not re-emit pairs an exploding rule found."""
    from dataclasses import replace

    from memory_optimized_splink_spark.model import BlockingRule, block_on

    df = spark.createDataFrame(
        [("1", ["a"], "k"), ("2", ["a"], "k"), ("3", ["z"], "k")],
        "unique_id string, terms array<string>, grp string")
    rules = (BlockingRule(keys=("terms",), explode_columns=("terms",)),
             block_on("grp"))
    s = replace(basic_settings, blocking_rules=rules)
    rows = block_using_rules(df, s).collect()
    by_pair = {}
    for r in rows:
        key = (r["unique_id_l"], r["unique_id_r"])
        assert key not in by_pair, "duplicate pair across rules"
        by_pair[key] = r["match_key"]
    assert by_pair[("1", "2")] == "0"  # found by the exploding rule
    assert by_pair[("1", "3")] == "1" and by_pair[("2", "3")] == "1"


def test_salted_predict_invariant(repo_nodes, basic_settings):
    """Reference invariant test_salting_len.py:10-55: salted vs unsalted
    predict -> same pair set AND same sum of match_probability."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.model import block_on
    from memory_optimized_splink_spark.operators.score import predict
    from memory_optimized_splink_spark.operators.vectors import (
        compute_comparison_vectors,
    )

    sums = []
    for hot in (None, 10):
        s = replace(basic_settings, blocking_rules=(
            block_on("repo", hot_key_threshold=hot, salting_partitions=4),))
        pairs = block_using_rules(repo_nodes, s)
        cv = compute_comparison_vectors(pairs, repo_nodes, s)
        total = predict(cv, s).agg(
            F.sum("match_probability").alias("s"),
            F.count(F.lit(1)).alias("n")).collect()[0]
        sums.append((total["n"], round(total["s"], 9)))
    assert sums[0] == sums[1]


def test_link_cumulative_window_orders_rules_numerically(spark):
    """11 rules: cumulative_rows must follow rule INDEX order, not the
    lexical string order where '10' < '2'."""
    import pandas as pd

    from memory_optimized_splink_spark.operators.brs import (
        cumulative_comparisons_link,
    )

    cols = {f"c{i}": [f"{i}_{j % 2}" for j in range(6)] for i in range(11)}
    pl = pd.DataFrame({"unique_id": [str(i) for i in range(6)], **cols})
    dl = spark.createDataFrame(pl)
    dr = spark.createDataFrame(pl)
    rules = [block_on(f"c{i}") for i in range(11)]
    rows = {r["match_key"]: r for r in
            cumulative_comparisons_link(dl, dr, rules).collect()}
    # rule 0 blocks everything cross-wise; later rules add nothing
    running = 0
    for i in range(11):
        mk = str(i)
        if mk in rows:
            running += rows[mk]["row_count"]
            assert rows[mk]["cumulative_rows"] == running, mk


def test_link_cumulative_tolerates_differing_column_sets(spark):
    """Link inputs routinely carry different column sets; the analysis must
    union the superset (absent columns -> NULL, which never equi-matches)
    instead of raising (reference concatenates only the needed columns)."""
    import pandas as pd

    from memory_optimized_splink_spark.operators.brs import (
        cumulative_comparisons_link,
    )

    dl = spark.createDataFrame(pd.DataFrame({
        "unique_id": ["1", "2"], "city": ["ber", "par"],
        "only_left": ["x", "y"]}))
    dr = spark.createDataFrame(pd.DataFrame({
        "unique_id": ["1", "2"], "city": ["ber", "lon"],
        "only_right": ["u", "v"]}))
    rows = {r["match_key"]: r["row_count"] for r in
            cumulative_comparisons_link(dl, dr, [block_on("city")]).collect()}
    assert rows == {"0": 1}  # the single cross-dataset 'ber' pair


def test_and_composition_preserves_explode_and_skew_knobs(spark):
    """And() of key rules must PROPAGATE exploding/salting/hot-key
    semantics, not silently drop them (a dropped explode_columns turns
    per-element matching into whole-array equality — a different pair
    set); Or/Not must refuse exploding rules outright."""
    import pandas as pd
    import pytest

    from memory_optimized_splink_spark.blocking_rule_library import And, Not, Or

    expl = BlockingRule(keys=("aliases",), explode_columns=("aliases",),
                        label="aliases", salting_partitions=4,
                        hot_key_threshold=100)
    merged = And(expl, block_on("city"))
    assert merged.keys == ("aliases", "city")
    assert merged.explode_columns == ("aliases",)
    assert merged.salting_partitions == 4
    assert merged.hot_key_threshold == 100
    for compose in (lambda: Or(expl, block_on("city")), lambda: Not(expl)):
        with pytest.raises(ValueError, match="exploding"):
            compose()

    # end-to-end: the merged rule matches per ELEMENT (shared alias), which
    # whole-array equality would miss
    nodes = spark.createDataFrame(pd.DataFrame({
        "unique_id": ["a", "b", "c"],
        "aliases": [["x", "y"], ["y", "z"], ["q"]],
        "city": ["ber", "ber", "ber"],
    }))
    s = Settings(comparisons=(), blocking_rules=(merged,))
    got = {(r["unique_id_l"], r["unique_id_r"])
           for r in block_using_rules(nodes, s).collect()}
    assert got == {("a", "b")}
