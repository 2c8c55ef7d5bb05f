"""SparkLinker integration: checkpoint resume, truth space, realtime APIs."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.linker import SparkLinker


def test_checkpoint_resume(spark, repo_nodes, basic_settings, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    l1 = SparkLinker(spark, repo_nodes, basic_settings,
                     checkpoint_dir=ckpt, enable_checkpoints=True)
    n1 = l1.predict().count()
    assert os.path.exists(os.path.join(ckpt, "blocked_pairs"))
    # a fresh linker with identical settings resumes instead of recomputing
    l2 = SparkLinker(spark, repo_nodes, basic_settings,
                     checkpoint_dir=ckpt, enable_checkpoints=True)
    n2 = l2.predict().count()
    assert n1 == n2
    events = [r.get("event") for r in l2.metrics.records]
    assert "resume_from_checkpoint" in events
    # lineage log captures per-partition stats for completed stages
    stage_recs = [r for r in l1.metrics.records if r.get("event") == "stage_complete"]
    assert stage_recs and all("partition_rows_max" in r for r in stage_recs)


def test_truth_space(spark, repo_nodes, basic_settings):
    from memory_optimized_splink_spark.fixtures import (
        labeled_pairs_pandas, repo_files_pandas, RepoFilesSpec,
    )
    import pandas as pd

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    pdf = repo_nodes.select("unique_id", "cluster", "repo").toPandas()
    # labels: positives within entity + same-repo hard negatives
    base = pdf.rename(columns={"cluster": "cluster"})
    labels = labeled_pairs_pandas(
        base[["repo", "cluster"]].assign(
            path="", commit="", lang="", content=""),
        base["unique_id"],
    )
    labels_df = spark.createDataFrame(labels)
    ts = linker.truth_space(labels_df).orderBy(F.desc("truth_threshold"))
    rows = ts.collect()
    assert len(rows) > 1
    # precision should be high at the top threshold, recall ~1 at the bottom
    assert rows[0]["precision"] >= 0.99
    assert rows[-1]["recall"] >= 0.99
    # cumulative sanity: tp non-decreasing as threshold drops
    tps = [r["tp"] for r in rows]
    assert tps == sorted(tps)


def test_cluster_f1_gate(spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    res = linker.cluster_f1(threshold=0.9)
    assert res["f1"] >= 0.99


def test_find_matches_to_new_records(spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    new = repo_nodes.limit(3).withColumn(
        "unique_id", F.concat(F.col("unique_id"), F.lit("_new"))
    )
    matches = linker.find_matches_to_new_records(
        new, threshold_match_probability=0.5)
    assert matches.count() >= 3  # each copied record matches its original
    uid_cols = matches.select("unique_id_l", "unique_id_r").collect()
    assert all(
        (r["unique_id_l"].endswith("_new")) != (r["unique_id_r"].endswith("_new"))
        for r in uid_cols
    )


def test_compare_two_records(spark, repo_nodes, basic_settings):
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    row = repo_nodes.limit(1).collect()[0].asDict()
    same = linker.compare_two_records(row, dict(row)).collect()[0]
    assert same["match_probability"] > 0.99
    other = dict(row)
    other["content_sha"] = "0" * 64
    other["path"] = "totally/different/zzz.md"
    diff = linker.compare_two_records(row, other).collect()[0]
    assert diff["match_probability"] < same["match_probability"]


def test_estimate_lambda_and_count_comparisons(spark, repo_nodes, basic_settings):
    from memory_optimized_splink_spark.model import block_on

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    n = repo_nodes.count()
    # deterministic rule: exact content hash; recall assumed 0.9
    linker.estimate_lambda([block_on("content_sha")], recall=0.9)
    lam = linker.settings.probability_two_random_records_match
    assert 0 < lam < 0.1
    # lambda ~ (#content-dup pairs / 0.9) / C(n,2)
    exact_pairs = linker.count_comparisons(block_on("content_sha"))
    expected = (exact_pairs / 0.9) / (n * (n - 1) / 2)
    assert abs(lam - expected) < 1e-9


def test_find_matches_tf_from_node_table_after_resume(spark, repo_nodes,
                                                      basic_settings, tmp_path):
    """TF dims for realtime scoring must come from the full node table even
    when the nodes stage resumed from checkpoint (regression)."""
    from dataclasses import replace

    s = replace(basic_settings, tf_columns=("lang",))
    ckpt = str(tmp_path / "ck")
    l1 = SparkLinker(spark, repo_nodes, s, checkpoint_dir=ckpt,
                     enable_checkpoints=True)
    l1.nodes().count()  # materialize checkpoint
    l2 = SparkLinker(spark, repo_nodes, s, checkpoint_dir=ckpt,
                     enable_checkpoints=True)
    l2.nodes()  # resume -> _tf_tables empty
    new = repo_nodes.limit(1).withColumn(
        "unique_id", F.concat(F.col("unique_id"), F.lit("_n"))).drop("tf_lang")
    tf = l2._ensure_tf_tables()["lang"]
    full_counts = {r["lang"]: r["tf_lang"] for r in tf.collect()}
    # counts reflect the FULL node table, not the 1-row frame
    assert max(full_counts.values()) > 1


def test_checkpoint_not_reused_across_different_inputs(
        spark, repo_nodes, basic_settings, tmp_path):
    """Same settings + same checkpoint dir + DIFFERENT input must not
    resume the previous input's cached stages (the stage key includes an
    input fingerprint)."""
    ckpt = str(tmp_path / "ck_inputs")
    l1 = SparkLinker(spark, repo_nodes, basic_settings,
                     checkpoint_dir=ckpt, enable_checkpoints=True)
    n1 = l1.blocked_pairs().count()
    smaller = repo_nodes.limit(60).cache()
    smaller.count()
    l2 = SparkLinker(spark, smaller, basic_settings,
                     checkpoint_dir=ckpt, enable_checkpoints=True)
    n2 = l2.blocked_pairs().count()
    assert n2 < n1


def test_realtime_tf_weights_match_batch(spark, basic_settings):
    """compare_two_records must use the same per-field non-null counts as
    batch predict(), so TF-adjusted weights agree even when the TF column
    has nulls."""
    from dataclasses import replace

    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    rows = [
        ("1", "k1", "en"), ("2", "k1", "en"), ("3", "k1", None),
        ("4", "k2", "fr"), ("5", "k2", "fr"), ("6", "k2", "en"),
    ]
    df = spark.createDataFrame(rows, "unique_id string, k string, lang string")
    s = Settings(
        comparisons=(
            Comparison("lang", "lang", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.8, u=0.2, tf_adjustment=True),
                ComparisonLevel("else", m=0.2, u=0.8),
            )),
        ),
        blocking_rules=(block_on("k"),),
        probability_two_random_records_match=0.1,
        tf_columns=("lang",),
    )
    linker = SparkLinker(spark, df, s)
    batch = {(r["unique_id_l"], r["unique_id_r"]): r["match_weight"]
             for r in linker.predict().collect()}
    rt = linker.compare_two_records(
        {"unique_id": "1", "k": "k1", "lang": "en"},
        {"unique_id": "2", "k": "k1", "lang": "en"},
    ).collect()[0]["match_weight"]
    assert abs(rt - batch[("1", "2")]) < 1e-12


def test_compare_two_records_fast_parity_and_latency(spark, repo_nodes,
                                                     basic_settings):
    """Driver-side realtime scoring (reference realtime.py's cache,
    upgraded to no-job-at-all): numbers match the Spark path exactly, and
    a warm call is >=10x faster than the cold one (which pays the one-time
    TF collect)."""
    import time
    from dataclasses import replace

    s = replace(basic_settings, tf_columns=("lang",))
    # give the lang column a TF-adjusted exact level to exercise tf maps
    from memory_optimized_splink_spark.model import Comparison, ComparisonLevel
    s = replace(s, comparisons=s.comparisons + (
        Comparison("lang", "lang", (
            ComparisonLevel("null"),
            ComparisonLevel("exact", m=0.7, u=0.3, tf_adjustment=True),
            ComparisonLevel("else", m=0.3, u=0.7),
        )),
    ))
    linker = SparkLinker(spark, repo_nodes, s)
    row = repo_nodes.limit(1).collect()[0].asDict()
    other = dict(row)
    other["content_sha"] = "0" * 64
    other["path"] = row["path"][:-3] + ".xy"  # near path -> fuzzy level
    cases = [(row, dict(row)), (row, other),
             (row, {**other, "path": None}),  # null level
             (row, {**other, "path": "zz/" + "q" * 40})]  # else level
    t0 = time.time()
    fast_first = linker.compare_two_records_fast(*cases[0])
    t_cold = time.time() - t0
    for rec_l, rec_r in cases:
        spark_row = linker.compare_two_records(rec_l, rec_r).collect()[0]
        fast = linker.compare_two_records_fast(rec_l, rec_r)
        assert abs(fast["match_weight"] - spark_row["match_weight"]) < 1e-9
        assert abs(fast["match_probability"]
                   - spark_row["match_probability"]) < 1e-12
        for c in s.comparisons:
            g = f"gamma_{c.name}"
            assert fast[g] == spark_row[g], (g, rec_l, rec_r)
    t0 = time.time()
    for _ in range(50):
        linker.compare_two_records_fast(*cases[1])
    t_warm = (time.time() - t0) / 50
    assert t_warm < t_cold / 10, (t_warm, t_cold)


def test_datasets_registry_end_to_end(spark):
    """splink_datasets-equivalent loader: fake_1000 has the documented shape
    and links end-to-end with known ground truth."""
    from memory_optimized_splink_spark.datasets import datasets
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )
    from memory_optimized_splink_spark.accuracy import pairwise_cluster_f1

    ds = datasets(spark)
    df = ds.fake_1000()
    assert df.columns == ["unique_id", "first_name", "surname", "dob",
                          "city", "email", "cluster"]
    n = df.count()
    assert n == 1000
    # determinism
    assert ds.fake_1000().agg(F.sum(F.crc32("unique_id"))).collect()[0][0] \
        == df.agg(F.sum(F.crc32("unique_id"))).collect()[0][0]

    s = Settings(
        comparisons=(
            Comparison("first_name", "first_name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.7, u=0.05),
                ComparisonLevel("jaro_winkler", threshold=0.88, m=0.2, u=0.02),
                ComparisonLevel("else", m=0.1, u=0.93),
            )),
            Comparison("surname", "surname", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.7, u=0.05),
                ComparisonLevel("jaro_winkler", threshold=0.88, m=0.2, u=0.02),
                ComparisonLevel("else", m=0.1, u=0.93),
            )),
            Comparison("email", "email", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.001),
                ComparisonLevel("else", m=0.1, u=0.999),
            )),
        ),
        blocking_rules=(block_on("dob"),),
        probability_two_random_records_match=0.01,
    )
    linker = SparkLinker(spark, df, s)
    member = linker.cluster(threshold_match_probability=0.9) \
        .select("unique_id", "cluster_id", "cluster")
    f1 = pairwise_cluster_f1(member, truth_col="cluster")
    assert f1["f1"] > 0.9


def test_settings_validation_fails_fast(spark, repo_nodes, basic_settings):
    """Settings referencing a column absent from the input must raise at
    linker construction with the full missing list (reference
    linker.py:316-334), not fail mid-pipeline."""
    from dataclasses import replace

    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel,
    )

    bad = replace(basic_settings, comparisons=basic_settings.comparisons + (
        Comparison("nope", "no_such_column", (
            ComparisonLevel("null"), ComparisonLevel("exact"),
            ComparisonLevel("else"))),
    ))
    with pytest.raises(ValueError, match="no_such_column"):
        SparkLinker(spark, repo_nodes, bad)
    # valid settings construct fine
    SparkLinker(spark, repo_nodes, basic_settings)


def test_local_scorer_random_parity_vs_batch(spark):
    """Randomized parity: every pair of a 24-record random table (with
    nulls, unicode-free ASCII noise) scored by the driver-side LocalScorer
    must match the batch predict() row exactly (gammas) and to 1e-9
    (weights). Covers JW, DL, exact, null and else levels in one sweep."""
    import random

    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )
    from memory_optimized_splink_spark.realtime import LocalScorer

    rng = random.Random(7)
    words = ["smith", "smyth", "jones", "baker", "abc", "abcd", ""]
    rows = []
    for i in range(24):
        name = None if rng.random() < 0.2 else (
            rng.choice(words) + rng.choice(["", "x", "ie", "son"]))
        city = None if rng.random() < 0.2 else rng.choice(
            ["london", "londn", "paris", "rome"])
        rows.append((str(i), "k", name, city))
    df = spark.createDataFrame(
        rows, "unique_id string, k string, name string, city string")
    s = Settings(
        comparisons=(
            Comparison("name", "name", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.01),
                ComparisonLevel("jaro_winkler", threshold=0.88, m=0.6, u=0.05),
                ComparisonLevel("damerau_levenshtein", threshold=2,
                                m=0.3, u=0.1),
                ComparisonLevel("else", m=0.05, u=0.84),
            )),
            Comparison("city", "city", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.8, u=0.1),
                ComparisonLevel("else", m=0.2, u=0.9),
            )),
        ),
        blocking_rules=(block_on("k"),),
        probability_two_random_records_match=0.05,
    )
    linker = SparkLinker(spark, df, s)
    batch = {(r["unique_id_l"], r["unique_id_r"]): r
             for r in linker.predict().collect()}
    assert len(batch) == 24 * 23 // 2
    recs = {r[0]: {"unique_id": r[0], "k": r[1], "name": r[2], "city": r[3]}
            for r in rows}
    scorer = LocalScorer(s)
    for (a, b), row in batch.items():
        fast = scorer.score(recs[a], recs[b])
        assert fast["gamma_name"] == row["gamma_name"], (a, b)
        assert fast["gamma_city"] == row["gamma_city"], (a, b)
        assert abs(fast["match_weight"] - row["match_weight"]) < 1e-9


def test_compare_two_records_fast_rejects_tf_arrays(spark, repo_nodes,
                                                    basic_settings):
    """Array-TF adjustments are batch-only: the fast path must refuse
    rather than silently diverge from predict()."""
    from dataclasses import replace

    import pytest

    from memory_optimized_splink_spark.realtime import LocalScoringUnsupported

    s = replace(basic_settings, tf_array_columns=("langs",))
    df = repo_nodes.withColumn("langs", F.array(F.col("lang")))
    linker = SparkLinker(spark, df, s)
    row = df.limit(1).collect()[0].asDict()
    with pytest.raises(LocalScoringUnsupported):
        linker.compare_two_records_fast(row, dict(row))


def test_truth_space_labels_column_link_only(spark):
    """link_only labels-column truth space: the implicit-negative total is
    the cross-dataset product, and the output telescopes to hand-computed
    tp/fn at the extreme thresholds."""
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    rows = [
        ("a1", "L", "k1", "x"), ("a2", "L", "k2", "y"), ("a3", "L", "k3", "z"),
        ("b1", "R", "k1", "x"), ("b2", "R", "k2", "q"), ("b3", "R", "k9", "z"),
    ]
    df = spark.createDataFrame(
        rows, "unique_id string, ds string, k string, ent string")
    s = Settings(
        comparisons=(
            Comparison("k", "k", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=0.05),
                ComparisonLevel("else", m=0.1, u=0.95),
            )),
        ),
        blocking_rules=(block_on("k"),),
        probability_two_random_records_match=0.1,
        link_type="link_only",
        source_dataset_column_name="ds",
    )
    linker = SparkLinker(spark, df, s)
    ts = linker.truth_space_from_labels_column("ent").orderBy(
        "truth_threshold").collect()
    # total labels = 3*3 cross pairs; positives: (a1,b1) ent=x, (a3,b3) ent=z
    # blocking (k) finds (a1,b1) [k1] and (a2,b2) [k2]; (a3,b3) only via the
    # label rule -> scored -999 (a blocking miss, counted in fn everywhere)
    bottom, top = ts[0], ts[-1]
    assert bottom["tp"] + bottom["fn"] == 2.0  # P = 2 label positives
    assert bottom["fn"] >= 1.0                 # (a3,b3) missed by blocking
    assert top["tn"] + top["fp"] == 9.0 - 2.0  # N = total - P
    assert top["tp"] <= 2.0 and top["precision"] <= 1.0


def test_compare_two_records_fast_invalidated_by_training(spark, repo_nodes,
                                                          basic_settings):
    """Training reassigns settings; the cached LocalScorer must be rebuilt,
    not silently keep pre-training m/u."""
    linker = SparkLinker(spark, repo_nodes, basic_settings)
    row = repo_nodes.limit(1).collect()[0].asDict()
    other = dict(row)
    other["content_sha"] = "0" * 64
    before = linker.compare_two_records_fast(row, other)["match_weight"]
    linker.estimate_u(max_pairs=5e4)  # reassigns self.settings
    after_fast = linker.compare_two_records_fast(row, other)["match_weight"]
    after_spark = linker.compare_two_records(row, other) \
        .collect()[0]["match_weight"]
    assert abs(after_fast - after_spark) < 1e-9
    assert after_fast != before  # u changed -> weights changed
