"""Full workflow like the reference's end-to-end test
(/root/reference/tests/test_full_example_spark.py:19-140): TF columns,
u-training, EM training, predict, cluster, accuracy — on the repo_files
fixture with ground truth."""

from __future__ import annotations

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.linker import SparkLinker
from memory_optimized_splink_spark.model import (
    Comparison, ComparisonLevel, Settings, block_on,
)


def test_full_workflow(spark, repo_nodes, tmp_path):
    settings = Settings(
        comparisons=(
            Comparison("content_sha", "content_sha", (
                ComparisonLevel("null"), ComparisonLevel("exact"),
                ComparisonLevel("else"),
            )),
            Comparison("path", "path", (
                ComparisonLevel("null"),
                ComparisonLevel("exact"),
                ComparisonLevel("jaro_winkler", threshold=0.9401),
                ComparisonLevel("levenshtein", threshold=4),
                ComparisonLevel("else"),
            )),
            Comparison("lang", "lang", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", tf_adjustment=True),
                ComparisonLevel("else"),
            )),
        ),
        blocking_rules=(block_on("content_sha"),
                        block_on("repo", hot_key_threshold=50)),
        probability_two_random_records_match=0.01,
        tf_columns=("lang",),
        additional_columns_to_retain=("cluster",),
    )
    linker = SparkLinker(spark, repo_nodes, settings,
                         checkpoint_dir=str(tmp_path / "ck"),
                         enable_checkpoints=False)
    # 1. u from random sampling (deterministic seed)
    linker.estimate_u(max_pairs=5e4)
    us = {c.name: dict(c.graded_levels) for c in linker.settings.comparisons}
    assert us["content_sha"][1].u is not None
    assert us["content_sha"][1].u < 0.01  # sha collisions are rare
    # 2. m via EM blocked on repo (trains content_sha/path/lang m's)
    history = linker.estimate_m_with_em(block_on("repo"))
    assert history[-1]["max_delta"] < 1e-3 or len(history) == 25
    ms = {c.name: dict(c.graded_levels) for c in linker.settings.comparisons}
    assert ms["content_sha"][1].m > 0.5  # dups share content by construction
    # 3. predict + cluster + pairwise F1 vs ground truth
    res = linker.cluster_f1(threshold=0.9)
    assert res["f1"] >= 0.99
    # 4. truth space has sane precision/recall shape
    pred = linker.predict()
    assert pred.where(F.col("match_probability") > 1.0).count() == 0
    # 5. settings JSON round-trip of the TRAINED model
    from memory_optimized_splink_spark.model import Settings as S
    rt = S.from_json(linker.settings.to_json())
    assert rt == linker.settings
