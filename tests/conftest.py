"""Shared Spark session for the test suite (mirrors the reference's fixture:
/root/reference/tests/conftest.py:41-82 — one session, small shuffle
partition count, checkpoint dir)."""

from __future__ import annotations

import pytest

from memory_optimized_splink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        checkpoint_dir="/tmp/spark_graft_test_ckpt",
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def basic_settings():
    from memory_optimized_splink_spark.model import (
        Comparison, ComparisonLevel, Settings, block_on,
    )

    return Settings(
        comparisons=(
            Comparison("content_sha", "content_sha", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.9, u=1e-4),
                ComparisonLevel("else", m=0.1, u=0.9999),
            )),
            Comparison("path", "path", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", m=0.6, u=0.01),
                ComparisonLevel("jaro_winkler", threshold=0.9401, m=0.3, u=0.02),
                ComparisonLevel("levenshtein", threshold=4, m=0.05, u=0.05),
                ComparisonLevel("else", m=0.05, u=0.92),
            )),
        ),
        blocking_rules=(
            block_on("content_sha"),
            block_on("repo", hot_key_threshold=50),
        ),
        probability_two_random_records_match=0.01,
    )


@pytest.fixture(scope="session")
def repo_nodes(spark):
    from memory_optimized_splink_spark.fixtures import RepoFilesSpec, repo_files_df
    from memory_optimized_splink_spark.operators.nodes import derive_repo_file_ids

    df = derive_repo_file_ids(repo_files_df(spark, RepoFilesSpec(n_entities=200)))
    df.cache()
    df.count()
    return df
