"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship dedupe pipeline on sf0.001;
`queries()` exposes one callable per implemented operator from SURVEY.md §2
(plus the training-data-pipeline operators); `oracle_sql()` holds the
DuckDB-equivalent SQL for EVERY query (46/46) — the iterative
connected-components queries are checked against WITH RECURSIVE min-label
transitive-closure oracles with md5(sorted-member-list) cluster ids
computed identically on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from memory_optimized_splink_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return EQ.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
