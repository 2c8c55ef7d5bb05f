"""Data profiling operators (reference: profile_data.py:82-238,
completeness.py): distinct/null counts, top/bottom-n values, value-length
percentiles, completeness per source dataset."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def profile_columns(df: DataFrame, columns: list[str] | None = None,
                    top_n: int = 10) -> DataFrame:
    """One row per (column, stat snapshot): counts + top-n frequent values."""
    columns = columns or [c for c, t in df.dtypes if t == "string"]
    outs = []
    for c in columns:
        stats = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(c).alias("n_non_null"),
            F.approx_count_distinct(c).alias("n_distinct_approx"),
        ).withColumn("column", F.lit(c))
        top = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(c).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("value_count"))
            .orderBy(F.desc("value_count"), F.asc("value"))
            .limit(top_n)
            .agg(F.collect_list(F.struct("value", "value_count")).alias("top_values"))
            .withColumn("column", F.lit(c))
        )
        outs.append(stats.join(top, on="column"))
    return reduce(lambda a, b: a.unionByName(b), outs)


def value_frequency_percentiles(df: DataFrame, column: str) -> DataFrame:
    """Distribution of value frequencies (the reference's percentile chart,
    profile_data.py:82-128): percent_rank over value counts."""
    counts = df.where(F.col(column).isNotNull()) \
        .groupBy(column).agg(F.count(F.lit(1)).alias("value_count"))
    w = Window.orderBy("value_count")
    return counts.select(
        F.col(column).cast("string").alias("value"),
        "value_count",
        F.percent_rank().over(w).alias("percentile"),
    )


def completeness_data(df: DataFrame, source_dataset_col: str | None = None,
                      columns: list[str] | None = None) -> DataFrame:
    """Share of non-null values per column (per source dataset when
    linking). Reference: completeness.py."""
    columns = columns or [c for c in df.columns if c != source_dataset_col]
    group = [source_dataset_col] if source_dataset_col else []
    aggs = []
    for c in columns:
        aggs.append(
            (F.count(c) / F.count(F.lit(1))).alias(f"completeness_{c}"))
    wide = df.groupBy(*group).agg(*aggs)
    # unpivot to (source_dataset?, column, completeness)
    stack_expr = ", ".join(
        f"'{c}', completeness_{c}" for c in columns)
    cols = (group + ["column_name", "completeness"])
    return wide.selectExpr(
        *group, f"stack({len(columns)}, {stack_expr}) as (column_name, completeness)"
    ).select(*cols)
