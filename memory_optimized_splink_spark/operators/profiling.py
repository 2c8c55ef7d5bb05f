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


def profile_panel_data(df: DataFrame, column: str, top_n: int = 10,
                       bottom_n: int = 10
                       ) -> tuple[list[dict], list[dict], list[dict]]:
    """Driver-sized payloads for one column of the profiler chart
    (reference profile_data.py:82-203): the value-frequency percentile
    distribution AGGREGATED BY distinct frequency (rows bounded by the
    number of distinct value counts, never by column cardinality), plus
    top-n / bottom-n values by count. One groupBy pass per panel set."""
    counts = df.where(F.col(column).isNotNull()) \
        .groupBy(F.col(column).cast("string").alias("value")) \
        .agg(F.count(F.lit(1)).alias("value_count"))
    counts = counts.persist()
    try:
        totals_row = df.agg(
            F.count(F.lit(1)).alias("total_rows_inc_nulls"),
            F.count(column).alias("total_non_null_rows"),
        ).collect()[0]
        n_distinct = counts.count()
        # one row per distinct frequency: how many values and what share of
        # non-null ROWS sit at or below that frequency
        freq = counts.groupBy("value_count").agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("value_count").alias("n_rows"))
        w = Window.orderBy("value_count") \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        total_nn = float(totals_row["total_non_null_rows"] or 0)
        percentile = [
            {**r.asDict(),
             "total_rows_inc_nulls": totals_row["total_rows_inc_nulls"],
             "total_non_null_rows": totals_row["total_non_null_rows"],
             "distinct_value_count": n_distinct}
            for r in freq.select(
                "value_count", "n_values",
                (F.sum("n_rows").over(w) / F.lit(max(total_nn, 1.0)))
                .alias("percentile_ex_nulls"),
            ).orderBy("value_count").collect()
        ]
        top = [r.asDict() for r in counts.orderBy(
            F.desc("value_count"), F.asc("value")).limit(top_n).collect()]
        bottom = [r.asDict() for r in counts.orderBy(
            F.asc("value_count"), F.asc("value")).limit(bottom_n).collect()]
        return percentile, top, bottom
    finally:
        counts.unpersist()
