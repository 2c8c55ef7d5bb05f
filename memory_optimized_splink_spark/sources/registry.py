"""Table registration & IO (reference: database_api.py:216-255,
splink_dataframe.py:120-196).

The reference accepts table-name strings / pandas / list-of-dicts / native
Spark DataFrames; sinks are parquet/csv. This engine reads Iceberg when an
Iceberg catalog is configured on the session (the BASELINE.json input is an
Iceberg table) and falls back to parquet/csv paths; import-gated so the
sandbox (no Iceberg jars) still works.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def register_table(spark: SparkSession, data: Any, alias: str,
                   overwrite: bool = True) -> DataFrame:
    """str (table/path) | pandas.DataFrame | list[dict] | DataFrame ->
    registered temp view `alias`."""
    df = read_any(spark, data)
    if not overwrite:
        existing = [t.name for t in spark.catalog.listTables()]
        if alias in existing:
            raise ValueError(f"table {alias} already registered")
    df.createOrReplaceTempView(alias)
    return df


def register_multiple_tables(spark: SparkSession, tables: list[Any],
                             aliases: list[str] | None = None
                             ) -> dict[str, DataFrame]:
    aliases = aliases or [f"__input_{i}" for i in range(len(tables))]
    return {a: register_table(spark, t, a) for t, a in zip(tables, aliases)}


def read_any(spark: SparkSession, data: Any) -> DataFrame:
    if isinstance(data, DataFrame):
        return data
    if isinstance(data, str):
        if data.endswith(".parquet"):
            return spark.read.parquet(data)
        if data.endswith(".csv"):
            return spark.read.option("header", "true").csv(data)
        return read_table(spark, data)
    try:
        import pandas as pd
        if isinstance(data, pd.DataFrame):
            return spark.createDataFrame(data)
    except ImportError:
        pass
    if isinstance(data, list):
        return spark.createDataFrame(data)
    raise TypeError(f"cannot register {type(data)}")


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog table (Iceberg when the catalog provides it). Equivalent of
    spark.read.format('iceberg').load(name) — `spark.read.table` resolves
    through the configured catalog, so Iceberg metadata (partition pruning,
    hidden partitioning, snapshot reads) applies transparently."""
    return spark.read.table(name)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_output(df: DataFrame, path_or_table: str, fmt: str = "parquet",
                 mode: str = "overwrite", partition_by: list[str] | None = None
                 ) -> None:
    """parquet/csv path sink or Iceberg table sink (splink_dataframe.py
    to_parquet/to_csv + our Iceberg extension)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path_or_table)
    elif fmt == "csv":
        w.option("header", "true").csv(path_or_table)
    elif fmt == "iceberg":
        w.format("iceberg").saveAsTable(path_or_table)
    else:
        raise ValueError(fmt)


def write_bucketed_nodes(df: DataFrame, table: str, bucket_col: str,
                         n_buckets: int = 256, mode: str = "overwrite",
                         sort: bool = True) -> None:
    """Persist the node table BUCKETED by the pair-join key so repeated
    candidate->columns joins are co-located: a table bucketed (and sorted)
    on `unique_id` lets the two-sided id join read both sides pre-hashed —
    no Exchange on the bucketed side across every downstream stage that
    joins on the same key (the biggest repeated shuffle in the pipeline at
    100 TB: the pair table re-joins nodes twice per scoring pass).
    Hive-bucketed parquet via saveAsTable (bucketBy requires a table, not a
    bare path)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata applies automatically
    when spark.sql.sources.bucketing.enabled is on, the default)."""
    return spark.read.table(table)
