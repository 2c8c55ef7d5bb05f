"""Node-table preparation: vertical concat, id derivation, term frequencies.

Reference semantics:
- vertical concat (+source_dataset, +salt):
  /root/reference/splink/internals/vertically_concatenate.py:19-81. The
  reference salts with random(); we salt with a hash of the unique id so the
  pipeline is deterministic end-to-end (EM-seed bug regression,
  /root/reference/CHANGELOG.md:25).
- composite unique id '<ds>-__-<uid>':
  /root/reference/splink/internals/unique_id_concat.py:5-43.
- TF tables store raw **counts** (fork delta,
  /root/reference/splink/internals/term_frequencies.py:83-92) and are
  left-joined back onto nodes (term_frequencies.py:96-141). TF tables are
  value->count dims: small, so we broadcast them.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..model import Settings

UID_SEP = "-__-"


def derive_repo_file_ids(df: DataFrame) -> DataFrame:
    """BASELINE.json input_hint derivation for the (repo,path,commit,lang,
    content) table: unique_id = sha2(repo \\x01 path \\x01 commit, 256) and
    the per-row invariant content_sha = sha2(content, 256)."""
    return df.withColumn(
        "unique_id",
        F.sha2(F.concat_ws("\x01", F.col("repo"), F.col("path"), F.col("commit")), 256),
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))


def vertically_concatenate(
    dfs: dict[str, DataFrame] | list[DataFrame],
    settings: Settings,
    salt_partitions: int = 1,
) -> DataFrame:
    """Union inputs by name; add source_dataset when linking and a
    deterministic __splink_salt in [1, salt_partitions]."""
    if isinstance(dfs, dict):
        parts = [
            df.withColumn("source_dataset", F.lit(alias)) for alias, df in dfs.items()
        ]
    else:
        parts = list(dfs)
    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=False), parts)
    if salt_partitions > 1:
        out = out.withColumn(
            "__splink_salt",
            (F.pmod(F.xxhash64(F.col(settings.unique_id_column_name)),
                    F.lit(salt_partitions)) + 1).cast("int"),
        )
    return out


def composite_uid(settings: Settings):
    uid = F.col(settings.unique_id_column_name).cast("string")
    if settings.source_dataset_column_name:
        return F.concat_ws(UID_SEP, F.col(settings.source_dataset_column_name), uid)
    return uid


def non_null_counts(nodes: DataFrame, cols, include_total: bool = False
                    ) -> dict[str, int]:
    """Per-column non-null counts in ONE aggregate pass (plus "__total__"
    when requested) instead of one count() job per column. At 100-TB scale
    the k+1-scan version (reference comparison_level.py:30-42 runs one query
    per field) is k+1 full reads of the node table; a single
    `agg(count(when(isNotNull(c),1)) ...)` does the same work in one scan
    with map-side partial aggregation."""
    cols = list(cols)
    aggs = [F.count(F.when(F.col(c).isNotNull(), 1)).alias(f"_c{i}")
            for i, c in enumerate(cols)]
    if include_total:
        aggs.append(F.count(F.lit(1)).alias("_total"))
    if not aggs:
        return {}
    row = nodes.agg(*aggs).collect()[0]
    out = {c: int(row[f"_c{i}"]) for i, c in enumerate(cols)}
    if include_total:
        out["__total__"] = int(row["_total"])
    return out


def compute_tf_table(nodes: DataFrame, col: str, is_array: bool = False,
                     tokenize: bool = False) -> DataFrame:
    """value -> count dim table. Array columns are exploded first (and
    optionally whitespace-tokenized+lowered, term_frequencies.py:50-81)."""
    if is_array:
        c = F.explode(F.col(col)).alias(col)
        df = nodes.select(c)
        if tokenize:
            df = df.select(F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias(col))
    else:
        df = nodes.select(F.col(col))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("double").alias(f"tf_{col}"))
    )


def join_tf_columns(nodes: DataFrame, settings: Settings,
                    tf_tables: dict[str, DataFrame] | None = None
                    ) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Left-join tf_<col> count columns onto nodes; TF dims are broadcast
    (value-cardinality << node count at any scale where TF helps)."""
    tf_tables = dict(tf_tables or {})
    out = nodes
    for col in settings.tf_columns:
        if col not in tf_tables:
            tf_tables[col] = compute_tf_table(nodes, col)
        out = out.join(F.broadcast(tf_tables[col]), on=col, how="left")
    return out, tf_tables
