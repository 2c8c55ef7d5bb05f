"""Array-column TF adjustment — the fork's signature delta.

Reference (/root/reference/splink/internals/linker_components/
inference.py:335-550, predict.py:72-91, term_frequencies.py:50-81): for an
array comparison column (e.g. tokenized employers / city-state pairs), the
TF adjustment of a pair is computed from the sorted term-frequency counts of
the INTERSECTING terms:

    tf_values = sort(tf(t) for t in array_intersect(l, r))      (<= 10 terms)
    adj = N / tf_values[1]
        + sum_{k=2..min(5, len)} ln(k/(k-1)) / tf_values[k] * N / ln(log_base)

(the rarest common term contributes fully, subsequent terms with
harmonically-decaying weight). Pairs with > 10 common terms fall back to 1.0
(the reference drops them via HAVING; predict's LEFT JOIN then coalesces).

Spark shape: filter to qualifying gammas -> explode(array_intersect) ->
broadcast-join the term TF dim -> groupBy pair w/ sort_array(collect_list)
-> closed-form expression. The fork's x5 hash-sharding (shard_sql.py) is
subsumed by shuffle partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def tf_array_adjustment(
    pairs_with_cols: DataFrame,
    tf_table: DataFrame,
    col: str,
    gamma_column: str,
    gamma_levels: list[int],
    n_records: float,
    log_base: float = 2.0,
    max_terms: int = 10,
    sum_terms: int = 5,
) -> DataFrame:
    """-> (unique_id_l, unique_id_r, tf_adjustment_<col>). Join back LEFT and
    COALESCE(.., 1.0) into the Bayes-factor product (predict.py:72-91)."""
    tf_col = f"tf_{col}"
    base = pairs_with_cols.where(
        F.col(gamma_column).isin([int(g) for g in gamma_levels])
    ).select(
        "unique_id_l", "unique_id_r",
        F.explode(F.array_intersect(F.col(f"{col}_l"), F.col(f"{col}_r")))
        .alias("term"),
    )
    joined = base.join(
        F.broadcast(tf_table.select(F.col(col).alias("term"),
                                    F.col(tf_col).alias("tf_value"))),
        on="term", how="inner",
    )
    agg = (
        joined.groupBy("unique_id_l", "unique_id_r")
        .agg(F.sort_array(F.collect_list("tf_value")).alias("tf_values"))
        .where(F.size("tf_values") <= max_terms)
    )
    ln_base = math.log(log_base)
    adj: Column = F.lit(float(n_records)) / F.element_at("tf_values", 1)
    for k in range(2, sum_terms + 1):
        term_k = (
            F.lit(math.log(k / (k - 1))) / F.element_at("tf_values", k)
        ) * F.lit(n_records / ln_base)
        adj = adj + F.when(F.size("tf_values") >= k, term_k).otherwise(F.lit(0.0))
    return agg.select(
        "unique_id_l", "unique_id_r",
        adj.cast("double").alias(f"tf_adjustment_{col}"),
    )


def apply_tf_array_adjustments(
    predictions_input: DataFrame,
    adjustments: dict[str, DataFrame],
) -> DataFrame:
    """LEFT JOIN each tf_adjustment table onto the match-weight-parts input
    keyed by the id pair (predict.py:72-91). Missing pairs -> 1.0."""
    out = predictions_input
    for col, adj in adjustments.items():
        out = out.join(adj, on=["unique_id_l", "unique_id_r"], how="left")
        out = out.withColumn(
            f"bf_tf_adj_{col}",
            F.coalesce(F.col(f"tf_adjustment_{col}"), F.lit(1.0)),
        ).drop(f"tf_adjustment_{col}")
    return out


def tf_array_adjustment_fuzzy(
    pairs_with_cols: DataFrame,
    tf_table: DataFrame,
    col: str,
    gamma_column: str,
    fuzzy_gamma_levels: list[int],
    n_records: float,
    log_base: float = 2.0,
    jw_threshold: float = 0.95,
    max_terms: int = 10,
    sum_terms: int = 5,
) -> DataFrame:
    """Fuzzy variant (inference.py:453-519): all l-term x r-term pairs with
    jaro_winkler >= 0.95 count as common; per matched pair the tf value is
    GREATEST(tf_l_term, tf_r_term); same harmonic formula.

    Spark shape: posexplode both arrays -> term-pair grid within the pair
    (arrays are short) -> vectorized JW batch -> tf joins -> groupBy pair.
    """
    import math

    from ..functions.similarity import jaro_winkler_udf

    tf_col = f"tf_{col}"
    base = pairs_with_cols.where(
        F.col(gamma_column).isin([int(g) for g in fuzzy_gamma_levels])
    ).select("unique_id_l", "unique_id_r",
             F.explode(F.col(f"{col}_l")).alias("term_l"),
             F.col(f"{col}_r"))
    grid = base.select("unique_id_l", "unique_id_r", "term_l",
                       F.explode(F.col(f"{col}_r")).alias("term_r"))
    matched = grid.where(
        jaro_winkler_udf(F.col("term_l"), F.col("term_r")) >= jw_threshold)
    tf_dim = tf_table.select(F.col(col).alias("_term"),
                             F.col(tf_col).alias("_tf"))
    joined = (
        matched
        .join(F.broadcast(tf_dim.withColumnRenamed("_term", "term_l")
                          .withColumnRenamed("_tf", "_tf_l")),
              on="term_l", how="left")
        .join(F.broadcast(tf_dim.withColumnRenamed("_term", "term_r")
                          .withColumnRenamed("_tf", "_tf_r")),
              on="term_r", how="left")
        .select("unique_id_l", "unique_id_r",
                F.greatest("_tf_l", "_tf_r").alias("tf_value"))
        .where(F.col("tf_value").isNotNull())
    )
    agg = (
        joined.groupBy("unique_id_l", "unique_id_r")
        .agg(F.sort_array(F.collect_list("tf_value")).alias("tf_values"))
        .where(F.size("tf_values") <= max_terms)
    )
    ln_base = math.log(log_base)
    adj = F.lit(float(n_records)) / F.element_at("tf_values", 1)
    for k in range(2, sum_terms + 1):
        term_k = (
            F.lit(math.log(k / (k - 1))) / F.element_at("tf_values", k)
        ) * F.lit(n_records / ln_base)
        adj = adj + F.when(F.size("tf_values") >= k, term_k).otherwise(F.lit(0.0))
    return agg.select(
        "unique_id_l", "unique_id_r",
        adj.cast("double").alias(f"tf_adjustment_{col}"),
    )


def tf_array_adjustment_combined(
    pairs_with_cols: DataFrame,
    tf_table: DataFrame,
    col: str,
    gamma_column: str,
    exact_gamma_levels: list[int],
    fuzzy_gamma_levels: list[int],
    n_records: float,
    **kw,
) -> DataFrame:
    """Exact + fuzzy tables UNION'd (inference.py:543-549): each pair falls
    in exactly one gamma level, so the union is disjoint by construction."""
    parts = []
    if exact_gamma_levels:
        parts.append(tf_array_adjustment(
            pairs_with_cols, tf_table, col, gamma_column,
            exact_gamma_levels, n_records, **kw))
    if fuzzy_gamma_levels:
        parts.append(tf_array_adjustment_fuzzy(
            pairs_with_cols, tf_table, col, gamma_column,
            fuzzy_gamma_levels, n_records, **kw))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
