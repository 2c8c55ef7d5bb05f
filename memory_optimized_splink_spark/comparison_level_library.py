"""Reference-parity `comparison_level_library` (cll) — PascalCase level
factories mirroring /root/reference/splink/internals/
comparison_level_library.py:82-1024, each returning this engine's
model.ComparisonLevel with the matching kind, so migrating user code
(`import ... comparison_level_library as cll; cll.ExactMatchLevel("city")`)
runs unchanged. Levels compose with comparison_library.And/Or/Not and with
CustomComparison."""

from __future__ import annotations

from .comparison_library import TIME_METRIC_SECONDS, _metric_seconds
from .functions.column_expression import ColumnExpression
from .model import ComparisonLevel


def _ce(col) -> ColumnExpression:
    return ColumnExpression.instantiate_if_str(col)


def _ce_pair_sql(ce: ColumnExpression) -> tuple[str, str]:
    return (ce.sql_expression(f"{ce.name}_l"),
            ce.sql_expression(f"{ce.name}_r"))

__all__ = [
    "NullLevel", "ElseLevel", "CustomLevel", "ExactMatchLevel",
    "LiteralMatchLevel", "ColumnsReversedLevel", "LevenshteinLevel",
    "DamerauLevenshteinLevel", "JaroWinklerLevel", "JaroLevel",
    "JaccardLevel", "DistanceFunctionLevel",
    "PairwiseStringDistanceFunctionLevel", "AbsoluteTimeDifferenceLevel",
    "AbsoluteDateDifferenceLevel", "DistanceInKMLevel",
    "CosineSimilarityLevel", "ArrayIntersectLevel", "ArraySubsetLevel",
    "PercentageDifferenceLevel", "AbsoluteDifferenceLevel",
    "TIME_METRIC_SECONDS",
]


def NullLevel(col_name, valid_string_pattern: str = None
              ) -> ComparisonLevel:
    """Reference cll.NullLevel:82 — with valid_string_pattern, values not
    matching the regex are also treated as null. Accepts a
    ColumnExpression anywhere the reference does (the expression renders
    into the level SQL)."""
    ce = _ce(col_name)
    if not ce.is_pure_column:
        l, r = _ce_pair_sql(ce)
        cond = f"({l}) IS NULL OR ({r}) IS NULL"
        if valid_string_pattern:
            p = valid_string_pattern.replace("\\", "\\\\").replace("'", "\\'")
            cond += (f" OR NOT (({l}) RLIKE '{p}')"
                     f" OR NOT (({r}) RLIKE '{p}')")
        return ComparisonLevel("null", column=ce.name,
                               label=f"{ce.output_column_name}_is_null",
                               sql_condition=cond)
    col_name = ce.name
    if valid_string_pattern:
        p = valid_string_pattern.replace("\\", "\\\\").replace("'", "\\'")
        return ComparisonLevel(
            "null", column=col_name, label="null_or_invalid",
            sql_condition=(
                f"{col_name}_l IS NULL OR {col_name}_r IS NULL OR "
                f"NOT ({col_name}_l RLIKE '{p}') OR "
                f"NOT ({col_name}_r RLIKE '{p}')"))
    return ComparisonLevel("null", column=col_name)


def ElseLevel() -> ComparisonLevel:
    return ComparisonLevel("else")


def CustomLevel(sql_condition: str, label_for_charts: str = None,
                base_dialect_str: str = None) -> ComparisonLevel:
    """Reference cll.CustomLevel:132 — raw level SQL, translated through
    the settings importer's recognise-or-refuse parser (interop.py) so
    duckdb-dialect conditions from reference code keep working."""
    from .interop import _parse_level
    d = {"sql_condition": sql_condition}
    if label_for_charts:
        d["label_for_charts"] = label_for_charts
    return _parse_level(d, base_dialect_str or "duckdb")


def ExactMatchLevel(col_name, term_frequency_adjustments: bool = False
                    ) -> ComparisonLevel:
    ce = _ce(col_name)
    if not ce.is_pure_column:
        if term_frequency_adjustments:
            raise ValueError(
                "term_frequency_adjustments need a raw column (the TF "
                "table is keyed by column values); materialize the "
                "expression as a column first")
        l, r = _ce_pair_sql(ce)
        return ComparisonLevel(
            "custom", column=ce.name,
            label=f"exact_{ce.output_column_name}",
            sql_condition=f"({l}) = ({r})")
    return ComparisonLevel("exact", column=ce.name,
                           tf_adjustment=term_frequency_adjustments)


def LiteralMatchLevel(col_name: str, literal_value: str,
                      literal_datatype: str = "string",
                      side_of_comparison: str = "both") -> ComparisonLevel:
    if side_of_comparison != "both":
        raise NotImplementedError(
            "only side_of_comparison='both' is supported")
    return ComparisonLevel("literal", column=col_name, literal=literal_value)


def ColumnsReversedLevel(col_name_1: str, col_name_2: str,
                         symmetrical: bool = False) -> ComparisonLevel:
    """Reference cll:356-396: default (symmetrical=False) is the
    ONE-directional `col1_l = col2_r`; symmetrical=True requires equality
    in both directions (`col1_l = col2_r AND col1_r = col2_l`) — which is
    exactly the engine's native columns_reversed kind."""
    if symmetrical:
        return ComparisonLevel("columns_reversed", column=col_name_1,
                               column2=col_name_2)
    return ComparisonLevel(
        "custom", column=col_name_1,
        label=f"reversed_{col_name_1}_{col_name_2}_one_direction",
        sql_condition=f"{col_name_1}_l = {col_name_2}_r")


# SQL-callable comparator names for expression inputs (builtin levenshtein;
# the rest are registered on the session by functions.similarity.register_udfs)
_METRIC_SQL_FN = {
    "levenshtein": ("levenshtein", "<="),
    "damerau_levenshtein": ("damerau_levenshtein", "<="),
    "jaro_winkler": ("jaro_winkler", ">="),
    "jaro": ("jaro_sim", ">="),
}


def _metric_level(kind: str, col_name, threshold) -> ComparisonLevel:
    ce = _ce(col_name)
    if ce.is_pure_column:
        return ComparisonLevel(kind, column=ce.name, threshold=threshold)
    if kind not in _METRIC_SQL_FN:
        raise NotImplementedError(
            f"{kind} over a ColumnExpression is not supported; materialize "
            "the expression as a column first")
    fn, op = _METRIC_SQL_FN[kind]
    l, r = _ce_pair_sql(ce)
    return ComparisonLevel(
        "custom", column=ce.name,
        label=f"{kind}_{ce.output_column_name}_{op}_{threshold}",
        sql_condition=f"{fn}(({l}), ({r})) {op} {threshold}")


def LevenshteinLevel(col_name, distance_threshold: int) -> ComparisonLevel:
    return _metric_level("levenshtein", col_name, distance_threshold)


def DamerauLevenshteinLevel(col_name, distance_threshold: int
                            ) -> ComparisonLevel:
    return _metric_level("damerau_levenshtein", col_name,
                         distance_threshold)


def JaroWinklerLevel(col_name, distance_threshold: float) -> ComparisonLevel:
    return _metric_level("jaro_winkler", col_name, distance_threshold)


def JaroLevel(col_name, distance_threshold: float) -> ComparisonLevel:
    return _metric_level("jaro", col_name, distance_threshold)


def JaccardLevel(col_name, distance_threshold: float) -> ComparisonLevel:
    return _metric_level("jaccard_chars", col_name, distance_threshold)


def DistanceFunctionLevel(col_name: str, distance_function_name: str,
                          distance_threshold: float,
                          higher_is_more_similar: bool = True
                          ) -> ComparisonLevel:
    op = ">=" if higher_is_more_similar else "<="
    return ComparisonLevel(
        "custom", column=col_name,
        label=f"{distance_function_name}_{op}_{distance_threshold}",
        sql_condition=(f"{distance_function_name}({col_name}_l, "
                       f"{col_name}_r) {op} {distance_threshold}"))


def PairwiseStringDistanceFunctionLevel(
        col_name: str, distance_function_name: str,
        distance_threshold) -> ComparisonLevel:
    kinds = {"levenshtein": "pairwise_levenshtein",
             "damerau_levenshtein": "pairwise_damerau_levenshtein",
             "jaro": "pairwise_jaro",
             "jaro_winkler": "pairwise_jaro_winkler"}
    if distance_function_name not in kinds:
        raise ValueError(
            f"distance_function_name must be one of {sorted(kinds)}, "
            f"got {distance_function_name!r}")
    return ComparisonLevel(kinds[distance_function_name], column=col_name,
                           threshold=distance_threshold)


def AbsoluteTimeDifferenceLevel(col_name: str, *, input_is_string: bool,
                                metric: str, threshold: float,
                                datetime_format: str = None
                                ) -> ComparisonLevel:
    seconds = _metric_seconds(threshold, metric)
    if not input_is_string:
        return ComparisonLevel("date_diff_seconds", column=col_name,
                               threshold=seconds)
    fmt = f", '{datetime_format}'" if datetime_format else ""
    ts = lambda side: f"try_to_timestamp({col_name}_{side}{fmt})"
    return ComparisonLevel(
        "custom", column=col_name,
        label=f"abs_time_diff_<=_{threshold:g}_{metric}",
        sql_condition=(f"abs(unix_timestamp({ts('l')}) - "
                       f"unix_timestamp({ts('r')})) <= {seconds:g}"))


def AbsoluteDateDifferenceLevel(col_name: str, *, input_is_string: bool,
                                metric: str, threshold: float,
                                datetime_format: str = None
                                ) -> ComparisonLevel:
    return AbsoluteTimeDifferenceLevel(
        col_name, input_is_string=input_is_string, metric=metric,
        threshold=threshold, datetime_format=datetime_format)


def DistanceInKMLevel(lat_col: str, long_col: str, km_threshold: float
                      ) -> ComparisonLevel:
    return ComparisonLevel("distance_in_km", threshold=km_threshold,
                           lat_column=lat_col, long_column=long_col)


def CosineSimilarityLevel(col_name: str, similarity_threshold: float
                          ) -> ComparisonLevel:
    return ComparisonLevel("cosine", column=col_name,
                           threshold=similarity_threshold)


def ArrayIntersectLevel(col_name: str, min_intersection: int = 1
                        ) -> ComparisonLevel:
    return ComparisonLevel("array_intersect", column=col_name,
                           threshold=min_intersection)


def ArraySubsetLevel(col_name: str, empty_is_subset: bool = False
                     ) -> ComparisonLevel:
    if empty_is_subset:
        raise NotImplementedError(
            "empty_is_subset=True is not supported (the engine's "
            "array_subset treats empty arrays as non-matching, like the "
            "reference default)")
    return ComparisonLevel("array_subset", column=col_name)


def PercentageDifferenceLevel(col_name: str, percentage_threshold: float
                              ) -> ComparisonLevel:
    return ComparisonLevel("pct_diff", column=col_name,
                           threshold=percentage_threshold)


def AbsoluteDifferenceLevel(col_name: str, difference_threshold: float
                            ) -> ComparisonLevel:
    return ComparisonLevel("abs_diff", column=col_name,
                           threshold=difference_threshold)
