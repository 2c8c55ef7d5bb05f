"""Composite comparison factories — the reference's comparison_library.py
sugar (ExactMatch:14 ... CosineSimilarityAtThresholds:1193): each assembles
NullLevel + graded levels + ElseLevel around one mechanism (the ordered
level list -> gamma CASE, model.Comparison)."""

from __future__ import annotations

from .model import Comparison, ComparisonLevel


def _null(col=None):
    return ComparisonLevel("null", column=col)


def _else():
    return ComparisonLevel("else")


def exact_match(col: str, tf_adjustment: bool = False) -> Comparison:
    return Comparison(col, col, (
        _null(), ComparisonLevel("exact", tf_adjustment=tf_adjustment), _else()))


def _at_thresholds(kind: str, col: str, thresholds: list,
                   include_exact: bool = True, name: str | None = None
                   ) -> Comparison:
    levels = [_null()]
    if include_exact:
        levels.append(ComparisonLevel("exact"))
    for t in thresholds:
        levels.append(ComparisonLevel(kind, threshold=t))
    levels.append(_else())
    return Comparison(name or col, col, tuple(levels))


def levenshtein_at_thresholds(col: str, thresholds=(1, 2)) -> Comparison:
    return _at_thresholds("levenshtein", col, list(thresholds))


def damerau_levenshtein_at_thresholds(col: str, thresholds=(1, 2)) -> Comparison:
    return _at_thresholds("damerau_levenshtein", col, list(thresholds))


def jaro_at_thresholds(col: str, thresholds=(0.9, 0.7)) -> Comparison:
    return _at_thresholds("jaro", col, list(thresholds))


def jaro_winkler_at_thresholds(col: str, thresholds=(0.9, 0.7)) -> Comparison:
    return _at_thresholds("jaro_winkler", col, list(thresholds))


def jaccard_at_thresholds(col: str, thresholds=(0.9, 0.7)) -> Comparison:
    return _at_thresholds("jaccard_chars", col, list(thresholds))


def cosine_similarity_at_thresholds(col: str, thresholds=(0.9,)) -> Comparison:
    return _at_thresholds("cosine", col, list(thresholds), include_exact=False)


def array_intersect_at_sizes(col: str, sizes=(1,)) -> Comparison:
    levels = [_null()]
    for s in sorted(sizes, reverse=True):
        levels.append(ComparisonLevel("array_intersect", threshold=s))
    levels.append(_else())
    return Comparison(col, col, tuple(levels))


def absolute_date_difference_at_thresholds(
        col: str, thresholds_seconds=(86400, 30 * 86400)) -> Comparison:
    levels = [_null(), ComparisonLevel("exact")]
    for t in thresholds_seconds:
        levels.append(ComparisonLevel("date_diff_seconds", threshold=t))
    levels.append(_else())
    return Comparison(col, col, tuple(levels))


def distance_in_km_at_thresholds(lat_col: str, long_col: str,
                                 thresholds_km=(1, 10, 100),
                                 name: str = "location") -> Comparison:
    levels = [ComparisonLevel("null", column=lat_col)]
    for t in thresholds_km:
        levels.append(ComparisonLevel("distance_in_km", threshold=t,
                                      lat_column=lat_col, long_column=long_col))
    levels.append(_else())
    return Comparison(name, lat_col, tuple(levels))


def pairwise_string_distance_at_thresholds(col: str, thresholds=(1, 2)
                                           ) -> Comparison:
    levels = [_null(), ComparisonLevel("array_intersect", threshold=1)]
    for t in thresholds:
        levels.append(ComparisonLevel("pairwise_levenshtein", threshold=t))
    levels.append(_else())
    return Comparison(col, col, tuple(levels))


def custom_comparison(name: str, col: str | None,
                      levels: list[ComparisonLevel]) -> Comparison:
    return Comparison(name, col, tuple(levels))


# ----------------------------------------------------- domain-shaped sugar

def email_comparison(col: str = "email") -> Comparison:
    """Reference EmailComparison ladder (comparison_library.py:951-1000):
    null, TF-adjusted exact on the full email, exact on the username
    part, JW >= 0.88 on the full email, JW >= 0.88 on the username part,
    else. The username is extracted with the reference's own
    USERNAME_REGEX ('^[^@]+') via nullif(regexp_extract(...)) — null-safe
    for malformed addresses (array indexing on split() raises under
    Spark's default ANSI mode when '@' is absent)."""
    user = lambda s: f"nullif(regexp_extract({s}, '^[^@]+', 0), '')"
    return Comparison(col, col, (
        _null(),
        ComparisonLevel("exact", tf_adjustment=True),
        ComparisonLevel("custom", label="username_match",
                        sql_condition=f"{user(col + '_l')} = {user(col + '_r')}"),
        ComparisonLevel("jaro_winkler", threshold=0.88),
        ComparisonLevel("custom", label="username_jw_088",
                        sql_condition=(f"jaro_winkler({user(col + '_l')}, "
                                       f"{user(col + '_r')}) >= 0.88")),
        _else(),
    ))


def name_comparison(col: str) -> Comparison:
    """Exact, JW .92, JW .88, JW .7, else (comparison_library.py:1002)."""
    return Comparison(col, col, (
        _null(),
        ComparisonLevel("exact"),
        ComparisonLevel("jaro_winkler", threshold=0.92),
        ComparisonLevel("jaro_winkler", threshold=0.88),
        ComparisonLevel("jaro_winkler", threshold=0.70),
        _else(),
    ))


def forename_surname_comparison(forename: str = "first_name",
                                surname: str = "surname") -> Comparison:
    """Exact both, columns reversed, JW both, surname-only, forename-only,
    else (comparison_library.py:1087)."""
    return Comparison("forename_surname", forename, (
        ComparisonLevel("null", column=forename),
        ComparisonLevel("custom", label="exact_both",
                        sql_condition=f"{forename}_l = {forename}_r AND "
                                      f"{surname}_l = {surname}_r"),
        ComparisonLevel("columns_reversed", column=forename, column2=surname),
        ComparisonLevel("custom", label="jw_both",
                        sql_condition=f"jaro_winkler({forename}_l, {forename}_r) >= 0.88 "
                                      f"AND jaro_winkler({surname}_l, {surname}_r) >= 0.88"),
        ComparisonLevel("exact", column=surname, label="surname_only"),
        ComparisonLevel("exact", column=forename, label="forename_only"),
        _else(),
    ))


def date_of_birth_comparison(col: str = "dob") -> Comparison:
    """Exact, +-1 month, +-1 year, +-10 years, else
    (comparison_library.py:710)."""
    return Comparison(col, col, (
        _null(),
        ComparisonLevel("exact"),
        ComparisonLevel("date_diff_seconds", threshold=31 * 86400),
        ComparisonLevel("date_diff_seconds", threshold=366 * 86400),
        ComparisonLevel("date_diff_seconds", threshold=3660 * 86400),
        _else(),
    ))


def postcode_comparison(col: str = "postcode") -> Comparison:
    """Full match, sector, district, area, else (comparison_library.py:833).
    UK postcode shapes via regexp_extract."""
    sector = lambda s: f"regexp_extract({s}, '^(.*? ?[0-9])', 1)"
    district = lambda s: f"regexp_extract({s}, '^([A-Za-z]+[0-9][A-Za-z0-9]?)', 1)"
    area = lambda s: f"regexp_extract({s}, '^([A-Za-z]+)', 1)"
    return Comparison(col, col, (
        _null(),
        ComparisonLevel("exact"),
        ComparisonLevel("custom", label="sector",
                        sql_condition=f"{sector(col + '_l')} = {sector(col + '_r')}"),
        ComparisonLevel("custom", label="district",
                        sql_condition=f"{district(col + '_l')} = {district(col + '_r')}"),
        ComparisonLevel("custom", label="area",
                        sql_condition=f"{area(col + '_l')} = {area(col + '_r')}"),
        _else(),
    ))


# ---- level composition (reference comparison_level_composition.py) ---------

def And(*levels: ComparisonLevel, **attrs) -> ComparisonLevel:
    """Level whose condition is the AND of the given levels' conditions
    (reference comparison_level_composition.py:54-66). An And of only null
    levels is itself a null level. Level attributes (m, u, label,
    tf_adjustment, ...) may be set via keyword args."""
    return ComparisonLevel("and", sub_levels=tuple(levels), **attrs)


def Or(*levels: ComparisonLevel, **attrs) -> ComparisonLevel:
    """Level whose condition is the OR of the given levels' conditions
    (reference comparison_level_composition.py:69-81)."""
    return ComparisonLevel("or", sub_levels=tuple(levels), **attrs)


def Not(level: ComparisonLevel, **attrs) -> ComparisonLevel:
    """Level whose condition negates the given level's condition (reference
    comparison_level_composition.py:84-106); never a null level, even when
    the negated level is."""
    return ComparisonLevel("not", sub_levels=(level,), **attrs)


# ===================== reference creator-class aliases =====================
# The reference's user-facing comparison API is PascalCase creator classes
# (comparison_library.py:14-1193: ExactMatch, LevenshteinAtThresholds, ...)
# with reference argument names, plus .configure(term_frequency_adjustments/
# m_probabilities/u_probabilities) — implemented here as factories returning
# model.Comparison (which carries .configure), so a migrating user's
# `import ... as cl; cl.ExactMatch("city").configure(...)` runs unchanged.

def _iter(x):
    return list(x) if isinstance(x, (list, tuple)) else [x]


# reference comparison_level_library.py:757-766 conversion factors
TIME_METRIC_SECONDS = {
    "second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0,
    "month": 86400.0 * 365.25 / 12, "year": 86400.0 * 365.25,
}


def _metric_seconds(threshold: float, metric: str) -> float:
    if metric not in TIME_METRIC_SECONDS:
        raise ValueError(
            f"metric must be one of {sorted(TIME_METRIC_SECONDS)}, "
            f"got {metric!r}")
    return float(threshold) * TIME_METRIC_SECONDS[metric]


def _ce_metric_comparison(kind: str, ce, thresholds: list) -> Comparison:
    """Comparison over a transformed ColumnExpression: the expression
    renders into each level's SQL, exactly how the reference's creator
    classes emit it (comparison_creator.py renders col_expression per
    level). The base column is the comparison column, so projection
    carries it to the pair table."""
    from . import comparison_level_library as cll
    levels = [cll.NullLevel(ce), cll.ExactMatchLevel(ce)]
    levels += [cll._metric_level(kind, ce, t) for t in thresholds]
    levels.append(_else())
    return Comparison(ce.output_column_name, ce.name, tuple(levels))


def _maybe_ce(col_name):
    from .functions.column_expression import ColumnExpression
    ce = ColumnExpression.instantiate_if_str(col_name)
    return ce if not ce.is_pure_column else None


def ExactMatch(col_name) -> Comparison:
    ce = _maybe_ce(col_name)
    if ce is not None:
        from . import comparison_level_library as cll
        return Comparison(ce.output_column_name, ce.name, (
            cll.NullLevel(ce), cll.ExactMatchLevel(ce), _else()))
    name = col_name if isinstance(col_name, str) else col_name.name
    return exact_match(name)


def LevenshteinAtThresholds(
        col_name, distance_threshold_or_thresholds=(1, 2)) -> Comparison:
    ce = _maybe_ce(col_name)
    if ce is not None:
        return _ce_metric_comparison(
            "levenshtein", ce, _iter(distance_threshold_or_thresholds))
    name = col_name if isinstance(col_name, str) else col_name.name
    return levenshtein_at_thresholds(
        name, _iter(distance_threshold_or_thresholds))


def DamerauLevenshteinAtThresholds(
        col_name, distance_threshold_or_thresholds=(1, 2)) -> Comparison:
    ce = _maybe_ce(col_name)
    if ce is not None:
        return _ce_metric_comparison(
            "damerau_levenshtein", ce,
            _iter(distance_threshold_or_thresholds))
    name = col_name if isinstance(col_name, str) else col_name.name
    return damerau_levenshtein_at_thresholds(
        name, _iter(distance_threshold_or_thresholds))


def JaccardAtThresholds(
        col_name: str, score_threshold_or_thresholds=(0.9, 0.7)) -> Comparison:
    return jaccard_at_thresholds(
        col_name, _iter(score_threshold_or_thresholds))


def JaroAtThresholds(
        col_name, score_threshold_or_thresholds=(0.9, 0.7)) -> Comparison:
    ce = _maybe_ce(col_name)
    if ce is not None:
        return _ce_metric_comparison(
            "jaro", ce, _iter(score_threshold_or_thresholds))
    name = col_name if isinstance(col_name, str) else col_name.name
    return jaro_at_thresholds(name, _iter(score_threshold_or_thresholds))


def JaroWinklerAtThresholds(
        col_name, score_threshold_or_thresholds=(0.9, 0.7)) -> Comparison:
    ce = _maybe_ce(col_name)
    if ce is not None:
        return _ce_metric_comparison(
            "jaro_winkler", ce, _iter(score_threshold_or_thresholds))
    name = col_name if isinstance(col_name, str) else col_name.name
    return jaro_winkler_at_thresholds(
        name, _iter(score_threshold_or_thresholds))


def CosineSimilarityAtThresholds(
        col_name: str, score_threshold_or_thresholds=(0.9,)) -> Comparison:
    return cosine_similarity_at_thresholds(
        col_name, _iter(score_threshold_or_thresholds))


def ArrayIntersectAtSizes(
        col_name: str, size_threshold_or_thresholds=(1,)) -> Comparison:
    return array_intersect_at_sizes(
        col_name, _iter(size_threshold_or_thresholds))


def DistanceInKMAtThresholds(lat_col: str, long_col: str,
                             km_thresholds) -> Comparison:
    return distance_in_km_at_thresholds(lat_col, long_col,
                                        _iter(km_thresholds))


def DistanceFunctionAtThresholds(
        col_name: str, distance_function_name: str,
        distance_threshold_or_thresholds,
        higher_is_more_similar: bool = True) -> Comparison:
    """Exact + custom `fn(l, r) >= t` (or <= t) levels + else (reference
    comparison_library.py:287). The function must be callable in Spark SQL
    (builtin or a registered UDF — this engine registers jaro_winkler,
    jaro_sim, damerau_levenshtein, cosine_similarity)."""
    op = ">=" if higher_is_more_similar else "<="
    levels = [_null(), ComparisonLevel("exact")]
    for t in _iter(distance_threshold_or_thresholds):
        levels.append(ComparisonLevel(
            "custom", label=f"{distance_function_name}_{op}_{t}",
            sql_condition=(f"{distance_function_name}({col_name}_l, "
                           f"{col_name}_r) {op} {t}")))
    levels.append(_else())
    return Comparison(col_name, col_name, tuple(levels))


def PairwiseStringDistanceFunctionAtThresholds(
        col_name: str, distance_function_name: str,
        distance_threshold_or_thresholds) -> Comparison:
    """Best cross-product string metric over array<string> columns at
    graded thresholds (reference comparison_library.py:348): exact array
    match first, then pairwise levels."""
    kinds = {"levenshtein": "pairwise_levenshtein",
             "damerau_levenshtein": "pairwise_damerau_levenshtein",
             "jaro": "pairwise_jaro",
             "jaro_winkler": "pairwise_jaro_winkler"}
    if distance_function_name not in kinds:
        raise ValueError(
            f"distance_function_name must be one of {sorted(kinds)}, "
            f"got {distance_function_name!r}")
    levels = [_null(), ComparisonLevel("exact")]
    for t in _iter(distance_threshold_or_thresholds):
        levels.append(ComparisonLevel(kinds[distance_function_name],
                                      threshold=t))
    levels.append(_else())
    return Comparison(col_name, col_name, tuple(levels))


def _time_difference_comparison(col_name: str, *, input_is_string: bool,
                                metrics, thresholds,
                                datetime_format: str | None,
                                term_frequency_adjustments: bool,
                                invalid_dates_as_null: bool) -> Comparison:
    metrics, thresholds = _iter(metrics), _iter(thresholds)
    if len(metrics) != len(thresholds):
        raise ValueError(
            f"metrics and thresholds must align: {len(metrics)} metrics "
            f"vs {len(thresholds)} thresholds")
    seconds = [_metric_seconds(t, m) for t, m in zip(thresholds, metrics)]
    if sorted(seconds) != seconds:
        raise ValueError(
            "thresholds must be in ascending order of elapsed time")
    if input_is_string:
        fmt = f", '{datetime_format}'" if datetime_format else ""
        ts = lambda side: f"try_to_timestamp({col_name}_{side}{fmt})"
        if invalid_dates_as_null:
            null_lv = ComparisonLevel(
                "null", column=col_name, label="invalid_or_null",
                sql_condition=(f"{ts('l')} IS NULL OR {ts('r')} IS NULL"))
        else:
            null_lv = _null()
        diff_lv = lambda s: ComparisonLevel(
            "custom", label=f"abs_time_diff_<=_{s:g}s",
            sql_condition=(f"abs(unix_timestamp({ts('l')}) - "
                           f"unix_timestamp({ts('r')})) <= {s:g}"))
    else:
        null_lv = _null()
        diff_lv = lambda s: ComparisonLevel("date_diff_seconds", threshold=s)
    levels = [null_lv,
              ComparisonLevel("exact",
                              tf_adjustment=term_frequency_adjustments)]
    levels += [diff_lv(s) for s in seconds]
    levels.append(_else())
    return Comparison(col_name, col_name, tuple(levels))


def AbsoluteTimeDifferenceAtThresholds(
        col_name: str, *, input_is_string: bool, metrics, thresholds,
        datetime_format: str = None, term_frequency_adjustments: bool = False,
        invalid_dates_as_null: bool = True) -> Comparison:
    """Reference comparison_library.py:418: exact + elapsed-time levels."""
    return _time_difference_comparison(
        col_name, input_is_string=input_is_string, metrics=metrics,
        thresholds=thresholds, datetime_format=datetime_format,
        term_frequency_adjustments=term_frequency_adjustments,
        invalid_dates_as_null=invalid_dates_as_null)


def AbsoluteDateDifferenceAtThresholds(
        col_name: str, *, input_is_string: bool, metrics, thresholds,
        datetime_format: str = None, term_frequency_adjustments: bool = False,
        invalid_dates_as_null: bool = True) -> Comparison:
    """Reference comparison_library.py:539 (same mechanics over dates)."""
    return _time_difference_comparison(
        col_name, input_is_string=input_is_string, metrics=metrics,
        thresholds=thresholds, datetime_format=datetime_format,
        term_frequency_adjustments=term_frequency_adjustments,
        invalid_dates_as_null=invalid_dates_as_null)


def CustomComparison(comparison_levels, output_column_name: str = None,
                     comparison_description: str = None) -> Comparison:
    """Reference comparison_library.py:645: assemble a comparison from
    level objects (ours) or reference level dicts (routed through the
    settings importer's recognise-or-refuse parser)."""
    levels = []
    for lv in comparison_levels:
        if isinstance(lv, ComparisonLevel):
            levels.append(lv)
        elif isinstance(lv, dict):
            from .interop import _parse_level
            levels.append(_parse_level(lv, lv.get("sql_dialect", "duckdb")))
        else:
            raise TypeError(
                f"comparison level must be a ComparisonLevel or dict, "
                f"got {type(lv)}")
    name = output_column_name
    if not name:
        cols = [lv.column for lv in levels if lv.column]
        if not cols:
            raise ValueError(
                "output_column_name is required when no level names a "
                "column")
        name = cols[0]
    col = next((lv.column for lv in levels if lv.column), None)
    return Comparison(name, col, tuple(levels))


def DateOfBirthComparison(
        col_name: str, *, input_is_string: bool,
        datetime_thresholds=(1, 1, 10),
        datetime_metrics=("month", "year", "year"),
        datetime_format: str = None,
        invalid_dates_as_null: bool = True) -> Comparison:
    """Reference comparison_library.py:710-830: null (invalid dates as
    null when parsing strings), exact, Damerau-Levenshtein <= 1 on the
    date STRING (catches single-digit typos and day-month transposes),
    graded absolute date differences, else."""
    base = _time_difference_comparison(
        col_name, input_is_string=input_is_string,
        metrics=datetime_metrics, thresholds=datetime_thresholds,
        datetime_format=datetime_format, term_frequency_adjustments=False,
        invalid_dates_as_null=invalid_dates_as_null)
    # the reference's second level: DL<=1 on the string form
    # (comparison_library.py:803-807); non-string inputs are cast
    if input_is_string:
        dl = ComparisonLevel("damerau_levenshtein", column=col_name,
                             threshold=1, label="dl_1_on_date_string")
    else:
        from .functions.column_expression import ColumnExpression
        from . import comparison_level_library as cll
        dl = cll.DamerauLevenshteinLevel(
            ColumnExpression(col_name).cast_to_string(), 1)
    levels = list(base.levels)
    return Comparison(base.name, base.column,
                      tuple(levels[:2] + [dl] + levels[2:]))


def PostcodeComparison(col_name: str = "postcode") -> Comparison:
    return postcode_comparison(col_name)


def EmailComparison(col_name: str = "email") -> Comparison:
    return email_comparison(col_name)


def NameComparison(col_name: str,
                   jaro_winkler_thresholds=(0.92, 0.88, 0.7),
                   dmeta_col_name: str = None) -> Comparison:
    """Reference comparison_library.py:1002-1085: TF-adjusted exact match,
    JW levels >= 0.88, then (when a dmeta array column is provided) an
    array-intersect level on it, then the looser JW levels."""
    levels = [_null(),
              ComparisonLevel("exact", tf_adjustment=True)]
    thresholds = _iter(jaro_winkler_thresholds)
    levels += [ComparisonLevel("jaro_winkler", threshold=t)
               for t in thresholds if t >= 0.88]
    if dmeta_col_name is not None:
        levels.append(ComparisonLevel("array_intersect",
                                      column=dmeta_col_name, threshold=1))
    levels += [ComparisonLevel("jaro_winkler", threshold=t)
               for t in thresholds if t < 0.88]
    levels.append(_else())
    return Comparison(col_name, col_name, tuple(levels))


def ForenameSurnameComparison(
        forename_col_name: str, surname_col_name: str,
        jaro_winkler_thresholds=(0.92, 0.88),
        forename_surname_concat_col_name: str = None) -> Comparison:
    """Reference comparison_library.py:1087-1189: null only when BOTH
    name parts are null (And of null levels), TF-adjusted exact match
    (on the pre-concatenated column when provided), symmetrical
    columns-reversed, JW-both levels, then TF-adjusted surname-only and
    forename-only exact levels."""
    if forename_surname_concat_col_name:
        exact_both = ComparisonLevel(
            "exact", column=forename_surname_concat_col_name,
            tf_adjustment=True, label="exact_forename_surname")
    else:
        exact_both = ComparisonLevel(
            "custom", label="exact_both",
            sql_condition=(
                f"{forename_col_name}_l = {forename_col_name}_r AND "
                f"{surname_col_name}_l = {surname_col_name}_r"))
    levels = [And(ComparisonLevel("null", column=forename_col_name),
                  ComparisonLevel("null", column=surname_col_name),
                  label="both_null"),
              exact_both,
              ComparisonLevel("columns_reversed", column=forename_col_name,
                              column2=surname_col_name)]
    for t in _iter(jaro_winkler_thresholds):
        levels.append(And(
            ComparisonLevel("jaro_winkler", column=forename_col_name,
                            threshold=t),
            ComparisonLevel("jaro_winkler", column=surname_col_name,
                            threshold=t),
            label=f"jw_both_{t}"))
    levels += [
        ComparisonLevel("exact", column=surname_col_name,
                        tf_adjustment=True, label="surname_only"),
        ComparisonLevel("exact", column=forename_col_name,
                        tf_adjustment=True, label="forename_only"),
        _else(),
    ]
    return Comparison("forename_surname", forename_col_name, tuple(levels))
