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
    """Exact, same local-part, same domain, fuzzy, else
    (comparison_library.py:951)."""
    return Comparison(col, col, (
        _null(),
        ComparisonLevel("exact"),
        ComparisonLevel("custom", label="username_match",
                        sql_condition=f"split({col}_l, '@')[0] = split({col}_r, '@')[0]"),
        ComparisonLevel("jaro_winkler", threshold=0.88),
        ComparisonLevel("custom", label="domain_match",
                        sql_condition=f"split({col}_l, '@')[1] = split({col}_r, '@')[1]"),
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
