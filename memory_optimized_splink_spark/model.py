"""Model objects: comparison levels, comparisons, blocking rules, settings.

Semantics mirror the reference (not its architecture):
- gamma assignment: null level -> -1, graded levels descending, else -> 0
  (/root/reference/splink/internals/comparison.py:87-105).
- m/u defaults when untrained (/root/reference/splink/internals/
  comparison_level.py:85-106): top level m=0.95 with the remainder spread
  uniformly; u defaults spread by fixed weights. Training overwrites these.
- fork extras: `only_help` (m clamped to >= u pre-predict,
  inference.py:158-175), TF adjustment parameters
  (comparison_level.py:155-181), `tf_minimum_u_value` floor
  (comparison_level.py:682-718).
- JSON round-trip like settings.py:604-629.
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field, replace

SIM_KINDS = {"jaro_winkler", "jaro", "jaccard_chars", "cosine"}
DIST_KINDS = {"levenshtein", "damerau_levenshtein", "abs_diff",
              "date_diff_seconds", "distance_in_km"}


@dataclass(frozen=True)
class ComparisonLevel:
    kind: str  # null|exact|else|custom|literal|array_intersect|pct_diff|<SIM>|<DIST>
    label: str = ""
    column: str | None = None      # defaults to the comparison's column
    threshold: float | None = None  # >= for SIM_KINDS, <= for DIST_KINDS
    sql_condition: str | None = None  # custom: Spark SQL over <col>_l/_r
    literal: str | None = None
    m: float | None = None
    u: float | None = None
    tf_adjustment: bool = False
    tf_adjustment_weight: float = 1.0  # upstream-style (u/tf)^w exponent
    tf_minimum_u_value: float = 0.0
    only_help: bool = False
    # second column for columns_reversed levels (a_l=b_r AND b_l=a_r)
    column2: str | None = None
    # lat/long columns for distance_in_km levels
    lat_column: str | None = None
    long_column: str | None = None
    # fork fuzzy-TF params (/root/reference/.../comparison_level.py:720-744)
    fuzzy_similarity_value: float | None = None
    fuzzy_max_epsilon: float | None = None
    # composed levels (reference comparison_level_composition.py And/Or/Not):
    # kind in ("and", "or", "not"); the condition combines the sub levels'
    sub_levels: tuple["ComparisonLevel", ...] = ()

    def __post_init__(self):
        if isinstance(self.sub_levels, list):
            object.__setattr__(self, "sub_levels", tuple(self.sub_levels))
        if self.kind in ("and", "or") and not self.sub_levels:
            raise ValueError(f"'{self.kind}' level needs >=1 sub_levels")
        if self.kind == "not" and len(self.sub_levels) != 1:
            raise ValueError("'not' level needs exactly 1 sub_level")

    @property
    def is_null_level(self) -> bool:
        """An And/Or of only-null levels is itself a null level; a Not of a
        null level is not (reference comparison_level_composition.py:40,
        100-102)."""
        if self.kind == "null":
            return True
        if self.kind in ("and", "or"):
            return all(s.is_null_level for s in self.sub_levels)
        return False

    def walk(self):
        """This level and every nested sub level, depth-first."""
        yield self
        for s in self.sub_levels:
            yield from s.walk()

    def describe(self) -> str:
        if self.label:
            return self.label
        if self.kind in ("and", "or"):
            op = f" {self.kind.upper()} "
            return op.join(f"({s.describe()})" for s in self.sub_levels)
        if self.kind == "not":
            return f"NOT ({self.sub_levels[0].describe()})"
        if self.kind in ("null", "else", "exact"):
            return self.kind
        if self.threshold is not None:
            return f"{self.kind}_{self.threshold}"
        return self.kind


@dataclass(frozen=True)
class Comparison:
    name: str                      # output: gamma_<name>, bf_<name>
    column: str | None             # main input column (None for custom-only)
    levels: tuple[ComparisonLevel, ...] = ()

    def __post_init__(self):
        if isinstance(self.levels, list):
            object.__setattr__(self, "levels", tuple(self.levels))

    @property
    def null_level(self) -> ComparisonLevel | None:
        for lv in self.levels:
            if lv.is_null_level:
                return lv
        return None

    @property
    def graded_levels(self) -> list[tuple[int, ComparisonLevel]]:
        """(gamma_value, level) for non-null levels; first graded level gets
        the highest gamma, the else level gets 0."""
        non_null = [lv for lv in self.levels if not lv.is_null_level]
        n = len(non_null)
        return [(n - 1 - i, lv) for i, lv in enumerate(non_null)]

    @property
    def gamma_column(self) -> str:
        return f"gamma_{self.name}"

    @property
    def bf_column(self) -> str:
        return f"bf_{self.name}"

    def configure(
        self,
        *,
        term_frequency_adjustments: bool | None = None,
        m_probabilities: list[float] | None = None,
        u_probabilities: list[float] | None = None,
    ) -> "Comparison":
        """Reference ComparisonCreator.configure
        (comparison_creator.py:150-195): m/u lists map onto the non-null
        levels in declared order (exact first, ELSE last); TF adjustments
        apply to exact-match levels only. Mutates in place and returns self,
        matching the reference's call-without-reassignment idiom."""
        non_null = [lv for lv in self.levels if not lv.is_null_level]
        for label, probs in (("m_probabilities", m_probabilities),
                             ("u_probabilities", u_probabilities)):
            if probs is not None and len(probs) != len(non_null):
                raise ValueError(
                    f"{label} has {len(probs)} entries but this comparison "
                    f"has {len(non_null)} non-null levels")
        new_levels, i = [], 0
        for lv in self.levels:
            if lv.is_null_level:
                new_levels.append(lv)
                continue
            changes: dict = {}
            if m_probabilities is not None:
                changes["m"] = float(m_probabilities[i])
            if u_probabilities is not None:
                changes["u"] = float(u_probabilities[i])
            if term_frequency_adjustments is not None and lv.kind == "exact":
                changes["tf_adjustment"] = bool(term_frequency_adjustments)
            new_levels.append(replace(lv, **changes) if changes else lv)
            i += 1
        object.__setattr__(self, "levels", tuple(new_levels))
        return self

    def with_defaults(self) -> "Comparison":
        """Fill missing m/u with untrained defaults."""
        graded = self.graded_levels
        n = len(graded)
        new_levels = []
        for lv in self.levels:
            if lv.is_null_level:
                new_levels.append(lv)
                continue
            gamma = next(g for g, l2 in graded if l2 is lv)
            m = lv.m
            u = lv.u
            if m is None:
                m = 0.95 if gamma == n - 1 else 0.05 / max(n - 1, 1)
            if u is None:
                # fixed default match weights spaced over levels
                w = -5.0 + 8.0 * (gamma / max(n - 1, 1))
                u = m / (2.0 ** w)
            new_levels.append(replace(lv, m=m, u=u))
        # normalize u to <=1 domain
        total_u = sum(lv.u for lv in new_levels if not lv.is_null_level)
        if total_u > 1.0:
            new_levels = [
                lv if lv.is_null_level else replace(lv, u=lv.u / total_u)
                for lv in new_levels
            ]
        return replace(self, levels=tuple(new_levels))


@dataclass(frozen=True)
class BlockingRule:
    """Candidate-generation rule.

    keys: list of Spark SQL expressions over node columns; a pair blocks
          together when all key expressions are equal (equi path, the fast
          one: repartition-by-key hash join).
    sql:  raw theta condition over aliases l/r (slow path).
    salting_partitions: static salt fan-out like the reference's
          (/root/reference/splink/internals/blocking.py:340-401).
    hot_key_threshold: rows-per-key above which the key is split explicitly
          (north rule: measured hot-key splitting).
    """
    keys: tuple[str, ...] | None = None
    sql: str | None = None
    label: str = ""
    salting_partitions: int = 1
    hot_key_threshold: int | None = None
    # array columns among `keys` to unnest before the equi-join (exploding
    # rule, /root/reference/splink/internals/blocking.py:404-543); matched
    # pairs are deduped on the id pair afterwards.
    explode_columns: tuple[str, ...] = ()

    def __post_init__(self):
        if isinstance(self.keys, list):
            object.__setattr__(self, "keys", tuple(self.keys))
        if isinstance(self.explode_columns, list):
            object.__setattr__(self, "explode_columns", tuple(self.explode_columns))
        if self.keys is None and self.sql is None:
            raise ValueError("BlockingRule needs keys or sql")


def block_on(*cols: str, **kw) -> BlockingRule:
    return BlockingRule(keys=tuple(cols), label=kw.pop("label", "_".join(cols)), **kw)


@dataclass(frozen=True)
class Settings:
    comparisons: tuple[Comparison, ...]
    blocking_rules: tuple[BlockingRule, ...]
    probability_two_random_records_match: float = 1e-4
    unique_id_column_name: str = "unique_id"
    source_dataset_column_name: str | None = None
    link_type: str = "dedupe_only"  # dedupe_only | link_only | link_and_dedupe
    em_convergence: float = 1e-4
    max_iterations: int = 25
    retain_matching_columns: bool = False
    # keep the per-comparison bf_* / tf-multiplier columns in predict
    # output (reference settings.py retain_intermediate_calculation_columns)
    retain_intermediate_calculation_columns: bool = False
    # "fork_count": N/tf count formulas (the fork's predict,
    #   comparison_level.py:682-744); "upstream_ratio": (u/tf)^weight
    #   (upstream Splink / Splink-2 golden semantics)
    tf_style: str = "fork_count"
    additional_columns_to_retain: tuple[str, ...] = ()
    tf_columns: tuple[str, ...] = ()
    tf_array_columns: tuple[str, ...] = ()
    seed: int = 42
    # compute pandas-UDF metrics over DISTINCT value pairs and join back
    # (vectors.with_comparison_metrics): a big win when comparison columns
    # repeat across candidate pairs (names/cities/dobs), a net cost for
    # near-unique columns — hence opt-in
    dedupe_metric_values: bool = False
    # pair-scoring join strategy: the candidate-pair table is ALWAYS much
    # bigger than the node table (pairs ~ nodes x avg block size), so
    # broadcasting the projected node side lets pairs stream with ZERO
    # shuffle. Catalyst's own autoBroadcastJoinThreshold (64 MB here) is
    # tuned for general queries and silently flips to sort-merge once the
    # node projection outgrows it — which re-shuffles the huge pair table
    # twice (measured 6.6x per-pair slowdown at 169M pairs). This cap
    # (bytes, Catalyst plan-stats estimate) forces the broadcast up to
    # ~1 GB; beyond it (1e9+ node rows at cluster scale) the engine falls
    # back to Catalyst's choice / the bucketed co-located node path.
    broadcast_node_join_max_bytes: int = 1 << 30

    def __post_init__(self):
        for f_ in ("comparisons", "blocking_rules", "additional_columns_to_retain",
                   "tf_columns", "tf_array_columns"):
            v = getattr(self, f_)
            if isinstance(v, list):
                object.__setattr__(self, f_, tuple(v))

    def with_defaults(self) -> "Settings":
        # TF needs are declared on levels (tf_adjustment) — collect any the
        # caller didn't list in tf_columns, so library comparisons with
        # default-on TF (NameComparison etc.) work in plain Settings too
        tf_cols = list(self.tf_columns)
        for comp in self.comparisons:
            for top in comp.levels:
                for lv in top.walk():
                    c = lv.column or comp.column
                    if lv.tf_adjustment and c and c not in tf_cols \
                            and c not in self.tf_array_columns:
                        tf_cols.append(c)
        return replace(
            self,
            comparisons=tuple(c.with_defaults() for c in self.comparisons),
            tf_columns=tuple(tf_cols),
        )

    # ----------------------------------------------------------- validation
    def columns_used(self) -> set[str]:
        """Every input column the settings reference (comparisons, TF
        config, retained columns; bare equi-join blocking keys)."""
        import re

        cols: set[str] = {self.unique_id_column_name}
        if self.source_dataset_column_name:
            cols.add(self.source_dataset_column_name)
        for comp in self.comparisons:
            for top in comp.levels:
                for lv in top.walk():
                    for c in (lv.column or comp.column, lv.column2,
                              lv.lat_column, lv.long_column):
                        if c:
                            cols.add(c)
        for rule in self.blocking_rules:
            for k in (rule.keys or ()):
                if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", k.strip()):
                    cols.add(k.strip())
        cols |= set(self.additional_columns_to_retain)
        cols |= set(self.tf_columns) | set(self.tf_array_columns)
        return cols

    def validate_against(self, input_columns: list[str]) -> None:
        """Cross-check referenced columns against the input table
        (reference linker.py:316-334 / settings_validation): raise with the
        full missing list up front instead of failing mid-pipeline. TF join
        columns (tf_<col>) are derived, so they're exempted."""
        have = set(input_columns)
        missing = sorted(
            c for c in self.columns_used()
            if c not in have and not (
                c.startswith("tf_") and c[3:] in have))
        if missing:
            raise ValueError(
                f"settings reference columns missing from the input table: "
                f"{missing}; input has {sorted(have)}")
        if self.link_type not in ("dedupe_only", "link_only",
                                  "link_and_dedupe"):
            raise ValueError(f"unknown link_type {self.link_type!r}")
        if not 0.0 < self.probability_two_random_records_match < 1.0:
            raise ValueError(
                "probability_two_random_records_match must be in (0, 1)")

    # ---------------------------------------------------------------- JSON
    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Settings":
        d = json.loads(s)

        def _level(lv: dict) -> ComparisonLevel:
            lv = dict(lv)
            lv["sub_levels"] = tuple(
                _level(sub) for sub in lv.get("sub_levels", ()))
            return ComparisonLevel(**lv)

        d["comparisons"] = tuple(
            Comparison(
                name=c["name"], column=c["column"],
                levels=tuple(_level(lv) for lv in c["levels"]),
            )
            for c in d["comparisons"]
        )
        d["blocking_rules"] = tuple(
            BlockingRule(
                keys=tuple(b["keys"]) if b.get("keys") else None,
                sql=b.get("sql"), label=b.get("label", ""),
                salting_partitions=b.get("salting_partitions", 1),
                hot_key_threshold=b.get("hot_key_threshold"),
                explode_columns=tuple(b.get("explode_columns", ())),
            )
            for b in d["blocking_rules"]
        )
        for f_ in ("additional_columns_to_retain", "tf_columns", "tf_array_columns"):
            d[f_] = tuple(d.get(f_, ()))
        return Settings(**d)


# ---------------------------------------------------------- probability math
# (/root/reference/splink/internals/misc.py:19-32)

def prob_to_bayes_factor(p: float) -> float:
    return p / (1 - p) if p < 1 else math.inf


def bayes_factor_to_prob(bf: float) -> float:
    return 1.0 if math.isinf(bf) else bf / (1 + bf)


def match_weight_to_prob(w: float) -> float:
    return bayes_factor_to_prob(2.0 ** w)
