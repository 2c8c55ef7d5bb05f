"""Reference-parity `SettingsCreator` authoring surface.

The reference's user-facing entrypoint for authoring a model is
`SettingsCreator` (/root/reference/splink/internals/settings_creator.py:18-48):
a non-dialected dataclass holding `link_type`, `comparisons` (library
objects OR raw dicts), `blocking_rules_to_generate_predictions` (library
objects, SQL strings, or dicts) and the training/retention scalars, which
the reference `Linker` accepts directly or via
`SettingsCreator.from_path_or_dict` (settings_creator.py:108-135). This
module mirrors that surface 1:1 so a migrating user's authoring code runs
unchanged:

    settings = SettingsCreator(
        link_type="dedupe_only",
        comparisons=[cl.exact_match("city"),          # our library objects
                     {"output_column_name": "email",  # or reference dicts
                      "comparison_levels": [...]}],
        blocking_rules_to_generate_predictions=[
            block_on("city"), "l.surname = r.surname"],
    )
    linker = SparkLinker(spark, df, settings)

Dict-form comparisons and string/dict blocking rules route through the
same recognise-or-refuse importer as saved-model JSON (interop.py), so
they score on the vectorized native kernels wherever the SQL matches a
known pattern and refuse loudly otherwise.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Union

from .model import BlockingRule, Comparison, Settings


def _to_comparison(c: Union[Comparison, dict],
                   tf_columns: list[str]) -> Comparison:
    if isinstance(c, Comparison):
        for lv in c.levels:
            col = lv.column or c.column
            if lv.tf_adjustment and col:
                tf_columns.append(col)
        return c
    if isinstance(c, dict):
        from .interop import parse_comparison_dict
        comp, comp_tf = parse_comparison_dict(
            c, c.get("sql_dialect", "duckdb"))
        tf_columns.extend(comp_tf)
        return comp
    raise TypeError(
        f"comparison must be a Comparison or a reference settings dict, "
        f"got {type(c)}")


def _to_blocking_rule(b: Union[BlockingRule, str, dict]) -> BlockingRule:
    if isinstance(b, BlockingRule):
        return b
    if isinstance(b, (str, dict)):
        from .interop import _parse_blocking_rule
        return _parse_blocking_rule(b)
    raise TypeError(
        f"blocking rule must be a BlockingRule, SQL string, or dict, "
        f"got {type(b)}")


@dataclass
class SettingsCreator:
    """Field-for-field mirror of the reference's authoring dataclass
    (settings_creator.py:18-46). `to_settings()` produces this engine's
    frozen `Settings`; `SparkLinker` accepts a SettingsCreator (or dict or
    model-JSON path) wherever it accepts Settings."""

    link_type: str = "dedupe_only"
    comparisons: list = field(default_factory=list)
    blocking_rules_to_generate_predictions: list = field(default_factory=list)
    probability_two_random_records_match: float = 1e-4
    em_convergence: float = 1e-4
    max_iterations: int = 25
    retain_matching_columns: bool = True
    retain_intermediate_calculation_columns: bool = False
    additional_columns_to_retain: list = field(default_factory=list)
    unique_id_column_name: str = "unique_id"
    source_dataset_column_name: str = "source_dataset"
    # accepted for signature parity; this engine derives its column names
    # the same way the reference does, so overrides are refused loudly
    bayes_factor_column_prefix: str = "bf_"
    term_frequency_adjustment_column_prefix: str = "tf_"
    comparison_vector_value_column_prefix: str = "gamma_"
    linker_uid: str | None = None

    def to_settings(self, tf_style: str = "fork_count") -> Settings:
        for name, want in (("bayes_factor_column_prefix", "bf_"),
                           ("term_frequency_adjustment_column_prefix", "tf_"),
                           ("comparison_vector_value_column_prefix",
                            "gamma_")):
            if getattr(self, name) != want:
                raise ValueError(
                    f"{name}={getattr(self, name)!r} is not supported: this "
                    f"engine derives {want!r}-prefixed columns natively")
        tf_columns: list[str] = []
        comparisons = tuple(_to_comparison(c, tf_columns)
                            for c in self.comparisons)
        rules = tuple(_to_blocking_rule(b)
                      for b in self.blocking_rules_to_generate_predictions)
        source_ds = (self.source_dataset_column_name
                     if self.link_type != "dedupe_only" else None)
        return Settings(
            comparisons=comparisons,
            blocking_rules=rules,
            probability_two_random_records_match=(
                self.probability_two_random_records_match),
            unique_id_column_name=self.unique_id_column_name,
            source_dataset_column_name=source_ds,
            link_type=self.link_type,
            em_convergence=self.em_convergence,
            max_iterations=int(self.max_iterations),
            retain_matching_columns=bool(self.retain_matching_columns),
            retain_intermediate_calculation_columns=bool(
                self.retain_intermediate_calculation_columns),
            additional_columns_to_retain=tuple(
                self.additional_columns_to_retain),
            tf_columns=tuple(dict.fromkeys(tf_columns)),
            tf_style=tf_style,
        )

    @classmethod
    def from_path_or_dict(cls, path_or_dict: Union[Path, str, dict]
                          ) -> "SettingsCreator":
        """Reference settings_creator.py:108-135: load a settings dict or
        saved-model JSON path into a creator whose comparisons/rules stay
        in dict form (resolved by to_settings via the interop parser)."""
        if isinstance(path_or_dict, (str, Path)):
            p = Path(path_or_dict)
            if not p.is_file():
                raise ValueError(f"Path {p} does not point to a valid file.")
            d = json.loads(p.read_text())
        elif isinstance(path_or_dict, dict):
            d = dict(path_or_dict)
        else:
            raise TypeError(
                f"Argument must be Path, str, or dict; got "
                f"{type(path_or_dict)}")
        known = {
            "link_type", "comparisons",
            "blocking_rules_to_generate_predictions",
            "probability_two_random_records_match", "em_convergence",
            "max_iterations", "retain_matching_columns",
            "retain_intermediate_calculation_columns",
            "additional_columns_to_retain", "unique_id_column_name",
            "source_dataset_column_name", "linker_uid",
        }
        kwargs = {k: v for k, v in d.items() if k in known}
        # keep the source dialect visible to the dict-comparison parser
        dialect = d.get("sql_dialect")
        if dialect:
            for c in kwargs.get("comparisons", ()):
                if isinstance(c, dict):
                    c.setdefault("sql_dialect", dialect)
        return cls(**kwargs)


def resolve_settings(settings: Union[Settings, SettingsCreator, dict,
                                     str, Path]) -> Settings:
    """Accept every settings form the reference Linker accepts
    (linker.py:75,143-146): Settings passes through; SettingsCreator /
    dict / model-JSON path are resolved through the authoring shim."""
    if isinstance(settings, Settings):
        return settings
    if isinstance(settings, SettingsCreator):
        return settings.to_settings()
    if isinstance(settings, dict):
        # reference-format settings dict / saved model: the full importer
        # (dialect translation, tf columns, recognise-or-refuse levels)
        from .interop import settings_from_splink_dict
        return settings_from_splink_dict(settings)
    if isinstance(settings, (str, Path)):
        p = Path(settings)
        if not p.is_file():
            raise ValueError(f"Path {p} does not point to a valid file.")
        from .interop import settings_from_splink_json
        return settings_from_splink_json(p.read_text())
    raise TypeError(
        f"settings must be Settings, SettingsCreator, dict, or a model-JSON "
        f"path; got {type(settings)}")
