"""Convenience dataset registry mirroring the reference's `splink_datasets`
(/root/reference/splink/datasets.py). The reference lazily downloads hosted
CSVs; this engine has no network dependency, so every dataset is a
DETERMINISTIC SYNTHETIC generator with the documented shape — `fake_1000`
matches the reference demo dataset's columns
(unique_id, first_name, surname, dob, city, email, cluster) with known
ground-truth clusters, typo'd duplicates and nulls, so every training /
evaluation walkthrough runs unchanged.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_FIRST = ["oliver", "amelia", "george", "isla", "noah", "ava", "arthur",
          "ivy", "muhammad", "grace", "leo", "freya", "harry", "lily",
          "oscar", "sofia", "jack", "mia", "charlie", "ruby"]
_SURNAME = ["smith", "jones", "taylor", "brown", "williams", "wilson",
            "johnson", "davies", "robinson", "wright", "thompson", "evans",
            "walker", "white", "roberts", "green", "hall", "wood",
            "jackson", "clarke"]
_CITY = ["london", "birmingham", "leeds", "glasgow", "sheffield",
         "bradford", "liverpool", "edinburgh", "manchester", "bristol"]


def _typo(word: str, rng: random.Random) -> str:
    if len(word) < 3:
        return word
    i = rng.randrange(len(word) - 1)
    kind = rng.randrange(3)
    if kind == 0:  # transpose
        return word[:i] + word[i + 1] + word[i] + word[i + 2:]
    if kind == 1:  # drop
        return word[:i] + word[i + 1:]
    return word[:i] + "x" + word[i + 1:]  # substitute


def person_records_pandas(n_entities: int = 400, seed: int = 7
                          ) -> pd.DataFrame:
    """Deterministic person table with ground-truth `cluster`: every entity
    appears 1-3 times; duplicate rows carry typos and occasional nulls."""
    rng = random.Random(seed)
    rows = []
    for e in range(n_entities):
        first = _FIRST[e % len(_FIRST)]
        sur = _SURNAME[(e * 7 + 3) % len(_SURNAME)]
        dob = f"{1950 + e % 50:04d}-{1 + e % 12:02d}-{1 + e % 28:02d}"
        city = _CITY[(e * 3 + 1) % len(_CITY)]
        email = f"{first}.{sur}{e}@example.com"
        n_dup = 1 + (e % 3 == 0) + (e % 7 == 0)
        for d in range(n_dup):
            f2, s2, d2, c2, m2 = first, sur, dob, city, email
            if d:
                r = rng.random()
                if r < 0.35:
                    f2 = _typo(first, rng)
                elif r < 0.55:
                    s2 = _typo(sur, rng)
                elif r < 0.70:
                    c2 = None
                elif r < 0.85:
                    m2 = None
                # else: exact duplicate
            rows.append((f"{e}-{d}", f2, s2, d2, c2, m2, e))
    return pd.DataFrame(rows, columns=[
        "unique_id", "first_name", "surname", "dob", "city", "email",
        "cluster"])


class SplinkDatasets:
    """`datasets(spark).fake_1000()` etc. — attribute-per-dataset registry
    (reference splink/datasets.py exposes `splink_datasets.fake_1000`)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark

    def fake_1000(self) -> DataFrame:
        """1000-row person demo table (same shape as the reference's
        fake_1000_from_splink_demos.csv, synthesized deterministically)."""
        pdf = person_records_pandas(n_entities=700, seed=42).head(1000)
        return self._spark.createDataFrame(pdf)

    def repo_files_small(self) -> DataFrame:
        """Repo-file-shaped table (the BASELINE.json input_hint shape) with
        known duplicate cliques — the engine's native demo input."""
        from .fixtures import RepoFilesSpec, repo_files_df
        from .operators.nodes import derive_repo_file_ids
        return derive_repo_file_ids(
            repo_files_df(self._spark, RepoFilesSpec(n_entities=200)))

    def list_datasets(self) -> list[str]:
        return ["fake_1000", "repo_files_small"]


def datasets(spark: SparkSession) -> SplinkDatasets:
    return SplinkDatasets(spark)
