"""Deterministic synthetic fixtures (FIXTURES.md).

F1 `repo_files`: the BASELINE.json input-shaped table
    (repo, path, commit, lang, content) + ground-truth `cluster`.
F2 `labeled_pairs`: positives within an entity + hard negatives.
F3 `cc_random_graph`: Erdos-Renyi / path / star graphs for the CC oracle.

Everything is seeded (numpy Generator, default seed 42) and generated on the
driver as pandas, then parallelized — fixture scale is test-scale only; real
inputs arrive as Iceberg/parquet tables (sources/registry.py).

Mirrors the reference's fixture strategy:
/root/reference/tests/datasets/fake_1000_from_splink_demos.csv (ground-truth
`cluster` column) and /root/reference/tests/cc_testing_utils.py:11-53.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

_LANGS = ["py", "js", "go", "rs", "java", "md"]
_LANG_W = [0.3, 0.25, 0.12, 0.08, 0.15, 0.1]
_DIRS = ["core", "utils", "api", "io", "net", "db", "ui", "cli", "fmt", "ops"]
_STEMS = [
    "main", "engine", "parser", "router", "config", "schema", "index",
    "model", "worker", "client", "server", "cache", "logger", "auth",
    "token", "graph", "query", "store", "batch", "shard",
]


def _sha40(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()[:40]


def _perturb_path(path: str, kind: int) -> str:
    """Small edits to exercise Jaro-Winkler / Levenshtein levels."""
    stem, dot, ext = path.rpartition(".")
    if kind == 0:  # char swap inside stem
        if len(stem) >= 6:
            i = len(stem) // 2
            stem = stem[:i] + stem[i + 1] + stem[i] + stem[i + 2:]
    elif kind == 1:  # case change
        stem = stem[:-3] + stem[-3:].upper()
    elif kind == 2:  # _old suffix
        stem = stem + "_old"
    elif kind == 3:  # drop a char
        if len(stem) >= 6:
            stem = stem[:-2] + stem[-1]
    return stem + dot + ext


@dataclass(frozen=True)
class RepoFilesSpec:
    n_entities: int = 300
    seed: int = 42
    hot_repo_frac: float = 0.15  # route ~15% of rows to org0/repo0 (skew)


def repo_files_pandas(spec: RepoFilesSpec = RepoFilesSpec()) -> pd.DataFrame:
    """Ground-truthed repo-file table. Each entity emits 1-5 rows that share
    identical `content` (so sha2(content,256) agreement is a real level) with
    perturbed path/commit/repo."""
    rng = np.random.default_rng(spec.seed)
    rows: list[tuple] = []
    for e in range(spec.n_entities):
        n_dups = int(rng.integers(1, 6))
        repo = f"org{e % 7}/repo{e % 101}"
        if rng.random() < spec.hot_repo_frac:
            repo = "org0/repo0"
        d = _DIRS[int(rng.integers(0, len(_DIRS)))]
        stem = _STEMS[int(rng.integers(0, len(_STEMS)))]
        lang = str(rng.choice(_LANGS, p=_LANG_W))
        base_path = f"src/{d}/{stem}{e % 23}.{lang}"
        salt = int(rng.integers(0, 1_000_000))
        content = f"content-{e}-{salt} " + " ".join(
            _STEMS[int(rng.integers(0, len(_STEMS)))] for _ in range(12)
        )
        for k in range(n_dups):
            if k == 0:
                path = base_path
            else:
                path = _perturb_path(base_path, int(rng.integers(0, 4)))
            commit = _sha40(f"c{e}-{k}")
            row_repo = repo
            if k > 0 and rng.random() < 0.15:  # some dups move repos
                row_repo = f"org{(e + 1) % 7}/repo{(e + 3) % 101}"
            rows.append((row_repo, path, commit, lang, content, e))
    df = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content", "cluster"]
    )
    # deterministic shuffle so entities are not contiguous
    order = np.random.default_rng(spec.seed + 1).permutation(len(df))
    return df.iloc[order].reset_index(drop=True)


def repo_files_df(spark, spec: RepoFilesSpec = RepoFilesSpec()):
    pdf = repo_files_pandas(spec)
    return spark.createDataFrame(pdf)


def labeled_pairs_pandas(
    repo_files: pd.DataFrame, unique_ids: pd.Series, neg_per_entity: int = 2,
    seed: int = 43,
) -> pd.DataFrame:
    """F2: all positive pairs within an entity + hard negatives sharing repo.

    `unique_ids` must align row-for-row with `repo_files` (the engine-derived
    unique_id). Output columns match the reference accuracy harness
    (/root/reference/splink/internals/accuracy.py:312-446)."""
    rng = np.random.default_rng(seed)
    df = repo_files.assign(unique_id=unique_ids.values)
    pos: list[tuple] = []
    for _, grp in df.groupby("cluster"):
        ids = sorted(grp["unique_id"].tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pos.append((ids[i], ids[j], 1.0))
    neg: list[tuple] = []
    by_repo = df.groupby("repo")
    for _, grp in by_repo:
        if len(grp) < 2:
            continue
        arr = grp[["unique_id", "cluster"]].to_numpy()
        for _ in range(min(neg_per_entity, len(grp))):
            i, j = rng.integers(0, len(arr), size=2)
            if i == j or arr[i][1] == arr[j][1]:
                continue
            a, b = sorted([arr[i][0], arr[j][0]])
            neg.append((a, b, 0.0))
    out = pd.DataFrame(
        pos + neg, columns=["unique_id_l", "unique_id_r", "clerical_match_score"]
    ).drop_duplicates(["unique_id_l", "unique_id_r"])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------- F3 graphs

def erdos_renyi_edges(n: int, p: float, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    iu = np.triu_indices(n, k=1)
    mask = rng.random(len(iu[0])) < p
    return pd.DataFrame(
        {"unique_id_l": iu[0][mask].astype("int64"),
         "unique_id_r": iu[1][mask].astype("int64")}
    )


def path_graph_edges(n: int) -> pd.DataFrame:
    a = np.arange(n - 1, dtype="int64")
    return pd.DataFrame({"unique_id_l": a, "unique_id_r": a + 1})


def star_graph_edges(n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {"unique_id_l": np.zeros(n - 1, dtype="int64"),
         "unique_id_r": np.arange(1, n, dtype="int64")}
    )
