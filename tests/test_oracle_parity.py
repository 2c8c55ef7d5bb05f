"""Reference-parity gate (BASELINE.md: pairwise F1 >= 0.99).

The reference is a SQL-generating compiler whose default backend is DuckDB
(SURVEY.md §0): the SQL below IS what Splink executes for this model —
blocking self-join with uid ordering + preceding-rule exclusion, gamma CASE
ladders over DuckDB's own jaro_winkler_similarity/levenshtein, Bayes-factor
CASE, log2 combine, threshold, then connected components. We run it in
DuckDB + networkx as the oracle and demand our Spark clusters match to
pairwise F1 >= 0.99 (they should match exactly: the similarity kernels are
bit-identical to DuckDB's).

Also checks the per-row invariant: sha2(content,256) equality between Spark
and DuckDB (BASELINE.json input_hint).
"""

from __future__ import annotations

import duckdb
import networkx as nx
import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.fixtures import RepoFilesSpec, repo_files_pandas
from memory_optimized_splink_spark.linker import SparkLinker

THRESHOLD = 0.9
PRIOR = 0.01
M_U = {
    "content_sha": {1: (0.9, 1e-4), 0: (0.1, 0.9999)},
    "path": {3: (0.6, 0.01), 2: (0.3, 0.02), 1: (0.05, 0.05), 0: (0.05, 0.92)},
}


def _oracle_membership(pdf):
    con = duckdb.connect()
    con.register("raw", pdf)
    con.execute("""
        create table nodes as
        select *,
            sha256(concat_ws(chr(1), repo, path, commit)) as unique_id,
            sha256(content) as content_sha
        from raw
    """)
    con.execute("""
        create table pairs as
        select l.unique_id as uid_l, r.unique_id as uid_r,
               l.content_sha as csha_l, r.content_sha as csha_r,
               l.path as path_l, r.path as path_r
        from nodes l join nodes r on l.content_sha = r.content_sha
        where l.unique_id < r.unique_id
        union all
        select l.unique_id, r.unique_id, l.content_sha, r.content_sha,
               l.path, r.path
        from nodes l join nodes r on l.repo = r.repo
        where l.unique_id < r.unique_id
          and not coalesce(l.content_sha = r.content_sha, false)
    """)
    bf_sha = " ".join(
        f"when gamma_sha = {g} then {m}/{u}" for g, (m, u) in M_U["content_sha"].items()
    )
    bf_path = " ".join(
        f"when gamma_path = {g} then {m}/{u}" for g, (m, u) in M_U["path"].items()
    )
    prior_bf = PRIOR / (1 - PRIOR)
    edges = con.execute(f"""
        with cv as (
            select uid_l, uid_r,
              case when csha_l is null or csha_r is null then -1
                   when csha_l = csha_r then 1 else 0 end as gamma_sha,
              case when path_l is null or path_r is null then -1
                   when path_l = path_r then 3
                   when jaro_winkler_similarity(path_l, path_r) >= 0.9401 then 2
                   when levenshtein(path_l, path_r) <= 4 then 1
                   else 0 end as gamma_path
            from pairs
        ), scored as (
            select uid_l, uid_r,
              {prior_bf}
                * (case when gamma_sha = -1 then 1.0 {bf_sha} end)
                * (case when gamma_path = -1 then 1.0 {bf_path} end) as bf
            from cv
        )
        select uid_l, uid_r from scored
        where bf/(1+bf) >= {THRESHOLD}
    """).fetchall()
    all_ids = [r[0] for r in con.execute("select unique_id from nodes").fetchall()]
    g = nx.Graph()
    g.add_nodes_from(all_ids)
    g.add_edges_from(edges)
    membership = {}
    for comp in nx.connected_components(g):
        rep = min(comp)
        for n in comp:
            membership[n] = rep
    return membership, con


def test_cluster_parity_vs_duckdb_oracle(spark, repo_nodes, basic_settings):
    pdf = repo_files_pandas(RepoFilesSpec(n_entities=200))
    oracle, con = _oracle_membership(pdf)

    linker = SparkLinker(spark, repo_nodes, basic_settings)
    mine = {
        r["unique_id"]: r["cluster_id"]
        for r in linker.cluster(THRESHOLD).select("unique_id", "cluster_id").collect()
    }
    assert set(mine) == set(oracle), "node id derivation differs"

    # pairwise F1 between the two partitions
    from collections import Counter
    both = Counter((mine[k], oracle[k]) for k in mine)
    p_cnt = Counter(mine.values())
    t_cnt = Counter(oracle.values())
    tp = sum(v * (v - 1) / 2 for v in both.values())
    p = sum(v * (v - 1) / 2 for v in p_cnt.values())
    t = sum(v * (v - 1) / 2 for v in t_cnt.values())
    f1 = 2 * tp / (p + t) if (p + t) else 1.0
    assert f1 >= 0.99
    assert f1 == 1.0  # kernels are bit-identical: expect exact agreement


def test_content_sha_matches_duckdb(spark, repo_nodes):
    pdf = repo_files_pandas(RepoFilesSpec(n_entities=200))
    con = duckdb.connect()
    con.register("raw", pdf)
    duck = dict(con.execute(
        "select concat_ws(chr(1), repo, path, commit), sha256(content) from raw"
    ).fetchall())
    mine = dict(
        repo_nodes.select(
            F.concat_ws("\x01", "repo", "path", "commit"), "content_sha"
        ).collect()
    )
    assert mine == duck
