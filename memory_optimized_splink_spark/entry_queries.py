"""Driver-contract query catalogue (__spark_entry__.py backend).

Each entry in QUERIES runs an operator from SURVEY.md §2 (or a
training-data-pipeline operator) on the driver-generated parquet tables at a
given sf dir; ORACLES holds the equivalent DuckDB SQL. Column names and
rounding are matched on both sides (the driver hash-compares values).

The record-linkage queries run over a repo-file-shaped table derived
DETERMINISTICALLY from `documents` (BASELINE.json input_hint shape:
repo/path/commit/lang/content), so the whole Fellegi-Sunter pipeline is
oracle-checked end to end: derivation -> TF -> blocking -> gammas ->
match weights -> truth space. Cross-engine hashing uses sha256 (identical
in Spark/DuckDB) and a poly31 rolling hash (identical by construction);
Jaro-Winkler/levenshtein use DuckDB builtins vs our bit-identical kernels.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from .model import Comparison, ComparisonLevel, Settings, block_on
from .operators.blocking import block_using_rules
from .operators.cluster import solve_connected_components
from .operators.nodes import derive_repo_file_ids
from .operators.score import predict as predict_op
from .operators.vectors import compute_comparison_vectors

P31 = 2147483647  # 2^31-1, the cross-engine poly-hash modulus

# ---------------------------------------------------------------- the model

M_U = {
    "content_sha": {1: (0.9, 1e-4), 0: (0.1, 0.9999)},
    "path": {3: (0.6, 0.01), 2: (0.3, 0.02), 1: (0.05, 0.05), 0: (0.05, 0.92)},
}
PRIOR = 0.01


def entry_settings() -> Settings:
    mu = lambda c, g: dict(m=M_U[c][g][0], u=M_U[c][g][1])
    return Settings(
        comparisons=(
            Comparison("content_sha", "content_sha", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", **mu("content_sha", 1)),
                ComparisonLevel("else", **mu("content_sha", 0)),
            )),
            Comparison("path", "path", (
                ComparisonLevel("null"),
                ComparisonLevel("exact", **mu("path", 3)),
                ComparisonLevel("jaro_winkler", threshold=0.9401, **mu("path", 2)),
                ComparisonLevel("levenshtein", threshold=4, **mu("path", 1)),
                ComparisonLevel("else", **mu("path", 0)),
            )),
        ),
        blocking_rules=(block_on("content_sha"), block_on("repo")),
        probability_two_random_records_match=PRIOR,
    )


# ------------------------------------------------------- shared derivations

def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def repo_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic repo-file-shaped derivation with REAL entity structure:
    docs in the same doc_id//5 group share identical content when
    doc_id%5 <= 2 (exact-duplicate cliques, the ground-truth entities),
    and the repo key is coarse enough (7 x 23 = 161 keys) that blocks hold
    several rows at every sf — so blocking/gamma/predict/cluster queries
    exercise non-empty, non-trivial result sets even at 500 docs."""
    d = load(spark, sf_dir, "documents")
    entity = (F.col("doc_id") - (F.col("doc_id") % 5)).cast("long")
    return d.select(
        "doc_id", "lang", "source",
        F.concat(F.lit("org"), (F.col("doc_id") % 7).cast("string"),
                 F.lit("/repo"), (F.col("doc_id") % 23).cast("string")
                 ).alias("repo"),
        F.concat(F.lit("src/"), F.col("source"), F.lit("/doc"),
                 (F.col("doc_id") % 997).cast("string"), F.lit("."),
                 F.col("lang")).alias("path"),
        F.sha2(F.concat(F.lit("c"), F.col("doc_id").cast("string")), 256)
        .substr(1, 40).alias("commit"),
        F.when(F.col("doc_id") % 5 <= 2,
               F.concat(F.lit("content-"), entity.cast("string")))
        .otherwise(F.col("text")).alias("content"),
    )


def nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_repo_file_ids(repo_files(spark, sf_dir))


RF_CTE = """
rf AS (
  SELECT doc_id, lang, source,
    'org' || CAST(doc_id % 7 AS VARCHAR) || '/repo'
          || CAST(doc_id % 23 AS VARCHAR) AS repo,
    'src/' || source || '/doc' || CAST(doc_id % 997 AS VARCHAR)
           || '.' || lang AS path,
    substr(sha256('c' || CAST(doc_id AS VARCHAR)), 1, 40) AS commit,
    CASE WHEN doc_id % 5 <= 2
         THEN 'content-' || CAST(doc_id - (doc_id % 5) AS VARCHAR)
         ELSE text END AS content
  FROM documents
),
nodes AS (
  SELECT rf.*,
    sha256(concat_ws(chr(1), repo, path, commit)) AS unique_id,
    sha256(content) AS content_sha
  FROM rf
)
"""

PAIRS_CTE = RF_CTE + """,
pairs AS (
  SELECT '0' AS match_key,
         l.unique_id AS unique_id_l, r.unique_id AS unique_id_r,
         l.path AS path_l, r.path AS path_r,
         l.content_sha AS csha_l, r.content_sha AS csha_r
  FROM nodes l JOIN nodes r ON l.content_sha = r.content_sha
  WHERE l.unique_id < r.unique_id
  UNION ALL
  SELECT '1', l.unique_id, r.unique_id, l.path, r.path,
         l.content_sha, r.content_sha
  FROM nodes l JOIN nodes r ON l.repo = r.repo
  WHERE l.unique_id < r.unique_id
    AND NOT COALESCE(l.content_sha = r.content_sha, FALSE)
)
"""

CV_CTE = PAIRS_CTE + """,
cv AS (
  SELECT match_key, unique_id_l, unique_id_r,
    CASE WHEN csha_l IS NULL OR csha_r IS NULL THEN -1
         WHEN csha_l = csha_r THEN 1 ELSE 0 END AS gamma_content_sha,
    CASE WHEN path_l IS NULL OR path_r IS NULL THEN -1
         WHEN path_l = path_r THEN 3
         WHEN jaro_winkler_similarity(path_l, path_r) >= 0.9401 THEN 2
         WHEN levenshtein(path_l, path_r) <= 4 THEN 1
         ELSE 0 END AS gamma_path
  FROM pairs
)
"""


def _bf_case(comp: str) -> str:
    whens = " ".join(
        f"WHEN gamma_{comp} = {g} THEN CAST({m} AS DOUBLE)/CAST({u} AS DOUBLE)"
        for g, (m, u) in M_U[comp].items()
    )
    return f"(CASE WHEN gamma_{comp} = -1 THEN 1.0 {whens} END)"


PREDICT_CTE = CV_CTE + f""",
scored AS (
  SELECT match_key, unique_id_l, unique_id_r, gamma_content_sha, gamma_path,
    CAST({PRIOR / (1 - PRIOR)!r} AS DOUBLE)
      * {_bf_case("content_sha")} * {_bf_case("path")} AS bf
  FROM cv
),
predictions AS (
  SELECT match_key, unique_id_l, unique_id_r, gamma_content_sha, gamma_path,
    ROUND(log2(bf), 6) AS match_weight,
    ROUND(bf / (1 + bf), 6) AS match_probability
  FROM scored
)
"""


def _spark_pairs(spark, sf_dir) -> tuple[DataFrame, DataFrame, Settings]:
    s = entry_settings()
    nodes = nodes_df(spark, sf_dir)
    return block_using_rules(nodes, s), nodes, s


def _spark_predict(spark, sf_dir) -> DataFrame:
    pairs, nodes, s = _spark_pairs(spark, sf_dir)
    cv = compute_comparison_vectors(pairs, nodes, s)
    pred = predict_op(cv, s)
    return pred.select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_content_sha", "gamma_path",
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_probability", 6).alias("match_probability"),
    )


# ------------------------------------------------------------------ queries

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# --- §2.1/2.2/2.7: derivation, projection, hash helpers ---------------------

@q("repo_file_ids", f"WITH {RF_CTE} SELECT unique_id, content_sha, repo, path, lang FROM nodes")
def q_repo_file_ids(spark, sf_dir):
    return nodes_df(spark, sf_dir).select(
        "unique_id", "content_sha", "repo", "path", "lang")


# --- §2.4: TF tables (term_frequencies.py:83-92) ----------------------------

@q("tf_table",
   f"WITH {RF_CTE} SELECT lang, CAST(COUNT(*) AS DOUBLE) AS tf_lang "
   "FROM nodes WHERE lang IS NOT NULL GROUP BY lang")
def q_tf_table(spark, sf_dir):
    from .operators.nodes import compute_tf_table
    return compute_tf_table(nodes_df(spark, sf_dir), "lang")


# --- §2.3: blocking joins (blocking.py) --------------------------------------

@q("blocking_pairs",
   f"WITH {PAIRS_CTE} SELECT match_key, unique_id_l, unique_id_r FROM pairs")
def q_blocking_pairs(spark, sf_dir):
    pairs, _, _ = _spark_pairs(spark, sf_dir)
    return pairs


# --- §2.8: comparison vectors + scoring --------------------------------------

@q("comparison_vectors",
   f"WITH {CV_CTE} SELECT match_key, unique_id_l, unique_id_r, "
   "gamma_content_sha, gamma_path FROM cv")
def q_comparison_vectors(spark, sf_dir):
    pairs, nodes, s = _spark_pairs(spark, sf_dir)
    return compute_comparison_vectors(pairs, nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_content_sha", "gamma_path")


@q("predict", f"WITH {PREDICT_CTE} SELECT * FROM predictions")
def q_predict(spark, sf_dir):
    return _spark_predict(spark, sf_dir)


@q("match_weight_histogram",
   f"""WITH {PREDICT_CTE},
mm AS (SELECT min(match_weight) AS mn, max(match_weight) AS mx
       FROM predictions),
bw AS (
  SELECT w
  FROM (SELECT unnest([0.01, 0.1, 0.2, 0.25, 0.5, 1.0, 2.0, 5.0]) AS w) ws,
       mm
  ORDER BY abs(w - (mm.mx - mm.mn) / 30.0), w LIMIT 1
)
SELECT bw.w * floor(p.match_weight / bw.w) AS splink_score_bin_low,
       bw.w AS binwidth,
       COUNT(*) AS count_rows,
       bw.w * floor(p.match_weight / bw.w) + bw.w AS splink_score_bin_high
FROM predictions p, bw
GROUP BY 1, 2""")
def q_match_weight_histogram(spark, sf_dir):
    """Match-weight histogram over predict() (reference
    visualisations.py:112 / match_weights_histogram.py:66-96): ladder-chosen
    bin width, one distributed groupBy on floor(mw/width). The oracle
    replays the exact ladder selection (first-minimum = smallest width on
    ties) and binning arithmetic in SQL."""
    from .charts import match_weights_histogram_data
    return match_weights_histogram_data(_spark_predict(spark, sf_dir),
                                        target_bins=30)


@q("comparator_scores",
   f"""WITH {RF_CTE},
pr AS (
  SELECT a.path AS string1, b.path AS string2
  FROM nodes a JOIN nodes b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 3 = 0
)
SELECT string1, string2,
  levenshtein(string1, string2) AS levenshtein_distance,
  damerau_levenshtein(string1, string2) AS damerau_levenshtein_distance,
  ROUND(jaro_similarity(string1, string2), 6) AS jaro_similarity,
  ROUND(jaro_winkler_similarity(string1, string2), 6)
    AS jaro_winkler_similarity,
  ROUND(jaccard(string1, string2), 6) AS jaccard_similarity
FROM pr""")
def q_comparator_scores(spark, sf_dir):
    """Exploratory comparator table (exploratory.comparator_score_df — the
    reference's similarity_analysis.comparator_score_df:49) over path pairs
    derived from the repo table; the oracle recomputes every comparator
    with DuckDB's builtins (the reference's exploratory backend)."""
    from .exploratory import comparator_score_df

    nodes = nodes_df(spark, sf_dir)
    a = nodes.select(F.col("doc_id").alias("_d"),
                     F.col("path").alias("string1")) \
        .where(F.col("_d") % 3 == 0)
    b = nodes.select((F.col("doc_id") - 1).alias("_d"),
                     F.col("path").alias("string2"))
    pairs = a.join(b, on="_d").select("string1", "string2").toPandas()
    scored = comparator_score_df(pairs, "string1", "string2",
                                 decimal_places=6)
    return spark.createDataFrame(scored)


@q("predict_imported_settings",
   f"WITH {PREDICT_CTE} SELECT * FROM predictions")
def q_predict_imported_settings(spark, sf_dir):
    """Settings interop round-trip (interop.py): serialize the entry model
    in the reference's model.json format, re-import it, and predict. The
    oracle is the NATIVE predict oracle — a hash match proves the imported
    settings reproduce the native model's probabilities bit-for-bit."""
    import json as _json

    from .interop import settings_from_splink_json, settings_to_splink_dict

    s = settings_from_splink_json(
        _json.dumps(settings_to_splink_dict(entry_settings())))
    nodes = nodes_df(spark, sf_dir)
    pairs = block_using_rules(nodes, s)
    cv = compute_comparison_vectors(pairs, nodes, s)
    pred = predict_op(cv, s)
    return pred.select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_content_sha", "gamma_path",
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_probability", 6).alias("match_probability"),
    )


# --- fork TF-adjusted scoring (comparison_level.py:682-718) ------------------

@q("predict_tf",
   f"""WITH {RF_CTE},
tf AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS tf_source FROM nodes GROUP BY source),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_records FROM nodes),
p2 AS (
  SELECT l.unique_id AS unique_id_l, r.unique_id AS unique_id_r,
    CASE WHEN l.content_sha = r.content_sha THEN 1 ELSE 0 END AS gamma_content_sha,
    CASE WHEN l.source = r.source THEN 1 ELSE 0 END AS gamma_source,
    tl.tf_source AS tf_source_l
  FROM nodes l JOIN nodes r ON l.repo = r.repo AND l.unique_id < r.unique_id
  LEFT JOIN tf tl ON tl.source = l.source
),
sc AS (
  SELECT unique_id_l, unique_id_r, gamma_content_sha, gamma_source,
    CAST({PRIOR / (1 - PRIOR)!r} AS DOUBLE)
    * {_bf_case("content_sha")}
    * (CASE WHEN gamma_source = 1 THEN 0.5/0.1 ELSE 0.5/0.9 END)
    * (CASE WHEN gamma_source = 1 AND tf_source_l IS NOT NULL
            THEN (SELECT n_records FROM n) / tf_source_l ELSE 1.0 END) AS bf
  FROM p2
)
SELECT unique_id_l, unique_id_r, gamma_content_sha, gamma_source,
  ROUND(log2(bf), 6) AS match_weight,
  ROUND(bf / (1+bf), 6) AS match_probability
FROM sc""")
def q_predict_tf(spark, sf_dir):
    mu = lambda c, g: dict(m=M_U[c][g][0], u=M_U[c][g][1])
    s = Settings(
        comparisons=(
            Comparison("content_sha", "content_sha", (
                ComparisonLevel("exact", **mu("content_sha", 1)),
                ComparisonLevel("else", **mu("content_sha", 0)),
            )),
            Comparison("source", "source", (
                ComparisonLevel("exact", m=0.5, u=0.1, tf_adjustment=True),
                ComparisonLevel("else", m=0.5, u=0.9),
            )),
        ),
        blocking_rules=(block_on("repo"),),
        probability_two_random_records_match=PRIOR,
        tf_columns=("source",),
    )
    from .operators.nodes import join_tf_columns
    nodes, _ = join_tf_columns(nodes_df(spark, sf_dir), s)
    n_records = nodes.count()
    pairs = block_using_rules(nodes, s)
    cv = compute_comparison_vectors(pairs, nodes, s)
    pred = predict_op(cv, s, n_records=float(n_records))
    return pred.select(
        "unique_id_l", "unique_id_r", "gamma_content_sha", "gamma_source",
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_probability", 6).alias("match_probability"),
    )


# --- §2.9: EM substrate — agreement patterns + u sampling --------------------

@q("em_agreement_patterns",
   f"WITH {CV_CTE} SELECT gamma_content_sha, gamma_path, "
   "COUNT(*) AS agreement_pattern_count FROM cv "
   "GROUP BY gamma_content_sha, gamma_path")
def q_em_patterns(spark, sf_dir):
    pairs, nodes, s = _spark_pairs(spark, sf_dir)
    cv = compute_comparison_vectors(pairs, nodes, s)
    return cv.groupBy("gamma_content_sha", "gamma_path").agg(
        F.count(F.lit(1)).alias("agreement_pattern_count"))


@q("u_sample_gamma_counts",
   f"""WITH {RF_CTE},
samp AS (SELECT * FROM nodes WHERE doc_id % 10 = 0),
sp AS (
  SELECT l.path AS path_l, r.path AS path_r,
         l.content_sha AS csha_l, r.content_sha AS csha_r
  FROM samp l JOIN samp r ON l.unique_id < r.unique_id
)
SELECT
  CASE WHEN csha_l = csha_r THEN 1 ELSE 0 END AS gamma_content_sha,
  CASE WHEN path_l = path_r THEN 3
       WHEN jaro_winkler_similarity(path_l, path_r) >= 0.9401 THEN 2
       WHEN levenshtein(path_l, path_r) <= 4 THEN 1 ELSE 0 END AS gamma_path,
  COUNT(*) AS cnt
FROM sp GROUP BY 1, 2""")
def q_u_sample(spark, sf_dir):
    """Deterministic-sample u-estimation counts (estimate_u.py semantics
    with a hash-mod sample instead of rand so both engines agree)."""
    from .operators.blocking import cartesian_pairs
    s = entry_settings()
    samp = nodes_df(spark, sf_dir).where(F.col("doc_id") % 10 == 0)
    pairs = cartesian_pairs(samp, s)
    cv = compute_comparison_vectors(pairs, samp, s)
    return cv.groupBy("gamma_content_sha", "gamma_path").agg(
        F.count(F.lit(1)).alias("cnt"))


# --- §2.13: realtime find_matches_to_new_records (inference.py:770-926) ------

@q("find_matches_new_records",
   f"""WITH {RF_CTE},
newrec AS (
  SELECT sha256('new' || CAST(doc_id AS VARCHAR)) AS unique_id,
         repo, path || '_new' AS path, content_sha
  FROM nodes WHERE doc_id % 50 = 0
),
comb AS (
  SELECT unique_id, repo, path, content_sha, 0 AS ds FROM nodes
  UNION ALL
  SELECT unique_id, repo, path, content_sha, 1 FROM newrec
),
fm_pairs AS (
  SELECT '0' AS match_key, l.unique_id AS unique_id_l,
         r.unique_id AS unique_id_r, l.path AS path_l, r.path AS path_r,
         l.content_sha AS csha_l, r.content_sha AS csha_r,
         l.ds + r.ds AS dss
  FROM comb l JOIN comb r
    ON l.content_sha = r.content_sha AND l.unique_id < r.unique_id
  UNION ALL
  SELECT '1', l.unique_id, r.unique_id, l.path, r.path,
         l.content_sha, r.content_sha, l.ds + r.ds
  FROM comb l JOIN comb r
    ON l.repo = r.repo AND l.unique_id < r.unique_id
   AND NOT COALESCE(l.content_sha = r.content_sha, FALSE)
),
fm_cv AS (
  SELECT match_key, unique_id_l, unique_id_r,
    CASE WHEN csha_l IS NULL OR csha_r IS NULL THEN -1
         WHEN csha_l = csha_r THEN 1 ELSE 0 END AS gamma_content_sha,
    CASE WHEN path_l IS NULL OR path_r IS NULL THEN -1
         WHEN path_l = path_r THEN 3
         WHEN jaro_winkler_similarity(path_l, path_r) >= 0.9401 THEN 2
         WHEN levenshtein(path_l, path_r) <= 4 THEN 1
         ELSE 0 END AS gamma_path
  FROM fm_pairs WHERE dss = 1
),
fm_sc AS (
  SELECT match_key, unique_id_l, unique_id_r, gamma_content_sha, gamma_path,
    CAST({PRIOR / (1 - PRIOR)!r} AS DOUBLE)
      * {_bf_case("content_sha")} * {_bf_case("path")} AS bf
  FROM fm_cv
)
SELECT match_key, unique_id_l, unique_id_r, gamma_content_sha, gamma_path,
  ROUND(log2(bf), 6) AS match_weight,
  ROUND(bf / (1 + bf), 6) AS match_probability
FROM fm_sc""")
def q_find_matches_new_records(spark, sf_dir):
    """Realtime path THROUGH THE LINKER (find_matches_to_new_records):
    deterministic new records (each shares content with its entity clique,
    path perturbed) scored against the node table, cross-dataset pairs
    only."""
    from .linker import SparkLinker
    nodes = nodes_df(spark, sf_dir)
    new = repo_files(spark, sf_dir).where(F.col("doc_id") % 50 == 0) \
        .withColumn("path", F.concat(F.col("path"), F.lit("_new")))
    new = new.withColumn(
        "unique_id",
        F.sha2(F.concat(F.lit("new"), F.col("doc_id").cast("string")), 256)) \
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
    linker = SparkLinker(spark, nodes, entry_settings())
    out = linker.find_matches_to_new_records(new)
    return out.select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_content_sha", "gamma_path",
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_probability", 6).alias("match_probability"))


# --- §2.4/2.12: blocking analysis (skew audit) -------------------------------

@q("largest_blocks",
   f"""WITH {RF_CTE}
SELECT repo AS key_0, COUNT(*) AS key_count,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS comparison_count
FROM nodes WHERE repo IS NOT NULL GROUP BY repo
ORDER BY comparison_count DESC, key_0 LIMIT 10""")
def q_largest_blocks(spark, sf_dir):
    from .operators.blocking import n_largest_blocks
    return n_largest_blocks(nodes_df(spark, sf_dir), block_on("repo"), n=10)


@q("cumulative_comparisons",
   f"""WITH {PAIRS_CTE},
per AS (SELECT match_key, COUNT(*) AS row_count FROM pairs GROUP BY match_key)
SELECT match_key, row_count,
  CAST(SUM(row_count) OVER (ORDER BY match_key
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cumulative_rows
FROM per""")
def q_cumulative_comparisons(spark, sf_dir):
    pairs, _, _ = _spark_pairs(spark, sf_dir)
    per = pairs.groupBy("match_key").agg(F.count(F.lit(1)).alias("row_count"))
    w = Window.orderBy("match_key").rowsBetween(Window.unboundedPreceding,
                                                Window.currentRow)
    return per.select("match_key", "row_count",
                      F.sum("row_count").over(w).alias("cumulative_rows"))


# --- §2.10: clustering --------------------------------------------------------
# The Spark side is the iterative large-star/small-star CC; the DuckDB oracle
# is a WITH RECURSIVE transitive-closure min-label propagation (feasible at
# sf<=0.01 scale). Cluster ids are the fork's deterministic
# md5(sorted member list) (connected_components.py:504-518), so the hash
# compare checks the full membership partition, not just row counts.

CC_CTES = PREDICT_CTE + """,
cc_edges AS (
  SELECT unique_id_l AS src, unique_id_r AS dst FROM predictions
  WHERE match_probability >= 0.9
),
cc_und AS (SELECT src, dst FROM cc_edges UNION SELECT dst, src FROM cc_edges),
cc_walk(node_id, label) AS (
  SELECT unique_id, unique_id FROM nodes
  UNION
  SELECT u.dst, w.label FROM cc_walk w JOIN cc_und u ON u.src = w.node_id
),
cc_labels AS (SELECT node_id, MIN(label) AS rep FROM cc_walk GROUP BY node_id),
cc_md5 AS (
  SELECT rep, md5(string_agg(node_id, ',' ORDER BY node_id)) AS cluster_id
  FROM cc_labels GROUP BY rep
),
cc_member AS (
  SELECT l.node_id, m.cluster_id FROM cc_labels l JOIN cc_md5 m USING (rep)
)
"""


@q("cluster_membership",
   f"WITH RECURSIVE {CC_CTES} SELECT node_id, cluster_id FROM cc_member")
def q_cluster_membership(spark, sf_dir):
    pred = _spark_predict(spark, sf_dir)
    nodes = nodes_df(spark, sf_dir)
    edges = pred.where(F.col("match_probability") >= 0.9) \
        .select("unique_id_l", "unique_id_r")
    return solve_connected_components(nodes, edges, with_md5_ids=True)


@q("cluster_sizes",
   f"""WITH RECURSIVE {CC_CTES}
SELECT cluster_id, COUNT(*) AS n_members FROM cc_member GROUP BY cluster_id""")
def q_cluster_sizes(spark, sf_dir):
    from .operators.cluster import cluster_sizes
    return cluster_sizes(q_cluster_membership(spark, sf_dir))


def _cc_threshold_ctes(tag: str, threshold: float) -> str:
    """Recursive min-label CC over predictions >= threshold, md5 ids."""
    return f"""
e{tag} AS (SELECT unique_id_l AS s, unique_id_r AS d FROM predictions
           WHERE match_probability >= {threshold}),
u{tag} AS (SELECT s, d FROM e{tag} UNION SELECT d, s FROM e{tag}),
w{tag}(node_id, label) AS (
  SELECT unique_id, unique_id FROM nodes
  UNION
  SELECT u.d, w.label FROM w{tag} w JOIN u{tag} u ON u.s = w.node_id),
l{tag} AS (SELECT node_id, MIN(label) AS rep FROM w{tag} GROUP BY node_id),
m{tag} AS (SELECT rep, md5(string_agg(node_id, ',' ORDER BY node_id)) AS cid
           FROM l{tag} GROUP BY rep)"""


_MT_THRESHOLDS = (0.9, 0.995)  # 0.995 drops the 0.98912 edges at sf0.01


@q("multi_threshold_clusters",
   f"""WITH RECURSIVE {PREDICT_CTE},
{_cc_threshold_ctes("a", _MT_THRESHOLDS[0])},
{_cc_threshold_ctes("b", _MT_THRESHOLDS[1])}
SELECT CAST({_MT_THRESHOLDS[0]} AS DOUBLE) AS threshold,
       la.node_id, ma.cid AS cluster_id
FROM la JOIN ma USING (rep)
UNION ALL
SELECT CAST({_MT_THRESHOLDS[1]} AS DOUBLE), lb.node_id, mb.cid
FROM lb JOIN mb USING (rep)""")
def q_multi_threshold_clusters(spark, sf_dir):
    """Multi-threshold incremental clustering (clustering.py:346-600):
    membership at threshold t must equal plain CC over edges >= t — the
    oracle checks that partition identity via md5(sorted members) ids."""
    from .operators.cluster_extras import cluster_at_multiple_thresholds
    pred = _spark_predict(spark, sf_dir)
    nodes = nodes_df(spark, sf_dir)
    out = cluster_at_multiple_thresholds(
        nodes, pred, list(_MT_THRESHOLDS), node_col="unique_id")
    md5 = out.groupBy("threshold", "cluster_id").agg(
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list("node_id"))))
        .alias("_cid"))
    return out.join(md5, on=["threshold", "cluster_id"]).select(
        "threshold", "node_id", F.col("_cid").alias("cluster_id"))


# --- §2.11: truth space ------------------------------------------------------

@q("truth_space",
   f"""WITH {PREDICT_CTE},
lp AS (
  SELECT match_weight,
         CASE WHEN gamma_content_sha = 1 THEN 1 ELSE 0 END AS is_pos
  FROM predictions
),
per_t AS (
  SELECT match_weight, SUM(is_pos) AS pos_at_t,
         SUM(1 - is_pos) AS neg_at_t
  FROM lp GROUP BY match_weight
),
tot AS (SELECT CAST(SUM(is_pos) AS DOUBLE) AS p,
               CAST(SUM(1 - is_pos) AS DOUBLE) AS n FROM lp)
SELECT match_weight AS truth_threshold,
  CAST(SUM(pos_at_t) OVER w AS DOUBLE) AS tp,
  CAST(SUM(neg_at_t) OVER w AS DOUBLE) AS fp,
  (SELECT p FROM tot) - CAST(SUM(pos_at_t) OVER w AS DOUBLE) AS fn,
  (SELECT n FROM tot) - CAST(SUM(neg_at_t) OVER w AS DOUBLE) AS tn,
  ROUND(CAST(SUM(pos_at_t) OVER w AS DOUBLE)
    / GREATEST(CAST(SUM(pos_at_t) OVER w + SUM(neg_at_t) OVER w AS DOUBLE), 1.0), 6)
    AS precision,
  ROUND(CAST(SUM(pos_at_t) OVER w AS DOUBLE)
    / GREATEST((SELECT p FROM tot), 1.0), 6) AS recall
FROM per_t
WINDOW w AS (ORDER BY match_weight DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")
def q_truth_space(spark, sf_dir):
    pred = _spark_predict(spark, sf_dir)
    lp = pred.select(
        "match_weight",
        (F.col("gamma_content_sha") == 1).cast("int").alias("is_pos"))
    per_t = lp.groupBy("match_weight").agg(
        F.sum("is_pos").alias("pos_at_t"),
        F.sum(1 - F.col("is_pos")).alias("neg_at_t"))
    tot = lp.agg(F.sum("is_pos").alias("p"),
                 F.sum(1 - F.col("is_pos")).alias("n")).collect()[0]
    total_p, total_n = float(tot["p"] or 0), float(tot["n"] or 0)
    w = Window.orderBy(F.desc("match_weight")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    out = per_t.select(
        F.col("match_weight").alias("truth_threshold"),
        F.sum("pos_at_t").over(w).cast("double").alias("tp"),
        F.sum("neg_at_t").over(w).cast("double").alias("fp"))
    return out.select(
        "truth_threshold", "tp", "fp",
        (F.lit(total_p) - F.col("tp")).alias("fn"),
        (F.lit(total_n) - F.col("fp")).alias("tn"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1.0)), 6)
        .alias("precision"),
        F.round(F.col("tp") / F.lit(max(total_p, 1.0)), 6).alias("recall"))


_TS_CONFUSION_CTES = """
lp AS (
  SELECT match_weight,
         CASE WHEN gamma_content_sha = 1 THEN 1 ELSE 0 END AS is_pos
  FROM predictions
),
per_t AS (
  SELECT match_weight, SUM(is_pos) AS pos_at_t,
         SUM(1 - is_pos) AS neg_at_t
  FROM lp GROUP BY match_weight
),
tot AS (SELECT CAST(SUM(is_pos) AS DOUBLE) AS p,
               CAST(SUM(1 - is_pos) AS DOUBLE) AS n FROM lp),
ts AS (
  SELECT match_weight AS truth_threshold,
    CAST(SUM(pos_at_t) OVER w AS DOUBLE) AS tp,
    CAST(SUM(neg_at_t) OVER w AS DOUBLE) AS fp,
    (SELECT p FROM tot) - CAST(SUM(pos_at_t) OVER w AS DOUBLE) AS fn,
    (SELECT n FROM tot) - CAST(SUM(neg_at_t) OVER w AS DOUBLE) AS tn
  FROM per_t
  WINDOW w AS (ORDER BY match_weight DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)"""


@q("accuracy_metrics",
   f"""WITH {PREDICT_CTE},{_TS_CONFUSION_CTES}
SELECT truth_threshold, tp, fp, fn, tn,
  ROUND(tn / (tn + fp), 6) AS specificity,
  ROUND(CASE WHEN tn + fn = 0 THEN 1.0 ELSE tn / (tn + fn) END, 6) AS npv,
  ROUND((tp + tn) / (tp + fn + tn + fp), 6) AS accuracy,
  ROUND(2.0 * tp / (2 * tp + fn + fp), 6) AS f1,
  ROUND(5.0 * tp / (5 * tp + 4 * fn + fp), 6) AS f2,
  ROUND(1.25 * tp / (1.25 * tp + 0.25 * fn + fp), 6) AS f0_5,
  ROUND(CASE WHEN (4.0 * tp * tn) + ((tp + tn) * (fp + fn)) = 0 THEN 0.0
        ELSE 4.0 * tp * tn / ((4.0 * tp * tn) + ((tp + tn) * (fp + fn)))
        END, 6) AS p4,
  ROUND(CASE WHEN tn + fn = 0 OR tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0
        THEN 0.0
        ELSE ((tp * tn) - (fp * fn))
          / SQRT((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)) END, 6)
    AS phi
FROM ts""")
def q_accuracy_metrics(spark, sf_dir):
    """Extended accuracy metrics over the truth space (reference
    accuracy.py:254-283 final SELECT): specificity, NPV, accuracy,
    F1/F2/F0.5, P4, and the phi/Matthews coefficient, each a pure Column
    expression over the cumulative confusion counts."""
    from .accuracy import ACCURACY_METRICS, add_accuracy_metrics

    ts = q_truth_space(spark, sf_dir).select(
        "truth_threshold", "tp", "fp", "fn", "tn")
    out = add_accuracy_metrics(ts)
    rounded = [F.round(F.col(m), 6).alias(m) for m in ACCURACY_METRICS]
    return out.select("truth_threshold", "tp", "fp", "fn", "tn", *rounded)


@q("prediction_errors",
   f"""WITH {PREDICT_CTE},
nl2 AS (SELECT n.*, 'e' || CAST(doc_id - (doc_id % 5) AS VARCHAR) AS label
        FROM nodes n),
labels AS (
  SELECT l.unique_id AS uid_l, r.unique_id AS uid_r, 1.0 AS clerical
  FROM nl2 l JOIN nl2 r
    ON l.label = r.label AND l.unique_id < r.unique_id
  UNION ALL
  SELECT l.unique_id, r.unique_id, 0.0
  FROM nl2 l JOIN nl2 r
    ON l.repo = r.repo AND l.label <> r.label AND l.unique_id < r.unique_id
),
lp AS (
  SELECT lb.uid_l AS unique_id_l, lb.uid_r AS unique_id_r, lb.clerical,
         COALESCE(p.match_weight, -999.0) AS mw
  FROM labels lb LEFT JOIN predictions p
    ON p.unique_id_l = lb.uid_l AND p.unique_id_r = lb.uid_r
)
SELECT unique_id_l, unique_id_r, ROUND(mw, 6) AS match_weight,
  CASE WHEN mw >= -6.5 AND clerical < 0.5 THEN 'FP'
       WHEN mw < -6.5 AND clerical >= 0.5 THEN 'FN' END AS error_type
FROM lp
WHERE (mw >= -6.5 AND clerical < 0.5) OR (mw < -6.5 AND clerical >= 0.5)""")
def q_prediction_errors(spark, sf_dir):
    """FP/FN lists at one weight threshold (reference accuracy.py:447-560)
    against a deterministic labeled-pair derivation: intra-label positives
    plus same-repo different-label hard negatives."""
    from .accuracy import prediction_errors

    nodes = nodes_df(spark, sf_dir).withColumn(
        "label", F.concat(F.lit("e"), (F.col("doc_id")
                                       - F.col("doc_id") % 5).cast("string")))
    side = lambda s: nodes.select(
        F.col("unique_id").alias(f"uid_{s}"), F.col("label").alias(f"lb_{s}"),
        F.col("repo").alias(f"rp_{s}"))
    pos = side("l").join(side("r"), (F.col("lb_l") == F.col("lb_r"))
                         & (F.col("uid_l") < F.col("uid_r"))) \
        .select(F.col("uid_l").alias("unique_id_l"),
                F.col("uid_r").alias("unique_id_r"),
                F.lit(1.0).alias("clerical_match_score"))
    neg = side("l").join(side("r"), (F.col("rp_l") == F.col("rp_r"))
                         & (F.col("lb_l") != F.col("lb_r"))
                         & (F.col("uid_l") < F.col("uid_r"))) \
        .select(F.col("uid_l").alias("unique_id_l"),
                F.col("uid_r").alias("unique_id_r"),
                F.lit(0.0).alias("clerical_match_score"))
    labels = pos.unionByName(neg)
    out = prediction_errors(labels, _spark_predict(spark, sf_dir),
                            threshold_weight=-6.5)
    return out.select(
        "unique_id_l", "unique_id_r",
        F.round("match_weight", 6).alias("match_weight"), "error_type")


LABELS_COLUMN_TS_SQL = f"""WITH {RF_CTE},
nl AS (SELECT n.*, 'e' || CAST(doc_id - (doc_id % 5) AS VARCHAR) AS label
       FROM nodes n),
pairs3 AS (
  SELECT '0' AS match_key, l.path AS path_l, r.path AS path_r,
         l.content_sha AS csha_l, r.content_sha AS csha_r,
         l.label AS label_l, r.label AS label_r
  FROM nl l JOIN nl r ON l.content_sha = r.content_sha
  WHERE l.unique_id < r.unique_id
  UNION ALL
  SELECT '1', l.path, r.path, l.content_sha, r.content_sha, l.label, r.label
  FROM nl l JOIN nl r ON l.repo = r.repo
  WHERE l.unique_id < r.unique_id
    AND NOT COALESCE(l.content_sha = r.content_sha, FALSE)
  UNION ALL
  SELECT '2', l.path, r.path, l.content_sha, r.content_sha, l.label, r.label
  FROM nl l JOIN nl r ON l.label = r.label
  WHERE l.unique_id < r.unique_id
    AND NOT (COALESCE(l.content_sha = r.content_sha, FALSE)
             OR COALESCE(l.repo = r.repo, FALSE))
),
cv3 AS (
  SELECT match_key, label_l, label_r,
    CASE WHEN csha_l IS NULL OR csha_r IS NULL THEN -1
         WHEN csha_l = csha_r THEN 1 ELSE 0 END AS gamma_content_sha,
    CASE WHEN path_l IS NULL OR path_r IS NULL THEN -1
         WHEN path_l = path_r THEN 3
         WHEN jaro_winkler_similarity(path_l, path_r) >= 0.9401 THEN 2
         WHEN levenshtein(path_l, path_r) <= 4 THEN 1
         ELSE 0 END AS gamma_path
  FROM pairs3
),
scored3 AS (
  SELECT match_key, label_l, label_r,
    CAST({PRIOR / (1 - PRIOR)!r} AS DOUBLE)
      * {_bf_case("content_sha")} * {_bf_case("path")} AS bf
  FROM cv3
),
lp AS (
  SELECT CASE WHEN match_key <> '2' THEN log2(bf)
              ELSE CAST(-999 AS DOUBLE) END AS t,
         CASE WHEN label_l = label_r THEN 1 ELSE 0 END AS is_pos
  FROM scored3
),
per AS (SELECT t, SUM(is_pos) AS pos_at_t, SUM(1 - is_pos) AS neg_at_t,
               COUNT(*) AS n_at_t FROM lp GROUP BY t),
tot AS (
  SELECT CAST(SUM(is_pos) AS DOUBLE) AS p,
         CAST(SUM(1 - is_pos) AS DOUBLE) AS nf,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM nl) AS nn
  FROM lp
),
stats AS (
  SELECT t,
    CAST(SUM(pos_at_t) OVER wdesc AS DOUBLE) AS tp,
    CAST(SUM(n_at_t) OVER wdesc - SUM(pos_at_t) OVER wdesc AS DOUBLE) AS fp,
    CAST(SUM(n_at_t) OVER wasc - n_at_t
         - (SUM(neg_at_t) OVER wasc - neg_at_t) AS DOUBLE) AS fn,
    CAST(SUM(neg_at_t) OVER wasc - neg_at_t AS DOUBLE) AS tn_base
  FROM per
  WINDOW wdesc AS (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wasc AS (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT ROUND(t, 6) AS truth_threshold, tp, fp, fn,
  tn_base + (nn * (nn - 1) / 2 - p - nf) AS tn,
  ROUND(CASE WHEN tp + fp = 0 THEN 1.0 ELSE tp / (tp + fp) END, 6)
    AS precision,
  ROUND(tp / GREATEST(p, 1.0), 6) AS recall,
  ROUND(2 * tp / GREATEST(2 * tp + fn + fp, 1.0), 6) AS f1
FROM stats, tot
WHERE t >= -998"""


@q("truth_space_labels_column", LABELS_COLUMN_TS_SQL)
def q_truth_space_labels_column(spark, sf_dir):
    """Truth space from a ground-truth cluster COLUMN (reference
    accuracy.py:337-404): the model's rules are extended with an equi rule
    on the label column; pairs found only there score -999 and never-
    generated label pairs enter as implicit (ghost) true negatives."""
    from .linker import SparkLinker

    nodes = nodes_df(spark, sf_dir).withColumn(
        "label", F.concat(F.lit("e"), (F.col("doc_id")
                                       - F.col("doc_id") % 5).cast("string")))
    lk = SparkLinker(spark, nodes, entry_settings())
    ts = lk.truth_space_from_labels_column("label")
    return ts.select(
        F.round("truth_threshold", 6).alias("truth_threshold"),
        "tp", "fp", "fn", "tn",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


@q("link_cumulative_comparisons",
   f"""WITH {RF_CTE},
nl AS (SELECT * FROM nodes WHERE doc_id % 2 = 0),
nr AS (SELECT * FROM nodes WHERE doc_id % 2 = 1),
p0 AS (SELECT 1 AS x FROM nl l JOIN nr r ON l.repo = r.repo),
p1 AS (SELECT 1 AS x FROM nl l JOIN nr r ON l.lang = r.lang
       WHERE NOT COALESCE(l.repo = r.repo, FALSE)),
per AS (SELECT '0' AS match_key, COUNT(*) AS row_count FROM p0
        UNION ALL SELECT '1', COUNT(*) FROM p1)
SELECT match_key, row_count,
  CAST(SUM(row_count) OVER (ORDER BY match_key
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cumulative_rows
FROM per""")
def q_link_cumulative_comparisons(spark, sf_dir):
    """Two-dataset (link_only) blocking analysis: exact per-rule and
    cumulative comparison counts with NOT-prior exclusion (reference
    blocking_analysis link branch), against a plain join-count oracle."""
    from .operators.brs import cumulative_comparisons_link

    rf = nodes_df(spark, sf_dir)
    l = rf.where(F.col("doc_id") % 2 == 0)
    r = rf.where(F.col("doc_id") % 2 == 1)
    return cumulative_comparisons_link(
        l, r, [block_on("repo"), block_on("lang")])


@q("blocking_pairs_salted",
   f"WITH {PAIRS_CTE} SELECT match_key, unique_id_l, unique_id_r FROM pairs")
def q_blocking_pairs_salted(spark, sf_dir):
    """Static salting is a pure parallelism transform: a rule with
    salting_partitions=4 (and NO hot-key threshold) must produce the exact
    pair set of the unsalted plain-SQL oracle."""
    from dataclasses import replace

    s = entry_settings()
    s = replace(s, blocking_rules=tuple(
        replace(r, salting_partitions=4) for r in s.blocking_rules))
    return block_using_rules(nodes_df(spark, sf_dir), s)


# --- graph metrics / one-to-one ----------------------------------------------

@q("node_degrees",
   f"""WITH {PREDICT_CTE},
edges AS (SELECT unique_id_l, unique_id_r FROM predictions
          WHERE match_probability >= 0.9)
SELECT node_id, COUNT(*) AS degree FROM (
  SELECT unique_id_l AS node_id FROM edges
  UNION ALL SELECT unique_id_r FROM edges
) GROUP BY node_id""")
def q_node_degrees(spark, sf_dir):
    pred = _spark_predict(spark, sf_dir)
    edges = pred.where(F.col("match_probability") >= 0.9)
    return edges.select(F.col("unique_id_l").alias("node_id")).unionAll(
        edges.select(F.col("unique_id_r").alias("node_id"))
    ).groupBy("node_id").agg(F.count(F.lit(1)).alias("degree"))


@q("one_to_one_best_links",
   f"""WITH {PREDICT_CTE}
SELECT unique_id_l, unique_id_r, match_weight FROM predictions
QUALIFY ROW_NUMBER() OVER (PARTITION BY unique_id_l
    ORDER BY match_weight DESC, unique_id_r) = 1""")
def q_one_to_one(spark, sf_dir):
    pred = _spark_predict(spark, sf_dir)
    w = Window.partitionBy("unique_id_l").orderBy(
        F.desc("match_weight"), F.asc("unique_id_r"))
    return pred.select("unique_id_l", "unique_id_r", "match_weight",
                       F.row_number().over(w).alias("rn")) \
        .where(F.col("rn") == 1).drop("rn")


# --- training-data ops: dedup -----------------------------------------------

@q("exact_dedup",
   """WITH h AS (
  SELECT doc_id, sha256(text) AS dup_group_id FROM documents)
SELECT doc_id, dup_group_id,
  COUNT(*) OVER (PARTITION BY dup_group_id) AS group_size,
  MIN(doc_id) OVER (PARTITION BY dup_group_id) = doc_id AS is_canonical
FROM h""")
def q_exact_dedup(spark, sf_dir):
    from .operators.dedup import exact_dedup
    return exact_dedup(load(spark, sf_dir, "documents"), "doc_id", "text")


_NGJ_DUCK = """
list_distinct([substring({col}, i, 3)
               for i in range(1, greatest(length({col}) - 2, 1) + 1)])
"""


@q("ngram_jaccard_pairs",
   f"""WITH {RF_CTE},
cand AS (
  SELECT l.doc_id AS id_l, r.doc_id AS id_r,
         lower(l.path) AS path_l, lower(r.path) AS path_r
  FROM nodes l JOIN nodes r ON l.repo = r.repo AND l.doc_id < r.doc_id
),
j AS (
  SELECT id_l, id_r,
    ROUND(CAST(len(list_intersect({_NGJ_DUCK.format(col="path_l")},
                                  {_NGJ_DUCK.format(col="path_r")})) AS DOUBLE)
      / GREATEST(len(list_distinct({_NGJ_DUCK.format(col="path_l")}
                 || {_NGJ_DUCK.format(col="path_r")})), 1), 6) AS jaccard
  FROM cand
)
SELECT id_l, id_r, jaccard FROM j WHERE jaccard >= 0.3101""")
def q_ngram_jaccard(spark, sf_dir):
    from .operators.dedup import ngram_jaccard
    nodes = nodes_df(spark, sf_dir)
    l = nodes.select(F.col("doc_id").alias("id_l"), F.col("repo"),
                     F.col("path").alias("path_l"))
    r = nodes.select(F.col("doc_id").alias("id_r"), F.col("repo"),
                     F.col("path").alias("path_r"))
    cand = l.join(r, on="repo").where(F.col("id_l") < F.col("id_r"))
    out = cand.select(
        "id_l", "id_r",
        F.round(ngram_jaccard(F.lower(F.col("path_l")),
                              F.lower(F.col("path_r")), 3), 6).alias("jaccard"))
    # 0.3101: non-vacuous at sf0.01 (~117 rows; max observed jaccard ~0.43)
    # and not equal to any small-denominator shingle-count rational.
    return out.where(F.col("jaccard") >= 0.3101)


# --- unrestricted Damerau-Levenshtein (level kernel vs DuckDB builtin) --------

@q("damerau_levenshtein_pairs",
   f"""WITH {RF_CTE},
cand AS (
  SELECT l.doc_id AS id_l, r.doc_id AS id_r,
         l.path AS path_l, r.path AS path_r
  FROM nodes l JOIN nodes r ON l.repo = r.repo AND l.doc_id < r.doc_id
)
SELECT id_l, id_r,
       CAST(damerau_levenshtein(path_l, path_r) AS BIGINT) AS dl
FROM cand""")
def q_damerau_levenshtein(spark, sf_dir):
    """Unrestricted DL kernel (functions/similarity.py) vs DuckDB's
    damerau_levenshtein — the reference registers the same function as a
    Scala UDF (spark/jar_location.py:64-71)."""
    from .functions.similarity import damerau_levenshtein_udf
    nodes = nodes_df(spark, sf_dir)
    l = nodes.select(F.col("doc_id").alias("id_l"), F.col("repo"),
                     F.col("path").alias("path_l"))
    r = nodes.select(F.col("doc_id").alias("id_r"), F.col("repo"),
                     F.col("path").alias("path_r"))
    cand = l.join(r, on="repo").where(F.col("id_l") < F.col("id_r"))
    return cand.select(
        "id_l", "id_r",
        damerau_levenshtein_udf(F.col("path_l"), F.col("path_r"))
        .cast("long").alias("dl"))


# --- minhash LSH with the cross-engine poly31 hash ---------------------------

_MH_NUM, _MH_BANDS, _MH_K = 16, 4, 4
_rng = random.Random(42)
_MH_COEFFS = [(_rng.randrange(1, P31), _rng.randrange(0, P31))
              for _ in range(_MH_NUM)]


def _poly31_str_col(col: Column) -> Column:
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(P31))


def _mh_signature_col(col: Column) -> Column:
    lowered = F.lower(col)
    n = F.greatest(F.length(lowered) - F.lit(_MH_K - 1), F.lit(1))
    sh = F.array_distinct(F.transform(
        F.sequence(F.lit(1), n), lambda i: lowered.substr(i, F.lit(_MH_K))))
    hashes = F.transform(sh, _poly31_str_col)
    return F.array(*[
        F.array_min(F.transform(
            hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(P31)))
        for a, b in _MH_COEFFS
    ])


def _duck_mh_ctes(src: str = "documents") -> str:
    """CTE fragment computing poly31 minhash LSH candidate pairs over
    `src(doc_id, text)`: defines mh_hs, mh_sigs, mh_banded, mh_cand."""
    rows = _MH_NUM // _MH_BANDS
    sh = ("list_distinct([substring(lower(text), i, %d) for i in "
          "range(1, greatest(length(text) - %d, 1) + 1)])"
          % (_MH_K, _MH_K - 1))
    h = ("list_transform(%s, s -> list_reduce("
         "[CAST(0 AS BIGINT)] || list_transform(string_split(s, ''), "
         "c -> CAST(ascii(c) AS BIGINT)), "
         "(acc, x) -> (acc * 31 + x) %% %d))" % (sh, P31))
    sig_elems = ", ".join(
        f"list_aggregate(list_transform(h, x -> ({a} * x + {b}) % {P31}), 'min')"
        for a, b in _MH_COEFFS)
    band_rows = " UNION ALL ".join(
        f"""SELECT doc_id, {b} AS band_id,
           list_reduce([CAST(0 AS BIGINT)] || list_slice(sig, {b * rows + 1},
                       {b * rows + rows}), (acc, x) -> (acc * 31 + x) % {P31})
           AS band_hash FROM mh_sigs"""
        for b in range(_MH_BANDS))
    return f"""mh_hs AS (SELECT doc_id, {h} AS h FROM {src}),
mh_sigs AS (SELECT doc_id, [{sig_elems}] AS sig FROM mh_hs),
mh_banded AS ({band_rows}),
mh_cand AS (
  SELECT l.doc_id AS id_l, r.doc_id AS id_r, COUNT(*) AS n_common_bands
  FROM mh_banded l JOIN mh_banded r
    ON l.band_id = r.band_id AND l.band_hash = r.band_hash
   AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)"""


def _duck_mh_sql() -> str:
    return (f"WITH {_duck_mh_ctes('documents')} "
            "SELECT id_l, id_r, n_common_bands FROM mh_cand")


def _poly31_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Cross-engine MinHash-LSH candidates over (doc_id, text) using the
    poly31 hash family (bit-identical to the DuckDB oracle by construction).
    Production code uses operators/dedup.py's xxhash64 path; this variant
    exists so the LSH pipeline is oracle-checkable end to end."""
    rows = _MH_NUM // _MH_BANDS
    # explode shingles to rows so the poly31 fold runs over <=4 chars per
    # row (higher-order lambdas are interpreted; keep them tiny)
    lowered = F.lower(F.col("text"))
    n = F.greatest(F.length(lowered) - F.lit(_MH_K - 1), F.lit(1))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(1), n),
            lambda i: lowered.substr(i, F.lit(_MH_K))))).alias("_s"),
    ).withColumn("_h", _poly31_str_col(F.col("_s")))
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(P31)).alias(f"_m{i}")
        for i, (a, b) in enumerate(_MH_COEFFS)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs).select(
        "doc_id",
        F.array(*[F.col(f"_m{i}") for i in range(_MH_NUM)]).alias("sig"))
    band_hash = F.array(*[
        F.aggregate(F.slice(F.col("sig"), b * rows + 1, rows),
                    F.lit(0).cast("long"),
                    lambda acc, x: (acc * F.lit(31) + x) % F.lit(P31))
        for b in range(_MH_BANDS)
    ])
    banded = sig.select(
        "doc_id", F.posexplode(band_hash).alias("band_id", "band_hash"))
    l, r = banded.alias("l"), banded.alias("r")
    return (l.join(r, (F.col("l.band_id") == F.col("r.band_id"))
                   & (F.col("l.band_hash") == F.col("r.band_hash"))
                   & (F.col("l.doc_id") < F.col("r.doc_id")))
            .groupBy(F.col("l.doc_id").alias("id_l"),
                     F.col("r.doc_id").alias("id_r"))
            .agg(F.count(F.lit(1)).alias("n_common_bands")))


@q("minhash_lsh_pairs", _duck_mh_sql())
def q_minhash_lsh(spark, sf_dir):
    return _poly31_lsh_pairs(load(spark, sf_dir, "documents"))


# --- simhash (poly31, 32-bit) ------------------------------------------------

def _duck_simhash_sql() -> str:
    toks = ("list_distinct(list_filter(regexp_split_to_array("
            "trim(lower(text)), '\\s+'), t -> t <> ''))")
    h = (f"list_transform({toks}, t -> list_reduce("
         "[CAST(0 AS BIGINT)] || list_transform(string_split(t, ''), "
         f"c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc * 31 + x) % {P31}))")
    bits = " + ".join(
        f"(CASE WHEN 2 * list_aggregate(list_transform(h, "
        f"x -> (x >> {b}) & 1), 'sum') > len(h) "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(32))
    return (f"WITH hs AS (SELECT doc_id, {h} AS h FROM documents) "
            f"SELECT doc_id, CASE WHEN len(h) = 0 THEN 0 ELSE {bits} END "
            "AS simhash FROM hs")


@q("simhash32", _duck_simhash_sql())
def q_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode_outer(F.array_distinct(F.filter(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            lambda t: t != F.lit("")))).alias("_t"),
    ).withColumn(
        "_h", F.when(F.col("_t").isNotNull(), _poly31_str_col(F.col("_t"))))
    aggs = [F.sum(F.when(F.col("_h").isNotNull(), 1).otherwise(0)).alias("_n")]
    for b in range(32):
        aggs.append(F.sum(
            F.when(F.col("_h").isNotNull(),
                   F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)))
            .otherwise(0)).alias(f"_b{b}"))
    per = toks.groupBy("doc_id").agg(*aggs)
    total = F.lit(0).cast("long")
    for b in range(32):
        total = total + F.when(
            F.lit(2) * F.col(f"_b{b}") > F.col("_n"),
            F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return per.select(
        "doc_id",
        F.when(F.col("_n") == 0, F.lit(0).cast("long")).otherwise(total)
        .alias("simhash"))


# --- ANN: brute-force cosine top-k -------------------------------------------

@q("ann_topk",
   """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id % 100 = 0),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
s AS (
  SELECT query_id, vec_id,
         ROUND(list_cosine_similarity(qv, cv), 6) AS cosine
  FROM q, c WHERE query_id <> vec_id
)
SELECT query_id, vec_id, cosine,
  ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, vec_id) AS rank
FROM s QUALIFY rank <= 5""")
def q_ann_topk(spark, sf_dir):
    # per-vector norms hoisted out of the pair rows (ann.cosine_prenorm_expr:
    # float-identical to cosine_expr, one interpreted aggregate per pair
    # instead of up to five)
    from .operators.ann import _norm, cosine_prenorm_expr
    emb = load(spark, sf_dir, "embeddings")
    qd = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"))
    qd = qd.select("*", _norm(F.col("qv")).alias("qn"))
    cd = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("cv"))
    # a single-file embedding table scans as ONE partition, and the
    # per-pair interpreted dot products run in the scan stage (before the
    # window's exchange) — i.e. on one core. Same adaptive rule as the
    # other Python/interpreted stages: spread the corpus side over the
    # cores only when it arrives narrower than them (values per row are
    # partition-independent, so results are identical).
    try:
        cur = cd.rdd.getNumPartitions()
    except Exception:
        cur = 0
    dp = spark.sparkContext.defaultParallelism
    if cur and cur < dp:
        cd = cd.repartition(dp)
    cd = cd.select("*", _norm(F.col("cv")).alias("cn"))
    scored = cd.crossJoin(F.broadcast(qd)) \
        .where(F.col("query_id") != F.col("vec_id")) \
        .select("query_id", "vec_id",
                F.round(cosine_prenorm_expr(F.col("qv"), F.col("cv"),
                                            F.col("qn"), F.col("cn")),
                        6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")) \
        .where(F.col("rank") <= 5)


# --- text analysis -----------------------------------------------------------

@q("text_quality",
   r"""WITH t AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                x -> x <> '') AS toks,
    length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  ROUND(CASE WHEN n_chars > 0 THEN
    CAST(n_chars - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
      / n_chars ELSE 0.0 END, 6) AS punct_ratio,
  ROUND(CASE WHEN len(toks) > 0 THEN
    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
    ELSE 0.0 END, 6) AS distinct_token_ratio,
  ROUND(CASE WHEN len(toks) > 0 THEN
    CAST(list_reduce([0] || list_transform(toks, x -> length(x)),
                     (a, b) -> a + b) AS DOUBLE) / len(toks)
    ELSE 0.0 END, 6) AS mean_word_len
FROM t""")
def q_text_quality(spark, sf_dir):
    from .functions.text import quality_features
    docs = load(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    return docs.select(
        "doc_id", f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        F.round(f["distinct_token_ratio"], 6).alias("distinct_token_ratio"),
        F.round(f["mean_word_len"], 6).alias("mean_word_len"))


@q("token_counts",
   r"""SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> x <> '')) AS BIGINT) AS n_tokens
FROM documents""")
def q_token_counts(spark, sf_dir):
    from .functions.text import token_count
    return load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens"))


# --- profiling ---------------------------------------------------------------

@q("profile_percentiles",
   """SELECT lang,
  COUNT(*) AS n,
  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 6) AS p50,
  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 6) AS p90
FROM documents GROUP BY lang""")
def q_profile_percentiles(spark, sf_dir):
    return load(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90"))


# ----------------------------------------------------------------- flagship

def flagship(spark: SparkSession,
             sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """End-to-end dedupe on the derived repo-file table: blocking ->
    comparison vectors -> Fellegi-Sunter predict -> connected components.
    Returns per-node cluster membership with cluster sizes."""
    pred = _spark_predict(spark, sf_dir)
    nodes = nodes_df(spark, sf_dir)
    edges = pred.where(F.col("match_probability") >= 0.9) \
        .select("unique_id_l", "unique_id_r")
    member = solve_connected_components(nodes, edges)
    sizes = member.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return member.join(sizes, on="cluster_id") \
        .select("node_id", "cluster_id", "cluster_size")


# --- unlinkables: self-link score distribution -------------------------------

@q("unlinkables",
   f"""WITH {RF_CTE},
selfp AS (
  SELECT ROUND(log2(
    CAST({PRIOR / (1 - PRIOR)!r} AS DOUBLE)
    * (CASE WHEN content_sha IS NULL THEN 1.0 ELSE {M_U["content_sha"][1][0]}/{M_U["content_sha"][1][1]} END)
    * (CASE WHEN path IS NULL THEN 1.0 ELSE {M_U["path"][3][0]}/{M_U["path"][3][1]} END)
  ), 2) AS match_weight
  FROM nodes
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM selfp),
per_w AS (SELECT match_weight, COUNT(*) AS cnt FROM selfp GROUP BY match_weight)
SELECT match_weight,
  ROUND(cnt / (SELECT n FROM tot), 6) AS prop,
  ROUND(SUM(cnt) OVER (ORDER BY match_weight
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        / (SELECT n FROM tot), 6) AS cum_prop
FROM per_w""")
def q_unlinkables(spark, sf_dir):
    """Self-link weight distribution (linker.py:505-564 / unlinkables.py)."""
    from .operators.cluster_extras import unlinkables_data
    nodes = nodes_df(spark, sf_dir)
    pairs = nodes.select(
        F.lit("0").alias("match_key"),
        F.col("unique_id").alias("unique_id_l"),
        F.col("unique_id").alias("unique_id_r"))
    s = entry_settings()
    cv = compute_comparison_vectors(pairs, nodes, s)
    pred = predict_op(cv, s)
    out = unlinkables_data(pred, round_dp=2)
    return out.select("match_weight", F.round("prop", 6).alias("prop"),
                      F.round("cum_prop", 6).alias("cum_prop"))


# --- language id (stopword-vote heuristic) -----------------------------------

def _duck_langid_sql() -> str:
    from .functions.text import _LANG_MARKERS
    toks = ("list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
            " x -> x <> '')")
    scores = {
        lang: ("len(list_distinct(list_intersect(%s, %s)))"
               % (toks, "[" + ", ".join(f"'{w}'" for w in words) + "]"))
        for lang, words in _LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} = best AND best > 0 THEN '{lang}'"
        for lang in _LANG_MARKERS
    )
    return (f"WITH t AS (SELECT doc_id, {best} AS best, text FROM documents) "
            f"SELECT doc_id, CASE {whens} ELSE 'und' END AS lang_id FROM t")


@q("language_id", _duck_langid_sql())
def q_language_id(spark, sf_dir):
    from .functions.text import language_id
    return load(spark, sf_dir, "documents").select(
        "doc_id", language_id(F.col("text")).alias("lang_id"))


# --- completeness ------------------------------------------------------------

@q("completeness",
   """SELECT 'text' AS column_name,
       ROUND(CAST(COUNT(text) AS DOUBLE) / COUNT(*), 6) AS completeness
   FROM documents
   UNION ALL
   SELECT 'lang', ROUND(CAST(COUNT(lang) AS DOUBLE) / COUNT(*), 6)
   FROM documents""")
def q_completeness(spark, sf_dir):
    from .operators.profiling import completeness_data
    out = completeness_data(load(spark, sf_dir, "documents"),
                            columns=["text", "lang"])
    return out.select("column_name",
                      F.round("completeness", 6).alias("completeness"))


# --- graph metrics over predicted edges (graph_metrics.py:257-312) -----------

@q("cluster_graph_metrics",
   f"""WITH RECURSIVE {CC_CTES},
deg AS (
  SELECT node_id, COUNT(*) AS d FROM (
    SELECT src AS node_id FROM cc_edges
    UNION ALL SELECT dst FROM cc_edges
  ) GROUP BY node_id
),
nm AS (
  SELECT m.node_id, m.cluster_id, COALESCE(deg.d, 0) AS d
  FROM cc_member m LEFT JOIN deg USING (node_id)
)
SELECT cluster_id,
  COUNT(*) AS n_nodes,
  CAST(SUM(d) AS DOUBLE) / 2.0 AS n_edges,
  CASE WHEN COUNT(*) > 1 THEN
    ROUND(CAST(SUM(d) AS DOUBLE) / (COUNT(*) * (COUNT(*) - 1)), 6)
  END AS density,
  CASE WHEN COUNT(*) > 2 THEN
    ROUND(CAST(COUNT(*) * MAX(d) - SUM(d) AS DOUBLE)
          / ((COUNT(*) - 1) * (COUNT(*) - 2)), 6)
  END AS cluster_centralisation
FROM nm GROUP BY cluster_id""")
def q_cluster_graph_metrics(spark, sf_dir):
    from .operators.cluster import graph_metrics
    pred = _spark_predict(spark, sf_dir)
    edges = pred.where(F.col("match_probability") >= 0.9) \
        .select("unique_id_l", "unique_id_r")
    member = q_cluster_membership(spark, sf_dir)
    _, cluster_metrics = graph_metrics(member, edges)
    return cluster_metrics.select(
        "cluster_id", "n_nodes",
        F.col("n_edges").cast("double").alias("n_edges"),
        F.round("density", 6).alias("density"),
        F.round("cluster_centralisation", 6).alias("cluster_centralisation"))


# --- winnowing fingerprint ----------------------------------------------------
# Production path is xxhash64 (functions/text.py:fingerprint64); the entry
# query uses the poly31 variant so DuckDB can replicate it bit-for-bit
# (xor of distinct rolling-window minima over token hashes).

_FP_WINDOW = 8
_FP_TOKS = ("list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
            "x -> x <> '')")
_FP_HASHES = (f"list_transform({_FP_TOKS}, t -> list_reduce("
              "[CAST(0 AS BIGINT)] || list_transform(string_split(t, ''), "
              f"c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc * 31 + x) % {P31}))")


@q("fingerprints",
   f"""WITH t AS (SELECT doc_id, {_FP_HASHES} AS h FROM documents),
w AS (
  SELECT doc_id,
    list_distinct([list_aggregate(h[i:i+{_FP_WINDOW - 1}], 'min')
                   for i in range(1, greatest(len(h) - {_FP_WINDOW - 1}, 1) + 1)])
    AS sel
  FROM t
)
SELECT doc_id,
  COALESCE(list_reduce([CAST(0 AS BIGINT)] || sel, (a, b) -> xor(a, b)),
           CAST(0 AS BIGINT)) AS fingerprint
FROM w""")
def q_fingerprints(spark, sf_dir):
    from .functions.text import fingerprint_poly31
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        fingerprint_poly31(F.col("text"), window=_FP_WINDOW)
        .alias("fingerprint"))


# --- near-dedup pipeline (exact -> LSH -> verify -> CC -> fan-out) -------------

_ND_SH = ("list_distinct([substring(lower({c}), i, %d) for i in "
          "range(1, greatest(length({c}) - %d, 1) + 1)])"
          % (_MH_K, _MH_K - 1))


def _duck_near_dedup_sql(threshold: float = 0.8) -> str:
    shl, shr = _ND_SH.format(c="l.text"), _ND_SH.format(c="r.text")
    return f"""WITH RECURSIVE
ex AS (SELECT doc_id, sha256(text) AS g FROM documents),
nd_reps AS (SELECT MIN(doc_id) AS rep_id, g FROM ex GROUP BY g),
rdocs AS (SELECT d.doc_id, d.text FROM documents d
          JOIN nd_reps ON nd_reps.rep_id = d.doc_id),
{_duck_mh_ctes("rdocs")},
ver AS (
  SELECT id_l, id_r FROM mh_cand c
  JOIN rdocs l ON l.doc_id = c.id_l JOIN rdocs r ON r.doc_id = c.id_r
  WHERE CAST(len(list_intersect({shl}, {shr})) AS DOUBLE)
        / GREATEST(len(list_distinct({shl} || {shr})), 1) >= {threshold}
),
nd_und AS (SELECT id_l AS src, id_r AS dst FROM ver
           UNION SELECT id_r, id_l FROM ver),
nd_walk(node_id, label) AS (
  SELECT rep_id, rep_id FROM nd_reps
  UNION
  SELECT u.dst, w.label FROM nd_walk w JOIN nd_und u ON u.src = w.node_id
),
nd_labels AS (SELECT node_id, MIN(label) AS cc FROM nd_walk GROUP BY node_id),
fan AS (
  SELECT e.doc_id, l.cc
  FROM ex e JOIN nd_reps r ON e.g = r.g
  JOIN nd_labels l ON l.node_id = r.rep_id
)
SELECT doc_id,
  MIN(doc_id) OVER (PARTITION BY cc) AS dup_cluster_id,
  MIN(doc_id) OVER (PARTITION BY cc) = doc_id AS is_canonical
FROM fan"""


@q("near_dedup_documents", _duck_near_dedup_sql(0.8))
def q_near_dedup(spark, sf_dir):
    from .operators.dedup import near_dedup_documents
    return near_dedup_documents(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        jaccard_threshold=0.8, shingle_k=_MH_K,
        candidate_fn=_poly31_lsh_pairs)


# --- §2.7 tail: geo / temporal / numeric / array / reversed levels -----------
# These put the comparison-level kinds that previously had only pytest
# coverage (distance_in_km, date_diff_seconds, abs_diff, pct_diff,
# array_intersect, array_subset, pairwise_levenshtein, columns_reversed,
# literal) behind the DuckDB oracle gate, through the REAL operator path
# (block_using_rules -> compute_comparison_vectors), on deterministically
# derived columns. Reference: comparison_level_library.py:356-396 (reversed),
# 598-692 (pairwise lev), 812-864 (haversine), 946-985 (array subset).
#
# distance_in_km thresholds are mid-gap for the WHOLE 37x53 coordinate
# lattice (nearest attainable distances: 1998.77 / 2000.28 around 2000 km
# and 4999.93 / 5000.45 around 5000 km — verified over all lattice pairs),
# so a trig-library ulp difference between the JVM and DuckDB can never
# flip a gamma.

def rich_nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodes_df + deterministic geo/time/numeric/array/name columns."""
    d = F.col("doc_id")
    return nodes_df(spark, sf_dir).withColumns({
        "lat": ((d % 37) * 2 - 36).cast("double"),
        "lon": ((d % 53) * 3 - 78).cast("double"),
        "event_ts": F.timestamp_seconds(F.lit(1577836800) + (d % 1000) * 7200),
        "content_size": F.length("content"),
        "path_tokens": F.split("path", "/"),
        "first_name": F.concat(F.lit("p"), (d % 11).cast("string")),
        "last_name": F.concat(F.lit("p"), (d % 13).cast("string")),
        "aliases": F.array(
            F.concat(F.lit("doc"), (d % 997).cast("string")),
            F.concat(F.lit("d"), (d % 31).cast("string"))),
    })


RICH_PAIRS_CTE = RF_CTE + """,
rich AS (
  SELECT nodes.*,
    CAST((doc_id % 37) * 2 - 36 AS DOUBLE) AS lat,
    CAST((doc_id % 53) * 3 - 78 AS DOUBLE) AS lon,
    to_timestamp(1577836800 + (doc_id % 1000) * 7200) AS event_ts,
    length(content) AS content_size,
    string_split(path, '/') AS path_tokens,
    'p' || CAST(doc_id % 11 AS VARCHAR) AS first_name,
    'p' || CAST(doc_id % 13 AS VARCHAR) AS last_name,
    ['doc' || CAST(doc_id % 997 AS VARCHAR),
     'd' || CAST(doc_id % 31 AS VARCHAR)] AS aliases
  FROM nodes
),
rpairs AS (
  SELECT '0' AS match_key,
    l.unique_id AS unique_id_l, r.unique_id AS unique_id_r,
    l.lat AS lat_l, r.lat AS lat_r, l.lon AS lon_l, r.lon AS lon_r,
    l.event_ts AS ts_l, r.event_ts AS ts_r,
    l.content_size AS sz_l, r.content_size AS sz_r,
    l.path_tokens AS tok_l, r.path_tokens AS tok_r,
    l.first_name AS fn_l, r.first_name AS fn_r,
    l.last_name AS ln_l, r.last_name AS ln_r,
    l.aliases AS al_l, r.aliases AS al_r,
    l.path AS path_l, r.path AS path_r
  FROM rich l JOIN rich r ON l.repo = r.repo
  WHERE l.unique_id < r.unique_id
)
"""

_HAVERSINE_SQL = ("2*6371.0*asin(sqrt(pow(sin(radians(lat_r-lat_l)/2),2)"
                  " + cos(radians(lat_l))*cos(radians(lat_r))"
                  "*pow(sin(radians(lon_r-lon_l)/2),2)))")


def _rich_settings_geo() -> Settings:
    return Settings(
        comparisons=(
            Comparison("geo", None, (
                ComparisonLevel("null", column="lat"),
                ComparisonLevel("distance_in_km", threshold=2000.0,
                                lat_column="lat", long_column="lon"),
                ComparisonLevel("distance_in_km", threshold=5000.0,
                                lat_column="lat", long_column="lon"),
                ComparisonLevel("else"),
            )),
            Comparison("event_ts", "event_ts", (
                ComparisonLevel("null"),
                ComparisonLevel("date_diff_seconds", threshold=86400),
                ComparisonLevel("date_diff_seconds", threshold=2592000),
                ComparisonLevel("else"),
            )),
            Comparison("size", "content_size", (
                ComparisonLevel("null"),
                ComparisonLevel("abs_diff", threshold=10),
                ComparisonLevel("pct_diff", threshold=0.3),
                ComparisonLevel("else"),
            )),
        ),
        blocking_rules=(block_on("repo"),),
        probability_two_random_records_match=PRIOR,
    )


@q("geo_time_numeric_vectors",
   f"""WITH {RICH_PAIRS_CTE}
SELECT match_key, unique_id_l, unique_id_r,
  CASE WHEN lat_l IS NULL OR lat_r IS NULL THEN -1
       WHEN {_HAVERSINE_SQL} <= 2000.0 THEN 2
       WHEN {_HAVERSINE_SQL} <= 5000.0 THEN 1
       ELSE 0 END AS gamma_geo,
  CASE WHEN ts_l IS NULL OR ts_r IS NULL THEN -1
       WHEN abs(epoch(ts_l) - epoch(ts_r)) <= 86400 THEN 2
       WHEN abs(epoch(ts_l) - epoch(ts_r)) <= 2592000 THEN 1
       ELSE 0 END AS gamma_event_ts,
  CASE WHEN sz_l IS NULL OR sz_r IS NULL THEN -1
       WHEN abs(sz_l - sz_r) <= 10 THEN 2
       WHEN abs(sz_l - sz_r) / greatest(sz_l, sz_r) < 0.3 THEN 1
       ELSE 0 END AS gamma_size
FROM rpairs""")
def q_geo_time_numeric_vectors(spark, sf_dir):
    """DistanceInKM / AbsoluteTimeDifference / AbsoluteDifference /
    PercentageDifference gamma ladders through the real blocking+vectors
    operators (comparison_level_library.py:812-864, 1040-1105)."""
    s = _rich_settings_geo()
    nodes = rich_nodes_df(spark, sf_dir)
    pairs = block_using_rules(nodes, s)
    return compute_comparison_vectors(pairs, nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_geo", "gamma_event_ts", "gamma_size")


def _rich_settings_arrays() -> Settings:
    return Settings(
        comparisons=(
            Comparison("tokens", "path_tokens", (
                ComparisonLevel("null"),
                ComparisonLevel("array_subset"),
                ComparisonLevel("array_intersect", threshold=2),
                ComparisonLevel("else"),
            )),
            Comparison("name", "first_name", (
                ComparisonLevel("null"),
                ComparisonLevel("literal", literal="p3"),
                ComparisonLevel("exact"),
                ComparisonLevel("columns_reversed", column2="last_name"),
                ComparisonLevel("else"),
            )),
            Comparison("aliases", "aliases", (
                ComparisonLevel("null"),
                ComparisonLevel("pairwise_levenshtein", threshold=1),
                ComparisonLevel("pairwise_levenshtein", threshold=3),
                ComparisonLevel("else"),
            )),
            Comparison("qgram", "path", (
                ComparisonLevel("null"),
                ComparisonLevel("qgram_jaccard", threshold=0.7),
                ComparisonLevel("qgram_jaccard", threshold=0.4),
                ComparisonLevel("else"),
            )),
        ),
        blocking_rules=(block_on("repo"),),
        probability_two_random_records_match=PRIOR,
    )


_PW_LEV_SQL = ("list_min(flatten(list_transform(al_l, "
               "x -> list_transform(al_r, y -> levenshtein(x, y)))))")

# 2-gram token sets, the qgram_tokenise expression replayed in DuckDB
# (lowercase, substr windows 1..max(len-1,1), distinct)
_QG_SQL = ("list_distinct([substring(lower({c}), i, 2) for i in "
           "range(1, greatest(length({c}) - 1, 1) + 1)])")
_QG_JACCARD_SQL = (
    "(CAST(len(list_intersect({l}, {r})) AS DOUBLE)"
    " / len(list_distinct({l} || {r})))"
).format(l=_QG_SQL.format(c="path_l"), r=_QG_SQL.format(c="path_r"))


@q("array_name_vectors",
   f"""WITH {RICH_PAIRS_CTE}
SELECT match_key, unique_id_l, unique_id_r,
  CASE WHEN tok_l IS NULL OR tok_r IS NULL THEN -1
       WHEN len(tok_l) > 0 AND len(tok_r) > 0
            AND len(list_intersect(tok_l, tok_r))
                = least(len(tok_l), len(tok_r)) THEN 2
       WHEN len(list_intersect(tok_l, tok_r)) >= 2 THEN 1
       ELSE 0 END AS gamma_tokens,
  CASE WHEN fn_l IS NULL OR fn_r IS NULL THEN -1
       WHEN fn_l = 'p3' AND fn_r = 'p3' THEN 3
       WHEN fn_l = fn_r THEN 2
       WHEN fn_l = ln_r AND ln_l = fn_r THEN 1
       ELSE 0 END AS gamma_name,
  CASE WHEN al_l IS NULL OR al_r IS NULL THEN -1
       WHEN {_PW_LEV_SQL} <= 1 THEN 2
       WHEN {_PW_LEV_SQL} <= 3 THEN 1
       ELSE 0 END AS gamma_aliases,
  CASE WHEN path_l IS NULL OR path_r IS NULL THEN -1
       WHEN {_QG_JACCARD_SQL} >= 0.7 THEN 2
       WHEN {_QG_JACCARD_SQL} >= 0.4 THEN 1
       ELSE 0 END AS gamma_qgram
FROM rpairs""")
def q_array_name_vectors(spark, sf_dir):
    """ArraySubset / ArrayIntersect / Literal / ColumnsReversed /
    PairwiseStringDistance / QgramJaccard gamma ladders through the real
    operators (comparison_level_library.py:356-396, 598-692, 946-985;
    QgramTokeniser jar_location.py:58)."""
    s = _rich_settings_arrays()
    nodes = rich_nodes_df(spark, sf_dir)
    pairs = block_using_rules(nodes, s)
    return compute_comparison_vectors(pairs, nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_tokens", "gamma_name", "gamma_aliases", "gamma_qgram")


# same-repo doc_ids differ by multiples of 161 (repo = org<id%7>/repo<id%23>)
# and 161 = -1 (mod 9), so keying variants by doc_id % 9 makes within-block
# members land on CYCLICALLY ADJACENT variants (distances 1..3); the
# variant tables below are designed so those combos realize EVERY gamma
# level of each ladder (vacuity test-pinned). Identical SQL runs in both
# engines — one constant per column, no per-engine fork to desynchronize.
def _variants_case(variants: list[str | None]) -> str:
    whens = " ".join(
        f"WHEN {i} THEN " + ("NULL" if v is None else f"'{v}'")
        for i, v in enumerate(variants))
    return f"CASE (doc_id % 9) {whens} END"


_DOB_DERIVE = _variants_case([
    "1960-06-15", "1960-06-15",  # (0,1): exact
    "1960-06-16",                # vs base: DL 1 edit, 1 day -> dl level
    "1960-06-30",                # vs base: 2 edits, 15 days -> month level
    "1961-02-15",                # vs 2/3: year level
    "1965-07-15",                # vs 3/4: 10-year level
    "1999-01-01",                # else vs anything near
    "not-a-date",                # invalid -> null level
    "1970-01-01",                # else filler (9th slot)
])
# JW values (bit-identical to DuckDB, computed with this repo's kernels):
# full(alice.smith@example.com, alice.smyth@example.com) = .9826 >= .88
# with usernames unequal -> full-JW level; user(catherine.jones,
# catherine.jomes) = .9733 >= .88 while full = .8469 < .88 -> user-JW level
_EMAIL_DERIVE = _variants_case([
    "alice.smith@example.com", "alice.smith@example.com",  # exact
    "alice.smith@mail.org",      # same local part, full differs
    "alice.smyth@example.com",   # full JW >= .88, user not exact
    "catherine.jones@aa.com",
    "catherine.jomes@wholly-unrelated-domain-inc.org",  # user-JW only
    "bob@qq.net",                # else vs neighbours
    None,                        # null
    "broken.email.no.at",        # malformed: username = whole string
])
# forename/surname variant pairs: exact-both, columns-reversed, JW-both
# >= .92 (alices/smiths .9667), JW-both in [.88,.92) (alixe .9067 /
# smyth .8933), surname-only, forename-only, else, both-null
_FN_DERIVE = _variants_case([
    "alice", "alice", "smith", "alices", "alixe", "bob", "alixe",
    None, None])
_LN_DERIVE = _variants_case([
    "smith", "smith", "alice", "smiths", "smyth", "smyth", "jones",
    None, None])


# --- §2.7: the ForenameSurnameComparison composite at the oracle gate --------
# Replays the reference's full level ladder (comparison_library.py:1134-1189
# as built by cl.ForenameSurnameComparison): And-of-nulls, exact-both,
# symmetrical columns-reversed, JW-both at 0.92/0.88, surname-only,
# forename-only, else. Gammas are 6..0 over the 7 non-null levels; the
# derived variant name columns make every level fire (vacuity-pinned).

_JW_FN = "jaro_winkler_similarity(fn_l, fn_r)"
_JW_LN = "jaro_winkler_similarity(ln_l, ln_r)"


@q("forename_surname_vectors",
   f"""WITH {RF_CTE},
named AS (
  SELECT unique_id, repo,
    {_FN_DERIVE} AS first_name,
    {_LN_DERIVE} AS last_name
  FROM nodes
),
npairs AS (
  SELECT '0' AS match_key,
    l.unique_id AS unique_id_l, r.unique_id AS unique_id_r,
    l.first_name AS fn_l, r.first_name AS fn_r,
    l.last_name AS ln_l, r.last_name AS ln_r
  FROM named l JOIN named r ON l.repo = r.repo
  WHERE l.unique_id < r.unique_id
)
SELECT match_key, unique_id_l, unique_id_r,
  CASE
    WHEN (fn_l IS NULL OR fn_r IS NULL) AND (ln_l IS NULL OR ln_r IS NULL)
      THEN -1
    WHEN fn_l = fn_r AND ln_l = ln_r THEN 6
    WHEN fn_l = ln_r AND fn_r = ln_l THEN 5
    WHEN {_JW_FN} >= 0.92 AND {_JW_LN} >= 0.92 THEN 4
    WHEN {_JW_FN} >= 0.88 AND {_JW_LN} >= 0.88 THEN 3
    WHEN ln_l = ln_r THEN 2
    WHEN fn_l = fn_r THEN 1
    ELSE 0 END AS gamma_forename_surname
FROM npairs""")
def q_forename_surname_vectors(spark, sf_dir):
    """cl.ForenameSurnameComparison through the real operator path:
    composed And-null / And-JW levels, symmetrical columns_reversed, and
    the graded exact levels, hash-matched against a DuckDB replay of the
    reference ladder on variant name columns designed to exercise every
    level."""
    from dataclasses import replace as _replace

    from .comparison_library import ForenameSurnameComparison

    comp = ForenameSurnameComparison("first_name", "last_name")
    # gammas are TF-independent; strip the composite's default TF flags so
    # this vectors-only query doesn't require materialized tf_* columns
    comp = _replace(comp, levels=tuple(
        _replace(lv, tf_adjustment=False) for lv in comp.levels))
    s = Settings(
        comparisons=(comp,),
        blocking_rules=(block_on("repo"),),
        probability_two_random_records_match=PRIOR,
    )
    nodes = nodes_df(spark, sf_dir).selectExpr(
        "unique_id", "repo",
        f"{_FN_DERIVE} AS first_name",
        f"{_LN_DERIVE} AS last_name")
    pairs = block_using_rules(nodes, s)
    return compute_comparison_vectors(pairs, nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_forename_surname")


# --- §2.7: DateOfBirth + Email composites at the oracle gate ------------------
# Replays cl.DateOfBirthComparison(input_is_string=True) — invalid-as-null,
# exact, DL<=1 on the string, graded elapsed-time levels — and
# cl.email_comparison — exact, regex local-part match, JW 0.88 on the
# full email and on the local part (the reference EmailComparison ladder)
# — on deterministically derived dob/email variant columns.


_TS = lambda s: f"epoch(try_cast({s} AS TIMESTAMP))"
_USER = lambda s: f"nullif(regexp_extract({s}, '^[^@]+', 0), '')"
_MONTH_S = 86400 * 365.25 / 12
_YEAR_S = 86400 * 365.25


def _strip_tf(comp: Comparison) -> Comparison:
    """Gammas are TF-independent; vectors-only oracle queries drop the
    library composites' default TF flags so they don't require
    materialized tf_* columns."""
    from dataclasses import replace as _rp
    return _rp(comp, levels=tuple(
        _rp(lv, tf_adjustment=False) for lv in comp.levels))


@q("email_dob_vectors",
   f"""WITH {RF_CTE},
derived AS (
  SELECT unique_id, repo,
    {_DOB_DERIVE} AS dob,
    {_EMAIL_DERIVE} AS email
  FROM nodes
),
dpairs AS (
  SELECT '0' AS match_key,
    l.unique_id AS unique_id_l, r.unique_id AS unique_id_r,
    l.dob AS dob_l, r.dob AS dob_r,
    l.email AS em_l, r.email AS em_r
  FROM derived l JOIN derived r ON l.repo = r.repo
  WHERE l.unique_id < r.unique_id
)
SELECT match_key, unique_id_l, unique_id_r,
  CASE
    WHEN {_TS('dob_l')} IS NULL OR {_TS('dob_r')} IS NULL THEN -1
    WHEN dob_l = dob_r THEN 5
    WHEN damerau_levenshtein(dob_l, dob_r) <= 1 THEN 4
    WHEN abs({_TS('dob_l')} - {_TS('dob_r')}) <= {_MONTH_S} THEN 3
    WHEN abs({_TS('dob_l')} - {_TS('dob_r')}) <= {_YEAR_S} THEN 2
    WHEN abs({_TS('dob_l')} - {_TS('dob_r')}) <= {10 * _YEAR_S} THEN 1
    ELSE 0 END AS gamma_dob,
  CASE
    WHEN em_l IS NULL OR em_r IS NULL THEN -1
    WHEN em_l = em_r THEN 4
    WHEN {_USER('em_l')} = {_USER('em_r')} THEN 3
    WHEN jaro_winkler_similarity(em_l, em_r) >= 0.88 THEN 2
    WHEN jaro_winkler_similarity({_USER('em_l')}, {_USER('em_r')}) >= 0.88
      THEN 1
    ELSE 0 END AS gamma_email
FROM dpairs""")
def q_email_dob_vectors(spark, sf_dir):
    """cl.DateOfBirthComparison(input_is_string=True) and
    cl.email_comparison through the real operator path, hash-matched
    against a DuckDB replay of the reference ladders (invalid dates as
    null, DL<=1 on the date string, elapsed-time levels; email username
    extraction with the reference regex, JW on full and username,
    null-safe for malformed addresses)."""
    from .comparison_library import DateOfBirthComparison, email_comparison
    from .functions.similarity import register_udfs

    # the email ladder's username-JW level calls the jaro_winkler UDF by
    # SQL name (SparkLinker registers it; standalone queries must too)
    register_udfs(spark)
    nodes = nodes_df(spark, sf_dir).selectExpr(
        "unique_id", "repo",
        f"{_DOB_DERIVE} AS dob",
        f"{_EMAIL_DERIVE} AS email")
    s = Settings(
        comparisons=(
            DateOfBirthComparison("dob", input_is_string=True),
            _strip_tf(email_comparison("email")),
        ),
        blocking_rules=(block_on("repo"),),
        probability_two_random_records_match=PRIOR,
    )
    pairs = block_using_rules(nodes, s)
    return compute_comparison_vectors(pairs, nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_dob", "gamma_email")


# --- §2.7: pairwise fuzzy string metrics over array columns ------------------
# DuckDB replay of PairwiseStringDistanceFunctionLevel for the three
# non-levenshtein function names (reference comparison_library.py:348-417):
# best cross-product similarity/distance via nested list_transform lambdas.
# Our numpy kernels are bit-identical to the DuckDB builtins (fuzz-proven in
# tests/test_similarity_vs_duckdb.py), so exact thresholds hash-match.

def _pw_sql(fn: str, agg: str) -> str:
    return (f"{agg}(flatten(list_transform(al_l, "
            f"x -> list_transform(al_r, y -> {fn}(x, y)))))")


def _pairwise_fuzzy_settings() -> Settings:
    lv = ComparisonLevel
    return Settings(
        comparisons=(
            Comparison("jw_alias", "aliases", (
                lv("null"), lv("pairwise_jaro_winkler", threshold=0.9),
                lv("pairwise_jaro_winkler", threshold=0.7), lv("else"))),
            Comparison("jaro_alias", "aliases", (
                lv("null"), lv("pairwise_jaro", threshold=0.85),
                lv("else"))),
            Comparison("dl_alias", "aliases", (
                lv("null"), lv("pairwise_damerau_levenshtein", threshold=1),
                lv("pairwise_damerau_levenshtein", threshold=3),
                lv("else"))),
        ),
        blocking_rules=(block_on("repo"),),
        probability_two_random_records_match=PRIOR,
    )


@q("pairwise_fuzzy_vectors",
   f"""WITH {RICH_PAIRS_CTE}
SELECT match_key, unique_id_l, unique_id_r,
  CASE WHEN al_l IS NULL OR al_r IS NULL THEN -1
       WHEN {_pw_sql('jaro_winkler_similarity', 'list_max')} >= 0.9 THEN 2
       WHEN {_pw_sql('jaro_winkler_similarity', 'list_max')} >= 0.7 THEN 1
       ELSE 0 END AS gamma_jw_alias,
  CASE WHEN al_l IS NULL OR al_r IS NULL THEN -1
       WHEN {_pw_sql('jaro_similarity', 'list_max')} >= 0.85 THEN 1
       ELSE 0 END AS gamma_jaro_alias,
  CASE WHEN al_l IS NULL OR al_r IS NULL THEN -1
       WHEN {_pw_sql('damerau_levenshtein', 'list_min')} <= 1 THEN 2
       WHEN {_pw_sql('damerau_levenshtein', 'list_min')} <= 3 THEN 1
       ELSE 0 END AS gamma_dl_alias
FROM rpairs""")
def q_pairwise_fuzzy_vectors(spark, sf_dir):
    """pairwise_jaro_winkler / pairwise_jaro / pairwise_damerau_levenshtein
    gamma ladders through the real operator path (one vectorized kernel
    pass over the flattened cross-product per Arrow batch,
    functions/similarity.pairwise_best_np)."""
    s = _pairwise_fuzzy_settings()
    nodes = rich_nodes_df(spark, sf_dir)
    pairs = block_using_rules(nodes, s)
    return compute_comparison_vectors(pairs, nodes, s).select(
        "match_key", "unique_id_l", "unique_id_r",
        "gamma_jw_alias", "gamma_jaro_alias", "gamma_dl_alias")


# --- §2.9: one EM iteration at the oracle gate -------------------------------
# The E-step/M-step algebra (train._e_step/_m_step, reference
# expectation_maximisation.py) replayed in pure SQL over the agreement
# patterns: p = bf/(1+bf) per pattern from the STARTING m/u, new lambda =
# sum(p*cnt)/sum(cnt), new m_k/u_k = level-share of the (non-null)
# match/unmatch mass, floored at LEVEL_NOT_OBSERVED (1e-6) exactly like the
# numpy M-step. Every (comparison, gamma) row is emitted even when
# unobserved via a static VALUES spine.

def _em_iter_sql() -> str:
    prior_odds = PRIOR / (1 - PRIOR)
    spine = ", ".join(
        f"('{comp}', {g})" for comp in M_U for g in sorted(M_U[comp], reverse=True))
    return f"""WITH {CV_CTE},
pats AS (
  SELECT gamma_content_sha, gamma_path, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM cv GROUP BY 1, 2
),
pp AS (
  SELECT *, bf / (1 + bf) AS p FROM (
    SELECT *, CAST({prior_odds!r} AS DOUBLE)
      * {_bf_case("content_sha")} * {_bf_case("path")} AS bf
    FROM pats)
),
lam AS (SELECT SUM(p * cnt) / SUM(cnt) AS l FROM pp),
spine(comparison, gamma_value) AS (VALUES {spine}),
obs AS (
  SELECT 'content_sha' AS comparison, gamma_content_sha AS gamma_value,
         SUM(p * cnt) AS pm, SUM((1 - p) * cnt) AS pu
  FROM pp WHERE gamma_content_sha >= 0 GROUP BY gamma_content_sha
  UNION ALL
  SELECT 'path', gamma_path, SUM(p * cnt), SUM((1 - p) * cnt)
  FROM pp WHERE gamma_path >= 0 GROUP BY gamma_path
),
tot AS (
  SELECT comparison, SUM(pm) AS m_tot, SUM(pu) AS u_tot
  FROM obs GROUP BY comparison
)
SELECT s.comparison, s.gamma_value,
  ROUND(GREATEST(COALESCE(o.pm, 0) / t.m_tot, 1e-6), 6) AS m,
  ROUND(GREATEST(COALESCE(o.pu, 0) / t.u_tot, 1e-6), 6) AS u,
  ROUND((SELECT l FROM lam), 6) AS new_lambda
FROM spine s
JOIN tot t ON t.comparison = s.comparison
LEFT JOIN obs o ON o.comparison = s.comparison
               AND o.gamma_value = s.gamma_value"""


@q("em_one_iteration", _em_iter_sql())
def q_em_one_iteration(spark, sf_dir):
    """One full EM iteration (distributed agreement-pattern aggregation +
    driver-side E/M step, train.py expectation_maximisation) with the
    resulting m/u/lambda checked against a pure-SQL replay of the same
    algebra (reference expectation_maximisation.py)."""
    from .train import agreement_pattern_counts, expectation_maximisation
    s = entry_settings()
    pairs, nodes, _ = _spark_pairs(spark, sf_dir)
    cv = compute_comparison_vectors(pairs, nodes, s)
    pats = agreement_pattern_counts(cv, list(s.comparisons))
    comps, lam, _ = expectation_maximisation(
        pats, list(s.comparisons), PRIOR, max_iterations=1)
    rows = []
    for comp in comps:
        for gamma, lv in comp.graded_levels:
            rows.append((comp.name, gamma, round(float(lv.m), 6),
                         round(float(lv.u), 6), round(float(lam), 6)))
    return spark.createDataFrame(
        rows,
        "comparison string, gamma_value int, m double, u double, "
        "new_lambda double")
