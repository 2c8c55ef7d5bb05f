"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The query side is small by
  construction (it's the side you broadcast); the corpus side streams —
  one broadcast-hash join, no shuffle of the corpus, window top-k per query.
- ivf_topk: IVF-style scale path. A k-means-lite codebook (deterministic
  seeded sample + a few Lloyd iterations on the driver over a sample) maps
  every vector to its nearest centroid; queries probe `n_probe` centroids so
  the join is an equi-join on centroid id over a small fraction of the
  corpus. This is the standard sub-linear ANN layout expressed as
  DataFrames: partition pruning comes from the centroid equi-join.

Dot products use native zip_with/aggregate (JVM codegen); the k-means-lite
fit uses numpy on a bounded sample only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den).otherwise(F.lit(0.0))


def dot_fixed_dim(a: Column, b: Column, dim: int) -> Column:
    """_dot unrolled for a KNOWN element count: lit(0.0) + a[0]*b[0] + ...
    left-associated — whole-stage-codegen arithmetic instead of one
    interpreted higher-order aggregate per pair (~100x per-element cost).
    Bit-identical to _dot: same fold order and start value (the leading
    lit(0.0) also reproduces the aggregate's -0.0 normalization), and rows
    whose arrays are NOT `dim` long fall back to _dot itself via a lazily
    evaluated CASE branch (F.get past the end would yield NULL where
    zip_with pads — the fallback keeps those rows exact). Use when `dim`
    is already known (no extra job); for one-off small joins the probe job
    to learn `dim` costs more than the interpreted aggregate saves
    (measured at bench shape: ~0.15s probe vs ~0.2s HOF on 40k pairs)."""
    s: Column = F.lit(0.0)
    for i in range(dim):
        s = s + F.get(a, F.lit(i)) * F.get(b, F.lit(i))
    return F.when((F.size(a) == dim) & (F.size(b) == dim), s) \
        .otherwise(_dot(a, b))


def cosine_prenorm_expr(a: Column, b: Column, norm_a: Column,
                        norm_b: Column) -> Column:
    """cosine_expr with the per-vector norms hoisted out of the pair row.

    The interpreted higher-order aggregate is the whole per-pair cost; the
    naive form evaluates it up to five times per pair (dot + both norms,
    with `den` appearing in both the predicate and the division and no CSE
    across interpreted HOFs). Computing each side's norm ONCE per vector
    row and carrying it through the join leaves exactly one aggregate per
    pair. Float-identical to cosine_expr: the norm expression, the product
    order (norm_a * norm_b) and the division are unchanged."""
    den = norm_a * norm_b
    return F.when(den > 0, _dot(a, b) / den).otherwise(F.lit(0.0))


def cosine_prenorm_fixed(a: Column, b: Column, norm_a: Column,
                         norm_b: Column, dim: int) -> Column:
    """cosine_prenorm_expr with the per-pair dot unrolled for a known dim
    (dot_fixed_dim) — float-identical, zero interpreted work per pair."""
    den = norm_a * norm_b
    return F.when(den > 0, dot_fixed_dim(a, b, dim) / den) \
        .otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact top-k by cosine."""
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).cast("array<double>").alias("_cv"))
    # adaptive width: the per-pair dots run in the corpus scan stage
    # (broadcast join adds no exchange before them), so a single-file
    # corpus would compute every dot on one core
    try:
        cur = c.rdd.getNumPartitions()
    except Exception:
        cur = 0
    dp = corpus.sparkSession.sparkContext.defaultParallelism
    if cur and cur < dp:
        c = c.repartition(dp)
    c = c.select("*", _norm(F.col("_cv")).alias("_cn"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("_qv"))
    q = q.select("*", _norm(F.col("_qv")).alias("_qn"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        cosine_prenorm_expr(F.col("_qv"), F.col("_cv"),
                            F.col("_qn"), F.col("_cn")).alias("cosine"),
    ).where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")) \
        .where(F.col("rank") <= k)


def fit_centroids(corpus: DataFrame, vec_col: str = "embedding",
                  n_centroids: int = 16, sample: int = 4096, seed: int = 42,
                  iters: int = 8) -> np.ndarray:
    """k-means-lite on a seeded `df.sample` (driver-side numpy). One cheap
    count + a sampled scan — no full-corpus sort/hash (the previous
    orderBy(xxhash64).limit was a corpus-wide TakeOrdered for the same
    determinism)."""
    n = corpus.count()
    fraction = min(1.0, (2.0 * sample) / max(n, 1))
    rows = (
        corpus.select(F.col(vec_col).cast("array<double>"))
        .sample(fraction=fraction, seed=seed)
        .limit(sample).collect()
    )
    x = np.array([r[0] for r in rows])
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        for c in range(len(cent)):
            if (lab == c).any():
                cent[c] = x[lab == c].mean(0)
    return cent


# literal expression trees are O(n_centroids x dim) plan nodes — fine for a
# handful of centroids, quadratic plan bloat beyond this; larger codebooks
# switch to an Arrow-batched numpy matmul whose matrix ships in the UDF
# closure (data, not plan).
_LITERAL_CENTROID_MAX = 64


def _centroid_assign(vec: Column, centroids: np.ndarray,
                     n_probe: int = 1) -> Column:
    """array of the n_probe nearest centroid ids, native SQL expression
    (small codebooks only). Ties break to the LOWER centroid id."""
    sims = F.array(*[
        _dot(vec, F.array(*[F.lit(float(v)) for v in c]))
        / F.greatest(_norm(vec), F.lit(1e-12))
        for c in centroids
    ])
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.zip_with(
        sims, idx,
        lambda s, i: F.struct(s.alias("s"), (-i).alias("ni"), i.alias("i")))
    top = F.slice(F.reverse(F.array_sort(pairs)), 1, n_probe)
    return F.transform(top, lambda p: p["i"])


def _centroid_assign_arrow(vec: Column, centroids: np.ndarray,
                           n_probe: int = 1) -> Column:
    """Scale path: vectorized numpy matmul in a pandas UDF; the codebook is
    closure-captured (broadcast with the task, not inlined into the plan).
    Same scores and tie-break (lower id) as the literal path."""
    from pyspark.sql.types import ArrayType, IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    probes = int(n_probe)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probe(v: pd.Series) -> pd.Series:
        X = np.stack(
            v.apply(lambda x: np.asarray(x, dtype=np.float64)).to_numpy())
        norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = (X @ C.T) / norms
        # stable argsort on -sims: ties resolve to the lower centroid id
        order = np.argsort(-sims, axis=1, kind="stable")[:, :probes]
        return pd.Series(list(order.astype("int32")))

    return _probe(vec)


def assign_centroids(vec: Column, centroids: np.ndarray, n_probe: int = 1
                     ) -> Column:
    if len(centroids) <= _LITERAL_CENTROID_MAX:
        return _centroid_assign(vec, centroids, n_probe)
    return _centroid_assign_arrow(vec, centroids, n_probe)


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: np.ndarray | None = None, n_centroids: int = 16,
    n_probe: int = 4, seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: corpus bucketed by nearest centroid; each query
    scans only its n_probe nearest buckets (equi-join on centroid id).

    broadcast_queries=True is the interactive default: the (small) query
    side ships to every executor and the corpus never shuffles. For query
    sets too large to broadcast (batch kNN-join workloads), pass False:
    corpus and queries then shuffle-join on centroid id — both sides
    partition by cid, so each task holds one bucket's corpus rows and its
    probing queries. Results are identical (paths-agree test)."""
    if centroids is None:
        centroids = fit_centroids(corpus, vec_col, n_centroids, seed=seed)
    # per-vector norms hoisted out of the pair rows, and the per-pair dot
    # codegen'd for the known dim (the codebook fixes it) — float-identical
    # to the old cosine_expr-per-pair (same norm exprs, same fold order),
    # with zero interpreted higher-order work on the joined rows
    dim = int(np.asarray(centroids).shape[1])
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("cid", assign_centroids(F.col("_cv"), centroids, 1)[0])
    c = c.select("*", _norm(F.col("_cv")).alias("_cn"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("cid", F.explode(
        assign_centroids(F.col("_qv"), centroids, n_probe)))
    q = q.select("*", _norm(F.col("_qv")).alias("_qn"))
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = c.join(q_side, on="cid").select(
        "query_id", "vec_id",
        cosine_prenorm_fixed(F.col("_qv"), F.col("_cv"),
                             F.col("_qn"), F.col("_cn"), dim).alias("cosine"),
    ).where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")) \
        .where(F.col("rank") <= k)
