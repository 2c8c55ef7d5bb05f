"""Large-scale deduplication operators for training-data pipelines.

These extend the record-linkage engine with document-level dedup primitives
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine): each is a
specialization of the engine's block -> compare -> cluster pattern where
the blocking key is content-derived.

Scale design:
- exact dedup is one hash groupBy on sha2(text) — no pair materialization.
- MinHash signatures are exploded to shingle rows and hashed with codegen'd
  xxhash64, then min-aggregated (no Python, no interpreted array lambdas);
  LSH banding turns near-dup search into an equi-join on
  (band_id, band_hash).
- every candidate-pair self-join (minhash bands, simhash bands, SRP
  sketches) is guarded by an explicit BUCKET-SIZE CAP: bucket cardinalities
  are counted first (one aggregate sharing the join's shuffle key), buckets
  above `max_bucket_size` are dropped via a broadcast anti-join. Without the
  cap one degenerate bucket (empty docs, boilerplate headers sharing a band
  hash) emits O(n_bucket^2) pairs — at 100 TB a single 100k-doc bucket is
  5x10^9 pairs from one key. Oversized buckets are near-certainly exact/
  boilerplate duplicates, which the exact-sha pass already collapses;
  dropping them is the standard recall/cost trade in web-scale dedup.
- SimHash packs 64 per-bit majority votes into one BIGINT with bitwise
  aggregates; candidate pairs come from banding the 64 bits into 4x16-bit
  equi-join keys (Hamming distance <= 3 guaranteed recall within bands).
- n-gram Jaccard verifies candidates with native array_intersect/union.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, functions as F

# Mersenne prime for the affine minhash family. 2^31-1 keeps a*h < 2^62 so
# the native BIGINT multiply can't overflow (Spark 4 runs ANSI mode).
_MERSENNE = (1 << 31) - 1


def _shingles(col: Column, k: int = 5) -> Column:
    """Character k-shingles as distinct array<string> (lowercased)."""
    lowered = F.lower(col)
    n = F.greatest(F.length(lowered) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(
        F.transform(idx, lambda i: lowered.substr(i, F.lit(k)))
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles (token n-grams) as distinct array<string>."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n - F.lit(1))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(k)))
        )
    )


def _minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
            for _ in range(num_hashes)]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 64, k: int = 5, seed: int = 42
                       ) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures over character k-shingles.

    Shape matters at scale: shingles are EXPLODED to rows and hashed with
    codegen'd xxhash64, then min-aggregated per doc — higher-order array
    lambdas (transform/aggregate) are interpreted per element in Spark and
    are ~100x slower for wide signatures. One explode + one groupBy shuffle.
    """
    coeffs = _minhash_coeffs(num_hashes, seed)
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_shingles(F.col(text_col), k)).alias("_s"),
    ).withColumn("_h", F.pmod(F.xxhash64("_s"), F.lit(_MERSENNE)))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(_MERSENNE)))
        .alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    per_doc = sh.groupBy("_id").agg(*aggs)
    return per_doc.select(
        "_id", F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("_sig")
    )


def cap_bucket_sizes(df: DataFrame, keys: list[str],
                     max_bucket_size: Optional[int]) -> DataFrame:
    """Drop rows whose bucket (group of `keys`) exceeds `max_bucket_size`.

    The count aggregate shuffles on the same keys as the downstream
    self-join (one extra pass over the banded table, no extra join on the
    big side: oversized keys are few, so the exclusion is a broadcast
    anti-join). This is the guard that keeps a degenerate LSH bucket from
    emitting O(n^2) pairs — mirrors blocking.py's measured hot-key handling,
    but for dedup the correct action is drop, not split: a bucket of 100k
    docs sharing a band hash is boilerplate, and enumerating its 5x10^9
    pairs is never useful.
    """
    if max_bucket_size is None:
        return df
    hot = (
        df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bucket_n"))
        .where(F.col("_bucket_n") > max_bucket_size)
        .select(*keys)
    )
    return df.join(F.broadcast(hot), on=keys, how="left_anti")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    max_bucket_size: Optional[int] = 10_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    signature -> `bands` slices of num_hashes/bands values; docs sharing any
    (band_id, band_hash) bucket become a candidate pair. The bucket join is
    an equi self-join on the band key — the same shuffle shape as blocking.
    Buckets larger than `max_bucket_size` are dropped before the join (see
    cap_bucket_sizes; None disables). Output: (id_l, id_r, n_common_bands).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, seed)
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.slice(F.col("_sig"), b * rows_per_band + 1,
                                   rows_per_band))
                for b in range(bands)
            ])
        ).alias("band_id", "band_hash"),
    )
    banded = cap_bucket_sizes(banded, ["band_id", "band_hash"],
                              max_bucket_size)
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, (F.col("l.band_id") == F.col("r.band_id"))
               & (F.col("l.band_hash") == F.col("r.band_hash"))
               & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_l"), F.col("r._id").alias("id_r"))
        .agg(F.count(F.lit(1)).alias("n_common_bands"))
    )


def ngram_jaccard(col_l: Column, col_r: Column, k: int = 5) -> Column:
    """Exact Jaccard over character k-shingles — native array ops."""
    a, b = _shingles(col_l, k), _shingles(col_r, k)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str,
    jaccard_threshold: float = 0.8, **lsh_kw,
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard (the standard
    candidate->verify near-dup pipeline). Output: (id_l, id_r, jaccard)."""
    cand = minhash_lsh_pairs(df, id_col, text_col, **lsh_kw)
    side = lambda s: df.select(F.col(id_col).alias(f"id_{s}"),
                               F.col(text_col).alias(f"_t_{s}"))
    k = lsh_kw.get("shingle_k", 5)
    return (
        cand.join(side("l"), on="id_l").join(side("r"), on="id_r")
        .withColumn("jaccard", ngram_jaccard(F.col("_t_l"), F.col("_t_r"), k))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_l", "id_r", "jaccard")
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by sha2(text): (doc id, dup_group_id,
    group_size, is_canonical). One shuffle, no pairs."""
    from pyspark.sql import Window

    h = df.select(F.col(id_col).alias("doc_id"),
                  F.sha2(F.col(text_col), 256).alias("dup_group_id"))
    w = Window.partitionBy("dup_group_id")
    return h.select(
        "doc_id", "dup_group_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.min("doc_id").over(w) == F.col("doc_id")).alias("is_canonical"),
    )


# ------------------------------------------------------------------ SimHash

def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       seed: int = 0) -> DataFrame:
    """(id, simhash64 bigint) over whitespace tokens.

    Same explode+groupBy shape as minhash (codegen'd xxhash64 per token row,
    64 conditional sums in ONE aggregate pass): bit b is set when more token
    hashes have bit b set than clear."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.array_distinct(F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda t: t != F.lit("")))).alias("_t"),
    ).withColumn("_h", F.xxhash64("_t", F.lit(seed)))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for bit in range(64):
        mask = F.lit(1 << bit) if bit < 63 else F.lit(-(1 << 63))
        aggs.append(
            F.sum(F.when(F.col("_h").isNotNull()
                         & (F.col("_h").bitwiseAND(mask) != 0), 1)
                  .otherwise(0)).alias(f"_b{bit}")
        )
    per_doc = toks.groupBy("_id").agg(*aggs)
    out = F.lit(0).cast("long")
    for bit in range(64):
        mask = F.lit(1 << bit) if bit < 63 else F.lit(-(1 << 63))
        out = out.bitwiseOR(
            F.when(F.col(f"_b{bit}") * 2 > F.col("_n"), mask.cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return per_doc.select("_id", out.alias("_sh"))


def simhash_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                            max_hamming: int = 3,
                            max_bucket_size: Optional[int] = 10_000
                            ) -> DataFrame:
    """Near-dup candidates: band the 64-bit simhash into 4 x 16-bit keys;
    any pair within Hamming distance 3 shares at least one exact band
    (pigeonhole). Verify with bit_count(xor) <= max_hamming. Buckets above
    `max_bucket_size` are dropped before the self-join (cap_bucket_sizes)."""
    sim = simhash_signatures(df, id_col, text_col)
    banded = sim.select(
        "_id", "_sh",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("_sh"), b * 16).bitwiseAND(F.lit(0xFFFF))
            for b in range(4)
        ])).alias("band_id", "band_key"),
    )
    banded = cap_bucket_sizes(banded, ["band_id", "band_key"], max_bucket_size)
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, (F.col("l.band_id") == F.col("r.band_id"))
               & (F.col("l.band_key") == F.col("r.band_key"))
               & (F.col("l._id") < F.col("r._id")))
        .select(F.col("l._id").alias("id_l"), F.col("r._id").alias("id_r"),
                F.expr("bit_count(l._sh ^ r._sh)").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------- embedding near-duplicate

def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str,
    threshold: float = 0.95, n_planes: int = 16, seed: int = 7,
    max_bucket_size: Optional[int] = 10_000,
) -> DataFrame:
    """Near-dup pairs by embedding cosine, blocked by a random-hyperplane
    (SRP-LSH) sketch so the verify join is an equi-join, not a cross join.
    Exact cosine verification via native zip_with/aggregate. Sketch buckets
    above `max_bucket_size` are dropped before the self-join (a degenerate
    bucket — e.g. all-zero embeddings landing on one sketch — is quadratic)."""
    import numpy as np

    dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    plane_lits = [F.array(*[F.lit(float(x)) for x in p]) for p in planes]

    def dot(a: Column, b: Column) -> Column:
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, v: acc + v)

    sketch_bits = [
        F.when(dot(F.col(vec_col).cast("array<double>"), pl) > 0, F.lit(1 << i))
        .otherwise(F.lit(0)).cast("long")
        for i, pl in enumerate(plane_lits)
    ]
    sk = sketch_bits[0]
    for b in sketch_bits[1:]:
        sk = sk.bitwiseOR(b)
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v"),
                     sk.alias("_sketch"))
    base = cap_bucket_sizes(base, ["_sketch"], max_bucket_size)
    l, r = base.alias("l"), base.alias("r")
    cos = dot(F.col("l._v"), F.col("r._v")) / (
        F.sqrt(dot(F.col("l._v"), F.col("l._v")))
        * F.sqrt(dot(F.col("r._v"), F.col("r._v")))
    )
    return (
        l.join(r, (F.col("l._sketch") == F.col("r._sketch"))
               & (F.col("l._id") < F.col("r._id")))
        .select(F.col("l._id").alias("id_l"), F.col("r._id").alias("id_r"),
                cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def near_dedup_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    candidate_fn: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> DataFrame:
    """End-to-end near-duplicate clustering for a document corpus: exact
    sha-groups collapse to one representative (no pair blowup for identical
    cliques), MinHash-LSH candidates between representatives are verified
    with exact n-gram Jaccard, verified pairs close transitively (the same
    large-star/small-star CC as entity clustering), then membership is
    fanned back out to all exact copies.

    `candidate_fn(rep_docs) -> (id_l, id_r, ...)` swaps the candidate
    generator (default: xxhash64 MinHash-LSH); candidates are always
    verified with exact k-shingle Jaccard before clustering.

    Output: (doc id, dup_cluster_id, is_canonical) where dup_cluster_id is
    the MINIMUM member doc id — deterministic regardless of the CC
    representative choice. Keep is_canonical rows for a deduplicated corpus.
    """
    from .cluster import solve_connected_components

    exact = exact_dedup(df, id_col, text_col)
    reps = exact.where(F.col("is_canonical")).select(
        F.col("doc_id").alias("_rep_id"), "dup_group_id")
    rep_docs = df.join(
        reps.withColumnRenamed("_rep_id", id_col).select(id_col), on=id_col)
    if candidate_fn is None:
        cand = minhash_lsh_pairs(
            rep_docs, id_col, text_col, num_hashes=num_hashes, bands=bands,
            shingle_k=shingle_k, seed=seed)
    else:
        cand = candidate_fn(rep_docs)
    side = lambda s: rep_docs.select(F.col(id_col).alias(f"id_{s}"),
                                     F.col(text_col).alias(f"_t_{s}"))
    near = (
        cand.select("id_l", "id_r")
        .join(side("l"), on="id_l").join(side("r"), on="id_r")
        .withColumn("jaccard",
                    ngram_jaccard(F.col("_t_l"), F.col("_t_r"), shingle_k))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_l", "id_r")
    )
    member = solve_connected_components(
        rep_docs.select(F.col(id_col)), near,
        node_col=id_col, edge_l="id_l", edge_r="id_r")
    # fan membership back out through the exact groups
    rep_cluster = member.select(F.col("node_id").alias("_rep_id"),
                                F.col("cluster_id").alias("_cc_id"))
    out = exact.join(reps, on="dup_group_id") \
        .join(rep_cluster, on="_rep_id") \
        .select("doc_id", "_cc_id")
    from pyspark.sql import Window
    w = Window.partitionBy("_cc_id")
    return out.select(
        "doc_id",
        F.min("doc_id").over(w).alias("dup_cluster_id"),
        (F.min("doc_id").over(w) == F.col("doc_id")).alias("is_canonical"),
    )
