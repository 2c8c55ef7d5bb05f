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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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


# ------------------------- vectorized shingle hashing (numpy XXH64, Arrow)

_XXP1 = np.uint64(0x9E3779B185EBCA87)
_XXP2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXP3 = np.uint64(0x165667B19E3779F9)
_XXP4 = np.uint64(0x85EBCA77C2B2AE63)
_XXP5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _xxhash64_windows(W: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of each ROW of a (n, k) uint8 matrix, k < 32 — bit-identical to
    Spark's `xxhash64` (seed 42, little-endian loads) on the same bytes,
    verified by fuzz in tests. Vectorized over the n windows; the loops are
    over the k byte positions only (k is the shingle size, a small
    constant), so hashing a document is a handful of numpy passes instead of
    one interpreted lambda call per character position."""
    n, k = W.shape
    if k >= 32:
        raise ValueError("windowed XXH64 supports k < 32 (no main loop)")
    h = np.full(n, np.uint64(seed) + _XXP5 + np.uint64(k), dtype=np.uint64)
    i = 0
    while i + 8 <= k:
        chunk = np.zeros(n, np.uint64)
        for b in range(8):
            chunk |= W[:, i + b].astype(np.uint64) << np.uint64(8 * b)
        h ^= _rotl64(chunk * _XXP2, 31) * _XXP1
        h = _rotl64(h, 27) * _XXP1 + _XXP4
        i += 8
    if i + 4 <= k:
        u32 = np.zeros(n, np.uint64)
        for b in range(4):
            u32 |= W[:, i + b].astype(np.uint64) << np.uint64(8 * b)
        h ^= u32 * _XXP1
        h = _rotl64(h, 23) * _XXP2 + _XXP3
        i += 4
    while i < k:
        h ^= W[:, i].astype(np.uint64) * _XXP5
        h = _rotl64(h, 11) * _XXP1
        i += 1
    h ^= h >> np.uint64(33)
    h *= _XXP2
    h ^= h >> np.uint64(29)
    h *= _XXP3
    h ^= h >> np.uint64(32)
    return h


def _doc_shingle_hash_arr(text: str, k: int) -> np.ndarray:
    """Distinct pmod(xxhash64(shingle), 2^31-1) values of a doc's character
    k-shingles (byte windows of the lowercased UTF-8 text — identical to the
    SQL substr path on ASCII). numpy sliding windows, no per-char Python."""
    b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    if len(b) <= k:
        W = b.reshape(1, -1)
    else:
        W = np.lib.stride_tricks.sliding_window_view(b, k)
    h = np.unique(_xxhash64_windows(W))
    return h.view(np.int64) % np.int64(_MERSENNE)


def _doc_shingle_hashes(text: str, k: int) -> list[int]:
    return _doc_shingle_hash_arr(text, k).tolist()


def _minhash_sig_udf(k: int, coeffs: list[tuple[int, int]]):
    """Whole MinHash signature per doc inside ONE vectorized numpy pass:
    min((a*h + b) mod p) over the doc's distinct shingle hashes for every
    coefficient pair at once — a (num_hashes, n_shingles) uint64 matrix op.

    This replaces the explode-shingles -> shuffle -> 64-min-aggregates
    groupBy plan: at bench shape that exploded ~25M (id, hash) rows through
    an exchange and ran 64 pmod-multiply aggregates over them (guide §2.3
    "aggregate before you shuffle" — here the aggregation collapses into
    the UDF, so NOTHING is shuffled). a, h < 2^31 keeps a*h + b < 2^62:
    exact in uint64, bit-identical to the JVM BIGINT pmod path (pinned by
    the sql-vs-arrow equality test).

    Kept per-doc on purpose (r06 measurements): a whole-batch formulation
    (one concat buffer + sliding_window_view + segmented reduceat) ran
    1.5x SLOWER — it must drop the per-doc np.unique, growing the affine
    matrix ~1.4x, and its (num_hashes, windows) temporaries are memory-
    bandwidth-bound; likewise Mersenne-folding the `%` was 10x slower than
    numpy's vectorized uint64 division. The kernel is ~3% of the stage
    wall at bench shape — the boundary dominates, which is why this is an
    ARROW UDF: an all-ASCII null-free batch never materializes a Python
    string. `pc.ascii_lower` runs in C (== str.lower on ASCII), each doc's
    bytes are a zero-copy numpy VIEW into the Arrow data buffer (sliced by
    the offsets buffer), and the signatures return as one flat int64
    ListArray instead of per-doc Python int lists. Any batch with nulls or
    non-ASCII text falls back to the original per-row path (str.lower's
    full Unicode mapping differs from utf8 lower on exotic codepoints, so
    the fast path is gated rather than approximated)."""
    from pyspark.sql.types import ArrayType, LongType

    A = np.array([a for a, _ in coeffs], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in coeffs], dtype=np.uint64)[:, None]
    M = np.uint64(_MERSENNE)
    nh = len(coeffs)

    def _sig_of_hashes(h: np.ndarray) -> np.ndarray:
        """(nh,) int64 signature from a doc's shingle-hash array (the
        shared tail of both paths — bit-identical by construction)."""
        hu = h.view(np.uint64)[None, :]
        return ((A * hu + B) % M).min(axis=1).astype(np.int64)

    def _bytes_hash_arr(b: np.ndarray) -> np.ndarray:
        """_doc_shingle_hash_arr over an ALREADY-lowercased uint8 view."""
        if len(b) <= k:
            W = b.reshape(1, -1)
        else:
            W = np.lib.stride_tricks.sliding_window_view(b, k)
        h = np.unique(_xxhash64_windows(W))
        return h.view(np.int64) % np.int64(_MERSENNE)

    @F.arrow_udf(ArrayType(LongType()))
    def _sig(s: "pa.Array") -> "pa.Array":
        arr = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        n = len(arr)
        list_t = pa.list_(pa.int64())
        if n == 0:
            return pa.array([], type=list_t)
        if arr.null_count == 0 and pc.all(pc.string_is_ascii(arr)).as_py():
            low = pc.ascii_lower(arr)
            odt = np.int64 if pa.types.is_large_string(low.type) else np.int32
            off = np.frombuffer(low.buffers()[1], dtype=odt)[
                low.offset:low.offset + n + 1]
            data = np.frombuffer(low.buffers()[2], dtype=np.uint8)
            flat = np.empty(n * nh, dtype=np.int64)
            for i in range(n):
                flat[i * nh:(i + 1) * nh] = _sig_of_hashes(
                    _bytes_hash_arr(data[off[i]:off[i + 1]]))
            return pa.ListArray.from_arrays(
                np.arange(n + 1, dtype=np.int32) * nh,
                pa.array(flat, type=pa.int64()))
        # fallback: nulls or non-ASCII — the original per-row python path
        def one(v):
            if v is None:
                return None
            return _sig_of_hashes(_doc_shingle_hash_arr(v, k)).tolist()
        return pa.array(arr.to_pandas().apply(one), type=list_t,
                        from_pandas=True)

    return _sig


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 64, k: int = 5, seed: int = 42,
                       shingle_impl: str = "arrow",
                       python_parallelism: int | None = None) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures over character k-shingles.

    Shape matters at scale: shingles are EXPLODED to rows and min-aggregated
    per doc — higher-order array lambdas (transform/aggregate) are
    interpreted per element in Spark and are ~100x slower for wide
    signatures. One explode + one groupBy shuffle.

    shingle generation+hashing (`shingle_impl`):
    - "arrow" (default): numpy sliding byte windows hashed with a
      bit-identical XXH64 inside a pandas UDF — one vectorized pass per doc
      instead of an interpreted substr lambda per character position (the
      round-2 bench's dominant minhash cost on multi-KB docs). Byte-based:
      equals the SQL path on ASCII text.
    - "sql": the original codegen path (substr transform -> explode ->
      xxhash64) — char-based, kept for non-ASCII exactness and as the
      equality oracle for the arrow path.

    Impl caveats (the two paths agree bit-for-bit ONLY on non-null ASCII):
    - byte-vs-char: "arrow" windows over UTF-8 BYTES and lowercases with
      Python str.lower; "sql" windows over CODEPOINTS with SQL lower().
      Multi-byte text therefore yields different shingle sets (and Turkish
      dotted-I etc. lowercases differently). Pick "sql" when non-ASCII
      exactness matters; the near-dup semantics of "arrow" remain sound
      (byte shingles are a standard choice, e.g. in content-defined
      chunking), they just aren't the char-based oracle.
    - null text: docs with NULL `text_col` produce NO signature in either
      path (filtered here in the sql path too, for symmetry — xxhash64(NULL)
      would otherwise give null-docs a degenerate shared signature and pair
      them all with each other).
    """
    coeffs = _minhash_coeffs(num_hashes, seed)
    df = df.where(F.col(text_col).isNotNull())
    if shingle_impl == "arrow":
        narrow = df.select(F.col(id_col).alias("_id"),
                           F.col(text_col).alias("_t"))
        # Width of the Arrow signature stage. Explicit python_parallelism
        # forces that width; the default is ADAPTIVE, same rule as the
        # scoring path (compute_comparison_vectors): repartition ONLY when
        # the input arrives narrower than the cores. A single-file corpus
        # scans as ONE partition, which ran the whole signature kernel on
        # one core (measured at bench shape: 0.86s stage wall ~= the
        # single-core kernel time; with the conditional repartition the
        # stage spreads over every core for one tiny id+text shuffle). At
        # corpus scale the scan is already thousands of partitions wide
        # and the condition never fires — no shuffle is added where the
        # old unconditional repartition measurably hurt.
        if python_parallelism:
            narrow = narrow.repartition(python_parallelism)
        else:
            try:
                cur = narrow.rdd.getNumPartitions()
            except Exception:
                cur = 0
            dp = df.sparkSession.sparkContext.defaultParallelism
            if cur and cur < dp:
                narrow = narrow.repartition(dp)
        # whole signature computed inside the UDF: no shingle explode, no
        # shuffle, no 64-aggregate groupBy — one narrow map stage
        return narrow.select(
            "_id", _minhash_sig_udf(k, coeffs)(F.col("_t")).alias("_sig"))
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
                     max_bucket_size: Optional[int],
                     bucket_size_bound: Optional[int] = None) -> DataFrame:
    """Drop rows whose bucket (group of `keys`) exceeds `max_bucket_size`.

    The count aggregate shuffles on the same keys as the downstream
    self-join (one extra pass over the banded table, no extra join on the
    big side: oversized keys are few, so the exclusion is a broadcast
    anti-join). This is the guard that keeps a degenerate LSH bucket from
    emitting O(n^2) pairs — mirrors blocking.py's measured hot-key handling,
    but for dedup the correct action is drop, not split: a bucket of 100k
    docs sharing a band hash is boilerplate, and enumerating its 5x10^9
    pairs is never useful.

    `bucket_size_bound`: a caller-proven upper bound on ANY bucket's size
    (for banded tables: rows-per-band = n_rows / bands, since every doc
    contributes exactly one row per band). When the bound itself is within
    the cap, no bucket can exceed it and the count aggregate + anti-join
    are a provable no-op — skipped entirely, so small inputs (and the
    per-band row count is known from the materialized band table for one
    cheap cached count) don't pay two extra plan stages for a guard that
    cannot fire. Scale-adaptive: any input whose per-band rows exceed the
    cap still runs the full measured guard.
    """
    if max_bucket_size is None:
        return df
    if bucket_size_bound is not None and bucket_size_bound <= max_bucket_size:
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
    shingle_impl: str = "arrow",
    python_parallelism: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    signature -> `bands` slices of num_hashes/bands values; docs sharing any
    (band_id, band_hash) bucket become a candidate pair. The bucket join is
    an equi self-join on the band key — the same shuffle shape as blocking.
    Buckets larger than `max_bucket_size` are dropped before the join (see
    cap_bucket_sizes; None disables). Output: (id_l, id_r, n_common_bands).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k,
                             seed, shingle_impl=shingle_impl,
                             python_parallelism=python_parallelism)
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
    # materialize the (narrow: id + 2 longs) banded table once: it has four
    # downstream consumers (bucket count, anti-join probe, both self-join
    # sides), and without lineage truncation EACH replays the signature
    # UDF over every document (two ArrowEvalPython nodes in the round-5
    # plan; four signature passes at bench shape). LAZY checkpoint + count:
    # the count below is the single-scan materializing action, so the
    # signature pipeline runs in one job (eager would materialize in a
    # separate job and re-scan the cache for the count)
    banded = banded.localCheckpoint(eager=False)
    # one cheap count over the band table proves the per-band row
    # count (= docs with a signature); when that bound fits the cap the
    # bucket guard is skipped as a no-op (see cap_bucket_sizes)
    n_banded = banded.count()
    banded = cap_bucket_sizes(banded, ["band_id", "band_hash"],
                              max_bucket_size,
                              bucket_size_bound=-(-n_banded // bands))
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
    """Exact Jaccard over character k-shingles — native array ops. Exact but
    pays the interpreted shingle lambda per PAIR side; prefer
    ngram_jaccard_arrow on multi-KB documents."""
    a, b = _shingles(col_l, k), _shingles(col_r, k)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def _window_set(b: bytes, k: int) -> np.ndarray:
    W = np.lib.stride_tricks.sliding_window_view(
        np.frombuffer(b, dtype=np.uint8), k)
    return np.unique(np.ascontiguousarray(W).view(np.dtype((np.void, k))))


def _ngram_jaccard_py(a: str | None, b: str | None, k: int) -> float:
    if a is None or b is None:
        return 0.0  # matches the SQL expression's null handling
    ba, bb = a.lower().encode("utf-8"), b.lower().encode("utf-8")
    if len(ba) <= k or len(bb) <= k:
        A = {ba[i:i + k] for i in range(max(len(ba) - k + 1, 1))}
        B = {bb[i:i + k] for i in range(max(len(bb) - k + 1, 1))}
        inter, union = len(A & B), len(A | B)
        return inter / union if union else 0.0
    va, vb = _window_set(ba, k), _window_set(bb, k)
    inter = np.intersect1d(va, vb, assume_unique=True).size
    union = va.size + vb.size - inter
    return float(inter) / union if union else 0.0


def ngram_jaccard_arrow(col_l: Column, col_r: Column, k: int = 5) -> Column:
    """EXACT k-shingle Jaccard as a vectorized pandas UDF: distinct byte
    windows via numpy sliding views + set ops — no hashing, so the values
    equal the SQL expression's on ASCII text (equality-tested), at ~O(n log
    n) numpy cost per doc instead of one interpreted lambda call per
    character position per pair side. Byte-based (like the arrow shingle
    path): on non-ASCII text use ngram_jaccard (char-based)."""
    from pyspark.sql.types import DoubleType

    kk = int(k)

    @F.pandas_udf(DoubleType())
    def _j(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_ngram_jaccard_py(x, y, kk)
                          for x, y in zip(a, b)], dtype="float64")

    return _j(col_l, col_r)


def _jaccard_verify_col(l: Column, r: Column, k: int, impl: str) -> Column:
    if impl == "arrow":
        return ngram_jaccard_arrow(l, r, k)
    return ngram_jaccard(l, r, k)


def minhash_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str,
    jaccard_threshold: float = 0.8, verify_impl: str = "arrow", **lsh_kw,
) -> DataFrame:
    """LSH candidates verified with exact n-gram Jaccard (the standard
    candidate->verify near-dup pipeline). Output: (id_l, id_r, jaccard).
    verify_impl="arrow" (default) uses the exact numpy byte-window Jaccard;
    "sql" keeps the char-based native expression (non-ASCII exactness)."""
    cand = minhash_lsh_pairs(df, id_col, text_col, **lsh_kw)
    side = lambda s: df.select(F.col(id_col).alias(f"id_{s}"),
                               F.col(text_col).alias(f"_t_{s}"))
    k = lsh_kw.get("shingle_k", 5)
    return (
        cand.join(side("l"), on="id_l").join(side("r"), on="id_r")
        .withColumn("jaccard", _jaccard_verify_col(
            F.col("_t_l"), F.col("_t_r"), k, verify_impl))
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
    # same four-consumer shape as the minhash band table: materialize once
    # so the signature aggregation is not replayed per consumer (lazy
    # checkpoint — the count is the materializing single-scan action)
    banded = banded.localCheckpoint(eager=False)
    n_banded = banded.count()
    banded = cap_bucket_sizes(banded, ["band_id", "band_key"],
                              max_bucket_size,
                              bucket_size_bound=-(-n_banded // 4))
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

def srp_band_keys(vec_col: Column, planes, bands: int) -> Column:
    """Banded sign-random-projection sketch: `planes` is a
    (bands*planes_per_band, dim) matrix; returns array<long> of `bands` band
    keys, key b packing that band's sign bits. One numpy matmul per Arrow
    batch — the plane matrix ships in the UDF closure (data, not plan),
    mirroring ann._centroid_assign_arrow."""
    from pyspark.sql.types import ArrayType, LongType

    P = np.asarray(planes, dtype=np.float64)
    r = P.shape[0] // bands
    weights = (np.int64(1) << np.arange(r, dtype=np.int64))

    dim = P.shape[1]
    zero = np.zeros(dim)

    def _key_matrix(X: np.ndarray) -> np.ndarray:
        bits = (X @ P.T) > 0                       # (n, bands*r)
        return np.stack(
            [bits[:, b * r:(b + 1) * r] @ weights for b in range(bands)],
            axis=1,
        ).astype(np.int64)                          # (n, bands)

    @F.arrow_udf(ArrayType(LongType()))
    def _keys(v: "pa.Array") -> "pa.Array":
        # Arrow fast path: a clean batch (no null rows, every list exactly
        # `dim` long, no null elements) IS one contiguous (n, dim) float64
        # buffer — reshape it zero-copy and run one matmul, no per-row
        # Python. Dirty data must not kill the stage: any null/ragged
        # batch falls back to the per-row path where a NULL, wrong-length
        # or non-finite embedding sketches as the zero vector (all bits 0,
        # the same bucket the replaced SQL sketch path gave them); such
        # rows are dropped later at the exact-cosine verify (NULL cosine).
        arr = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        n = len(arr)
        list_t = pa.list_(pa.int64())
        if n == 0:
            return pa.array([], type=list_t)
        keys = None
        if arr.null_count == 0:
            off = arr.offsets.to_numpy()
            if (np.diff(off) == dim).all() and arr.values.null_count == 0:
                vals = arr.values.to_numpy(zero_copy_only=True)
                X = np.ascontiguousarray(
                    vals[off[0]:off[-1]]).reshape(n, dim)
                fin = np.isfinite(X).all(axis=1)
                if not fin.all():
                    X = np.where(fin[:, None], X, 0.0)
                keys = _key_matrix(X)
        if keys is None:
            def vec(x):
                if x is None:
                    return zero
                a = np.asarray(x, dtype=np.float64)
                if a.shape != (dim,) or not np.isfinite(a).all():
                    return zero
                return a

            X = np.stack(arr.to_pandas().apply(vec).to_numpy())
            keys = _key_matrix(X)
        return pa.ListArray.from_arrays(
            np.arange(n + 1, dtype=np.int32) * bands,
            pa.array(keys.reshape(-1), type=pa.int64()))

    return _keys(vec_col)


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str,
    threshold: float = 0.95, *, n_planes: int = 8, bands: int = 6,
    seed: int = 7, max_bucket_size: Optional[int] = 10_000,
) -> DataFrame:
    """Near-dup pairs by embedding cosine, blocked by a BANDED
    random-hyperplane (SRP-LSH) sketch so the verify join is an equi-join,
    not a cross join. A pair is a candidate when ANY of the `bands` bands
    (of `n_planes` sign bits each) agrees exactly — the same OR-of-ANDs
    recall amplification as the minhash/simhash paths. With the defaults
    (8 planes x 6 bands), P(candidate) at cosine 0.95 is
    1-(1-p^8)^6 ~ 0.96 where p = 1 - acos(0.95)/pi ~ 0.90; a single
    48-plane sketch would be ~0.006.

    Exact cosine verification via native zip_with/aggregate on the verified
    candidates only. Sketch buckets above `max_bucket_size` are dropped per
    (band_id, band_key) before the self-join (a degenerate bucket — e.g.
    all-zero embeddings landing on one key — is quadratic). The band join is
    NARROW (id + band key only); vectors are joined back for verification.
    """
    from .ann import _norm as _ann_norm, cosine_prenorm_fixed

    dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bands * n_planes, dim))

    # NOTE (r06, measured): no adaptive repartition before the sketch UDF,
    # unlike minhash_signatures — the SRP sketch is one numpy matmul per
    # batch (~0.15s single-core at bench shape), so splitting the one-file
    # scan into cores-many tasks cost MORE in shuffle + extra-stage
    # scheduling than it recovered (srp full 0.99s -> 1.33s when tried).
    base = df.select(
        F.col(id_col).alias("_id"),
        srp_band_keys(F.col(vec_col).cast("array<double>"), planes, bands)
        .alias("_keys"),
    )
    banded = base.select(
        "_id", F.posexplode("_keys").alias("band_id", "band_key"))
    # four consumers (bucket count, anti-join probe, both self-join sides):
    # materialize once so the sketch UDF runs once per document (lazy
    # checkpoint — the count is the materializing single-scan action)
    banded = banded.localCheckpoint(eager=False)
    n_banded = banded.count()
    banded = cap_bucket_sizes(banded, ["band_id", "band_key"],
                              max_bucket_size,
                              bucket_size_bound=-(-n_banded // bands))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(r, (F.col("l.band_id") == F.col("r.band_id"))
               & (F.col("l.band_key") == F.col("r.band_key"))
               & (F.col("l._id") < F.col("r._id")))
        .select(F.col("l._id").alias("id_l"), F.col("r._id").alias("id_r"))
        .distinct()
    )
    # per-vector norm computed once per id, not once (or more) per pair —
    # cosine_prenorm_expr is float-identical to cosine_expr and leaves one
    # interpreted array-aggregate (the dot) on each candidate row
    vecs = df.select(F.col(id_col).alias("_vid"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    vecs = vecs.select("_vid", "_v", _ann_norm(F.col("_v")).alias("_n"))
    return (
        cand
        .join(vecs.select(F.col("_vid").alias("id_l"),
                          F.col("_v").alias("_v_l"),
                          F.col("_n").alias("_n_l")), on="id_l")
        .join(vecs.select(F.col("_vid").alias("id_r"),
                          F.col("_v").alias("_v_r"),
                          F.col("_n").alias("_n_r")), on="id_r")
        .select("id_l", "id_r",
                # dim is already known (the SRP planes need it), so the
                # per-pair dot is codegen'd arithmetic (dot_fixed_dim) —
                # float-identical to the interpreted aggregate, no probe job
                cosine_prenorm_fixed(F.col("_v_l"), F.col("_v_r"),
                                     F.col("_n_l"), F.col("_n_r"), dim)
                .alias("cosine"))
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
    verify_impl: str = "arrow",
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

    Null/encoding caveats: NULL-text docs form one exact-dup group (sha2 of
    NULL) and never enter LSH — both shingle impls drop them (see
    minhash_signatures). verify_impl="arrow" is byte-based; use "sql" for
    char-exact Jaccard on non-ASCII corpora.
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
        .withColumn("jaccard", _jaccard_verify_col(
            F.col("_t_l"), F.col("_t_r"), shingle_k, verify_impl))
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
