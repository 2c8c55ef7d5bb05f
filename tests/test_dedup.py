"""Dedup operator correctness on constructed near/exact duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_candidate_pairs,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog again and again"),
    ("d2", "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of d1
    ("d3", "the quick brown fox jumped over the lazy dog again and again"),  # near dup
    ("d4", "completely different content about spark partitions and shuffles"),
    ("d5", "spark partitions and shuffles are completely different content about"),  # shuffled d4 words
    ("d6", "totally unrelated short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string").cache()


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert out["d1"]["dup_group_id"] == out["d2"]["dup_group_id"]
    assert out["d1"]["group_size"] == 2
    assert out["d1"]["is_canonical"] and not out["d2"]["is_canonical"]
    assert out["d3"]["group_size"] == 1


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_l"], r["id_r"])
             for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert ("d1", "d2") in pairs
    assert ("d1", "d3") in pairs or ("d2", "d3") in pairs
    assert ("d1", "d6") not in pairs and ("d4", "d6") not in pairs


def test_minhash_verified_jaccard(docs):
    out = {(r["id_l"], r["id_r"]): r["jaccard"]
           for r in minhash_dedup_pairs(docs, "doc_id", "text",
                                        jaccard_threshold=0.5).collect()}
    assert out[("d1", "d2")] == 1.0
    assert all(j >= 0.5 for j in out.values())


def test_ngram_jaccard_expr(spark):
    df = spark.createDataFrame([("abcdef", "abcdef"), ("abcdef", "zzzzzz")],
                               "a string, b string")
    got = df.select(ngram_jaccard(F.col("a"), F.col("b"), 3).alias("j")).collect()
    assert got[0]["j"] == 1.0
    assert got[1]["j"] == 0.0


def test_simhash_candidates(docs):
    pairs = {(r["id_l"], r["id_r"]): r["hamming"]
             for r in simhash_candidate_pairs(docs, "doc_id", "text",
                                              max_hamming=10).collect()}
    assert ("d1", "d2") in pairs and pairs[("d1", "d2")] == 0
    # d5 is d4 word-shuffled plus one extra token -> small hamming distance
    assert ("d4", "d5") in pairs and pairs[("d4", "d5")] <= 10
    assert ("d1", "d6") not in pairs


def test_embedding_cosine_pairs(spark):
    rows = [
        ("v1", [1.0, 0.0, 0.0, 0.0]),
        ("v2", [0.999, 0.01, 0.0, 0.0]),   # near dup of v1
        ("v3", [0.0, 1.0, 0.0, 0.0]),
        ("v4", [0.0, 0.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = {(r["id_l"], r["id_r"]) for r in embedding_cosine_pairs(
        df, "vec_id", "embedding", threshold=0.99, n_planes=8).collect()}
    assert ("v1", "v2") in got
    assert ("v1", "v3") not in got


def test_near_dedup_documents(spark):
    from memory_optimized_splink_spark.operators.dedup import (
        near_dedup_documents,
    )

    docs = spark.createDataFrame(DOCS + [
        ("d7", DOCS[0][1]),  # exact copy of d1 (3-clique with d1/d2)
    ], "doc_id string, text string")
    out = {r["doc_id"]: r for r in near_dedup_documents(
        docs, "doc_id", "text", jaccard_threshold=0.5).collect()}
    assert len(out) == 7
    # d1/d2/d7 exact copies + d3 near-dup: one cluster
    c = out["d1"]["dup_cluster_id"]
    assert {out[d]["dup_cluster_id"] for d in ("d2", "d3", "d7")} == {c}
    # exactly one canonical per cluster
    canon = [d for d, r in out.items()
             if r["dup_cluster_id"] == c and r["is_canonical"]]
    assert len(canon) == 1
    # unrelated doc stays its own cluster
    assert out["d6"]["dup_cluster_id"] != c


def test_bucket_cap_noop_below_cap(docs):
    uncapped = {(r["id_l"], r["id_r"])
                for r in minhash_lsh_pairs(docs, "doc_id", "text",
                                           max_bucket_size=None).collect()}
    capped = {(r["id_l"], r["id_r"])
              for r in minhash_lsh_pairs(docs, "doc_id", "text",
                                         max_bucket_size=10_000).collect()}
    assert capped == uncapped and len(capped) > 0


def test_bucket_cap_bounds_degenerate_bucket(spark):
    """60 identical docs put 60 rows in every LSH bucket: uncapped emits the
    full 60*59/2 quadratic pair set; a cap of 50 drops those buckets."""
    many = spark.range(60).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("doc_id"),
        F.lit("same boilerplate header text repeated everywhere").alias("text"),
    )
    n_unc = minhash_lsh_pairs(many, "doc_id", "text",
                              max_bucket_size=None).count()
    n_cap = minhash_lsh_pairs(many, "doc_id", "text",
                              max_bucket_size=50).count()
    assert n_unc == 60 * 59 // 2
    assert n_cap == 0

    n_sim_unc = simhash_candidate_pairs(many, "doc_id", "text",
                                        max_bucket_size=None).count()
    n_sim_cap = simhash_candidate_pairs(many, "doc_id", "text",
                                        max_bucket_size=50).count()
    assert n_sim_unc == 60 * 59 // 2 and n_sim_cap == 0


def test_embedding_bucket_cap(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    rows = [(i, [float(x) for x in base]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n_unc = embedding_cosine_pairs(df, "vec_id", "embedding",
                                   max_bucket_size=None).count()
    n_cap = embedding_cosine_pairs(df, "vec_id", "embedding",
                                   max_bucket_size=30).count()
    assert n_unc == 40 * 39 // 2 and n_cap == 0


def test_numpy_xxhash64_matches_spark(spark):
    """The arrow shingle path's windowed XXH64 must be bit-identical to
    Spark's xxhash64 on the same bytes (all tail paths: 8-byte chunk,
    4-byte word, byte loop, empty input)."""
    import random

    import numpy as np

    from memory_optimized_splink_spark.operators.dedup import (
        _xxhash64_windows,
    )

    rng = random.Random(1)
    strings = [""] + [
        "".join(rng.choice("abcdefghij klmnop.z") for _ in range(L))
        for L in range(1, 20) for _ in range(4)
    ]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    want = {r["s"]: r["h"]
            for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in strings:
        b = np.frombuffer(s.encode(), dtype=np.uint8).reshape(1, -1)
        mine = int(_xxhash64_windows(b)[0].view(np.int64))
        assert mine == want[s], repr(s)


def test_arrow_shingles_equal_sql_signatures(spark):
    """arrow (numpy byte-window) and sql (interpreted substr lambda) shingle
    paths must produce IDENTICAL minhash signatures on ASCII text, including
    the short-doc and empty-doc edge cases."""
    from memory_optimized_splink_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        DOCS + [("e1", ""), ("e2", "ab"), ("e3", "abcde"), ("e4", "abcdef"),
                ("e5", "AAAAAAAAAA"), ("e6", "Mixed CASE and  spaces  ")],
        "doc_id string, text string")
    sqlp = {r["_id"]: r["_sig"] for r in minhash_signatures(
        docs, "doc_id", "text", shingle_impl="sql").collect()}
    arrow = {r["_id"]: r["_sig"] for r in minhash_signatures(
        docs, "doc_id", "text", shingle_impl="arrow").collect()}
    assert arrow == sqlp and len(arrow) == len(DOCS) + 6


def test_null_text_dropped_by_both_shingle_impls(spark):
    """Null-text docs get NO signature in EITHER impl (symmetric: the sql
    path filters nulls too, otherwise xxhash64(NULL) pairs all null docs)."""
    from memory_optimized_splink_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [("a", "some real document text here"), ("n1", None), ("n2", None)],
        "doc_id string, text string")
    for impl in ("sql", "arrow"):
        ids = {r["_id"] for r in minhash_signatures(
            docs, "doc_id", "text", shingle_impl=impl).collect()}
        assert ids == {"a"}, impl


def test_embedding_srp_banded_recall(spark):
    """Banded SRP must recover >=90% of true cosine>=0.95 pairs (the
    single-sketch round-2 path had ~18% recall by construction). Truth is
    numpy brute force over planted near-dups."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim = 64
    base = rng.standard_normal((150, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = [], []
    for i, v in enumerate(base):
        nd = v + 0.03 * rng.standard_normal(dim)
        nd /= np.linalg.norm(nd)
        vecs += [v, nd]
        ids += [f"b{i:03d}", f"n{i:03d}"]
    X = np.stack(vecs)
    sims = X @ X.T
    truth = {
        tuple(sorted((ids[i], ids[j])))
        for i in range(len(ids)) for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.95
    }
    assert len(truth) >= 100  # planted pairs actually are near-dups

    df = spark.createDataFrame(
        [(ids[i], [float(x) for x in X[i]]) for i in range(len(ids))],
        "vec_id string, embedding array<double>")
    got = {tuple(sorted((r["id_l"], r["id_r"])))
           for r in embedding_cosine_pairs(df, "vec_id", "embedding",
                                           threshold=0.95).collect()}
    assert not got - truth  # exact-cosine verify: no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"banded SRP recall {recall:.3f} < 0.9"


def test_near_dedup_cluster_id_is_min_member(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    out = near_dedup_from_import(docs)
    for r in out.collect():
        assert r["is_canonical"] == (r["doc_id"] == r["dup_cluster_id"])


def near_dedup_from_import(docs):
    from memory_optimized_splink_spark.operators.dedup import (
        near_dedup_documents,
    )
    return near_dedup_documents(docs, "doc_id", "text", jaccard_threshold=0.5)


def test_ngram_jaccard_arrow_equals_sql(spark):
    """The vectorized byte-window Jaccard must produce EXACTLY the SQL
    expression's values on ASCII text — short strings, empty strings,
    nulls, identical and disjoint docs."""
    from memory_optimized_splink_spark.operators.dedup import (
        ngram_jaccard_arrow,
    )

    rows = [(a, b) for a, _ in DOCS for b, _ in DOCS]
    texts = dict(DOCS)
    pairs = [(texts[a], texts[b]) for a, b in rows]
    pairs += [("", ""), ("ab", "abcde"), ("abcde", "abcde"),
              (None, "abcdef"), ("abcdef", None), ("MIXED Case", "mixed case")]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select(
        F.round(ngram_jaccard(F.col("a"), F.col("b"), 5), 9).alias("sql"),
        F.round(ngram_jaccard_arrow(F.col("a"), F.col("b"), 5), 9)
        .alias("arrow"),
    ).collect()
    for r in got:
        assert r["sql"] == r["arrow"], r


def test_minhash_dedup_verify_impls_agree(docs):
    from memory_optimized_splink_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    def pairset(impl):
        return {(r["id_l"], r["id_r"], round(r["jaccard"], 9))
                for r in minhash_dedup_pairs(
                    docs, "doc_id", "text", jaccard_threshold=0.5,
                    verify_impl=impl).collect()}

    assert pairset("arrow") == pairset("sql")


def test_embedding_srp_tolerates_null_and_ragged_vectors(spark):
    """Dirty embeddings (NULL, wrong dim, NaN) must not kill the sketch
    stage: they bucket as zero vectors and drop at the cosine verify."""
    rows = [
        ("v1", [1.0, 0.0, 0.0, 0.0]),
        ("v2", [0.999, 0.01, 0.0, 0.0]),
        ("bad_null", None),
        ("bad_short", [1.0, 0.0]),
        ("bad_nan", [float("nan"), 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = {(r["id_l"], r["id_r"]) for r in embedding_cosine_pairs(
        df, "vec_id", "embedding", threshold=0.99).collect()}
    assert ("v1", "v2") in got
    assert not any("bad" in a or "bad" in b for a, b in got)
