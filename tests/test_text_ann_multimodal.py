"""Text analysis, ANN, and multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from memory_optimized_splink_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint64,
    language_id,
    quality_features,
    quality_score,
    token_count,
)
from memory_optimized_splink_spark.operators.ann import (
    brute_force_topk,
    ivf_topk,
)
from memory_optimized_splink_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_decode,
    frame_sample_plan,
    media_stats,
    real_decode_stub,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world foo",), ("  a  b ",), ("",)],
                               "t string")
    got = df.select(token_count(F.col("t")).alias("n"),
                    bpe_ish_token_count(F.col("t")).alias("b")).collect()
    assert [r["n"] for r in got] == [3, 2, 0]
    assert got[0]["b"] >= 3


def test_language_id(spark):
    df = spark.createDataFrame(
        [("the cat is in the hat and it is fine",),
         ("el gato que vive en la casa con los perros",),
         ("zzz qqq xxx",)], "t string")
    got = [r[0] for r in df.select(language_id(F.col("t"))).collect()]
    assert got == ["en", "es", "und"]


def test_quality_score(spark):
    df = spark.createDataFrame(
        [("The quick brown fox jumps over the lazy dog near the river bank",),
         ("!!! ??? ,,, ... ;;; :::",)], "t string")
    got = [r[0] for r in df.select(quality_score(F.col("t"))).collect()]
    assert got[0] > got[1]
    assert got[0] >= 0.8


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog " * 3,),
         ("the quick brown fox jumps over the lazy dog " * 3,),
         ("other text entirely different from the rest here okay",)],
        "t string")
    got = [r[0] for r in df.select(fingerprint64(F.col("t"))).collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(0)
    rows = [(i, rng.standard_normal(16).astype(float).tolist())
            for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_brute_force_topk(vectors):
    queries = vectors.limit(5)
    got = brute_force_topk(vectors, queries, k=3)
    rows = got.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for q, rs in per_q.items():
        assert len(rs) == 3
        sims = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_ivf_topk_recall_vs_exact(vectors):
    queries = vectors.limit(10)
    exact = brute_force_topk(vectors, queries, k=5).collect()
    approx = ivf_topk(vectors, queries, k=5, n_centroids=8, n_probe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # probing half the centroids


def test_ivf_topk_distributed_queries_agree(vectors):
    """broadcast_queries=False (the large-query-set shuffle-join mode) must
    return exactly the broadcast mode's results; its plan must not
    broadcast the query side."""
    queries = vectors.limit(50)

    def key(rows):
        return {(r["query_id"], r["vec_id"], r["rank"]) for r in rows}

    bcast = ivf_topk(vectors, queries, k=5, n_centroids=8, n_probe=4)
    spark = vectors.sparkSession
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast entirely: the distributed mode must survive as a
        # genuine shuffle join (what a too-big-to-broadcast query set gets)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        dist = ivf_topk(vectors, queries, k=5, n_centroids=8, n_probe=4,
                        broadcast_queries=False)
        rows = dist.collect()
        plan = dist._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert key(bcast.collect()) == key(rows)
    assert "BroadcastHashJoin" not in plan.split("AdaptiveSparkPlan")[0] \
        or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", "image/png", b"\x89PNG fake bytes 1234", 64, 64, None),
        ("m2", "image", "image/png", b"\x89PNG other bytes!", 32, 32, None),
        ("m3", "video", "video/mp4", b"\x00mp4 bytes", 640, 480, 3500),
        ("m4", "audio", "audio/wav", None, None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_extract_features_with_fake_decoder(media):
    out = {r["media_id"]: r for r in
           extract_features(media, decoder=fake_decode).collect()}
    assert len(out) == 4
    assert len(out["m1"]["feature"]) == 8
    assert out["m1"]["n_bytes"] == 20
    assert out["m4"]["n_bytes"] == 0
    # deterministic
    again = {r["media_id"]: r["feature"] for r in
             extract_features(media, decoder=fake_decode).collect()}
    assert again["m1"] == out["m1"]["feature"]


def test_real_decoder_is_stubbed(media):
    with pytest.raises(Exception):
        extract_features(media, decoder=real_decode_stub).collect()


def test_frame_sample_plan(media):
    got = frame_sample_plan(media, every_ms=1000).collect()
    assert {(r["media_id"], r["frame_ts_ms"]) for r in got} == {
        ("m3", 0), ("m3", 1000), ("m3", 2000), ("m3", 3000)
    }


def test_media_stats(media):
    got = {r["media_type"]: r for r in media_stats(media).collect()}
    assert got["image"]["n"] == 2
    assert got["video"]["total_bytes"] == 10


def test_ivf_large_codebook_arrow_path(vectors):
    """n_centroids=256 must use the Arrow matmul assignment (codebook in the
    UDF closure), not 256 array literals baked into the plan — and still
    recall well when probing a quarter of the centroids."""
    from memory_optimized_splink_spark.operators.ann import fit_centroids

    queries = vectors.limit(10)
    cents = fit_centroids(vectors, n_centroids=256, sample=300)
    approx_df = ivf_topk(vectors, queries, k=5, centroids=cents, n_probe=64)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan          # pandas-UDF assignment node
    assert len(plan) < 200_000                # no literal codebook blowup

    exact = brute_force_topk(vectors, queries, k=5).collect()
    approx = approx_df.collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_centroid_assign_paths_agree(vectors):
    """Literal-expression and Arrow-matmul assignment must pick identical
    centroids (same scores, same lower-id tie-break)."""
    import numpy as np

    from memory_optimized_splink_spark.operators.ann import (
        _centroid_assign, _centroid_assign_arrow, fit_centroids,
    )
    from pyspark.sql import functions as F

    cents = fit_centroids(vectors, n_centroids=16, sample=300)
    df = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v"))
    lit = {r["vec_id"]: list(r["c"]) for r in df.select(
        "vec_id", _centroid_assign(F.col("_v"), cents, 3).alias("c")).collect()}
    arw = {r["vec_id"]: list(r["c"]) for r in df.select(
        "vec_id",
        _centroid_assign_arrow(F.col("_v"), cents, 3).alias("c")).collect()}
    assert lit == arw
