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


# ----------------------------------------------------- real BMP/WAV decode

def _build_bmp(pixels, top_down=False):
    """Hand-assemble an uncompressed 24-bit BMP from an (H, W, 3) RGB list.
    Independent of the decoder under test: plain int.to_bytes packing."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = arr if top_down else arr[::-1]
    body = b""
    for row in rows:
        line = b"".join(bytes([b, g, r]) for r, g, b in row)  # BGR
        body += line + b"\x00" * (stride - len(line))
    header_size = 14 + 40
    file_size = header_size + len(body)
    signed_h = -h if top_down else h
    header = (
        b"BM" + file_size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + header_size.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + signed_h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + body


def _build_wav(samples, rate=8000, bits=16, channels=1):
    """Hand-assemble a PCM WAV; samples are floats in [-1, 1]."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        data = (x * 32767).astype("<i2").tobytes()
    elif bits == 8:
        data = ((x * 127) + 128).clip(0, 255).astype(np.uint8).tobytes()
    else:
        data = (x * (2 ** 31 - 1)).astype("<i4").tobytes()
    block = channels * bits // 8
    fmt = ((1).to_bytes(2, "little") + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + bits.to_bytes(2, "little"))
    chunks = (b"fmt " + len(fmt).to_bytes(4, "little") + fmt
              + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" \
        + chunks


def test_decode_bmp_exact_pixels():
    import numpy as np

    from memory_optimized_splink_spark.operators.multimodal import decode_bmp

    pixels = [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
              [[10, 20, 30], [40, 50, 60], [70, 80, 90]]]
    for top_down in (False, True):
        got = decode_bmp(_build_bmp(pixels, top_down=top_down))
        assert got.shape == (2, 3, 3)
        assert np.array_equal(got, np.asarray(pixels, dtype=np.uint8)), \
            top_down
    # width 3 forces a 1-byte row pad (stride 12 vs 9): covered above
    with pytest.raises(ValueError):
        decode_bmp(b"\xff\xd8\xff not a bmp at all, padding padding pad" * 3)


def test_decode_wav_exact_samples():
    import numpy as np

    from memory_optimized_splink_spark.operators.multimodal import decode_wav

    samples = [0.0, 0.5, -0.5, 1.0, -1.0, 0.25]
    got, rate = decode_wav(_build_wav(samples, rate=44100, bits=16))
    assert rate == 44100 and got.shape == (6, 1)
    assert np.allclose(got[:, 0], samples, atol=1 / 32767)
    # stereo: interleaved samples split into channels
    stereo, rate2 = decode_wav(
        _build_wav([0.1, -0.1, 0.2, -0.2], rate=8000, bits=16, channels=2))
    assert stereo.shape == (2, 2)
    assert np.allclose(stereo[:, 0], [0.1, 0.2], atol=1e-3)
    assert np.allclose(stereo[:, 1], [-0.1, -0.2], atol=1e-3)


def test_image_audio_features_known_values():
    import numpy as np

    from memory_optimized_splink_spark.operators.multimodal import (
        audio_features, image_features,
    )

    # uniform grey image: means = 100, std 0, edge energy 0
    grey = [[[100, 100, 100]] * 4] * 2
    f = image_features(_build_bmp(grey))
    assert f[0] == 4 and f[1] == 2            # w, h
    assert np.allclose(f[2:5], 100.0)
    assert f[5] == 0.0 and f[6] == 0.0 and f[7] == 2.0

    # square wave at +-0.5: rms ~ 0.5, peak ~ 0.5, zcr ~ 1
    wav = _build_wav([0.5, -0.5] * 50, rate=16000)
    a = audio_features(wav)
    assert a[0] == 16000 and a[1] == 100
    assert abs(a[2] - 0.5) < 1e-3 and abs(a[3] - 0.5) < 1e-3
    assert a[4] > 0.98


def test_media_decoder_dispatch_and_spark_path(spark):
    import numpy as np

    from memory_optimized_splink_spark.operators.multimodal import (
        extract_features, media_decoder,
    )

    bmp = _build_bmp([[[100, 100, 100]] * 4] * 2)
    wav = _build_wav([0.5, -0.5] * 50, rate=16000)
    rows = [("img1", "image", "image/bmp", bytearray(bmp), 4, 2, None),
            ("aud1", "audio", "audio/wav", bytearray(wav), None, None, 100)]
    df = spark.createDataFrame(
        rows, "media_id string, media_type string, mime string, "
              "content binary, width long, height long, duration_ms long")
    feats = {r["media_id"]: r for r in
             extract_features(df, decoder=media_decoder).collect()}
    assert feats["img1"]["n_bytes"] == len(bmp)
    assert np.allclose(feats["img1"]["feature"][2:5], 100.0)
    assert feats["aud1"]["feature"][0] == 16000.0
    # compressed formats remain honestly stubbed
    with pytest.raises(NotImplementedError):
        media_decoder(b"\xff\xd8\xff\xe0fakejpeg")


def test_pluggable_decoder_contract(spark, media):
    """Decoder-contract test: any user-supplied `bytes -> np.ndarray`
    callable slots into extract_features — it receives each row's exact
    content bytes, its output becomes the float32 feature array, and its
    exceptions surface loudly (never swallowed into nulls). This is the
    one-line integration path for users with media libs (PIL/torchaudio):
    decoder=pil_image_decoder() has the same signature."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from memory_optimized_splink_spark.operators.multimodal import (
        extract_features,
    )

    seen_hashes = []

    def my_decoder(content: bytes) -> np.ndarray:
        # simulates e.g. np.asarray(Image.open(io.BytesIO(content)))
        if content is None:
            return np.zeros(1, dtype=np.float32)
        return np.array([len(content), content[0], content[-1]],
                        dtype=np.float32)

    rows = {r["media_id"]: r for r in
            extract_features(media, decoder=my_decoder).collect()}
    src = {r["media_id"]: bytes(r["content"])
           for r in media.select("media_id", "content").collect()
           if r["content"]}
    assert set(src) <= set(rows)
    for mid, content in src.items():
        feat = rows[mid]["feature"]
        assert feat == [float(len(content)), float(content[0]),
                        float(content[-1])]
        assert rows[mid]["n_bytes"] == len(content)

    # a decoder that cannot handle the format must fail LOUDLY through
    # the Spark job, not degrade to nulls
    def refusing(content: bytes) -> np.ndarray:
        raise NotImplementedError("no codec for this format")

    with pytest.raises(Exception, match="no codec"):
        extract_features(media, decoder=refusing).collect()


def test_media_lib_decoders_import_gated():
    """pil_image_decoder/torchaudio_decoder fail fast driver-side with an
    actionable ImportError when the lib is absent; when present they return
    a bytes->ndarray callable satisfying the extract_features contract."""
    import numpy as np
    import pytest

    from memory_optimized_splink_spark.operators.multimodal import (
        pil_image_decoder, torchaudio_decoder,
    )

    try:
        import PIL  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        dec = pil_image_decoder()
        assert callable(dec)
    else:
        with pytest.raises(ImportError, match="pillow"):
            pil_image_decoder()

    try:
        import torchaudio  # noqa: F401
        have_ta = True
    except ImportError:
        have_ta = False
    if have_ta:
        assert callable(torchaudio_decoder())
    else:
        with pytest.raises(ImportError, match="torchaudio"):
            torchaudio_decoder()
