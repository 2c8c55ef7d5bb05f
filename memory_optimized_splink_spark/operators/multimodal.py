"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery (schema, batching, partition sizing, UDF
signatures) is real and tested. Decoding is real for the uncompressed
formats a pure-numpy decoder can handle — BMP images (decode_bmp) and PCM
WAV audio (decode_wav), dispatched by magic bytes in media_decoder — and
honestly stubbed for compressed formats (JPEG/PNG/MP3/...) that need
image/audio libraries this container does not ship.

Design:
- media rows are (id, media_type, content binary, metadata map-ish cols).
- decode/feature steps run via mapInPandas so one Arrow batch streams
  through Python at a time (bounded memory per task, no collect).
- binary payloads are heavy: all transforms project id+content only and
  join features back by id, so wide metadata never rides the Python hop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), True),   # image|audio|video
    StructField("mime", StringType(), True),
    StructField("content", BinaryType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
    StructField("n_bytes", LongType(), True),
])


def real_decode_stub(content: bytes) -> np.ndarray:
    """Placeholder for a compressed-format decoder (PIL/torchaudio/
    ffmpeg). Uncompressed BMP/WAV decode IS implemented — use
    media_decoder; this stub remains only for formats that require media
    libraries absent from this environment."""
    raise NotImplementedError(
        "compressed-media decoding requires image/audio libraries not "
        "present in this environment; use media_decoder for BMP/WAV or "
        "decoder=fake_decode for the deterministic fake"
    )


# ----------------------------------------------------- real decoders (numpy)

def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3) uint8 RGB array. Pure numpy:
    BITMAPFILEHEADER (14 bytes, pixel offset at 10), BITMAPINFOHEADER
    (width i32 @18, height i32 @22, bpp u16 @28, compression u32 @30 == 0),
    rows padded to 4 bytes, stored bottom-up (or top-down when height < 0),
    channel order BGR(A)."""
    if content is None or len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = int.from_bytes(content[10:14], "little")
    width = int.from_bytes(content[18:22], "little", signed=True)
    height = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported "
            f"(bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    nchan = bpp // 8
    stride = (width * nchan + 3) & ~3          # rows pad to 4 bytes
    data = np.frombuffer(content, dtype=np.uint8,
                         count=stride * height, offset=pix_off)
    rows = data.reshape(height, stride)[:, : width * nchan]
    img = rows.reshape(height, width, nchan)
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img[:, :, 2::-1])  # BGR(A) -> RGB


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((n_samples, channels) float64 in [-1, 1], sample_rate).
    Pure numpy RIFF walk: 'fmt ' chunk must declare PCM (format 1) at
    8/16/32 bits; the 'data' chunk holds interleaved little-endian
    samples."""
    if content is None or len(content) < 12 or content[:4] != b"RIFF" \
            or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        size = int.from_bytes(content[pos + 4:pos + 8], "little")
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)           # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16, 32):
        raise NotImplementedError(
            f"only 8/16/32-bit PCM WAV supported "
            f"(format={audio_format}, bits={bits})")
    if bits == 8:    # unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    else:
        dt = np.dtype(f"<i{bits // 8}")
        x = np.frombuffer(data, dtype=dt).astype(np.float64) \
            / float(1 << (bits - 1))
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), sample_rate


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy (the resize step of an image
    pipeline — no interpolation libs needed for thumbnailing features)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(content: bytes) -> np.ndarray:
    """BMP -> 8-dim feature: [w, h, mean R, mean G, mean B, std gray,
    edge-energy (mean |dx|+|dy| of gray), aspect]."""
    img = decode_bmp(content).astype(np.float64)
    h, w = img.shape[:2]
    gray = img.mean(axis=2)
    dx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
    dy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
    return np.array([
        w, h, img[:, :, 0].mean(), img[:, :, 1].mean(), img[:, :, 2].mean(),
        gray.std(), dx + dy, w / h,
    ], dtype=np.float32)


def audio_features(content: bytes) -> np.ndarray:
    """PCM WAV -> 6-dim feature: [sample_rate, n_samples, rms, peak,
    zero-crossing rate, mean |sample|] over the channel mix."""
    samples, rate = decode_wav(content)
    mono = samples.mean(axis=1)
    zc = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) \
        if len(mono) > 1 else 0.0
    return np.array([
        rate, len(mono), np.sqrt((mono ** 2).mean()) if len(mono) else 0.0,
        np.abs(mono).max(initial=0.0), zc,
        np.abs(mono).mean() if len(mono) else 0.0,
    ], dtype=np.float32)


def media_decoder(content: bytes) -> np.ndarray:
    """Magic-byte dispatch: BMP -> image_features, PCM WAV ->
    audio_features; compressed formats raise NotImplementedError (honest
    stub — no media libs in this environment)."""
    if content is None or len(content) == 0:
        return np.zeros(8, dtype=np.float32)
    if content[:2] == b"BM":
        return image_features(content)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return audio_features(content)
    return real_decode_stub(content)


def pil_image_decoder(mode: str = "RGB"
                      ) -> Callable[[bytes], np.ndarray]:
    """One-line exit from the compressed-format stub for users WITH
    pillow installed: extract_features(media, decoder=pil_image_decoder()).
    Decodes JPEG/PNG/anything PIL reads to an HxWxC uint8 array. Fails
    fast driver-side with a clear ImportError when pillow is absent; the
    returned closure re-imports lazily so workers only need pillow on
    their own PYTHONPATH (contract-tested in
    tests/test_text_ann_multimodal.py)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "pillow is required for pil_image_decoder(); pip install "
            "pillow, or use media_decoder (pure-numpy BMP/WAV) instead"
        ) from e

    def decode(content: bytes) -> np.ndarray:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(content)).convert(mode))

    return decode


def torchaudio_decoder() -> Callable[[bytes], np.ndarray]:
    """Same contract for compressed audio via torchaudio: returns
    (channels x samples) float32. extract_features(media,
    decoder=torchaudio_decoder())."""
    try:
        import torchaudio  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "torchaudio is required for torchaudio_decoder(); pip install "
            "torchaudio, or use media_decoder (pure-numpy PCM WAV) instead"
        ) from e

    def decode(content: bytes) -> np.ndarray:
        import io

        import torchaudio

        wave, _rate = torchaudio.load(io.BytesIO(content))
        return wave.numpy().astype(np.float32)

    return decode


def fake_decode(content: bytes) -> np.ndarray:
    """Deterministic fake decode: bytes -> pseudo feature vector. Keeps the
    whole Spark path executable without media libs."""
    if content is None:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(8, dtype=np.float32)
    pads = -len(arr) % 8
    arr = np.pad(arr, (0, pads)).reshape(-1, 8)
    return (arr.mean(axis=0) / 255.0).astype(np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = real_decode_stub,
    batch_size: int = 256,
) -> DataFrame:
    """media (MEDIA_SCHEMA-ish) -> FEATURE_SCHEMA via mapInPandas.

    Only (media_id, content) crosses into Python; Arrow batch size is capped
    so a partition of large blobs never materializes at once.
    """
    slim = media.select("media_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo:lo + batch_size]
                feats = [decoder(c) for c in chunk["content"]]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "feature": [np.asarray(f, dtype=np.float32) for f in feats],
                    "n_bytes": [len(c) if c is not None else 0
                                for c in chunk["content"]],
                })

    return slim.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    the decode itself is the stubbed step, but the fan-out (explode over a
    sequence bounded by duration) is the real Spark shape."""
    return media.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation: count/bytes per media_type."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
        F.avg(F.col("width")).alias("avg_width"),
    )
