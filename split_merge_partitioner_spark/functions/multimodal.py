"""Multimodal column processing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas (Arrow batches).

Decoders implemented WITHOUT codec libraries (none exist in this container):
- images: PPM (P6 binary / P3 ascii) and uncompressed 24/32-bit BMP — parsed
  with NumPy directly from the payload bytes; nearest-neighbor resize is a
  NumPy index gather.
- audio: RIFF/WAV PCM16 via the stdlib ``wave`` module -> float32 samples.
- compressed formats (PNG/JPEG/MP4...) stay behind an explicit
  NotImplementedError (honest stub: a real deployment drops in Pillow/ffmpeg
  at exactly this seam) — or the deterministic fake decoder when fake=True so
  the full Spark pipeline is testable for those kinds too.

The Spark side — schema, partitioning, Arrow batch shape, UDF signatures,
frame-sampling plan — is real for every kind.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("width", LongType()),        # typed metadata
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("std_byte", DoubleType()),
        StructField("feature", StringType()),    # hex fingerprint
        StructField("decoded_w", LongType()),    # images: decoded dims
        StructField("decoded_h", LongType()),
        StructField("n_samples", LongType()),    # audio: PCM sample count
        StructField("rms", DoubleType()),        # audio: RMS amplitude
    ]
)


# ---------------------------------------------------------------------------
# codecs (NumPy / stdlib only)
# ---------------------------------------------------------------------------

def _decode_ppm(payload: bytes) -> np.ndarray:
    toks: list[bytes] = []
    pos = 0
    while len(toks) < 4:  # magic, width, height, maxval
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        toks.append(payload[start:pos])
    magic, w, h, maxval = toks[0], int(toks[1]), int(toks[2]), int(toks[3])
    if magic == b"P6":
        pos += 1  # single whitespace after maxval
        raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        img = raw.reshape(h, w, 3)
    elif magic == b"P3":
        vals = np.array(payload[pos:].split(), dtype=np.int64)[: w * h * 3]
        img = vals.reshape(h, w, 3).astype(np.uint8)
    else:
        raise ValueError(f"not a PPM payload: {magic!r}")
    if maxval != 255:
        img = (img.astype(np.float64) * (255.0 / maxval)).astype(np.uint8)
    return img


def _decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError("only uncompressed 24/32-bit BMP supported")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3  # rows padded to 4 bytes
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_offset)
    rows = raw.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    img = rows[..., 2::-1]  # BGR(A) -> RGB
    return img[::-1] if flip else img


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image to an HxWx3 uint8 array.

    Real decoders: PPM (P6/P3) and uncompressed BMP — pure NumPy.
    Compressed formats (PNG/JPEG/...) raise NotImplementedError (no codec
    libraries in this container; this function is the drop-in seam) unless
    fake=True, which returns a deterministic pseudo-image derived from the
    payload bytes so the downstream plumbing is testable."""
    head = payload[:2]
    if head in (b"P6", b"P3"):
        return _decode_ppm(payload)
    if head == b"BM":
        return _decode_bmp(payload)
    if not fake:
        raise NotImplementedError(
            "compressed image decoding requires a codec library not present "
            "in this environment; use PPM/BMP payloads or pass fake=True"
        )
    b = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(b.size // 3)), 1)
    need = side * side * 3
    tiled = np.resize(b, need)
    return tiled.reshape(side, side, 3)


def decode_audio_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM16 -> (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate).  stdlib wave + NumPy."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV supported")
        nch = wf.getnchannels()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    pcm = np.frombuffer(frames, dtype="<i2").reshape(-1, nch)
    return (pcm.astype(np.float32) / 32768.0), rate


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize as a pure NumPy index gather."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h // out_h), h - 1)
    xi = np.minimum((np.arange(out_w) * w // out_w), w - 1)
    return img[yi][:, xi]


# ---------------------------------------------------------------------------
# fixtures + pipeline
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def make_media_df(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic mixed-media fixture: REAL PPM images, REAL PCM16 WAV
    audio, and opaque pseudo-mp4 video bytes (video decode stays stubbed)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, dur = encode_ppm(img), 0
        elif kind == "audio":
            n_samp = int(rng.integers(800, 4000))
            samples = rng.standard_normal(n_samp).astype(np.float32) * 0.2
            payload, rate = encode_wav_pcm16(samples), 8000
            w = h = 0
            dur = int(n_samp * 1000 / rate)
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8).tobytes()
            w, h = int(rng.integers(16, 256)), int(rng.integers(16, 256))
            dur = int(rng.integers(1000, 60000))
        mime = {"image": "image/x-portable-pixmap", "audio": "audio/wav", "video": "video/mp4"}[kind]
        rows.append((i, kind, mime, bytearray(payload), w, h, dur))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, fake_decode: bool = False, thumb: int = 8) -> DataFrame:
    """Per-media feature extraction over Arrow batches via mapInPandas:
    images decode + resize to a thumb fingerprint; audio decodes to PCM for
    sample count / RMS; video (and any compressed image) goes through the
    stub boundary (fake_decode=True substitutes the deterministic fake)."""

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload)
                b = np.frombuffer(raw, dtype=np.uint8)
                dw = dh = ns = 0
                rms = 0.0
                if kind == "audio":
                    samples, _rate = decode_audio_wav(raw)
                    ns = samples.shape[0]
                    rms = float(np.sqrt(np.mean(samples**2)))
                    fp = hashlib.sha256(samples.tobytes()).hexdigest()[:16]
                else:
                    img = decode_image(raw, fake=(kind == "video") or fake_decode)
                    dh, dw = img.shape[:2]
                    fp = hashlib.sha256(
                        resize_nearest(img, thumb, thumb).tobytes()
                    ).hexdigest()[:16]
                feats.append(
                    (int(mid), int(b.size), float(b.mean()), float(b.std()),
                     fp, dw, dh, ns, rms)
                )
            yield pd.DataFrame(
                feats,
                columns=["media_id", "n_bytes", "mean_byte", "std_byte",
                         "feature", "decoded_w", "decoded_h", "n_samples", "rms"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        task, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows via JVM-side
    sequence/explode — the distributed part of frame extraction; the actual
    frame decode is behind the same stub boundary."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
