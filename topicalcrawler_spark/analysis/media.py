"""Multimodal binary-column plumbing (task brief "Multimodal columns").

Images are REAL in this engine (PPM/PNG/qraw decode via
core.imagecodec — numpy+zlib, no PIL needed): decode_features and
resize_images do actual pixel work in Arrow-batched mapInPandas.
Video is real too, over the ``qvid`` container defined below (magic +
dimensions + zlib-packed raw RGB frames): ``sample_frames`` decodes
actual pixel data and phashes every sampled frame — no stub, and the
full pipeline is oracle-checked end-to-end (round-2 carried a
hash-faking ``_decode_av_stub`` here; it is gone).  ffmpeg-grade
codecs (H.264 etc.) are still absent from this container — on a real
cluster the qvid parser swaps for an ffmpeg call with the identical
operator contract.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql import types as T

from ..core.imagecodec import decode, encode_ppm, phash64

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("luma_std", T.DoubleType()),
        T.StructField("dec_phash", T.LongType()),
    ]
)


def image_features(data: bytes, fmt: str) -> tuple:
    """Per-image feature extraction (decode → channel means, luma
    contrast, recomputed phash).  Shared by the Spark operator below
    AND the oracle-fixture generator (sources.oracle_fixtures), so the
    driver's DuckDB comparison checks the full decode path through
    Arrow transport against the same math evaluated locally."""
    try:
        px = decode(bytes(data), fmt).astype(np.float64)
        luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        return (
            True,
            round(float(px[..., 0].mean()), 4),
            round(float(px[..., 1].mean()), 4),
            round(float(px[..., 2].mean()), 4),
            round(float(luma.std()), 4),
            phash64(px.astype(np.uint8)),
        )
    except Exception:
        return (False, 0.0, 0.0, 0.0, 0.0, 0)


def decode_features(corpus: DataFrame) -> DataFrame:
    """Decode images and extract channel-mean / contrast features +
    recomputed phash — one Arrow batch at a time, numpy-vectorized per
    image. Input: the corpus schema (BASELINE.json:15)."""

    def run(batches):
        for pdf in batches:
            rows = [
                (iid, *image_features(data, fmt))
                for iid, data, fmt in zip(
                    pdf["image_id"], pdf["bytes"], pdf["fmt"]
                )
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return corpus.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_pixels(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample — shared by the Spark resize operator
    and the oracle-fixture generator so the resize→feature pipeline is
    exactly replayable."""
    ys = (np.arange(out_h) * px.shape[0] // out_h).astype(int)
    xs = (np.arange(out_w) * px.shape[1] // out_w).astype(int)
    return px[ys][:, xs]


def resize_images(corpus: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); re-encodes as PPM.
    Output keeps the corpus schema (fmt='ppm', w/h updated)."""
    out_schema = corpus.schema

    def run(batches):
        for pdf in batches:
            new_bytes, ws, hs, fmts = [], [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                try:
                    px = decode(bytes(data), fmt)
                    small = resize_pixels(px, out_w, out_h)
                    new_bytes.append(encode_ppm(small))
                    ws.append(out_w), hs.append(out_h), fmts.append("ppm")
                except Exception:
                    new_bytes.append(bytes(data))
                    ws.append(0), hs.append(0), fmts.append(fmt)
            pdf = pdf.copy()
            pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"] = (
                new_bytes,
                pd.array(ws, dtype="int32"),
                pd.array(hs, dtype="int32"),
                fmts,
            )
            yield pdf

    return corpus.mapInPandas(run, schema=out_schema)


# -------------------------------------------------------- video (qvid)

QVID_MAGIC = b"QVID"

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_phash", T.LongType()),
        T.StructField("frame_mean_luma", T.DoubleType()),
    ]
)


def encode_qvid(frames: np.ndarray, interval_ms: int = 40) -> bytes:
    """Pack (n, h, w, 3) uint8 frames into the qvid container:
    magic | u16be w,h,n_frames,interval_ms | zlib(raw RGB frames)."""
    n, h, w, _ = frames.shape
    header = QVID_MAGIC + struct.pack(">HHHH", w, h, n, interval_ms)
    return header + zlib.compress(np.ascontiguousarray(frames).tobytes())


def decode_qvid(data: bytes) -> tuple[int, np.ndarray]:
    """Parse a qvid payload → (interval_ms, frames (n,h,w,3) uint8).
    Raises ValueError on a corrupt container (bad magic / short body)."""
    if len(data) < 12 or data[:4] != QVID_MAGIC:
        raise ValueError("not a qvid container")
    w, h, n, interval_ms = struct.unpack(">HHHH", data[4:12])
    raw = zlib.decompress(data[12:])
    if len(raw) != n * h * w * 3:
        raise ValueError("qvid body length mismatch")
    if n and (h == 0 or w == 0):
        # zero-dimension frames satisfy the length check vacuously
        # (n*0*3 == 0 == len('')), but downstream luma.mean() over an
        # empty array yields NaN rows instead of the corrupt sentinel
        raise ValueError("qvid zero-dimension frames")
    return interval_ms, np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3)


def _sample_one(media_id: str, payload: bytes, every_k: int) -> list[tuple]:
    """Decode one qvid payload and emit every k-th frame's features —
    the shared kernel (Spark operator + oracle generator), so the
    driver's comparison checks the distributed decode path through
    Arrow transport against the same math evaluated locally."""
    try:
        interval_ms, frames = decode_qvid(bytes(payload or b""))
    except Exception:
        return [(media_id, -1, -1, 0, 0.0)]
    out = []
    for i in range(0, frames.shape[0], every_k):
        px = frames[i].astype(np.float64)
        luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        out.append(
            (
                media_id,
                i,
                i * interval_ms,
                phash64(frames[i]),
                round(float(luma.mean()), 4),
            )
        )
    return out


# the oracle-fixture generator imports this name to state its intent
expected_frame_rows = _sample_one


AUDIO_MAGIC = b"QAUD"

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def encode_qaud(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Pack mono int16 PCM into the qaud container:
    magic | u32be sample_rate | u32be n_samples | zlib(PCM)."""
    pcm = np.ascontiguousarray(samples.astype("<i2"))
    header = AUDIO_MAGIC + struct.pack(">II", sample_rate, len(pcm))
    return header + zlib.compress(pcm.tobytes())


def decode_qaud(data: bytes) -> tuple[int, np.ndarray]:
    """Parse a qaud payload → (sample_rate, int16 samples).
    Raises ValueError on a corrupt container."""
    if len(data) < 12 or data[:4] != AUDIO_MAGIC:
        raise ValueError("not a qaud container")
    sample_rate, n = struct.unpack(">II", data[4:12])
    raw = zlib.decompress(data[12:])
    if len(raw) != n * 2 or sample_rate == 0:
        raise ValueError("qaud body length mismatch")
    return sample_rate, np.frombuffer(raw, dtype="<i2")


def _audio_features_one(media_id: str, payload: bytes) -> tuple:
    """Shared kernel (Spark operator + fixture expectations): decode
    and summarize one clip — duration, RMS level, peak, zero-crossing
    count (the cheap voicedness/noise discriminator)."""
    try:
        rate, pcm = decode_qaud(bytes(payload or b""))
    except Exception:
        return (media_id, False, -1, 0.0, 0, 0)
    x = pcm.astype(np.float64)
    rms = round(float(np.sqrt(np.mean(x * x))), 4) if len(x) else 0.0
    # abs on the widened copy, never on the raw int16: np.abs(-32768)
    # wraps to -32768 in int16 (full-scale negative — common in clipped
    # audio), which would report a wrong or negative peak
    peak = int(np.abs(x).max()) if len(pcm) else 0
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return (
        media_id,
        True,
        int(len(pcm) * 1000 // rate),
        rms,
        peak,
        zc,
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over binary qaud columns — REAL PCM
    decode in Arrow-batched mapInPandas (duration/RMS/peak/zero
    crossings per clip); corrupt payloads degrade to a decode_ok=False
    sentinel row.  Same operator contract as an ffmpeg/librosa-backed
    decode on a real cluster.  Input needs (media_id:string,
    payload:binary)."""

    def run(batches):
        for pdf in batches:
            rows = [
                _audio_features_one(mid, payload)
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_SCHEMA
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling over video binary columns: one input row →
    ceil(n_frames / every_k) frame rows (UDTF-shaped, done columnar in
    Arrow-batched mapInPandas), each with its timestamp, phash, and
    mean luma — REAL qvid decode, no per-row Python in the plan.
    Corrupt payloads yield a single (frame_idx=-1) sentinel row rather
    than killing the task (100-TB corpora always contain garbage).
    Input needs (media_id:string, payload:binary)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows.extend(_sample_one(mid, payload, every_k))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
