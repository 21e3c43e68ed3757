"""Multimodal binary-column plumbing (task brief "Multimodal columns").

Images are REAL in this engine (PPM/PNG/qraw decode via
core.imagecodec — numpy+zlib, no PIL needed): decode_features and
resize_images do actual pixel work in Arrow-batched mapInPandas.
Audio/video libraries are not in this container, so frame-sample and
audio-features expose the full Spark-side contract (schema, batch
shape, partitioning) over a clearly-marked deterministic stub decoder
— swap `_decode_av_stub` for a real codec on a cluster with ffmpeg.
"""

from __future__ import annotations

import hashlib

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


# ---------------------------------------------------------------- A/V stubs

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_phash", T.LongType()),
    ]
)


def _decode_av_stub(media_id: str, payload: bytes, n: int) -> list[tuple]:
    """STUB A/V decoder — deterministic fake (no ffmpeg/librosa in this
    container). Emits n 'frames' whose phash is an md5-derived value of
    (media_id, frame_idx); replace with a real decoder on a full
    cluster. The Spark-side plumbing (schema, explode shape, Arrow
    batching) is the real contract being exercised."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"{media_id}:{i}".encode()).digest()
        out.append((media_id, i, i * 1000, int.from_bytes(h[:8], "big") >> 4))
    return out


def sample_frames(media: DataFrame, frames_per_item: int = 4) -> DataFrame:
    """Frame-sampling contract for video-ish binary columns: one input
    row -> frames_per_item frame rows (UDTF-shaped, done columnar).
    Input needs (media_id:string, payload:binary)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows.extend(
                    _decode_av_stub(mid, bytes(payload or b""), frames_per_item)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
