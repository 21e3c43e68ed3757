"""Parquet side-files that let DuckDB oracle-check the corpus-fixture
queries (phash near-dup, decode features).

The driver's DuckDB views cover only the ten sandbox tables, but its
oracle SQL can read any parquet path — so the fixture generator writes
its deterministic expectations to fixed paths under /tmp and the oracle
SQL reads them back.  Writes are atomic (tmp file + os.replace) and
idempotent; both ``oracle_sql()`` and the query functions trigger them,
so either driver ordering (SQL first or Spark first) finds the files.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/tmp/topicalcrawler_oracle_fixtures"
CORPUS_PHASH_PATH = os.path.join(FIXTURE_DIR, "corpus_phash.parquet")
CORPUS_FEATURES_PATH = os.path.join(FIXTURE_DIR, "corpus_features.parquet")
CORPUS_RESIZE_PATH = os.path.join(FIXTURE_DIR, "corpus_resize_features.parquet")

PHASH_N, PHASH_NEAR_DUP_RATE = 400, 0.03
FEATURES_N = 200
RESIZE_W = RESIZE_H = 32


def _atomic_write(table: pa.Table, path: str) -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def ensure_phash_fixture() -> str:
    """(image_id, phash) of the J8 fixture corpus — the oracle
    brute-forces all-pairs hamming over it in DuckDB."""
    if not os.path.exists(CORPUS_PHASH_PATH):
        from .fixtures import make_corpus

        rows = make_corpus(PHASH_N, near_dup_rate=PHASH_NEAR_DUP_RATE)
        _atomic_write(
            pa.table(
                {
                    "image_id": [r["image_id"] for r in rows],
                    "phash": pa.array(
                        [r["phash"] for r in rows], type=pa.int64()
                    ),
                }
            ),
            CORPUS_PHASH_PATH,
        )
    return CORPUS_PHASH_PATH


def _features_table(rows: list[dict], feats: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "image_id": [r["image_id"] for r in rows],
            "decode_ok": pa.array([f[0] for f in feats], type=pa.bool_()),
            "mean_r": pa.array([f[1] for f in feats], type=pa.float64()),
            "mean_g": pa.array([f[2] for f in feats], type=pa.float64()),
            "mean_b": pa.array([f[3] for f in feats], type=pa.float64()),
            "luma_std": pa.array([f[4] for f in feats], type=pa.float64()),
            "dec_phash": pa.array([f[5] for f in feats], type=pa.int64()),
        }
    )


def ensure_resize_features_fixture() -> str:
    """Expected features of the resize→re-encode→decode pipeline
    (decode → nearest-neighbor resample → PPM → features), computed
    locally through the same library kernels the Spark operators run."""
    if not os.path.exists(CORPUS_RESIZE_PATH):
        from ..analysis.media import image_features, resize_pixels
        from ..core.imagecodec import decode, encode_ppm
        from .fixtures import make_corpus

        rows = make_corpus(FEATURES_N)
        feats = []
        for r in rows:
            px = decode(r["bytes"], r["fmt"])
            ppm = encode_ppm(resize_pixels(px, RESIZE_W, RESIZE_H))
            feats.append(image_features(ppm, "ppm"))
        _atomic_write(_features_table(rows, feats), CORPUS_RESIZE_PATH)
    return CORPUS_RESIZE_PATH


def ensure_features_fixture() -> str:
    """Expected decode features of the U4 fixture corpus, computed
    locally with the same analysis.media.image_features the Spark
    operator runs on executors."""
    if not os.path.exists(CORPUS_FEATURES_PATH):
        from ..analysis.media import image_features
        from .fixtures import make_corpus

        rows = make_corpus(FEATURES_N)
        feats = [image_features(r["bytes"], r["fmt"]) for r in rows]
        _atomic_write(_features_table(rows, feats), CORPUS_FEATURES_PATH)
    return CORPUS_FEATURES_PATH
