"""Embedded-VALUES oracle SQL for the corpus-fixture queries (phash
near-dup / components, decode+resize features, A/V frame sampling).

Round-2 shipped these oracles as parquet side-files under /tmp that the
driver's DuckDB was expected to read back — fragile (any driver that
runs the SQL in an environment that never imported this package sees no
file).  Round 3 inlines the deterministic fixture data directly into
the oracle SQL as a ``VALUES`` list: the SQL is then self-contained ANSI
SQL DuckDB can run anywhere, with zero filesystem coupling.

Independence contract unchanged: the VALUES carry fixture INPUTS
(image ids + phashes) or expectations computed by the *generator-side*
numpy kernels — the Spark side exercises the distributed path (Arrow
batching, mapInPandas decode, LSH band joins); the oracle replays the
math locally.  Every builder is deterministic (seeded generators), so
the SQL string is identical on every call; builders are lazy (invoked
by ``oracle_sql()``) so importing the registry stays cheap.
"""

from __future__ import annotations

PHASH_N, PHASH_NEAR_DUP_RATE = 400, 0.03
FEATURES_N = 200
RESIZE_W = RESIZE_H = 32
AV_N, AV_EVERY_K = 60, 2
AUDIO_N = 40


def _f(v: float) -> str:
    """Exact double literal: repr() is the shortest round-tripping
    decimal, and DuckDB's CAST(<literal> AS DOUBLE) parses it back to
    the bit-identical IEEE double."""
    return f"CAST({v!r} AS DOUBLE)"


def _i(v: int) -> str:
    return f"CAST({int(v)} AS BIGINT)"


def _b(v: bool) -> str:
    return "TRUE" if v else "FALSE"


def phash_values_sql() -> str:
    """``(image_id, phash)`` VALUES rows of the J8 fixture corpus —
    the oracle brute-forces all-pairs hamming over them in DuckDB."""
    from .fixtures import make_corpus

    rows = make_corpus(PHASH_N, near_dup_rate=PHASH_NEAR_DUP_RATE)
    return ",\n      ".join(
        f"('{r['image_id']}', {_i(r['phash'])})" for r in rows
    )


def features_values_sql() -> str:
    """Expected decode + resize-pipeline features of the U4 fixture
    corpus, computed locally with the same analysis.media kernels the
    Spark operators run on executors (decode → features, and decode →
    nearest-neighbor resample → PPM re-encode → features)."""
    from ..analysis.media import image_features, resize_pixels
    from ..core.imagecodec import decode, encode_ppm
    from .fixtures import make_corpus

    vals = []
    for r in make_corpus(FEATURES_N):
        d = image_features(r["bytes"], r["fmt"])
        px = decode(r["bytes"], r["fmt"])
        z = image_features(encode_ppm(resize_pixels(px, RESIZE_W, RESIZE_H)), "ppm")
        vals.append(
            "('{iid}', {d0}, {d1}, {d2}, {d3}, {d4}, {d5}, "
            "{z0}, {z1}, {z2}, {z3}, {z4}, {z5})".format(
                iid=r["image_id"],
                d0=_b(d[0]), d1=_f(d[1]), d2=_f(d[2]), d3=_f(d[3]),
                d4=_f(d[4]), d5=_i(d[5]),
                z0=_b(z[0]), z1=_f(z[1]), z2=_f(z[2]), z3=_f(z[3]),
                z4=_f(z[4]), z5=_i(z[5]),
            )
        )
    return ",\n      ".join(vals)


def av_media_values_sql() -> str:
    """Expected media-union rows (video frame sampling + audio feature
    extraction folded into ONE kind-tagged relation — registry packing,
    round-3 verdict #1), computed locally through the same
    decode_qvid/decode_qaud kernels the Spark operators run on
    executors.  Column mapping:

      kind='video': idx=frame_idx, ts_ms=frame_ts_ms, sig64=frame_phash,
                    level=frame_mean_luma, zc=0
      kind='audio': idx=0 ok / -1 corrupt, ts_ms=duration_ms, sig64=peak,
                    level=rms, zc=zero_crossings
    """
    from ..analysis.media import _audio_features_one, expected_frame_rows
    from .fixtures import make_audio, make_videos

    vals = []
    for r in make_videos(AV_N):
        for mid, idx, ts, ph, luma in expected_frame_rows(
            r["media_id"], r["payload"], AV_EVERY_K
        ):
            vals.append(
                f"('video', '{mid}', {int(idx)}, {_i(ts)}, {_i(ph)}, "
                f"{_f(luma)}, {_i(0)})"
            )
    for r in make_audio(AUDIO_N):
        mid, ok, dur, rms, peak, zc = _audio_features_one(
            r["media_id"], r["payload"]
        )
        vals.append(
            f"('audio', '{mid}', {0 if ok else -1}, {_i(dur)}, {_i(peak)}, "
            f"{_f(rms)}, {_i(zc)})"
        )
    return ",\n      ".join(vals)
