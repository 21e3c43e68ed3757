"""Deterministic fixture generators (FIXTURES.md F1-F6, F8), seed=42.

Pure Python + numpy — no Spark imports — so the oracle consumes these
directly and the engine lifts them via spark.createDataFrame.  All
randomness flows from np.random.default_rng(42 + stream offset).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np

from ..core.imagecodec import FORMATS, decode, encode, make_pixels, phash64
from ..core.synthweb import CAPTION_VOCAB, HOST_WEIGHTS, HOSTS, NUM_HOSTS

# crawl epoch: seeds carry T0, links discovered in round r carry T0 + r sec
T0 = datetime(2026, 2, 1, 0, 0, 0)
ROBOTS_EPOCH = datetime(2026, 1, 1, 0, 0, 0)

NUM_SEED_HOSTS = 20
NUM_SEEDS = 200
FULLY_DISALLOWED_HOSTS = (7, 13)
ROBOTS_UPDATED_HOSTS = (2, 3, 4)


# ---------------------------------------------------------------- F2 seeds


def make_seeds(n: int = NUM_SEEDS) -> list[str]:
    """Dirty seed URLs over the first NUM_SEED_HOSTS synthweb hosts,
    Zipf-weighted (hot host exists), with canonical-collision pairs."""
    rng = np.random.default_rng(42)
    w = HOST_WEIGHTS[:NUM_SEED_HOSTS] / HOST_WEIGHTS[:NUM_SEED_HOSTS].sum()
    urls: list[str] = []
    i = 0
    while len(urls) < n:
        host = HOSTS[int(rng.choice(NUM_SEED_HOSTS, p=w))]
        clean = f"http://{host}/s/{i:04d}"
        r = rng.random(5)
        u = clean
        if r[0] < 0.3:
            scheme, rest = u.split("://", 1)
            h, _, tail = rest.partition("/")
            u = f"HTTP://{h.upper()}/{tail}"
        if r[1] < 0.2:
            u = u.replace(".test/", ".test:80/", 1)
        if r[2] < 0.3:
            u += "?b=2&a=1" if r[3] < 0.5 else "?a=1&b=2"
        if r[4] < 0.2:
            u += "#sec"
        urls.append(u)
        # ~10%: a second, differently-dirty alias of the same clean URL
        # (canonical-form collision pair — dedup must collapse them)
        if rng.random() < 0.10 and len(urls) < n:
            urls.append(clean + ("?a=1&b=2" if r[3] < 0.5 else "?b=2&a=1"))
        i += 1
    return urls


def write_seed_file(path: str, n: int = NUM_SEEDS) -> None:
    with open(path, "w") as f:
        f.write("\n".join(make_seeds(n)) + "\n")


# ---------------------------------------------------------------- F4 robots


def make_robots() -> list[dict]:
    """Per-host robots rows; rules = [{prefix, allow}].  2 hosts fully
    disallowed; 3 hosts carry a second, newer row (as-of join J7)."""
    rng = np.random.default_rng(43)
    rows = []
    hexd = "0123456789abcdef"
    for hi, host in enumerate(HOSTS):
        fetched_at = ROBOTS_EPOCH + timedelta(hours=hi)
        if hi in FULLY_DISALLOWED_HOSTS:
            rules = [{"prefix": "/", "allow": False}]
        else:
            nrules = int(rng.integers(0, 5))
            prefixes = rng.choice(16, size=nrules, replace=False)
            rules = [
                {"prefix": f"/p/{hexd[int(p)]}", "allow": bool(rng.random() < 0.3)}
                for p in prefixes
            ]
        rows.append(
            {
                "host": host,
                "fetched_at": fetched_at,
                "rules": rules,
                "crawl_delay": round(float(rng.random() * 2.0), 3),
            }
        )
        if hi in ROBOTS_UPDATED_HOSTS:
            # newer snapshot relaxes to a single disallow prefix
            rows.append(
                {
                    "host": host,
                    "fetched_at": fetched_at + timedelta(days=3),
                    "rules": [{"prefix": "/p/f", "allow": False}],
                    "crawl_delay": 0.5,
                }
            )
    return rows


def robots_content_key(row: dict) -> tuple:
    """Canonical content sort key of a robots row — the deterministic
    fetched_at tie-break shared with the engine
    (operators.robots.robots_content_keys builds the identical ordering
    with Spark expressions).  'First row in Python list order' is NOT a
    rule a distributed table can honor, so ties break on content.

    The key is (rules_key, delay_is_set, delay): the delay compares as
    a FLOAT — never stringified, because Spark's CAST(double AS STRING)
    and Python's repr disagree on when scientific notation starts
    (0.0005 → '5.0E-4' vs '0.0005'), which would reorder the two sides
    — with None (no Crawl-delay directive) first, matching the engine's
    asc_nulls_first.  The rules key is length-prefixed
    '<len>:<prefix><flag>' per rule ('+'/'-'/'?' for allow
    true/false/None), injective even when a prefix contains '|', NULL
    array → ''.  String comparison is code-point-wise here, UTF-8
    byte-wise in Spark — identical orderings (UTF-8 preserves
    code-point order)."""
    rules = row.get("rules") or []
    rules_key = "|".join(
        "%d:%s%s"
        % (
            len(r.get("prefix") or ""),
            r.get("prefix") or "",
            "?" if r.get("allow") is None else ("+" if r["allow"] else "-"),
        )
        for r in rules
    )
    d = row.get("crawl_delay")
    return (rules_key, d is not None, 0.0 if d is None else float(d))


def _latest_robots_rows() -> dict[str, dict]:
    latest: dict[str, dict] = {}
    for r in make_robots():
        cur = latest.get(r["host"])
        if (
            cur is None
            or r["fetched_at"] > cur["fetched_at"]
            or (
                r["fetched_at"] == cur["fetched_at"]
                and robots_content_key(r) < robots_content_key(cur)
            )
        ):
            latest[r["host"]] = r
    return latest


def current_robots() -> dict[str, list[dict]]:
    """host -> rules of the LATEST robots row (the as-of-now view both
    engine (J7) and oracle use); fetched_at ties break on the content
    key, matching operators.robots.latest_robots."""
    return {h: r["rules"] for h, r in _latest_robots_rows().items()}


def current_crawl_delays() -> dict[str, float]:
    """host -> crawl_delay of the LATEST robots row — the oracle's view
    of the same as-of-resolved dim the engine's robots join carries
    (operators.robots.latest_robots keeps the crawl_delay column)."""
    return {h: r["crawl_delay"] for h, r in _latest_robots_rows().items()}


# ---------------------------------------------------------------- F5 budgets

DEFAULT_BUDGET = 4


def make_budgets() -> list[dict]:
    """budget 2-10 per host; the hot host (rank-1 Zipf) gets 3 so work
    is deferred across rounds (ordering-sensitive, FIXTURES.md F5)."""
    rng = np.random.default_rng(44)
    rows = []
    for hi, host in enumerate(HOSTS):
        b = 3 if hi == 0 else int(rng.integers(2, 11))
        rows.append({"host": host, "budget_per_round": b})
    return rows


# ---------------------------------------------------------------- F1 corpus


def make_corpus(n: int = 2000, near_dup_rate: float = 0.01) -> list[dict]:
    """Image+caption rows matching the authoritative corpus schema
    (BASELINE.json:15).  ~near_dup_rate of rows are pixel-noise copies
    of an earlier row (exercises the J8 hamming join)."""
    rng = np.random.default_rng(42)
    rows: list[dict] = []
    pixel_cache: list[np.ndarray] = []
    for i in range(n):
        r = np.random.default_rng(42 + i)
        dup_of = None
        if i > 10 and rng.random() < near_dup_rate:
            dup_of = int(rng.integers(0, i))
        if dup_of is None:
            w = int(r.integers(32, 129))
            h = int(r.integers(32, 129))
            pixels = make_pixels(42 + i, w, h)
        else:
            base = pixel_cache[dup_of]
            noise = r.integers(-2, 3, size=base.shape)
            pixels = np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8)
            h, w = pixels.shape[:2]
        pixel_cache.append(pixels)
        fmt = FORMATS[i % 3]
        data = encode(pixels, fmt)
        nwords = int(r.integers(5, 13))
        words = " ".join(
            CAPTION_VOCAB[int(j)]
            for j in r.integers(0, len(CAPTION_VOCAB), size=nwords)
        )
        rows.append(
            {
                "image_id": f"img-{i:08d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"synthetic caption {i}: {words}",
                "phash": phash64(decode(data, fmt)),
            }
        )
    return rows


# ---------------------------------------------------------------- F9 videos


def make_videos(n: int = 60) -> list[dict]:
    """qvid video fixtures: (media_id, payload) rows, 4-10 frames each
    of drifting synthetic pixels (frame f = base pixels rolled f steps,
    so consecutive frames are near-dups and sampled phashes vary).
    One row in ~15 carries a deliberately corrupt payload — the frame
    sampler must emit its sentinel row, never crash."""
    from ..analysis.media import encode_qvid

    rows = []
    for i in range(n):
        r = np.random.default_rng(4200 + i)
        if i % 15 == 14:
            rows.append(
                {"media_id": f"vid-{i:06d}", "payload": b"JUNK" + bytes(r.integers(0, 256, size=64, dtype=np.uint8))}
            )
            continue
        w, h = int(r.integers(16, 33)), int(r.integers(16, 33))
        nf = int(r.integers(4, 11))
        base = make_pixels(4200 + i, w, h)
        frames = np.stack(
            [np.roll(base, shift=3 * f, axis=1) for f in range(nf)]
        )
        rows.append(
            {
                "media_id": f"vid-{i:06d}",
                "payload": encode_qvid(frames, interval_ms=40),
            }
        )
    return rows


# ---------------------------------------------------------------- F10 audio


def make_audio(n: int = 40) -> list[dict]:
    """qaud audio fixtures: (media_id, payload) rows of 0.1-0.5 s mono
    int16 clips (seeded sine + noise mixes, so RMS/zero-crossing
    expectations are non-trivial).  One row in ~12 is corrupt."""
    from ..analysis.media import encode_qaud

    rows = []
    for i in range(n):
        r = np.random.default_rng(5200 + i)
        if i % 12 == 11:
            rows.append({"media_id": f"aud-{i:06d}", "payload": b"XX" + bytes(8)})
            continue
        rate = 16000
        dur = float(r.uniform(0.1, 0.5))
        t = np.arange(int(rate * dur)) / rate
        freq = float(r.uniform(100, 2000))
        amp = float(r.uniform(0.1, 0.8))
        x = amp * np.sin(2 * np.pi * freq * t) + 0.05 * r.standard_normal(len(t))
        pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        rows.append(
            {"media_id": f"aud-{i:06d}", "payload": encode_qaud(pcm, rate)}
        )
    return rows
