"""Deterministic synthetic web (FIXTURES.md F3) — the fetch target.

The sandbox has no network (SURVEY.md §0), so ``fetch_page`` is a pure
function of the canonical URL: page content, out-links, link context,
HTTP status, and the carried image are all derived from
``stable64u(url_canon)``.  Both the Spark engine's mapInArrow fetch UDF
(U3) and the pure-Python oracle call THIS function, so "the web" is
identical on both sides — the trace-equality test then isolates
scheduler behavior.

Out-link URLs are emitted *dirty* (mixed-case host, fragments, default
ports, shuffled query params) so canonicalization is exercised inside
the crawl loop, not just on seeds.
"""

from __future__ import annotations

import numpy as np

from .hashing import stable64u
from .imagecodec import FORMATS, decode, encode, make_pixels, phash64
from .relevance import OFF_TOPIC_VOCAB, ON_TOPIC_VOCAB

NUM_HOSTS = 50
HOSTS = [f"host-{i:02d}.test" for i in range(NUM_HOSTS)]
MAX_LINKS = 8
SAME_HOST_P = 0.70
IMAGE_P = 0.60
OK_P = 0.95

# Zipf(1.2) host popularity — one hot host for the skew path (FIXTURES F2)
_ranks = np.arange(1, NUM_HOSTS + 1, dtype=np.float64)
HOST_WEIGHTS = (1.0 / _ranks**1.2) / np.sum(1.0 / _ranks**1.2)

CAPTION_VOCAB = [
    f"w{i:02d}" for i in range(32)
] + ON_TOPIC_VOCAB  # 64-word fixed vocabulary (FIXTURES F1)


def _words(rng: np.random.Generator, vocab: list[str], lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    idx = rng.integers(0, len(vocab), size=n)
    return " ".join(vocab[int(i)] for i in idx)


def _dirty(url: str, rng: np.random.Generator) -> str:
    """Apply deterministic canonicalization noise to an out-link."""
    r = rng.random(4)
    if r[0] < 0.20:  # uppercase the host
        scheme, rest = url.split("://", 1)
        host, _, tail = rest.partition("/")
        url = f"{scheme}://{host.upper()}/{tail}"
    if r[1] < 0.10:  # explicit default port
        url = url.replace(".test/", ".test:80/", 1)
    if r[2] < 0.30:  # query params in shuffled order
        url += "?b=2&a=1" if r[3] < 0.5 else "?a=1&b=2"
    if rng.random() < 0.20:  # fragment
        url += "#sec"
    return url


def fetch_page(url_canon: str) -> dict:
    """Pure deterministic fetch.  Returns a dict:

    status:int, out_links:list[str] (dirty), link_context:list[str],
    image_id:str|None, image_bytes:bytes|None, w:int, h:int, fmt:str,
    caption:str|None, phash:int|None
    """
    seed = stable64u(url_canon)
    rng = np.random.default_rng(seed)

    status = 200
    if rng.random() >= OK_P:
        status = 404 if rng.random() < 0.5 else 500

    host = url_canon.split("://", 1)[1].split("/", 1)[0] if "://" in url_canon else ""

    out_links: list[str] = []
    contexts: list[str] = []
    image_id = None
    image_bytes = None
    w = h = 0
    fmt = ""
    caption = None
    ph = None

    if status == 200:
        nlinks = int(rng.integers(0, MAX_LINKS + 1))
        for _ in range(nlinks):
            child_host = (
                host
                if rng.random() < SAME_HOST_P
                else HOSTS[int(rng.choice(NUM_HOSTS, p=HOST_WEIGHTS))]
            )
            token = format(int(rng.integers(0, 1 << 48)), "012x")
            clean = f"http://{child_host.lower()}/p/{token}"
            out_links.append(_dirty(clean, rng))
            # per-link topical mix: some links on-topic, some off (FIXTURES F3)
            mix = rng.random()
            n_ctx = int(rng.integers(8, 21))
            ctx_words = []
            for _k in range(n_ctx):
                vocab = ON_TOPIC_VOCAB if rng.random() < mix else OFF_TOPIC_VOCAB
                ctx_words.append(vocab[int(rng.integers(0, len(vocab)))])
            contexts.append(" ".join(ctx_words))

        if rng.random() < IMAGE_P:
            image_id = f"img-{seed % 10**12:012d}"
            w = int(rng.integers(32, 129))
            h = int(rng.integers(32, 129))
            fmt = FORMATS[seed % 3]
            pixels = make_pixels(seed & 0xFFFFFFFF, w, h)
            image_bytes = encode(pixels, fmt)
            caption = "synthetic caption %d: %s" % (
                seed % 10**6,
                _words(rng, CAPTION_VOCAB, 5, 12),
            )
            # phash is defined over the *decoded* pixels (FIXTURES.md F1)
            # so the lossy qraw path hashes what a reader actually sees.
            ph = phash64(decode(image_bytes, fmt))

    return {
        "status": status,
        "out_links": out_links,
        "link_context": contexts,
        "image_id": image_id,
        "image_bytes": image_bytes,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": ph,
    }
