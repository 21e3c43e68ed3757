"""Link-context topical-relevance model (U2) — integer arithmetic only.

Spec (``BASELINE.json:6``): frontier priority = "topical-relevance score
from link-context classification via vectorized pandas/Arrow UDFs".

Design for exact-ordering determinism (SURVEY.md §7 hard part 1): the
score is computed entirely in *integer* arithmetic so the distributed
engine and the single-process oracle produce bit-identical values with
no float-summation-order hazard:

    score_q = (sum(W[bucket(tok)] for tok in tokens) * REL_SCALE)
              // max(1, n_tokens)          # Python/numpy floor division

``W`` is an int32 weight table: rng(42) normal noise, with the on-topic
vocabulary's buckets boosted — a hashed bag-of-words linear classifier
(the standard trick; public knowledge).  The float ``relevance`` column
is display-only: ``score_q / REL_Q_PER_UNIT``.  All ordering uses
``relevance_q`` (int64).
"""

from __future__ import annotations

import numpy as np

from .hashing import token_bucket

NBUCKETS = 1 << 16
REL_SCALE = 1 << 16  # fixed-point sub-scale applied before the length divide
WEIGHT_NOISE_STD = 500
ON_TOPIC_BOOST = 2000
# relevance (float, display) = relevance_q / REL_Q_PER_UNIT
REL_Q_PER_UNIT = REL_SCALE * 1000
# seeds carry relevance 1.0 (FIXTURES.md F6)
SEED_RELEVANCE_Q = REL_Q_PER_UNIT

ON_TOPIC_VOCAB = [
    "spark", "crawl", "frontier", "topical", "image", "caption", "phash",
    "parquet", "arrow", "shuffle", "partition", "broadcast", "bloom",
    "politeness", "robots", "relevance", "queue", "snapshot", "lineage",
    "columnar", "vectorized", "catalyst", "codegen", "executor",
    "watermark", "window", "streaming", "checkpoint", "dedup", "canonical",
    "hash", "cluster",
]
OFF_TOPIC_VOCAB = [
    "pebble", "umbrella", "violin", "pastry", "meadow", "lantern",
    "whistle", "harbor", "copper", "gentle", "marble", "puzzle",
    "ribbon", "saddle", "timber", "velvet", "walnut", "yonder",
    "zephyr", "anchor", "basket", "candle", "dune", "ember",
    "fable", "garnet", "hollow", "ivory", "jasper", "kettle",
    "lagoon", "mosaic",
]

_weights_cache: np.ndarray | None = None


def weights() -> np.ndarray:
    """The int32 weight table — deterministic, built once per process.

    (FIXTURES.md F8 describes a float table; we quantize at *generation*
    time instead of score time so every downstream sum is exact int.)
    """
    global _weights_cache
    if _weights_cache is None:
        rng = np.random.default_rng(42)
        w = np.rint(rng.normal(0.0, WEIGHT_NOISE_STD, NBUCKETS)).astype(np.int64)
        for tok in ON_TOPIC_VOCAB:
            w[token_bucket(tok, NBUCKETS)] += ON_TOPIC_BOOST
        _weights_cache = w
    return _weights_cache


def score_q(text: str) -> int:
    """Integer relevance score of one context string (oracle entry point).

    Buckets are computed directly per token — no memo.  A token-keyed
    cache was measured SLOWER here for realistic short web tokens
    (dict siphash + probe costs more than the crc32 it saves, since
    split() yields fresh str objects every batch) and, keyed by an
    unbounded real-web vocabulary, it was also per-worker memory that
    needed capping.  Deleting it is both the fast and the bounded
    choice; scores are unchanged (the memo was a pure cache).
    """
    w = weights()
    tokens = text.split()
    if not tokens:
        return 0
    total = int(sum(int(w[token_bucket(t, NBUCKETS)]) for t in tokens))
    return (total * REL_SCALE) // len(tokens)


def score_q_batch(texts: list[str] | "np.ndarray") -> np.ndarray:
    """Batch scorer for the pandas UDF — identical arithmetic to score_q."""
    return np.fromiter(
        (score_q(t) if t is not None else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
