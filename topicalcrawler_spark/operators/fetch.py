"""Synthetic-web fetch — U3/S5 (mapInPandas, Arrow-batched).

The sandbox has no network, so "HTTP" is the deterministic pure
function core.synthweb.fetch_page, called batch-at-a-time inside a
mapInPandas operator (the real-web version would swap the body for an
async HTTP client; the Spark plumbing — schema, batching, partitioning
— is identical).  The oracle calls the same fetch_page, so engine and
oracle see an identical web.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..core.synthweb import fetch_page
from ..schemas import FETCHED

_PAYLOAD_COLS = [
    "http_status",
    "out_links",
    "link_context",
    "image_id",
    "image_bytes",
    "img_w",
    "img_h",
    "img_fmt",
    "caption",
    "phash",
]


def fetch_selected(selected: DataFrame) -> DataFrame:
    """Fetch every selected frontier row; emits FETCHED schema rows."""
    frontier_cols = [f.name for f in FETCHED.fields if f.name not in _PAYLOAD_COLS]

    def do_fetch(batches):
        for pdf in batches:
            pages = [fetch_page(u) for u in pdf["url_canon"]]
            out = pdf[[c for c in frontier_cols if c in pdf.columns]].copy()
            out["http_status"] = [p["status"] for p in pages]
            out["out_links"] = [p["out_links"] for p in pages]
            out["link_context"] = [p["link_context"] for p in pages]
            out["image_id"] = [p["image_id"] for p in pages]
            out["image_bytes"] = [p["image_bytes"] for p in pages]
            out["img_w"] = pd.array([p["w"] for p in pages], dtype="int32")
            out["img_h"] = pd.array([p["h"] for p in pages], dtype="int32")
            out["img_fmt"] = [p["fmt"] for p in pages]
            out["caption"] = [p["caption"] for p in pages]
            out["phash"] = pd.array(
                [p["phash"] for p in pages], dtype="Int64"
            )
            yield out

    return selected.select(*[c for c in frontier_cols]).mapInPandas(
        do_fetch, schema=FETCHED
    )
