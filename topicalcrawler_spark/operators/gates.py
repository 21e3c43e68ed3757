"""Frontier admission gates — P4 (scheme + depth filter).

The crawl only ever fetches http(s) URLs, and depth-bounds the frontier
so one link farm cannot recurse the crawler to infinity.  A pure
Catalyst predicate: pushes down to the frontier scan, stays inside
whole-stage codegen, and costs zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALLOWED_SCHEMES = ("http://", "https://")


def scheme_depth_predicate(max_depth: int) -> Column:
    scheme_ok = F.col("url_canon").startswith(ALLOWED_SCHEMES[0])
    for s in ALLOWED_SCHEMES[1:]:
        scheme_ok = scheme_ok | F.col("url_canon").startswith(s)
    return (F.col("depth") <= max_depth) & scheme_ok


def scheme_depth_gate(frontier: DataFrame, max_depth: int) -> DataFrame:
    """P4 — drop non-http(s) and over-deep candidates."""
    return frontier.filter(scheme_depth_predicate(max_depth))
