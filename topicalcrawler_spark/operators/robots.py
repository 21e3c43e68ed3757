"""Robots enforcement — J2 (broadcast join), J7 (as-of), P5 (predicate).

All JVM-side: the longest-prefix decision is a higher-order array
expression (functions.robots_allowed_expr), so the robots gate runs
inside whole-stage codegen with zero Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import path_expr, robots_allowed_expr


def robots_content_keys(
    rules_col: str = "rules", delay_col: str = "crawl_delay"
) -> list[F.Column]:
    """Canonical content sort keys of a robots row — the DETERMINISTIC
    tie-break for rows sharing (host, fetched_at).  row_number over
    fetched_at alone returns whichever tied row a partition happens to
    deliver first (run-to-run nondeterminism, and divergence from the
    pure-Python oracle); physical row order is not a thing a
    distributed table can offer, so ties break on CONTENT.

    TWO keys, not one concatenated string: the crawl_delay compares as
    a DOUBLE on both sides (stringifying it would diverge — Spark's
    CAST(double AS STRING) switches to scientific notation below 1e-3,
    Python's repr below 1e-4, so '0.1' < '5.0E-4' while 0.0005 < 0.1),
    with NULL (no Crawl-delay directive) ordered first on both sides.
    The rules key is length-prefixed ('<len>:<prefix><flag>', flag
    '+'/'-'/'?' for allow true/false/NULL, NULL prefix as ''), which
    makes the encoding injective — a '|' inside a prefix can no longer
    alias two different rule lists — and NULL-safe: every element is
    non-null, a NULL rules array keys as ''.  Both orderings are
    byte-wise: Spark compares UTF-8 bytes, Python code points, and
    UTF-8 is code-point-order-preserving.  tests/oracle_crawler +
    sources/fixtures implement the same key."""
    rules_key = F.coalesce(
        F.array_join(
            F.expr(
                f"""
                transform({rules_col}, r -> concat(
                  cast(length(coalesce(r.prefix, '')) as string), ':',
                  coalesce(r.prefix, ''),
                  CASE WHEN r.allow IS NULL THEN '?'
                       WHEN r.allow THEN '+' ELSE '-' END))
                """
            ),
            "|",
        ),
        F.lit(""),
    )
    return [rules_key.asc(), F.col(delay_col).asc_nulls_first()]


def latest_robots(robots: DataFrame, as_of=None) -> DataFrame:
    """J7 — as-of join prep: newest robots row per host with
    fetched_at <= as_of (None = no bound).  Window + row_number, the
    standard Spark as-of idiom; ties on fetched_at break on the
    content keys (see robots_content_keys) so the pick is deterministic
    and oracle-matched."""
    df = robots if as_of is None else robots.filter(F.col("fetched_at") <= F.lit(as_of))
    w = Window.partitionBy("host").orderBy(
        F.col("fetched_at").desc(), *robots_content_keys()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_robots_decision(frontier: DataFrame, robots_current: DataFrame) -> DataFrame:
    """J2 + P5 — broadcast-join current rules, mark each row allowed."""
    return (
        frontier.withColumn("path", path_expr("url_canon"))
        .join(F.broadcast(robots_current.select("host", "rules")), "host", "left")
        .withColumn("robots_allowed", robots_allowed_expr("path", "rules"))
        .drop("path", "rules")
    )
