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


def latest_robots(robots: DataFrame, as_of=None) -> DataFrame:
    """J7 — as-of join prep: newest robots row per host with
    fetched_at <= as_of (None = no bound).  Window + row_number, the
    standard Spark as-of idiom."""
    df = robots if as_of is None else robots.filter(F.col("fetched_at") <= F.lit(as_of))
    w = Window.partitionBy("host").orderBy(F.col("fetched_at").desc())
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
