"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl-scheduler pipeline over
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full
oracle-checked operator registry (topicalcrawler_spark.queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one frontier-scheduling pass — canonicalize dirty
    URLs (U1), extract host (P3), hash (P2), dedup batch (T1), rank
    per-host by the crawl priority key and keep each host's politeness
    budget (W1/P6, salted two-stage) — over URLs synthesized from the
    sf0.001 orders table."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from topicalcrawler_spark.functions import canon_udf, host_expr, url_hash_expr
    from topicalcrawler_spark.operators.politeness import select_per_host_topk
    from topicalcrawler_spark.queries import _dirty_urls
    from topicalcrawler_spark.session import _ship_package

    _ship_package(spark)
    o = _dirty_urls(spark, SF0001)
    orders = spark.read.parquet(f"{SF0001}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    frontier = (
        o.join(orders, "o_orderkey")
        .withColumn("url_canon", canon_udf("url"))
        .withColumn("url_hash", url_hash_expr("url_canon"))
        .withColumn("host", host_expr("url_canon"))
        .withColumn(
            "relevance_q", F.floor(F.col("o_totalprice") * 100).cast("long")
        )
        .withColumn("depth", (F.col("o_orderkey") % 5).cast("int"))
        .withColumn("discovery_seq", F.col("o_orderkey"))
        .withColumn(
            "discovery_time", F.lit("2026-02-01 00:00:00").cast("timestamp")
        )
        .withColumn("budget_per_round", F.lit(4))
        # T1: collapse canonical-form collisions deterministically
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url_canon").orderBy("discovery_seq")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return select_per_host_topk(frontier).select(
        "url_canon", "host", "relevance_q", "depth", "discovery_seq"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from topicalcrawler_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from topicalcrawler_spark.queries import oracle_sql as _o

    return _o()
