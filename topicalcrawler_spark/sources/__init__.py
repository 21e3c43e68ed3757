"""Sources: parquet scans over the driver test tables + seed lists."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEST_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def scan(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """S1 — parquet scan of one driver test table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_seeds(spark: SparkSession, path: str) -> DataFrame:
    """S4 — seed-list source: text file, one URL per line, line number
    becomes the deterministic discovery sequence (1-based)."""
    from pyspark.sql.window import Window

    raw = (
        spark.read.text(path)
        .withColumnRenamed("value", "url")
        .filter(F.length(F.trim("url")) > 0)  # blank lines are not URLs
    )
    # line numbers: a seed file is tiny (hundreds of rows) — a single
    # global window here is fine; at scale seeds would carry explicit ids.
    w = Window.orderBy(F.monotonically_increasing_id())
    return raw.coalesce(1).withColumn(
        "discovery_seq", F.row_number().over(w).cast("long")
    )
