"""Sources: parquet scans over the driver test tables + seed lists."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    becomes the deterministic discovery sequence (1-based).

    Line numbers come from RDD ``zipWithIndex``: deterministic because
    text-file split order and in-split line order are fixed by the file
    bytes — never ``monotonically_increasing_id`` (partition-dependent,
    banned by SURVEY.md §7 hard part 1) and never a one-partition
    global window (a round-1 WindowExec warning source).  Scale-safe:
    zipWithIndex adds one tiny per-partition count job and no
    all-to-one point."""
    rdd = (
        spark.sparkContext.textFile(path)
        .filter(lambda line: line.strip() != "")  # blank lines are not URLs
        .zipWithIndex()
        .map(lambda t: (t[0], t[1] + 1))
    )
    return spark.createDataFrame(rdd, "url string, discovery_seq long")
