"""SparkSession factory with the engine's standard configuration.

Design notes for scale (SURVEY.md §4): AQE on (skew-join split + shuffle
coalesce), Arrow everywhere, UTC timezone pinned for DuckDB-oracle
comparison, shuffle partitions sized to cores for local mode (a real
cluster deployment would size this to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches carry a fat `bytes` column on the image path (U4) — cap
# records/batch so a batch of encoded images stays well under worker memory.
ARROW_MAX_RECORDS_PER_BATCH = 2048


def get_spark(
    app_name: str = "topicalcrawler_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions default to the core count — the right size for local
    mode where the default 200 just adds scheduling overhead.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers (addPyFile zip).

    Equivalent to ``spark-submit --py-files pkg.zip`` — required
    whenever the driver script is not launched from the repo root, and
    exactly what a multi-executor cluster deployment needs.
    """
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    marker = "_tc_spark_pyfile_shipped"
    if spark.conf.get(f"spark.{marker}", None) == "1":
        return
    import tempfile

    zpath = os.path.join(
        tempfile.gettempdir(), f"topicalcrawler_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark.conf.set(f"spark.{marker}", "1")
