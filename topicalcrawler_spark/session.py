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
        # default = core count (right for local mode at the driver's
        # SFs); $SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for derived
        # big tiers (sf100: 32 partitions of a 600M-row shuffle spill;
        # a cluster deployment sizes this to ~2-3x total cores and
        # lets AQE coalesce back down)
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")
        ) or max(int(cpus), 4)

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
    import hashlib
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    marker = "_tc_spark_pyfile_shipped"
    if spark.conf.get(f"spark.{marker}", None) == "1":
        return

    # Collect sources and key the archive by their CONTENT hash — a
    # name keyed by pid alone could reuse a stale or truncated zip
    # left by an earlier process with a recycled pid, silently shipping
    # outdated package code to the executors (results would drift from
    # the oracle with no error).  Same content → same name → safe reuse.
    sources: list[tuple[str, str]] = []
    h = hashlib.blake2b(digest_size=8)
    for root, dirs, files in os.walk(pkg_dir):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                sources.append((full, rel))
                h.update(rel.encode())
                with open(full, "rb") as f:
                    h.update(f.read())
    # the archive name carries the uid as well as the content hash:
    # mkstemp files are 0600, so on a shared-tempdir machine another
    # user running the same checkout must get their OWN archive rather
    # than finding ours unreadable (and being unable to replace it in a
    # sticky-bit /tmp)
    uid = os.getuid() if hasattr(os, "getuid") else 0
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"topicalcrawler_spark_{uid}_{h.hexdigest()}.zip",
    )
    if not os.path.exists(zpath):
        # write-then-rename so a crash mid-write can never leave a
        # truncated archive at the final name
        fd, tmp = tempfile.mkstemp(
            suffix=".zip", dir=tempfile.gettempdir()
        )
        os.close(fd)
        try:
            with zipfile.ZipFile(tmp, "w") as zf:
                for full, rel in sources:
                    zf.write(full, rel)
            os.replace(tmp, zpath)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    spark.sparkContext.addPyFile(zpath)
    spark.conf.set(f"spark.{marker}", "1")
