"""Per-host politeness scheduling — W1, P6, J3 (the core scheduler op).

Reproduces the reference's priority-queue pop order per round
(``BASELINE.json:6``): within each host, candidates ranked by
(relevance desc, depth asc, discovery_time asc, discovery_seq asc);
the top ``budget_per_round`` are fetched this round, the rest wait.

Skew design (``BASELINE.json:6`` "salted-by-host repartitioning to kill
hot-host skew"): a straight Window.partitionBy(host) puts one mega-host
on one task.  We run a **two-stage top-k**: stage A ranks within
(host, salt = pmod(url_hash, SALT)) — SALT-way parallel, and any row in
a host's true top-k is necessarily in its salt-bucket's top-k, so no
candidate is lost; stage B re-ranks the ≤ SALT·k survivors per host,
which is tiny.  Global correctness is exactly stage B's window — the
salt never changes the result, only the shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import order_cols

SALT = 8


def with_budget(
    frontier: DataFrame, budgets: DataFrame, default_budget: int
) -> DataFrame:
    """J3 — attach per-host budget (broadcast: one row per host)."""
    return frontier.join(F.broadcast(budgets), "host", "left").withColumn(
        "budget_per_round",
        F.coalesce(F.col("budget_per_round"), F.lit(default_budget)),
    )


def with_crawl_delay_cap(
    frontier_with_budget: DataFrame,
    robots_current: DataFrame,
    round_window_s: float,
) -> DataFrame:
    """P5/J3 — cap each host's budget by its robots ``crawl_delay``:
    a host whose robots asks for d seconds between fetches can sustain
    at most floor(round_window_s / d) fetches inside one round window
    (floored at 1 so a long delay defers, never starves, a host).
    Hosts with no robots row or delay <= 0 keep their plain budget.

    JVM-side broadcast join + codegen'd arithmetic; IEEE-double
    division then floor, bit-identical to the oracle's
    ``math.floor(round_window_s / d)`` — trace parity holds exactly.
    """
    delays = robots_current.select("host", "crawl_delay")
    capped = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.lit(float(round_window_s)) / F.col("crawl_delay")),
    )
    return (
        frontier_with_budget.join(F.broadcast(delays), "host", "left")
        .withColumn(
            "budget_per_round",
            F.when(
                F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
                F.least(F.col("budget_per_round").cast("long"), capped),
            )
            .otherwise(F.col("budget_per_round").cast("long"))
            .cast("int"),
        )
        .drop("crawl_delay")
    )


def select_per_host_topk(frontier_with_budget: DataFrame, salt: int = SALT) -> DataFrame:
    """W1/P6 — keep each host's top budget_per_round rows by the shared
    frontier order key.  Two-stage (see module docstring)."""
    df = frontier_with_budget.withColumn(
        "_salt", F.pmod(F.col("url_hash"), F.lit(salt)).cast("int")
    )
    w_a = Window.partitionBy("host", "_salt").orderBy(*order_cols())
    pruned = (
        df.withColumn("_rn_a", F.row_number().over(w_a))
        .filter(F.col("_rn_a") <= F.col("budget_per_round"))
        .drop("_rn_a", "_salt")
    )
    w_b = Window.partitionBy("host").orderBy(*order_cols())
    return (
        pruned.withColumn("_rn", F.row_number().over(w_b))
        .filter(F.col("_rn") <= F.col("budget_per_round"))
        .drop("_rn", "budget_per_round")
    )


def global_rank(
    df: DataFrame,
    order: list,
    out_col: str,
    cache_registry: list,
    partitions: int | None = None,
    base: int = 0,
) -> DataFrame:
    """Scale-safe global dense rank (``base`` + 1-based position in the
    total order ``order``) with NO single-partition window (the round-1
    plan moved whole sets to one task — the driver bench logged five
    `WindowExec: No Partition Defined` warnings):

      1. ``repartitionByRange`` on the order key — partition i holds
         globally-smaller keys than partition i+1 (parallel, sampled
         boundaries);
      2. per-partition counts → each partition's cumulative offset,
         computed as a tiny self-join aggregate over ≤ #partitions rows
         (no window at all, so nothing single-partitions);
      3. rank = base + offset(pid) + row_number within the partition.

    All one declarative plan, and the result is deterministic whenever
    ``order`` is a total order on the rows — boundary placement can
    never change the rank.  Every point of the plan is
    O(rows/partitions) per task.

    ``cache_registry`` (required): the internally persisted ranged
    layout is appended here so the CALLER can unpersist it once the
    result is materialized.  Required, not optional — persist()
    registers a CacheManager entry at call time, so any call site that
    "didn't care" would leak one entry per call, which is exactly the
    per-round leak the registry was introduced to fix (round-3 ADVICE).
    """
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    # persist the ranged layout: BOTH consumers below (the counts
    # subtree and the per-partition rank) must see the SAME sampled
    # range boundaries.  Relying on ReuseExchange alone is fragile
    # (spark.sql.exchange.reuse off, or plan divergence, would let the
    # two subtrees re-sample different boundaries and desync _pid from
    # the offsets) — a persisted partitioning is computed once by
    # construction.
    ranged = (
        df.repartitionByRange(n, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    cache_registry.append(ranged)
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    w_local = Window.partitionBy("_pid").orderBy(*order)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (
                F.lit(base).cast("long")
                + F.col("_off")
                + F.row_number().over(w_local)
            ).cast("long"),
        )
        .drop("_pid", "_off")
    )


def global_fetch_order(
    selected: DataFrame,
    cache_registry: list,
    partitions: int | None = None,
) -> DataFrame:
    """O1 — total fetch order within a round; trace_seq is the rank.

    ``global_rank`` over the frontier order key — exact because
    ``order_cols()`` is a total order (depth then discovery_seq is
    unique — SURVEY.md §7 hard part 1).  Scale contract: callers
    project payload columns away first; the selected set is
    politeness-budget-bounded, and the ranged layout is small and
    LRU-evictable."""
    return global_rank(
        selected, order_cols(), "trace_seq", cache_registry, partitions
    )
