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


def global_fetch_order(selected: DataFrame) -> DataFrame:
    """O1 — total fetch order within a round; trace_seq is the rank.

    Scale contract: callers MUST project the payload columns away
    first — rank only slim key columns.  The global row_number window
    single-partitions its input; for key-only rows that is a few MB
    per million URLs, and the per-round selected set is politeness-
    budget-bounded (Σ budgets), never frontier-sized.  Ranking wide
    rows (image bytes) here is the classic all-to-one-partition trap.
    """
    w = Window.orderBy(*order_cols())
    return selected.withColumn("trace_seq", F.row_number().over(w).cast("long"))
