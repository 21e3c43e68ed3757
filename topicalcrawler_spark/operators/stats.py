"""Scale-safe exact order statistics (A7).

Why this module exists — the round-5 sf10 sweep finding.  Spark's
built-in ``percentile`` aggregate is *exact* by buffering every value
of a group in the aggregation buffer (an OpenHashMap of boxed values
per partial buffer).  ``percentiles_lineitem`` originally evaluated
FOUR of those over the full ``l_extendedprice`` column: fine at sf1
(6 s), but at sf10 (~60 M rows x 32 local executor threads x 4
independent buffers) the partial buffers alone exceed the 8 GiB heap
and kill the JVM — precisely the "works at N, dies at 10N" class the
per-tier registry sweeps exist to catch, and a non-starter on a 100 TB
cluster where a single column is terabytes.

The replacement computes the *same* exact interpolated percentile
(the (n-1)*p linear-interpolation definition shared by Spark's
``percentile`` and DuckDB's ``quantile_cont``) with bounded state
everywhere:

1. **Value compression** — ``groupBy(group, value).count()``: a
   map-side-combining aggregation whose output is bounded by the
   *value domain*, not the row count.  60 M lineitem rows compress to
   ~1 M distinct (flag, price) rows; at 100 TB the TPC-H price domain
   is still bounded (quantity 1-50 x a fixed retail-price lattice).
2. **Two-pass distributed cumulative count** — no global
   one-task-per-group window.  Each distinct value is assigned a
   deterministic range bucket from the group's (min, max) span
   (broadcast from a tiny per-group aggregate); a window per
   (group, bucket) computes the within-bucket running count, and
   per-bucket totals (<= n_buckets rows per group) are prefix-summed
   in a second, trivially small window, then broadcast back as
   offsets.  Every window task is bounded by one bucket's distinct
   values.  Buckets are a pure function of the value, so the plan has
   no nondeterministic self-join (a ``spark_partition_id`` +
   ``repartitionByRange`` prefix-sum would rely on the sampled range
   exchange being reused, not recomputed, across its self-join).
3. **Rank bracketing** — each percentile needs only the values at
   ranks floor(r) and floor(r)+1, r = (n-1)*p.  The cumulative table
   is joined against a broadcast of (group, p, i, frac) targets and
   reduced; output is one row per (group, p).

For value domains that genuinely grow without bound (so step 1 stops
compressing), exact percentiles are the wrong tool at scale — callers
should use ``approx_percentile``'s mergeable sketch; the
``percentiles_lineitem`` entry carries both and asserts the sketch
lands within 1% of the exact answer.

SURVEY.md §2 A7.  No reference file citation: /root/reference is
empty (SURVEY.md §0); BASELINE.json's north rule is the binding spec.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: Sequence[float],
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact interpolated percentiles per group, bounded-state plan.

    Returns a DataFrame ``(group_col, p double, v double)`` with one
    row per (group, percentile).  NULL values are ignored (matching
    ``percentile`` / ``quantile_cont``); a group with zero non-null
    values yields no rows.  ``ps`` must be in [0, 1].

    The heaviest single task touches O(distinct-values-per-bucket)
    rows; pick ``n_buckets`` so domain/n_buckets fits a task.  Skewed
    value distributions concentrate distinct values in few buckets —
    acceptable for roughly uniform numeric domains (prices, sizes);
    for pathological domains raise ``n_buckets``.
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    if any(p < 0.0 or p > 1.0 for p in ps):
        raise ValueError(f"percentiles must be in [0, 1]: {ps}")

    g, v = F.col(group_col), F.col(value_col)

    # 1. value compression (map-side combine; output ~ value domain)
    counts = (
        df.where(v.isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )

    # deterministic bucket from the group's value span (tiny broadcast)
    span = counts.groupBy(group_col).agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width: Column = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("_lo")) / width),
            F.lit(n_buckets - 1),
        )
    )
    c = (
        counts.join(F.broadcast(span), group_col)
        .withColumn("_bkt", bucket.cast("long"))
        .drop("_lo", "_hi")
    )

    # 2. two-pass cumulative count: within-bucket running sum, then
    #    per-bucket prefix offsets (<= n_buckets rows per group)
    w_in = (
        Window.partitionBy(group_col, "_bkt")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = c.withColumn("_local_end", F.sum("_cnt").over(w_in))

    btot = c.groupBy(group_col, "_bkt").agg(F.sum("_cnt").alias("_btot"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = btot.withColumn(
        "_off", F.sum("_btot").over(w_off) - F.col("_btot")
    )

    c = (
        c.join(F.broadcast(off), [group_col, "_bkt"])
        .withColumn("_end", F.col("_local_end") + F.col("_off"))
        .withColumn("_start", F.col("_end") - F.col("_cnt"))
    )

    # 3. rank targets (tiny broadcast): r = (n-1)*p, bracket i / i+1
    totals = off.groupBy(group_col).agg(F.sum("_btot").alias("_n"))
    targets = (
        totals.select(
            group_col,
            "_n",
            F.explode(
                F.array(*[F.lit(float(p)) for p in ps])
            ).alias("p"),
        )
        .withColumn("_r", (F.col("_n") - 1).cast("double") * F.col("p"))
        .withColumn("_i", F.floor("_r"))
        .withColumn("_frac", F.col("_r") - F.col("_i"))
    )

    i = F.col("_i")
    hit = c.join(F.broadcast(targets), group_col).where(
        (F.col("_end") > i) & (F.col("_start") <= i + 1)
    )
    lo_hit = (F.col("_start") <= i) & (F.col("_end") > i)
    hi_hit = (F.col("_start") <= i + 1) & (F.col("_end") > i + 1)
    per = hit.groupBy(group_col, "p", "_frac").agg(
        F.min(F.when(lo_hit, F.col(value_col))).alias("_vlo"),
        F.min(F.when(hi_hit, F.col(value_col))).alias("_vhi"),
    )
    vlo, vhi = F.col("_vlo"), F.coalesce(F.col("_vhi"), F.col("_vlo"))
    return per.select(
        group_col,
        "p",
        (vlo + F.col("_frac") * (vhi - vlo)).alias("v"),
    )
