"""operators.stats — scale-safe exact percentiles (A7).

Pins `exact_grouped_percentiles` to Spark's built-in buffering
``percentile`` aggregate (the definition DuckDB's quantile_cont also
implements) on adversarial shapes: heavy ties, group sizes 1/2/odd/
even, a single-distinct-value group (the lo == hi zero-width bucket
branch), negative values, NULLs, boundary percentiles 0.0 and 1.0,
and far more distinct values than buckets (forcing multi-bucket
prefix offsets to matter).  The built-in is fine as an oracle at test
scale — it is only unusable at the sf10+ tier (see stats.py module
docstring for the round-5 sweep JVM-kill finding).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from topicalcrawler_spark.operators.stats import exact_grouped_percentiles

PS = [0.0, 0.25, 0.5, 0.95, 1.0]


def _reference(spark, df, ps):
    exprs = [
        F.expr(f"percentile(v, CAST({p!r} AS DOUBLE))").alias(f"r{i}")
        for i, p in enumerate(ps)
    ]
    rows = df.groupBy("g").agg(*exprs).collect()
    return {
        (r["g"], float(p)): r[f"r{i}"]
        for r in rows
        for i, p in enumerate(ps)
    }


def _engine(df, ps, n_buckets):
    out = exact_grouped_percentiles(df, "g", "v", ps, n_buckets=n_buckets)
    return {(r["g"], r["p"]): r["v"] for r in out.collect()}


def _assert_matches(got, want):
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9, rel=1e-12), (k, got[k], v)


def test_exact_percentiles_adversarial_shapes(spark):
    rng = random.Random(1205)
    rows = []
    # g=a: heavy ties from a tiny domain, odd count
    rows += [Row(g="a", v=float(rng.choice([1, 2, 2, 2, 7]))) for _ in range(501)]
    # g=b: even count, negatives, wide spread
    rows += [Row(g="b", v=rng.uniform(-1e6, 1e6)) for _ in range(500)]
    # g=c: single row
    rows += [Row(g="c", v=42.5)]
    # g=d: two rows (every p interpolates between them)
    rows += [Row(g="d", v=-3.0), Row(g="d", v=9.0)]
    # g=e: one distinct value repeated (lo == hi -> bucket 0 branch)
    rows += [Row(g="e", v=5.0) for _ in range(97)]
    # g=f: mostly NULLs
    rows += [Row(g="f", v=None) for _ in range(20)]
    rows += [Row(g="f", v=float(i)) for i in range(5)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, schema="g string, v double").repartition(7)

    want = _reference(spark, df, PS)
    # n_buckets=4 << distinct values: multi-bucket offsets do real work
    _assert_matches(_engine(df, PS, n_buckets=4), want)
    _assert_matches(_engine(df, PS, n_buckets=1024), want)


def test_exact_percentiles_many_distinct_randomized(spark):
    rng = random.Random(77)
    rows = [
        Row(g=g, v=round(rng.uniform(0, 1000), 2))
        for g in ("x", "y")
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, schema="g string, v double").repartition(13)
    ps = [0.01, 0.33, 0.66, 0.99]
    want = _reference(spark, df, ps)
    got = _engine(df, ps, n_buckets=16)
    _assert_matches(got, want)
    assert all(math.isfinite(v) for v in got.values())


def test_exact_percentiles_rejects_bad_ps(spark):
    df = spark.createDataFrame([Row(g="a", v=1.0)])
    with pytest.raises(ValueError):
        exact_grouped_percentiles(df, "g", "v", [])
    with pytest.raises(ValueError):
        exact_grouped_percentiles(df, "g", "v", [1.5])


def test_exact_percentiles_all_null_group_absent(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="z", v=None)], schema="g string, v double"
    )
    got = _engine(df, [0.5], 8)
    assert got == {("a", 0.5): 1.0}
