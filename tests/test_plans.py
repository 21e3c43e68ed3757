"""Physical-plan shape assertions (SURVEY.md §4): the optimizations we
rely on must actually appear in `explain` output — pushed filters,
broadcast joins for dims, no nested-loop joins on the band join, and
whole-stage codegen on the hot relational path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topicalcrawler_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_in_scan(spark):
    # 3-column projection must not read the full 16-column lineitem
    plan = _plan(spark, "pricing_summary")
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_dims_broadcast_in_star_join(spark):
    plan = _plan(spark, "revenue_by_nation")
    assert "BroadcastHashJoin" in plan


def test_band_join_is_not_nested_loop(spark):
    # equi band key (user_id) must make the planner pick a hash or
    # sort-merge join, never BroadcastNestedLoop
    plan = _plan(spark, "event_pairs_band_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_whole_stage_codegen_on_agg_path(spark):
    # AQE wraps the plan before execution, hiding codegen subtrees
    # from explain — disable it just for this compile-time check
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["pricing_summary"].fn(spark, SF)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in plan
    n = int(plan.split("WholeStageCodegen subtrees")[0].rsplit("Found", 1)[1])
    assert n >= 1


def test_semi_and_anti_join_operators(spark):
    assert "LeftSemi" in _plan(spark, "semi_join_customers")
    assert "LeftAnti" in _plan(spark, "anti_join_customers")


def test_no_python_udf_in_pure_relational_queries(spark):
    # 2.H families and the TPC-H surface must stay JVM-side
    for name in ("pricing_summary", "revenue_by_nation", "window_rank_orders",
                 "string_functions_part", "simhash_docs", "fingerprint_docs"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
