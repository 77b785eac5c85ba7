"""Physical-plan audits: assert the plans we designed for are the plans
Catalyst actually picks (pushdown reaches the scan, dimensions broadcast,
top-k avoids global sorts, aggregation stays partial+final). These are
the 100 TB guarantees — a regression here is a scale bug even when
results stay correct."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_DIR
from trembita_spark import contract

contract.load_all()


def plan_of(key: str, spark) -> str:
    df = contract.QUERIES[key](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(key: str, spark) -> str:
    df = contract.QUERIES[key](spark, SF_DIR)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_scan_pushdown_and_pruning(spark):
    plan = plan_of("q_scan_parquet", spark)
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200], (
        "filter must reach the parquet reader"
    )
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_orderdate" not in read_schema, "column pruning must drop unused columns"


def test_flagship_projection_pruned(spark):
    plan = plan_of("q_flagship_q1", spark)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema  # no such col, but assert narrowness:
    assert "l_orderkey" not in read_schema, "agg reads only the 7 needed columns"


def test_dim_join_broadcasts(spark):
    plan = plan_of("q_join_inner", spark)
    assert "BroadcastHashJoin" in plan, "25-row nation must broadcast, not shuffle"
    assert "SortMergeJoin" not in plan


def test_theta_join_broadcast_nested_loop(spark):
    plan = plan_of("q_join_theta", spark)
    assert "BroadcastNestedLoopJoin" in plan


def test_topk_take_ordered(spark):
    plan = plan_of("q_topk", spark)
    assert "TakeOrderedAndProject" in plan, "orderBy+limit must not global-sort"


def test_topk_per_group_window_limit(spark):
    plan = plan_of("q_topk_per_group", spark)
    assert "WindowGroupLimit" in plan, "rank<=k filter should push a group limit below the shuffle"


def test_agg_is_partial_final(spark):
    plan = plan_of("q_agg_basic", spark)
    assert plan.count("HashAggregate") >= 2, "map-side partial agg must precede the shuffle"


def test_semi_join_no_duplication(spark):
    plan = plan_of("q_join_semi", spark)
    assert "LeftSemi" in plan


def test_whole_stage_codegen_covers_flagship(spark):
    # AQE marks the plan final only after execution — run it, then audit.
    df = contract.QUERIES["q_flagship_q1"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, "codegen stage markers (*(n)) must span the agg pipeline"


def test_asof_single_shuffle(spark):
    # the as-of join must be one shuffle (user_id) + window — never a
    # range-explosion join.
    plan = plan_of("q_join_asof", spark)
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert plan.count("Exchange") <= 3  # union sides + window partitioning (AQE may split)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_lsh_no_cartesian(spark):
    plan = plan_of("q_dedup_near", spark)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, (
        "pair expansion must be bucket-local (groupBy+explode), not a self-join"
    )
