"""Plan-discipline tests (SURVEY.md §4): the scale contract, asserted.

Every flagship query must (a) push its filters into the parquet scan,
(b) read only referenced columns, (c) broadcast tiny dimensions.
These guard the '100 TB would still work' property — a regression
here (e.g. a filter that stops pushing after a refactor) changes
nothing at sf0.001 but everything at scale.
"""

from __future__ import annotations

import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.plans import (
    assert_plan,
    pushed_filters,
    scan_columns,
)
from experiment_flink_cdc_connectors_postgres_datastream_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_project_filter_pushdown_and_pruning(spark):
    df = QUERIES["project_filter"](spark, SF)
    assert any("EqualTo(event_type,click)" in p for p in pushed_filters(df))
    (cols,) = scan_columns(df)
    assert set(cols) == {"event_id", "user_id", "value", "event_type"}


def test_tpch_q1_pushdown_and_pruning(spark):
    df = QUERIES["tpch_q1"](spark, SF)
    assert any("l_shipdate" in p for p in pushed_filters(df))
    (cols,) = scan_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols


def test_tpch_q3_all_three_scans_filtered(spark):
    df = QUERIES["tpch_q3"](spark, SF)
    pushed = pushed_filters(df)
    assert any("c_mktsegment" in p for p in pushed)
    assert any("o_orderdate" in p for p in pushed)
    assert any("l_shipdate" in p for p in pushed)
    for cols in scan_columns(df):
        assert len(cols) <= 4  # no scan reads unreferenced columns


def test_revenue_by_nation_broadcasts_dims(spark):
    df = QUERIES["revenue_by_nation"](spark, SF)
    assert_plan(df, requires=["BroadcastHashJoin"])


def test_derived_key_prunes_scan(spark):
    df = QUERIES["derived_key"](spark, SF)
    (cols,) = scan_columns(df)
    assert set(cols) == {"event_type", "user_id", "event_id"}


def test_compact_latest_single_shuffle_no_sort(spark):
    """max_by-based compaction: one hash aggregate exchange, no
    Window sort in the plan."""
    df = QUERIES["compact_latest"](spark, SF)
    plan = assert_plan(df, forbids=["Window"])
    assert plan.count("Exchange") <= 2  # partial/final agg exchange only


def test_similarity_topk_broadcasts_queries(spark):
    df = QUERIES["similarity_topk"](spark, SF)
    assert_plan(df, requires=["BroadcastNestedLoopJoin"])
