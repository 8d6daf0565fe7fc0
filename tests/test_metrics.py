"""Execution-metrics collection (the reference's JoinStats analog,
SURVEY.md §2.11 A2/B3)."""

from __future__ import annotations

import pytest

from mapreduce_join_comparison_spark.operators.joins import equi_join
from mapreduce_join_comparison_spark.plans.metrics import (
    collect_plan_metrics,
    task_time_summary,
    timed_action,
)


def test_timed_action_raises_on_failure(spark, tables):
    bad = tables["orders"].selectExpr("assert_true(o_orderkey < 0) AS x")
    with pytest.raises(Exception):
        timed_action(bad)


def test_collect_plan_metrics_row_counters(spark, tables):
    j = equi_join(tables["customer"], tables["orders"],
                  "c_custkey", "o_custkey", "inner", "broadcast")
    stats = collect_plan_metrics(j)
    assert stats.wall_seconds > 0
    all_rows = [n for counts in stats.operator_rows.values() for n in counts]
    # the join's output row count must appear among operator counters
    assert j.count() in all_rows


def test_task_time_summary_shape(spark, tables):
    tables["orders"].count()
    s = task_time_summary(spark)
    assert set(s) == {"mean_task_ms", "median_task_ms", "max_task_ms"}
    assert s["max_task_ms"] >= s["median_task_ms"] >= 0
