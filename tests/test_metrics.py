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


def test_executed_exchange_metrics_counts_real_shuffles(spark, tables):
    from mapreduce_join_comparison_spark.plans.explain import (
        executed_exchange_metrics,
    )

    df = tables["orders"].groupBy("o_orderstatus").count()
    df.collect()
    m = executed_exchange_metrics(df)
    # one hash exchange; its volume is the partial-agg output (1 row
    # per (partition, status) pair present), bounded by 3 statuses x 32
    assert m["exchanges"] == 1
    assert 1 <= m["rows"] <= 3 * 32
    assert m["bytes"] > 0
    assert m["reused"] == 0


def test_executed_exchange_metrics_sees_reuse(spark, tables):
    from pyspark.sql import functions as F

    from mapreduce_join_comparison_spark.plans.explain import (
        executed_exchange_metrics,
    )

    counts = tables["orders"].groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # self-join of an aggregate: the count subtree repeats statically,
    # runtime exchange reuse must collapse the duplicate
    df = counts.alias("a").join(counts.alias("b"), "o_custkey").filter(
        F.col("a.cnt") == F.col("b.cnt")
    )
    df.collect()
    m = executed_exchange_metrics(df)
    assert m["reused"] >= 1
    assert m["exchanges"] >= 1


def test_executed_exchange_metrics_zero_for_narrow_plan(spark, tables):
    from mapreduce_join_comparison_spark.plans.explain import (
        executed_exchange_metrics,
    )

    df = tables["orders"].select("o_orderkey", "o_totalprice").filter(
        "o_totalprice > 0"
    )
    df.collect()
    m = executed_exchange_metrics(df)
    assert m == {"exchanges": 0, "reused": 0, "rows": 0, "bytes": 0}
