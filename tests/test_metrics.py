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


def test_task_time_summary_reads_real_stages(spark):
    """Regression for the silent-zero bug: AppStatusStore.stageList has
    four Scala default arguments py4j cannot elide, so the old one-arg
    call raised inside the try and every summary came back all-zero.
    After running a real shuffle job the summary must be non-zero."""
    from mapreduce_join_comparison_spark.plans.metrics import (
        task_time_summary,
    )

    spark.range(0, 500_000, 1, 8).selectExpr(
        "id % 97 AS k", "id"
    ).groupBy("k").count().collect()
    s = task_time_summary(spark)
    assert s["max_task_ms"] > 0 and s["mean_task_ms"] > 0


def test_peak_task_metrics_windows_by_stage_checkpoint(spark):
    from mapreduce_join_comparison_spark.plans.metrics import (
        max_stage_id,
        peak_task_metrics,
    )

    c0 = max_stage_id(spark)
    spark.range(0, 500_000, 1, 8).selectExpr(
        "id % 97 AS k", "id"
    ).groupBy("k").count().collect()
    m = peak_task_metrics(spark, since=c0)
    assert m["n_tasks"] > 0
    assert m["max_task_ms"] >= 0
    assert m["max_task_shuffle_read_bytes"] > 0
    # a later checkpoint sees nothing new
    m2 = peak_task_metrics(spark, since=max_stage_id(spark))
    assert m2["n_tasks"] == 0
