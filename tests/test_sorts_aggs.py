"""Sorts / aggregates / plan-quality checks: global order actually
holds across partitions, filters reach the parquet scan, top-k avoids a
global sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    approx_distinct,
    summary_stats,
)
from mapreduce_join_comparison_spark.operators.sorts import (
    top_k,
    top_k_per_group,
    total_order_sort,
)
from mapreduce_join_comparison_spark.plans.explain import physical_plan


def test_total_order_sort_is_globally_ordered(spark, tables):
    df = total_order_sort(
        tables["lineitem"].select("l_extendedprice"), ["l_extendedprice"],
        num_partitions=8,
    )
    vals = [r[0] for r in df.collect()]
    assert vals == sorted(vals)
    # and partition files are range-disjoint: max(part i) <= min(part i+1)
    bounds = (
        df.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .orderBy("p")
        .collect()
    )
    for a, b in zip(bounds, bounds[1:]):
        assert a["hi"] <= b["lo"]


def test_top_k_no_global_sort(spark, tables):
    df = top_k(tables["lineitem"], ["l_extendedprice"], 10)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    top = [r["l_extendedprice"] for r in df.collect()]
    all_sorted = sorted(
        (r[0] for r in tables["lineitem"].select("l_extendedprice").collect()),
        reverse=True,
    )
    assert top == all_sorted[:10]


def test_top_k_per_group(spark, tables):
    df = top_k_per_group(tables["orders"], ["o_custkey"], "o_totalprice", 2)
    counts = df.groupBy("o_custkey").count().collect()
    assert all(r["count"] <= 2 for r in counts)


def test_summary_stats_matches_python(spark, tables):
    import statistics

    row = summary_stats(tables["orders"], "o_totalprice").collect()[0]
    vals = [r[0] for r in tables["orders"].select("o_totalprice").collect()]
    assert row["n"] == len(vals)
    assert abs(row["mean"] - statistics.fmean(vals)) < 1e-6
    assert abs(row["median"] - statistics.median(vals)) < 1e-6
    assert row["min"] == min(vals) and row["max"] == max(vals)


def test_approx_distinct_close_to_exact(spark, tables):
    exact = tables["orders"].select("o_custkey").distinct().count()
    approx = approx_distinct(tables["orders"], "o_custkey").collect()[0][0]
    assert abs(approx - exact) / exact < 0.1


def test_filter_pushed_to_parquet_scan(spark, tables):
    df = tables["lineitem"].filter("l_quantity > 30").select("l_orderkey", "l_quantity")
    plan = physical_plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    # column pruning: ReadSchema carries only the 2 needed columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_resample_locf_gap_fill(spark):
    from datetime import datetime

    from mapreduce_join_comparison_spark.operators.timeseries import resample_locf

    rows = [
        # series "a": events in bins 0 and 2 (60s bins), gap at bin 1
        (1, datetime(2024, 1, 1, 0, 0, 10), "a", 1.0),
        (2, datetime(2024, 1, 1, 0, 0, 50), "a", 2.0),   # last of bin 0
        (3, datetime(2024, 1, 1, 0, 2, 30), "a", 9.0),
        # series "b": only one event, in bin 3 -> leading bins NULL
        (4, datetime(2024, 1, 1, 0, 3, 5), "b", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    out = resample_locf(df, bin_micros=60_000_000)
    got = {
        (r["series"], r["bin_start_us"]): (r["n_events"], r["value_locf"])
        for r in out.collect()
    }
    base = min(us for (s, us) in got if s == "a")  # min bin start
    m = 60_000_000
    # 4 bins per series (global span), 2 series
    assert len(got) == 8
    assert got[("a", base + 0 * m)] == (2, 2.0)   # last-in-bin wins
    assert got[("a", base + 1 * m)] == (0, 2.0)   # gap: count 0, LOCF
    assert got[("a", base + 2 * m)] == (1, 9.0)
    assert got[("a", base + 3 * m)] == (0, 9.0)
    assert got[("b", base + 0 * m)] == (0, None)  # before first obs
    assert got[("b", base + 2 * m)] == (0, None)
    assert got[("b", base + 3 * m)] == (1, 7.0)


def test_data_quality_audit_detects_constructed_violations(spark):
    """Dirty fixture: every constraint class fires with a known count."""
    from pyspark.sql import functions as F

    from mapreduce_join_comparison_spark.operators.aggregates import (
        data_quality_audit,
    )

    rows = [
        (1, 10, 5.0, "O"),
        (2, None, 6.0, "F"),    # null fk
        (3, 99, -1.0, "P"),     # orphan fk + nonpositive
        (3, 10, 7.0, "X"),      # dup key + bad status
    ]
    df = spark.createDataFrame(
        rows, "k bigint, fk bigint, price double, status string"
    )
    dim = spark.createDataFrame([(10,), (20,)], "pk bigint")
    out = {
        r["check_name"]: (r["n_violations"], r["n_checked"])
        for r in data_quality_audit(
            df,
            checks=[
                ("null_fk", F.col("fk").isNull()),
                ("nonpositive_price", F.col("price") <= 0),
                ("bad_status", ~F.col("status").isin("O", "F", "P")),
            ],
            unique_checks=[("dup_k", "k")],
            ref_checks=[("orphan_fk", "fk", dim, "pk")],
        ).collect()
    }
    assert out == {
        "null_fk": (1, 4),
        "nonpositive_price": (1, 4),
        "bad_status": (1, 4),
        "dup_k": (1, 4),
        "orphan_fk": (1, 3),  # null fk excluded from referential check
    }
