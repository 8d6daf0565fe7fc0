"""Round-5 (session 4) batch 4: linear attribution, two-proportion
z-test, Tukey outlier fences — hand-computed references including the
boundary cases (lookback edges, empty arms, fence equality)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    group_outlier_fences,
    two_proportion_ztest,
)
from mapreduce_join_comparison_spark.operators.timeseries import (
    linear_attribution,
)

H = 3_600_000_000


def _events(spark, rows):
    # rows: (user, event_id, us, type, value)
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, us bigint, event_type string, value double"
    ).select(
        "user_id", "event_id",
        F.timestamp_micros("us").alias("ts"),
        "event_type", "value",
    )


# ---------------------------------------------------------- attribution


def test_attribution_hand_case(spark):
    # user 1: click@0h, view@1h, purchase@2h val 10.0 -> 2 touches,
    #   each credited 10000 div 2 = 5000 milli
    # user 2: click@0h, purchase@30h val 7.77 (1h lookback excludes it);
    #   with 168h default the click IS inside -> 7770 div 1
    rows = [
        (1, 1, 0 * H, "click", 0.0),
        (1, 2, 1 * H, "view", 0.0),
        (1, 3, 2 * H, "purchase", 10.0),
        (2, 4, 0 * H, "click", 0.0),
        (2, 5, 30 * H, "purchase", 7.77),
    ]
    got = {
        r["touch_type"]: (r["n_credits"], r["attributed_milli"], r["n_convs_reached"])
        for r in linear_attribution(
            _events(spark, rows), "user_id", "event_id", "ts",
            "event_type", "value", "purchase", ["click", "view"],
        ).collect()
    }
    assert got == {"click": (2, 5000 + 7770, 2), "view": (1, 5000, 1)}


def test_attribution_window_boundaries(spark):
    # touch exactly at conv ts is EXCLUDED (strict <); touch exactly
    # lookback earlier is INCLUDED (>= cus - lookback)
    lb = 24
    rows = [
        (1, 1, 24 * H, "purchase", 1.0),
        (1, 2, 24 * H, "click", 0.0),   # same instant: excluded
        (1, 3, 0 * H, "click", 0.0),    # exactly 24h before: included
    ]
    got = linear_attribution(
        _events(spark, rows), "user_id", "event_id", "ts",
        "event_type", "value", "purchase", ["click"], lookback_hours=lb,
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_credits"], r["attributed_milli"]) == (1, 1000)


def test_attribution_no_touches_no_rows(spark):
    rows = [(1, 1, 0, "purchase", 5.0)]
    assert (
        linear_attribution(
            _events(spark, rows), "user_id", "event_id", "ts",
            "event_type", "value", "purchase", ["click"],
        ).count()
        == 0
    )


# ---------------------------------------------------------------- ztest


def test_ztest_hand_case(spark):
    # arm True: 4 trials 3 successes; arm False: 4 trials 1 success
    rows = [("g", True, s) for s in [1, 1, 1, 0]] + [
        ("g", False, s) for s in [1, 0, 0, 0]
    ]
    df = spark.createDataFrame(rows, "g string, arm boolean, succ int")
    r = two_proportion_ztest(
        df, ["g"], F.col("arm"), F.col("succ") == 1
    ).collect()[0]
    assert (r["n1"], r["s1"], r["n0"], r["s0"]) == (4, 3, 4, 1)
    p1, p0, p = 3 / 4, 1 / 4, 4 / 8
    want = (p1 - p0) / math.sqrt(p * (1 - p) * (1 / 4 + 1 / 4))
    assert r["z"] == pytest.approx(want, rel=1e-12)


def test_ztest_empty_arm_null_z(spark):
    df = spark.createDataFrame(
        [("g", True, 1), ("g", True, 0)], "g string, arm boolean, succ int"
    )
    r = two_proportion_ztest(
        df, ["g"], F.col("arm"), F.col("succ") == 1
    ).collect()[0]
    assert r["n0"] == 0 and r["z"] is None


# --------------------------------------------------------------- fences


def test_fences_hand_case(spark):
    # vm = 0..8 plus outliers -100 and 100: n=11 values.
    # sorted: -100,0,1,..,8,100; q1 at pos (11-1)*.25=2.5 -> 1.5;
    # q3 at pos 7.5 -> 6.5; iqr=5 -> lo=-6, hi=14 -> low={-100}, high={100}
    vals = [-100, 0, 1, 2, 3, 4, 5, 6, 7, 8, 100]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, vm bigint")
    r = group_outlier_fences(df, ["g"], F.col("vm")).collect()[0]
    assert (r["n"], r["q1_milli"], r["q3_milli"], r["n_low"], r["n_high"]) == (
        11, 1.5, 6.5, 1, 1,
    )


def test_fences_boundary_value_not_outlier(spark):
    # value exactly ON the fence is not an outlier (strict comparison):
    # vals 0,4,8,12,16 -> q1=4, q3=12, iqr=8, lo=-8, hi=24; add -8 & 24
    vals = [0, 4, 8, 12, 16]
    df = spark.createDataFrame(
        [("g", v) for v in vals + [-8, 24]], "g string, vm bigint"
    )
    r = group_outlier_fences(df, ["g"], F.col("vm")).collect()[0]
    # with the extra points quartiles shift; recompute: n=7 sorted
    # -8,0,4,8,12,16,24; q1 pos 1.5 -> 2.0; q3 pos 4.5 -> 14; iqr=12
    # lo=2-18=-16, hi=14+18=32 -> nothing outside
    assert (r["q1_milli"], r["q3_milli"], r["n_low"], r["n_high"]) == (
        2.0, 14.0, 0, 0,
    )
