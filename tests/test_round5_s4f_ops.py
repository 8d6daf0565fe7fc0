"""Round-5 (session 4) batch 6: exact-decimal OLS fit,
gaps-and-islands, time-to-convert — hand cases against closed-form
references, plus the degenerate/boundary paths (constant x, single-day
islands, never-converted users, conversion AT the start instant)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    group_linear_fit,
)
from mapreduce_join_comparison_spark.operators.timeseries import (
    activity_islands,
    time_to_convert,
)

DAY = 86_400_000_000


def test_linear_fit_exact_line(spark):
    # y = 3x + 7 exactly -> slope 3, intercept 7, r = 1
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    r = group_linear_fit(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert (r["slope"], r["intercept"], r["pearson_r"]) == (3.0, 7.0, 1.0)


def test_linear_fit_matches_closed_form(spark):
    xs = [1, 2, 4, 8, 16, 32]
    ys = [5, 3, 11, 2, 40, 9]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x bigint, y bigint"
    )
    r = group_linear_fit(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    numer = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    assert r["slope"] == pytest.approx(numer / denx, rel=1e-12)
    assert r["pearson_r"] == pytest.approx(
        numer / math.sqrt(denx * deny), rel=1e-12
    )


def test_linear_fit_constant_x_null(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2)], "g string, x bigint, y bigint"
    )
    r = group_linear_fit(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert r["slope"] is None and r["pearson_r"] is None


def test_activity_islands_hand_case(spark):
    # user 1 active days 0,1,2, 5, 7,8 -> islands [0-2],[5],[7-8]
    # user 2 active day 3 only (two events same day collapse)
    rows = [(1, d * DAY) for d in [0, 1, 2, 5, 7, 8]] + [
        (1, 1 * DAY + 5),  # second event on day 1: still one active day
        (2, 3 * DAY), (2, 3 * DAY + 9),
    ]
    df = spark.createDataFrame(rows, "u bigint, us bigint").select(
        "u", F.timestamp_micros("us").alias("ts")
    )
    got = {
        r["u"]: (
            r["active_days"], r["n_islands"], r["longest_streak"],
            r["first_day"], r["last_day"],
        )
        for r in activity_islands(df, "u", "ts").collect()
    }
    assert got == {1: (6, 3, 3, 0, 8), 2: (1, 1, 1, 3, 3)}


def test_time_to_convert_hand_case(spark):
    # u1: signup@10, purchase@30 -> lat 20
    # u2: purchase@5 BEFORE signup@10, purchase@10 AT signup -> lat 0
    # u3: signup@10, never converts -> counted started, lat NULL
    # u4: purchase only -> not started, excluded entirely
    rows = [
        (1, "signup", 10), (1, "purchase", 30),
        (2, "purchase", 5), (2, "signup", 10), (2, "purchase", 10),
        (3, "signup", 10),
        (4, "purchase", 99),
    ]
    df = spark.createDataFrame(rows, "u bigint, t string, us bigint").select(
        "u", F.col("t").alias("event_type"),
        F.timestamp_micros("us").alias("ts"),
    )
    r = time_to_convert(df, "u", "ts", "event_type", "signup", "purchase").collect()[0]
    assert (r["n_started"], r["n_converted"]) == (3, 2)
    assert (r["min_lat_us"], r["max_lat_us"]) == (0, 20)
    assert r["p50_lat_us"] == 10.0  # interpolated midpoint of {0, 20}
