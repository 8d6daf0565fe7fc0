"""Round-5 (session 4) batch 5: nearest as-of join, Benford audit,
truncated-dimension recall — boundary-heavy hand cases (equal-distance
ties, same-instant matches, keyless rows, digit extraction edges,
zero-overlap queries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    benford_digit_audit,
)
from mapreduce_join_comparison_spark.operators.joins import asof_nearest_join
from mapreduce_join_comparison_spark.operators.similarity import (
    truncated_dim_recall,
)


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.select(
        *[c for c in df.columns if c != "us"],
        F.timestamp_micros("us").alias("ts"),
    )


def test_asof_nearest_directions_and_ties(spark):
    left = _ts_df(
        spark,
        [(10, 1, 100), (10, 2, 205), (20, 3, 50), (30, 4, 100)],
        "k bigint, lid bigint, us bigint",
    )
    right = _ts_df(
        spark,
        [(10, 90, 900), (10, 100, 905), (10, 210, 910), (20, 400, 920)],
        "k bigint, us bigint, pay bigint",
    )
    got = {
        r["lid"]: (r["nearest_ts_us"], r["pay"], r["nearest_dist_us"])
        for r in asof_nearest_join(left, right, on="k").collect()
    }
    assert got == {
        1: (100, 905, 0),     # same-instant right row: backward dist 0
        2: (210, 910, 5),     # forward (5) beats backward (105)
        3: (400, 920, 350),   # only a forward match exists
        4: (None, None, None),  # keyless left row survives with NULLs
    }


def test_asof_nearest_equal_distance_prefers_backward(spark):
    left = _ts_df(spark, [(1, 1, 100)], "k bigint, lid bigint, us bigint")
    right = _ts_df(
        spark, [(1, 90, 7), (1, 110, 8)], "k bigint, us bigint, pay bigint"
    )
    r = asof_nearest_join(left, right, on="k").collect()[0]
    assert (r["nearest_ts_us"], r["pay"], r["nearest_dist_us"]) == (90, 7, 10)


def test_asof_nearest_tie_group_survivor_symmetric(spark):
    # two right rows at the SAME timestamp: both directions must pick
    # the max-payload survivor
    left = _ts_df(
        spark, [(1, 1, 100), (1, 2, 300)], "k bigint, lid bigint, us bigint"
    )
    right = _ts_df(
        spark,
        [(1, 200, 5), (1, 200, 9)],
        "k bigint, us bigint, pay bigint",
    )
    got = {
        r["lid"]: r["pay"]
        for r in asof_nearest_join(left, right, on="k").collect()
    }
    assert got == {1: 9, 2: 9}


def test_benford_digit_extraction(spark):
    # digits from exact integer strings: 1, 19, 2, 900 -> 1,1,2,9;
    # zero and negative values are excluded. Since round 6 (advice
    # fix) unobserved digits emit n_obs = 0 rows — the audit must
    # cover the full 1-9 spine so absent digits still contribute chi2
    df = spark.createDataFrame(
        [(v,) for v in [1, 19, 2, 900, 0, -5]], "cents bigint"
    )
    got = {
        r["digit"]: r["n_obs"]
        for r in benford_digit_audit(df, F.col("cents")).collect()
    }
    assert got == {1: 2, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}


def test_benford_expected_follows_law(spark):
    import math

    df = spark.createDataFrame([(v,) for v in range(1, 101)], "cents bigint")
    rows = benford_digit_audit(df, F.col("cents")).collect()
    n = sum(r["n_obs"] for r in rows)
    assert n == 100
    for r in rows:
        want = round(n * math.log10(1 + 1 / r["digit"]), 4)
        assert r["expected"] == pytest.approx(want, abs=1e-4)


def test_truncation_recall_identity_and_orthogonal(spark):
    # corpus where the first 2 dims ARE the full vector -> recall 1.0
    rows = [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.filter("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
    out = truncated_dim_recall(df, q, keep_dims=2, k=3)
    got = {r["query_id"]: r["recall_ppm"] for r in out.collect()}
    assert got == {0: 1_000_000, 1: 1_000_000}


def test_truncation_recall_zero_overlap_emits_row(spark):
    # information lives almost entirely in dims the truncation drops
    # (truncated vectors must stay nonzero — cosine needs a norm): the
    # truncated ranking inverts, overlap at k=1 is 0, and the query
    # still emits a row
    rows = [
        (0, [1.0, 0.0, 10.0, 0.0]),
        (1, [-1.0, 0.0, 9.9, 0.1]),   # full-cosine winner for q0
        (2, [1.0, 0.0, -10.0, 0.0]),  # truncated-cosine winner for q0
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    out = truncated_dim_recall(df, q, keep_dims=2, k=1).collect()
    assert len(out) == 1
    assert (out[0]["n_overlap"], out[0]["recall_ppm"]) == (0, 0)
