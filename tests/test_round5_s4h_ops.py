"""Round-5 (session 4) batch 8: exact two-sample KS, pinned-tie mode,
null-safe join semantics — serial references plus the semantics
corners (identical distributions → D=0, mode tie-break, NULL<=>NULL
matching vs plain equality dropping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    group_mode,
    ks_two_sample,
)


def _ks_df(spark, arm0, arm1):
    rows = [("g", False, v) for v in arm0] + [("g", True, v) for v in arm1]
    return spark.createDataFrame(rows, "g string, arm boolean, v bigint")


def _py_ks(arm0, arm1):
    support = sorted(set(arm0) | set(arm1))
    n0, n1 = len(arm0), len(arm1)
    best = 0
    for x in support:
        c0 = sum(1 for v in arm0 if v <= x)
        c1 = sum(1 for v in arm1 if v <= x)
        best = max(best, abs(c1 * n0 - c0 * n1))
    return best, n0 * n1


def test_ks_identical_distributions_zero(spark):
    vals = [1, 2, 3, 4, 5]
    r = ks_two_sample(
        _ks_df(spark, vals, vals), ["g"], F.col("arm"), F.col("v")
    ).collect()[0]
    assert (r["d_num"], r["ks_d"]) == (0, 0.0)


def test_ks_disjoint_distributions_one(spark):
    r = ks_two_sample(
        _ks_df(spark, [1, 2, 3], [10, 11]), ["g"], F.col("arm"), F.col("v")
    ).collect()[0]
    assert r["ks_d"] == 1.0 and (r["n0"], r["n1"]) == (3, 2)


def test_ks_matches_serial_reference(spark):
    arm0 = [1, 1, 2, 5, 5, 9, 12]
    arm1 = [1, 3, 3, 5, 8, 8]
    r = ks_two_sample(
        _ks_df(spark, arm0, arm1), ["g"], F.col("arm"), F.col("v")
    ).collect()[0]
    d_num, d_den = _py_ks(arm0, arm1)
    assert (r["d_num"], r["d_den"]) == (d_num, d_den)
    assert r["ks_d"] == d_num / d_den


def test_group_mode_tiebreak(spark):
    # g1: 7 and 9 both appear twice -> smallest value (7) wins;
    # g2: clear winner 4
    rows = [("g1", v) for v in [9, 7, 9, 7, 1]] + [("g2", v) for v in [4, 4, 5]]
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {
        r["g"]: (r["mode_value"], r["mode_count"])
        for r in group_mode(df, ["g"], F.col("v")).collect()
    }
    assert got == {"g1": (7, 2), "g2": (4, 2)}


def test_null_safe_join_matches_nulls(spark):
    l = spark.createDataFrame([(1,), (None,), (None,)], "k bigint")
    r = spark.createDataFrame([(1,), (None,), (2,)], "k bigint")
    ns = l.join(r, l["k"].eqNullSafe(r["k"])).count()
    plain = l.join(r, l["k"] == r["k"]).count()
    # null-safe: (1,1) + 2 left-nulls x 1 right-null = 3; plain: 1
    assert (ns, plain) == (3, 1)
