"""Round-5 (session 4) batch 9: exact weighted median, multiset set
ops — hand references including the half-weight boundary and
multiplicity arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    weighted_median,
)


def _wm(spark, rows):
    df = spark.createDataFrame(rows, "g string, v bigint, w bigint")
    return {
        r["g"]: (r["total_weight"], r["weighted_median"])
        for r in weighted_median(df, ["g"], F.col("v"), F.col("w")).collect()
    }


def test_weighted_median_hand_case(spark):
    # g: values 1(w3), 2(w1), 10(w2) -> W=6, cum: 3,4,6;
    # 2*cum>=6 first at v=1 (cum 3) -> lower weighted median 1
    got = _wm(spark, [("g", 1, 3), ("g", 2, 1), ("g", 10, 2)])
    assert got == {"g": (6, 1)}


def test_weighted_median_boundary_and_duplicates(spark):
    # duplicate value rows merge: 5(w1)+5(w1)=5(w2), 9(w2) -> W=4,
    # cum at 5 is 2, 2*2>=4 -> median 5 (exactly half the weight)
    got = _wm(spark, [("g", 5, 1), ("g", 5, 1), ("g", 9, 2)])
    assert got == {"g": (4, 5)}


def test_weighted_median_unit_weights_is_lower_median(spark):
    # w=1 everywhere degenerates to the lower median of 1..4 -> 2
    got = _wm(spark, [("g", v, 1) for v in [1, 2, 3, 4]])
    assert got == {"g": (4, 2)}


def test_multiset_semantics(spark):
    # a = [1,1,2,3], b = [1,2,2] ->
    # intersectAll = [1,2] (min multiplicity), exceptAll = [1,3],
    # intersect = {1,2}, subtract = {3}
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k bigint")
    b = spark.createDataFrame([(1,), (2,), (2,)], "k bigint")
    assert a.intersectAll(b).count() == 2
    assert sorted(r["k"] for r in a.exceptAll(b).collect()) == [1, 3]
    assert a.intersect(b).count() == 2
    assert [r["k"] for r in a.subtract(b).collect()] == [3]
