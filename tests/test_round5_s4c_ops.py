"""Round-5 (session 4) batch 3: bitmap exact distinct, table
checksums, snapshot diff, sliding-window distinct.

Bitmap distinct is proven equal to count_distinct AND OR-mergeable
across arbitrary splits; checksums are proven order-independent and
sensitive to single-cell edits; snapshot diff covers all four
classes; sliding distinct is checked against a serial reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    bitmap_distinct,
    table_checksum,
)
from mapreduce_join_comparison_spark.operators.cdc import snapshot_diff
from mapreduce_join_comparison_spark.operators.timeseries import (
    sliding_window_distinct,
)

# ------------------------------------------------------------- bitmap


def test_bitmap_distinct_equals_count_distinct(spark):
    rows = [(g, v) for g in ["x", "y"] for v in [0, 1, 62, 63, 64, 125, 126, 1000]]
    rows += [("x", 0), ("x", 1000), ("y", 63)]  # duplicates
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {
        r["g"]: r["n_distinct"]
        for r in bitmap_distinct(df, ["g"], "v").collect()
    }
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want == {"x": 8, "y": 8}


def test_bitmap_distinct_word_boundaries(spark):
    # 62/63/64 straddle the 63-bit word boundary: 62 is the last bit
    # of word 0; 63 and 64 are bits 0 and 1 of word 1
    df = spark.createDataFrame([("g", v) for v in [62, 63, 64]], "g string, v bigint")
    row = bitmap_distinct(df, ["g"], "v").collect()[0]
    assert (row["n_words"], row["n_distinct"]) == (2, 3)


def test_bitmap_partials_or_merge(spark):
    # the bitmap contract: per-split partial bitmaps OR-merge to the
    # same counts as a direct pass — what makes incremental exact
    # distinct possible (split here is arbitrary: value parity)
    rows = [("g", v) for v in range(0, 400, 3)] + [("g", v) for v in range(0, 400, 5)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    direct = bitmap_distinct(df, ["g"], "v").collect()[0]

    def partial(part):
        return part.groupBy("g", F.expr("v div 63").alias("w")).agg(
            F.bit_or(F.expr("shiftleft(1L, int(v % 63))")).alias("bits")
        )

    merged = (
        partial(df.filter("v % 2 = 0"))
        .unionByName(partial(df.filter("v % 2 = 1")))
        .groupBy("g", "w")
        .agg(F.bit_or("bits").alias("bits"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct"),
        )
        .collect()[0]
    )
    assert (merged["n_words"], merged["n_distinct"]) == (
        direct["n_words"],
        direct["n_distinct"],
    )


# ----------------------------------------------------------- checksum


def _cs(spark, rows):
    df = spark.createDataFrame(rows, "g string, a bigint, b string")
    return {
        r["g"]: (r["n_rows"], r["checksum_sum"], r["checksum_xor"])
        for r in table_checksum(df, ["a", "b"], ["g"]).collect()
    }


def test_checksum_order_independent_and_edit_sensitive(spark):
    base = [("g", 1, "x"), ("g", 2, "y"), ("g", 3, "z")]
    assert _cs(spark, base) == _cs(spark, list(reversed(base)))
    # single-cell edit changes both combiners
    edited = [("g", 1, "x"), ("g", 2, "y"), ("g", 3, "Z")]
    b, e = _cs(spark, base)["g"], _cs(spark, edited)["g"]
    assert b[0] == e[0] and b[1] != e[1] and b[2] != e[2]


def test_checksum_null_vs_empty_distinct(spark):
    a = _cs(spark, [("g", 1, None)])["g"]
    b = _cs(spark, [("g", 1, "")])["g"]
    assert a != b


# -------------------------------------------------------------- diff


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k bigint, v string"
    )
    got = {
        r["k"]: r["diff_class"]
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # 1 removed, 2 unchanged (absent), 3 changed, 4 added
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_snapshot_diff_identical_snapshots_empty(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "k bigint, v string")
    assert snapshot_diff(df, df, ["k"], ["v"]).count() == 0


# ------------------------------------------------------------ sliding


def test_sliding_distinct_serial_reference(spark):
    # hours 0,1,2,30 with overlapping users; 24h trailing window
    h = 3_600_000_000
    rows = [
        (0 * h, 10), (0 * h, 11),
        (1 * h, 10),
        (2 * h, 12), (2 * h + 5, 12),
        (30 * h, 10),
    ]
    df = spark.createDataFrame(rows, "us bigint, uid bigint").select(
        F.timestamp_micros("us").alias("ts"), F.col("uid")
    )
    got = {
        r["slot_start_us"] // h: r["n_distinct"]
        for r in sliding_window_distinct(df, "ts", "uid").collect()
    }
    # active slots: 0,1,2,30. trailing 24h (slots s-23..s):
    # slot 0: users{10,11}=2; slot 1: {10,11}=2; slot 2: {10,11,12}=3;
    # slot 30: events at slots 7..30 -> only slot-30 event: {10}=1
    assert got == {0: 2, 1: 2, 2: 3, 30: 1}


def test_sliding_distinct_only_active_slots(spark):
    h = 3_600_000_000
    df = spark.createDataFrame([(0, 1)], "us bigint, uid bigint").select(
        F.timestamp_micros("us").alias("ts"), F.col("uid")
    )
    rows = sliding_window_distinct(df, "ts", "uid").collect()
    assert len(rows) == 1 and rows[0]["slot_start_us"] == 0
