"""CDC operator semantics on literal frames: upsert row fates
(updated / untouched / inserted) and log-compaction survivor choice."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.cdc import (
    latest_per_key,
    merge_aggregates,
    merge_upsert,
)


def test_merge_upsert_row_fates(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, v string, x double"
    )
    got = {r.k: (r.v, r.x) for r in merge_upsert(base, updates, "k").collect()}
    assert got == {
        1: ("a", 10.0),   # untouched base row passes through
        2: ("B", 99.0),   # matched: every update column wins
        3: ("c", 30.0),
        4: ("d", 40.0),   # unmatched update inserts
    }


def test_merge_upsert_null_update_column_overwrites(spark):
    # matched rows take the update row WHOLESALE: an explicit NULL in a
    # non-key update column must overwrite the base value, not keep it
    base = spark.createDataFrame([(1, "a", 10.0)], "k int, v string, x double")
    updates = spark.createDataFrame([(1, None, 99.0)], "k int, v string, x double")
    (row,) = merge_upsert(base, updates, "k").collect()
    assert (row.k, row.v, row.x) == (1, None, 99.0)


def test_merge_upsert_rejects_duplicate_update_keys(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    base = spark.createDataFrame([(1, "a")], "k int, v string")
    updates = spark.createDataFrame([(1, "B"), (1, "C")], "k int, v string")
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        merge_upsert(base, updates, "k").collect()
    assert "duplicate update key" in str(ei.value)


def test_merge_upsert_version_col_compacts_duplicates(spark):
    base = spark.createDataFrame([(1, "a", 0)], "k int, v string, ver int")
    updates = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2)], "k int, v string, ver int"
    )
    (row,) = merge_upsert(base, updates, "k", version_col="ver").collect()
    assert (row.k, row.v, row.ver) == (1, "new", 2)


def test_merge_upsert_is_idempotent(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    updates = spark.createDataFrame([(2, "B")], "k int, v string")
    once = merge_upsert(base, updates, "k")
    twice = merge_upsert(once, updates, "k")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_aggregates_equals_recompute(spark):
    rows = [(i % 4, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "g int, x double")
    from pyspark.sql import functions as F

    def agg(d):
        return d.groupBy("g").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").alias("s"),
        )

    base = agg(df.filter("x < 12"))     # groups 0-3
    delta = agg(df.filter("x >= 12"))   # overlapping + disjoint-ish
    merged = {
        r.g: (r.n, r.s)
        for r in merge_aggregates(base, delta, ["g"], ["n", "s"]).collect()
    }
    want = {r.g: (r.n, r.s) for r in agg(df).collect()}
    assert merged == want


def test_merge_aggregates_one_sided_groups(spark):
    from pyspark.sql import functions as F

    def agg(d):
        return d.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    base = agg(spark.createDataFrame([(1,), (1,), (2,)], "g int"))
    delta = agg(spark.createDataFrame([(3,), (3,)], "g int"))
    merged = {
        r.g: r.n for r in merge_aggregates(base, delta, ["g"], ["n"]).collect()
    }
    assert merged == {1: 2, 2: 1, 3: 2}


def test_latest_per_key_picks_newest_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, 100, 7, "old"),
            (1, 200, 8, "new"),
            (2, 50, 1, "only"),
            (3, 60, 2, "tie-lo"),
            (3, 60, 5, "tie-hi"),  # equal version: higher tiebreak id wins
        ],
        "k int, version long, id long, tag string",
    )
    got = {r.k: r.tag for r in latest_per_key(df, "k", "version", "id").collect()}
    assert got == {1: "new", 2: "only", 3: "tie-hi"}


def test_merge_distinct_sketches_tracks_exact(spark, tables):
    from pyspark.sql import functions as F

    from mapreduce_join_comparison_spark.operators.cdc import (
        merge_distinct_sketches,
    )

    orders = tables["orders"]
    batches = [
        orders.filter(f"o_orderkey % 4 = {i}")
        .groupBy("o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
        for i in range(4)
    ]
    merged = {r["o_orderstatus"]: r["approx_distinct"] for r in
              merge_distinct_sketches(batches, ["o_orderstatus"]).collect()}
    exact = {r["o_orderstatus"]: r["n"] for r in
             orders.groupBy("o_orderstatus")
             .agg(F.count_distinct("o_custkey").alias("n")).collect()}
    assert set(merged) == set(exact)
    for k, n in exact.items():
        assert abs(merged[k] - n) <= 0.05 * n  # lgK=12: rsd ~0.8%


# -------------------------------------------------- incremental join view


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_maintain_join_view_equals_recompute(spark):
    from mapreduce_join_comparison_spark.operators.cdc import (
        maintain_join_view,
        merge_upsert,
    )

    left = _mk(spark, [(1, 10, 5.0), (2, 20, 6.0), (3, 10, 7.0)],
               "id bigint, fk bigint, v double")
    right = _mk(spark, [(10, "x"), (20, "y"), (30, "z")],
                "rk bigint, name string")
    view = left.join(right, F.col("fk") == F.col("rk")).select(
        "id", "fk", "v", "name"
    )
    # delta: reprice id=2, move id=3 to fk=30, insert id=9
    delta = _mk(spark, [(2, 20, 60.0), (3, 30, 7.0), (9, 20, 1.0)],
                "id bigint, fk bigint, v double")
    got = maintain_join_view(view, delta, right, "id", "fk", "rk")
    new_left = merge_upsert(left, delta, "id")
    want = new_left.join(right, F.col("fk") == F.col("rk")).select(
        "id", "fk", "v", "name"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the moved row joined its NEW dim partner
    assert got.filter("id = 3").collect()[0]["name"] == "z"


def test_maintain_join_view_deletes(spark):
    """Delete keys feed the retraction with an empty addition."""
    from mapreduce_join_comparison_spark.operators.cdc import (
        maintain_join_view,
    )

    left = _mk(spark, [(1, 10, 5.0), (2, 20, 6.0)],
               "id bigint, fk bigint, v double")
    right = _mk(spark, [(10, "x"), (20, "y")], "rk bigint, name string")
    view = left.join(right, F.col("fk") == F.col("rk")).select(
        "id", "fk", "v", "name"
    )
    # a delete is a delta row that re-joins nothing: key retracts,
    # nothing is added back
    ghost = _mk(spark, [(2, -1, 0.0)], "id bigint, fk bigint, v double")
    got = maintain_join_view(view, ghost, right, "id", "fk", "rk")
    assert [r["id"] for r in got.collect()] == [1]


def test_maintain_join_view_unmatched_delta_drops(spark):
    from mapreduce_join_comparison_spark.operators.cdc import (
        maintain_join_view,
    )

    left = _mk(spark, [(1, 10, 5.0)], "id bigint, fk bigint, v double")
    right = _mk(spark, [(10, "x")], "rk bigint, name string")
    view = left.join(right, F.col("fk") == F.col("rk")).select(
        "id", "fk", "v", "name"
    )
    delta = _mk(spark, [(1, 99, 5.0)], "id bigint, fk bigint, v double")
    got = maintain_join_view(view, delta, right, "id", "fk", "rk")
    assert got.count() == 0  # fk=99 has no dim row: inner-join semantics


def test_scd2_pointintime_boundaries(spark):
    """Half-open interval semantics: a probe AT valid_from joins that
    version; a probe at valid_to joins the NEXT version; probes after
    the last change join the open current version."""
    import datetime

    from mapreduce_join_comparison_spark.operators.cdc import (
        scd2_history,
        scd2_pointintime_join,
    )

    base = datetime.datetime(2024, 1, 1)

    def t(m):
        return base + datetime.timedelta(minutes=m)

    log = spark.createDataFrame(
        [(1, 7, t(0), "a"), (2, 7, t(10), "b"), (3, 7, t(20), "c")],
        "event_id bigint, user_id bigint, ts timestamp, attr string",
    )
    hist = scd2_history(
        log, key="user_id", attr="attr", version_col="ts",
        tiebreak="event_id",
    ).select(
        "user_id", F.col("attr").alias("dim_attr"),
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "version",
    )
    us = lambda m: int(t(m).timestamp() * 1_000_000)
    probes = spark.createDataFrame(
        [(100, 7, us(0)), (101, 7, us(10)), (102, 7, us(15)),
         (103, 7, us(99))],
        "probe_id bigint, user_id bigint, probe_us bigint",
    )
    got = {
        r["probe_id"]: r["dim_attr"]
        for r in scd2_pointintime_join(
            hist, probes, key="user_id", ts_col="probe_us"
        ).collect()
    }
    assert got == {100: "a", 101: "b", 102: "b", 103: "c"}
