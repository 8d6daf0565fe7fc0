"""Regression for the round-2 ADVICE finding: ``to_utc_timestamp(ntz,
'UTC')`` is NOT session-timezone independent — Spark 4 implicitly
casts TIMESTAMP_NTZ through ``spark.sql.session.timeZone`` first, so
on a non-UTC machine every NTZ-loaded timestamp used to shift (±hours)
while DuckDB's ``epoch_us(naive)`` did not, silently breaking every
timestamp oracle. The loaders now pin the session zone to UTC before
normalizing; these tests set a hostile zone first and assert the
loaded epoch micros still equal DuckDB's naive reading."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture()
def hostile_tz(spark):
    """Simulate a non-UTC machine: set the session zone the way a
    driver-built vanilla session on a PST box would have it."""
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    yield
    spark.conf.set("spark.sql.session.timeZone", original)


def _duck_epochs(table: str, ts_col: str, key_col: str, n: int = 5):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {key_col}, epoch_us({ts_col}) FROM "
        f"'{SF_SMOKE}/{table}.parquet' ORDER BY {key_col} LIMIT {n}"
    ).fetchall()
    con.close()
    return dict(rows)


@pytest.mark.parametrize(
    "table,ts_col,key_col",
    [("events", "ts", "event_id"), ("orders", "o_orderdate", "o_orderkey")],
)
def test_load_table_epochs_match_duckdb_under_hostile_tz(
    spark, hostile_tz, table, ts_col, key_col
):
    from mapreduce_join_comparison_spark.sources.io import load_table

    df = load_table(spark, SF_SMOKE, table)
    expected = _duck_epochs(table, ts_col, key_col)
    got = {
        r[key_col]: r["us"]
        for r in df.filter(F.col(key_col).isin(list(expected)))
        .select(key_col, F.unix_micros(F.col(ts_col)).alias("us"))
        .collect()
    }
    assert got == expected, (
        f"{table}.{ts_col}: epoch micros diverge from DuckDB's naive-as-UTC "
        f"reading under a non-UTC session zone — the load path lost its pin"
    )


def test_stream_loader_epochs_match_duckdb_under_hostile_tz(spark, hostile_tz):
    import os
    import tempfile

    from mapreduce_join_comparison_spark.streaming.events import (
        load_events_stream,
    )

    stream = load_events_stream(spark, f"{SF_SMOKE}/events.parquet")
    out = os.path.join(tempfile.mkdtemp(prefix="tz_stream_"), "sink")
    q = (
        stream.select("event_id", F.unix_micros("ts").alias("us"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    expected = _duck_epochs("events", "ts", "event_id")
    got = {
        r["event_id"]: r["us"]
        for r in spark.read.parquet(out)
        .filter(F.col("event_id").isin(list(expected)))
        .collect()
    }
    assert got == expected
