"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB at the same sf, compare
row-count, column names, and values (order-insensitive, columns sorted
by name, floats rounded) — mismatches here would fail CORRECTNESS_r{N}.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from mapreduce_join_comparison_spark import queries_catalog

SF_DIR = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 6)
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ", timespec="microseconds")
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(normalize(v) for v in value)
    return value


def spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(normalize(row[c]) for c in cols) for row in df.collect()),
        key=repr,
    )


def duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = sorted(
        (tuple(normalize(r[i]) for i in order) for r in res.fetchall()),
        key=repr,
    )
    return cols, rows


ORACLE_KEYS = sorted(queries_catalog.ORACLES)
ROWS_ONLY_KEYS = sorted(set(queries_catalog.QUERIES) - set(queries_catalog.ORACLES))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    sdf = queries_catalog.QUERIES[name](spark, SF_DIR)
    scols, srows = spark_rows(sdf)
    dcols, drows = duck_rows(duck, queries_catalog.ORACLES[name])
    assert scols == dcols, f"{name}: column names differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(spark, name):
    sdf = queries_catalog.QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
