"""Cross-engine type-width guard: DuckDB widens integer SUMs to
HUGEINT (int128), which Spark has no counterpart for — the driver's
value hash then differs even when every value matches (this exact
artifact was round 2's only red, tpch_q12_late_lines). Bind every
oracle's output types here so a new uncast SUM fails fast and locally,
not two rounds later in CORRECTNESS_r{N}.json."""

from __future__ import annotations

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
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(queries_catalog.ORACLES))
def test_oracle_emits_no_hugeint(duck, name):
    rel = duck.sql(queries_catalog.ORACLES[name])
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not offenders, (
        f"{name}: oracle columns {offenders} are HUGEINT — wrap the SUM in "
        f"CAST(... AS BIGINT) so the driver's value hash matches Spark"
    )
