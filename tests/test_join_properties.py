"""Property-based join correctness (hypothesis): random small tables,
every physical strategy and join type must agree with DuckDB's answer
— including duplicate keys (per-key cross product), non-matching keys,
NULL keys (never match), empty tables, and non-ASCII values.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_join_comparison_spark.operators.joins import equi_join

from conftest import rows_set

KEYS = st.one_of(st.integers(min_value=0, max_value=8), st.none())
VALS = st.text(alphabet="abxyzü ,", min_size=0, max_size=4)
TABLE = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=25)

SCHEMA = "k: bigint, v: string"


def duck_join(left, right, how):
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, v VARCHAR)")
    con.execute("CREATE TABLE r (k BIGINT, w VARCHAR)")
    if left:
        con.executemany("INSERT INTO l VALUES (?, ?)", left)
    if right:
        con.executemany("INSERT INTO r VALUES (?, ?)", right)
    sql = {
        "inner": "SELECT l.k, l.v, r.w FROM l JOIN r ON l.k = r.k",
        "left": "SELECT l.k, l.v, r.w FROM l LEFT JOIN r ON l.k = r.k",
        "left_semi": "SELECT k, v FROM l WHERE EXISTS"
                     " (SELECT 1 FROM r WHERE r.k = l.k)",
        "left_anti": "SELECT k, v FROM l WHERE NOT EXISTS"
                     " (SELECT 1 FROM r WHERE r.k = l.k)",
    }[how]
    rows = sorted((tuple(t) for t in con.execute(sql).fetchall()), key=repr)
    con.close()
    return rows


def run_spark_join(spark, left, right, how, strategy):
    ldf = spark.createDataFrame(left, schema=SCHEMA)
    rdf = spark.createDataFrame(
        [(k, w) for k, w in right], schema="k2: bigint, w: string"
    )
    out = equi_join(ldf, rdf, "k", "k2", how, strategy)
    cols = ["k", "v"] if how in ("left_semi", "left_anti") else ["k", "v", "w"]
    return rows_set(out.select(*cols))


@pytest.mark.parametrize("strategy", ["repartition", "broadcast", "merge"])
@given(left=TABLE, right=TABLE)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_inner_join_all_strategies_match_duckdb(spark, strategy, left, right):
    assert run_spark_join(spark, left, right, "inner", strategy) == duck_join(
        left, right, "inner"
    )


@pytest.mark.parametrize("how", ["left", "left_semi", "left_anti"])
@given(left=TABLE, right=TABLE)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_types_match_duckdb(spark, how, left, right):
    assert run_spark_join(spark, left, right, how, "merge") == duck_join(
        left, right, how
    )


# --------------------------------------------------------------------------
# IEJoin pair join (round 9): random integer frames with heavy ties,
# NULLs, negatives, and clustered values — both bucket-edge modes must
# equal the naive cross-filter at several grid sizes including
# n_buckets larger than the domain. Catches boundary-cell mistakes no
# crafted case anticipates (the crafted edge cases live in
# test_joins.py; this is the random sweep).
# --------------------------------------------------------------------------

IE_COORD = st.one_of(
    st.integers(min_value=-5, max_value=5),          # dense ties
    st.integers(min_value=990, max_value=1000),      # far cluster
    st.none(),
)
IE_TABLE = st.lists(
    st.tuples(IE_COORD, IE_COORD), min_size=0, max_size=18
)


@pytest.mark.parametrize("edges", ["uniform", "quantile"])
@given(left=IE_TABLE, right=IE_TABLE, b=st.sampled_from([1, 3, 8]))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_iejoin_pairs_matches_naive_property(spark, edges, left, right, b):
    from mapreduce_join_comparison_spark.operators.joins import iejoin_pairs

    ldf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(left)],
        schema="lid: bigint, lx: bigint, ly: bigint",
    )
    rdf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(right)],
        schema="rid: bigint, rx: bigint, ry: bigint",
    )
    got = rows_set(
        iejoin_pairs(ldf, rdf, "lx", "rx", "ly", "ry",
                     n_buckets=b, edges=edges)
    )
    naive = rows_set(
        ldf.crossJoin(rdf).filter("lx < rx AND ly > ry")
    )
    assert got == naive
