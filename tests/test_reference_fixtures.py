"""Port of the reference's golden smoke fixtures (SURVEY.md §5 F1):
``simulation/simple_tables/`` t1 / t1_nonunique / t2 as inline literal
rows, verified RELATIONALLY (DuckDB oracle + cross-strategy agreement)
— not against the committed ``expected_output.csv``, which is stale
(both committed files match only the nonunique case; SURVEY.md §5).

Covers: unique keys, duplicate keys on one side, duplicate keys on
both sides (per-key cross product), non-matching keys on both sides,
and UTF-8 values (from ``merge_join_tables/t1.txt``).
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_join_comparison_spark.operators.joins import (
    equi_join,
    join_reference_style,
)

from conftest import rows_set

T1 = [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"), (11, "a"),
      (5, "f"), (92, "a"), (93, "b"), (6, "g"), (7, "x"), (8, "aa")]
T1_NONUNIQUE = [(0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"),
                (5, "f"), (6, "g"), (6, "h"), (6, "i"), (7, "x"),
                (7, "y"), (7, "z")]
T2 = [(0, "aa"), (0, "ab"), (0, "ac"), (0, "ad"), (8, "aa"), (1, "bb"),
      (1, "bc"), (90, "cc"), (91, "dd"), (92, "ee"), (5, "ff"),
      (6, "gg"), (7, "xx"), (11, "a"), (7, "yy"), (7, "zx"), (7, "zy"),
      (7, "zz"), (8, "aa"), (91, "x"), (92, "y"), (93, "z"), (93, "zz")]
# UTF-8 rows from merge_join_tables/t1.txt
T_UTF8 = [(8, "ü"), (9, "ä"), (7, "x")]

STRATEGIES = ("repartition", "broadcast", "merge")


def oracle_join(left, right):
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, a VARCHAR)")
    con.execute("CREATE TABLE r (k BIGINT, b VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?, ?)", left)
    con.executemany("INSERT INTO r VALUES (?, ?)", right)
    rows = con.execute(
        "SELECT l.k, l.a, r.b FROM l JOIN r ON l.k = r.k"
    ).fetchall()
    con.close()
    return sorted((tuple(r) for r in rows), key=repr)


@pytest.fixture(scope="module")
def dfs(spark):
    return {
        "t1": spark.createDataFrame(T1, ["k", "a"]),
        "t1_nonunique": spark.createDataFrame(T1_NONUNIQUE, ["k", "a"]),
        "t2": spark.createDataFrame(T2, ["k", "b"]),
        "t_utf8": spark.createDataFrame(T_UTF8, ["k", "b"]),
    }


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("left_name", ["t1", "t1_nonunique"])
def test_golden_pair_all_strategies(spark, dfs, strategy, left_name):
    left, right = dfs[left_name], dfs["t2"]
    got = equi_join(
        left, right.withColumnRenamed("k", "k2"), "k", "k2", "inner", strategy
    ).select("k", "a", "b")
    expect = oracle_join(T1 if left_name == "t1" else T1_NONUNIQUE, T2)
    assert len(expect) > 0
    assert rows_set(got) == expect


def test_strategies_agree_with_each_other(spark, dfs):
    """The strongest invariant in the reference's design: all three
    physical algorithms compute the same logical join."""
    results = [
        rows_set(
            equi_join(dfs["t1_nonunique"],
                      dfs["t2"].withColumnRenamed("k", "k2"),
                      "k", "k2", "inner", s).select("k", "a", "b")
        )
        for s in STRATEGIES
    ]
    assert results[0] == results[1] == results[2]


def test_utf8_keys_and_values(spark, dfs):
    got = equi_join(
        dfs["t1"], dfs["t_utf8"].withColumnRenamed("k", "k2"),
        "k", "k2", "inner", "merge"
    ).select("k", "a", "b")
    assert rows_set(got) == [(7, "x", "x"), (8, "aa", "ü")]


def test_reference_style_output_shape(spark, dfs, tmp_path):
    """End-to-end reference-style run: positional CSV in, the
    ``key, left_row, right_row`` shape out (RepartitionJoin.java:61)."""
    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    dfs["t1"].write.option("header", False).csv(p1)
    dfs["t2"].write.option("header", False).csv(p2)
    from mapreduce_join_comparison_spark.sources.io import read_positional_csv

    a = read_positional_csv(spark, p1, n_cols=2)
    b = read_positional_csv(spark, p2, n_cols=2)
    out = join_reference_style(a, b, 0, 0, "repartition")
    assert out.columns == ["k", "left_row", "right_row"]
    assert out.count() == len(oracle_join(T1, T2))
    row7 = out.filter("k = '7'").collect()
    assert all(r["left_row"] == "7,x" for r in row7)
    assert sorted(r["right_row"] for r in row7) == [
        "7,xx", "7,yy", "7,zx", "7,zy", "7,zz"
    ]
