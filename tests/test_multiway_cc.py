"""Tests for the hypercube multiway join, semi-join reduction, and
connected-components clustering — the thesis-discussed-but-never-built
operators (SURVEY.md §2.3 Absent / §7.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.dedup import connected_components
from mapreduce_join_comparison_spark.operators.joins import semi_join_reduced_join
from mapreduce_join_comparison_spark.operators.multiway import (
    chain_triangle_join,
    hypercube_triangle_join,
    triangle_join,
)
from mapreduce_join_comparison_spark.plans.explain import count_shuffles, simple_plan

from conftest import rows_set


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _as_rst(e):
    return (
        e.selectExpr("src AS a", "dst AS b"),
        e.selectExpr("src AS b", "dst AS c"),
        e.selectExpr("src AS c", "dst AS a"),
    )


def test_hypercube_matches_chain_join(spark):
    """HyperCube and the binary-join chain must agree bag-exactly,
    including the self-loop triangle (5,5,5) and the two rotations of
    the 1-2-3 triangle."""
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (2, 1), (1, 3), (3, 2), (4, 1), (5, 5), (6, 4)],
    )
    r, s, t = _as_rst(e)
    cube = hypercube_triangle_join(r, s, t, grid=(2, 2, 2))
    chain = chain_triangle_join(r, s, t)
    assert rows_set(cube) == rows_set(chain)
    assert cube.count() > 0


def test_hypercube_handles_duplicate_tuples(spark):
    """Bag semantics: a duplicated edge multiplies matching triangles
    exactly as the SQL join does."""
    e = _edges(spark, [(1, 2), (1, 2), (2, 3), (3, 1)])
    r, s, t = _as_rst(e)
    cube = hypercube_triangle_join(r, s, t, grid=(2, 2, 2))
    chain = chain_triangle_join(r, s, t)
    assert sorted(cube.collect()) == sorted(chain.collect())


def test_hypercube_single_shuffle(spark):
    """The whole point: one exchange (the grid shuffle), versus ≥2 for
    the chain plan."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    r, s, t = _as_rst(e)
    assert count_shuffles(hypercube_triangle_join(r, s, t)) == 1
    assert count_shuffles(chain_triangle_join(r, s, t)) >= 2


def test_triangle_join_dispatcher(spark):
    """triangle_join defaults to the pure-JVM chain plan (no Python
    stage); both strategies agree bag-exactly; unknown strategies
    raise."""
    e = _edges(
        spark, [(1, 2), (2, 3), (3, 1), (2, 1), (1, 3), (3, 2), (5, 5)]
    )
    r, s, t = _as_rst(e)
    default = triangle_join(r, s, t)
    assert "FlatMapGroupsInPandas" not in simple_plan(default)
    cube = triangle_join(r, s, t, strategy="hypercube", grid=(2, 2, 2))
    assert rows_set(default) == rows_set(cube)
    with pytest.raises(ValueError):
        triangle_join(r, s, t, strategy="nested_loop")


def test_semi_join_reduced_matches_plain_join(spark, tables):
    li, sup = tables["lineitem"], tables["supplier"]
    dim = sup.filter("s_nationkey = 3")
    reduced = semi_join_reduced_join(li, dim, "l_suppkey", "s_suppkey").select(
        "l_orderkey", "l_linenumber", "s_name"
    )
    plain = li.join(dim, li.l_suppkey == dim.s_suppkey).select(
        "l_orderkey", "l_linenumber", "s_name"
    )
    assert rows_set(reduced) == rows_set(plain)


def test_semi_join_reduced_plan_filters_before_shuffle(spark, tables):
    """The fact side must pass through a broadcast LEFT-SEMI before the
    shuffle join — that is the semi-join reduction."""
    li, sup = tables["lineitem"], tables["supplier"]
    plan = simple_plan(
        semi_join_reduced_join(li, sup.filter("s_nationkey = 3"),
                               "l_suppkey", "s_suppkey")
    )
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "ShuffledHashJoin" in plan


@pytest.mark.parametrize(
    "edges,expected",
    [
        # two chains + an isolated pair: A~B~C collapses transitively
        ([(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
         {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
          (20, 20), (21, 20), (22, 20), (23, 20)}),
        # a cycle
        ([(1, 2), (2, 3), (3, 1)], {(1, 1), (2, 1), (3, 1)}),
        # self-loop only
        ([(7, 7)], {(7, 7)}),
    ],
)
def test_connected_components(spark, edges, expected):
    cc = connected_components(_edges(spark, edges))
    got = {(r.vertex, r.component) for r in cc.collect()}
    assert got == expected


def test_connected_components_long_chain_converges(spark):
    """A 12-vertex path needs several propagation rounds — exercises
    the iteration + localCheckpoint loop, not just one step."""
    edges = [(i, i + 1) for i in range(11)]
    cc = connected_components(_edges(spark, edges))
    assert {r.component for r in cc.collect()} == {0}
    assert cc.count() == 12
