"""F4 — pre-sorted co-partitioned merge join without re-shuffle.

The reference's distinct capability: joining already-sorted,
co-partitioned part files by zipping equal-numbered partitions
(``MergeJoin.java:217-251``, fixtures ``merge_join_tables/t1/part-r-*``).
Spark analog: co-bucketed ``bucketBy(n, k).sortBy(k)`` tables join via
SortMergeJoin with NO Exchange on either side.
"""

from __future__ import annotations

import pytest

from mapreduce_join_comparison_spark.plans.explain import (
    assert_no_exchange,
    assert_physical_contains,
)
from mapreduce_join_comparison_spark.sources.io import write_bucketed

from conftest import rows_set


@pytest.fixture(scope="module")
def bucketed_pair(spark, tables):
    orders = tables["orders"].selectExpr(
        "o_orderkey AS k", "o_totalprice AS price"
    )
    lineitem = tables["lineitem"].selectExpr(
        "l_orderkey AS k", "l_extendedprice AS amount"
    )
    write_bucketed(orders, "b_orders", ["k"], 4)
    write_bucketed(lineitem, "b_lineitem", ["k"], 4)
    return spark.table("b_orders"), spark.table("b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    bo, bl = bucketed_pair
    joined = bo.hint("merge").join(bl, "k", "inner")
    assert_physical_contains(joined, "SortMergeJoin")
    assert_no_exchange(joined)
    assert joined.count() > 0


def test_bucketed_join_matches_plain_join(spark, tables, bucketed_pair):
    bo, bl = bucketed_pair
    bucketed = bo.hint("merge").join(bl, "k", "inner")
    plain = (
        tables["orders"].selectExpr("o_orderkey AS k", "o_totalprice AS price")
        .join(
            tables["lineitem"].selectExpr("l_orderkey AS k", "l_extendedprice AS amount"),
            "k", "inner",
        )
    )
    assert rows_set(bucketed) == rows_set(plain)


def test_bucketed_groupby_no_shuffle(spark, bucketed_pair):
    # bucketing also pre-partitions aggregation on the bucket key
    bo, _ = bucketed_pair
    agg = bo.groupBy("k").count()
    assert_no_exchange(agg)
