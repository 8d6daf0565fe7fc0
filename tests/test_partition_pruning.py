"""Partition pruning: a hive-partitioned parquet write + a filter on
the partition column must prune at planning time (PartitionFilters in
the scan, fewer files read) — free via Catalyst, impossible in the
reference (SURVEY.md §4.1). At 100 TB, partition layout is the first
line of defense before any shuffle happens.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.plans.explain import physical_plan
from mapreduce_join_comparison_spark.sources.io import write_table

from conftest import rows_set


@pytest.fixture(scope="module")
def partitioned_orders(spark, tables, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    write_table(tables["orders"], path, partition_by=["o_orderstatus"])
    return path


def test_partition_filter_in_plan(spark, partitioned_orders):
    df = spark.read.parquet(partitioned_orders).filter("o_orderstatus = 'F'")
    plan = physical_plan(df)
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters")[1][:200]
    assert "o_orderstatus" in frag


def test_partitioned_results_match_unpartitioned(spark, tables,
                                                 partitioned_orders):
    pruned = (
        spark.read.parquet(partitioned_orders)
        .filter("o_orderstatus = 'F'")
        .select("o_orderkey", "o_totalprice")
    )
    plain = tables["orders"].filter("o_orderstatus = 'F'").select(
        "o_orderkey", "o_totalprice"
    )
    assert rows_set(pruned) == rows_set(plain)


def test_partition_directories_exist(partitioned_orders):
    dirs = glob.glob(os.path.join(partitioned_orders, "o_orderstatus=*"))
    statuses = {os.path.basename(d).split("=")[1] for d in dirs}
    assert statuses == {"F", "O", "P"}
