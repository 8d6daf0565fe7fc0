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


def test_dynamic_partition_pruning_fires(spark, partitioned_orders):
    """A dim filtered on a NON-join column forces runtime DPP: the
    fact scan's PartitionFilters must carry a dynamicpruningexpression
    (a static constant-fold would defeat the point — covered above)."""
    dim = spark.createDataFrame(
        [("F", "finished", 1), ("O", "open", 0), ("P", "pending", 0)],
        "status string, status_desc string, is_closed int",
    ).filter("is_closed = 1")
    fact = spark.read.parquet(partitioned_orders)
    out = fact.join(F.broadcast(dim), fact["o_orderstatus"] == dim["status"])
    plan = physical_plan(out)
    frag = plan.split("PartitionFilters")[1][:300]
    assert "dynamicpruningexpression" in frag
    assert out.count() == fact.filter("o_orderstatus = 'F'").count()


def test_runtime_bloom_filter_join(spark, tables, tmp_path_factory):
    """Spark's runtime bloom-filter injection (the automatic sibling of
    operators/joins.semi_join_reduced): with the size thresholds scaled
    to test data, a selective dim filter must inject
    bloom_filter_might_contain on the fact side of the shuffle join —
    at 100 TB this prunes shuffle volume before the exchange."""
    path = str(tmp_path_factory.mktemp("bloom") / "lineitem")
    tables["lineitem"].write.parquet(path)
    fact = spark.read.parquet(path)
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep the join shuffled
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        dim = tables["orders"].filter("o_orderpriority = '1-URGENT'")
        out = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
        plan = physical_plan(out)
        # injected filter on the fact side + the bloom build aggregate
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        expected = (
            tables["lineitem"]
            .join(dim, tables["lineitem"]["l_orderkey"] == dim["o_orderkey"])
            .count()
        )
        assert out.count() == expected
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
