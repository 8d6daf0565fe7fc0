"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column-naming convention: every computed/aggregate column is aliased
identically in the Spark code and the oracle SQL (driver hash-compares
values after sorting columns by name). Timestamp columns are projected
as ISO date strings on both sides to avoid representation drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_join_comparison_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's dim⋈fact equi-join (customer ⋈
    orders) under the broadcast strategy, at sf0.001."""
    from pyspark.sql import functions as F

    from mapreduce_join_comparison_spark.operators.joins import equi_join
    from mapreduce_join_comparison_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = equi_join(customer, orders, "c_custkey", "o_custkey",
                       "inner", "broadcast")
    return joined.select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    ).orderBy("c_custkey", "o_orderkey")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_catalog.QUERIES


def oracle_sql() -> dict[str, str]:
    return queries_catalog.ORACLES
