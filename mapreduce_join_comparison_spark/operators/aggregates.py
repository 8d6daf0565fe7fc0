"""Aggregations (SURVEY.md §2.4).

The reference's only aggregates are driver-side summary stats over task
runtimes (``JoinSimulation.java:34-70``: mean / median / max) and job
counters. Here they are distributed DataFrame aggregates, plus the
group-by/rollup/cube family the reference lacks (free in Spark —
partial aggregation map-side, final agg after one shuffle on the
group keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def summary_stats(df: DataFrame, col: str) -> DataFrame:
    """A1 — mean/median/max (JoinSimulation.java:34-70) plus count/min.
    Median is the exact continuous percentile (the reference sorts and
    takes the middle — exact), not percentile_approx."""
    return df.agg(
        F.count(col).cast("long").alias("n"),
        F.avg(col).alias("mean"),
        F.expr(f"percentile({col}, 0.5)").alias("median"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
    )


def group_agg(
    df: DataFrame, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Hash aggregate with map-side partial aggregation (one shuffle on
    the group keys; Catalyst plans partial+final automatically)."""
    return df.groupBy(*keys).agg(*aggs)


def distinct_count(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*cols).distinct()


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ cardinality — the scale path: no shuffle of raw
    values, constant memory per partition. At 100 TB an exact distinct
    on a high-cardinality key is a full shuffle; HLL is a map-side
    sketch merge."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)
