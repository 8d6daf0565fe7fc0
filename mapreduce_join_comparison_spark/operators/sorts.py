"""Sorts, limits, top-k (SURVEY.md §2.6).

Reference mapping:
  * O1 total-order sort — the reference's 2-job sampled
    TotalOrderPartitioner pipeline (``MergeJoin.java:146-215``:
    RandomSampler 1% / 2000 samples → range partition → per-partition
    sort) is exactly what Spark's ``SortExec`` does in one stage:
    ``df.sort(k)`` = reservoir-sampled RangePartitioning + in-partition
    sort. ``total_order_sort`` exposes the partition count (the
    reference's numReducers / maxSplits knob).
  * O2 secondary sort — ``sort_within_groups``.
  * O3 skew-bounded partition count — obsolete under AQE; the partition
    count arg remains for parity experiments.
  * top-k — beyond the reference: ``TakeOrderedAndProject`` (per
    partition heap + driver merge, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def total_order_sort(
    df: DataFrame, cols: list[str], num_partitions: int | None = None,
    ascending: bool = True,
) -> DataFrame:
    """Globally ordered output across partition files: partition i holds
    keys < partition i+1, each sorted — what the reference's
    TotalOrderPartitioner job produces (MergeJoin.java:146-215)."""
    order = [F.col(c).asc() if ascending else F.col(c).desc() for c in cols]
    if num_partitions:
        return df.repartitionByRange(num_partitions, *order).sortWithinPartitions(*order)
    return df.orderBy(*order)


def sort_within_groups(
    df: DataFrame, group_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """O2 — secondary sort: co-locate groups, order rows inside each
    (JoinTuple.java:47-55's tag ordering, generalized)."""
    return df.repartition(*[F.col(c) for c in group_cols]).sortWithinPartitions(
        *group_cols, *order_cols
    )


def top_k(df: DataFrame, order_cols: list[str], k: int, ascending: bool = False) -> DataFrame:
    """orderBy().limit(k) → TakeOrderedAndProject: each partition keeps
    a k-heap, driver merges k*partitions rows — no global shuffle."""
    order = [F.col(c).asc() if ascending else F.col(c).desc() for c in order_cols]
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int,
    ascending: bool = False,
) -> DataFrame:
    """Windowed top-k: rank within group, keep ≤ k. One shuffle on the
    group keys."""
    from pyspark.sql.window import Window

    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
