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

from pyspark.sql import DataFrame, Window
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
    group keys. The helper rank column uses a reserved name (any
    caller column of the same name would be silently clobbered and
    dropped)."""
    if "_rn" in df.columns:
        raise ValueError(
            "top_k_per_group: input already has a '_rn' column "
            "(reserved helper name) — rename it first"
        )
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bins: int = 512,
) -> DataFrame:
    """2-D skyline (Pareto frontier), minimizing both columns: keep
    every row for which no other row is ≤ in both dimensions and < in
    at least one (Börzsönyi et al., ICDE 2001 "The Skyline Operator").
    Duplicates of a frontier point are all kept (neither dominates).

    The textbook plan — sort globally by x, keep rows whose y beats
    the running strict-prefix min — needs a GLOBAL ordered window
    (single partition, the classic scale-killer). This is the binned
    two-level decomposition instead (same trick as
    ``rolling_zscore_anomalies_binned``):

      1. collapse to per-distinct-x grain: (x, min y) — the frontier
         can only contain each x's min-y rows, and the distinct-x
         grain makes "strictly smaller x" expressible as a ROWS frame,
      2. coarse-bin x (bounds from a 2-scalar fetch, same precedent as
         the quantile-prune histogram); per-bin min-y is a bins-sized
         aggregate whose strict-prefix min is an O(bins) window,
      3. intra-bin strict-prefix min via a ROWS frame PARTITIONED BY
         bin (earlier row in the per-x grain ⇔ strictly smaller x),
      4. a per-x row survives iff min(prior-bin, intra-bin prefix) > y
         — strictly: an equal y at smaller x dominates —
      5. re-attach original rows by equi-join on x, keeping y == the
         group min.

    Every window is either bins-sized or partitioned by bin — nothing
    global, frames all ROWS (O(1) incremental evaluation). Cost: two
    x-keyed exchanges of the per-x grain + the row re-attach join.
    Maximizing a dimension = pass its negation.
    """
    # a point missing either coordinate cannot be on (or dominate) the
    # frontier — excluded up front: a NULL x would land in the LAST
    # bin via least()'s null-skip and sort NULLS-FIRST inside it,
    # polluting the intra-bin prefix min and dropping true frontier
    # points
    pts = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    lo, hi = pts.agg(F.min(x_col), F.max(x_col)).first()  # 2-scalar fetch
    if lo is None:
        return pts  # empty input: empty frontier
    # bin arithmetic in DOUBLE: (x - lo) * bins in long wraps on
    # wide-range BIGINT x (bins go non-monotone, silently corrupting
    # the prefix-min invariant). The algorithm only needs bins
    # MONOTONE in x, which the double form preserves at any range.
    span = (float(hi) - float(lo)) or 1.0
    bin_of = F.least(
        F.lit(bins - 1),
        F.floor(
            (F.col(x_col).cast("double") - float(lo)) * bins / span
        ).cast("int"),
    )
    perx = (
        pts.groupBy(x_col)
        .agg(F.min(y_col).alias("_miny"))
        .withColumn("_bin", bin_of)
    )
    binmin = perx.groupBy("_bin").agg(F.min("_miny").alias("_bmin"))
    w_bins = (
        Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    )  # bins-sized table: single-partition window is O(bins), bounded
    prior = binmin.withColumn("_prior", F.min("_bmin").over(w_bins)).drop(
        "_bmin"
    )
    w_intra = (
        Window.partitionBy("_bin")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # bounded: one row per coarse bin
    sur = (
        perx.join(F.broadcast(prior), "_bin", "left")
        .withColumn(
            # least() skips nulls, so a missing prior bin / first row
            # in bin degrades to the other operand alone
            "_prev",
            F.least(F.min("_miny").over(w_intra), F.col("_prior")),
        )
        .filter(F.col("_prev").isNull() | (F.col("_prev") > F.col("_miny")))
        .select(x_col, "_miny")
    )
    return pts.join(sur, on=x_col).filter(
        F.col(y_col) == F.col("_miny")
    ).drop("_miny")
