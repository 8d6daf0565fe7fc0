"""Data-layout control: multi-dimensional (Z-order) clustering on write.

Hive partitioning (see ``io.write_table(partition_by=...)``) prunes on
ONE low-cardinality column at directory level. At 100 TB the second
line of defense is *file/row-group* pruning via parquet min/max
statistics — which only bites if rows with similar values are stored
together. Sorting by a single column clusters that column but leaves
any other filter column scattered across every file.

Z-ordering interleaves the bits of several columns into one sort key,
so files end up covering small hyper-rectangles of the combined key
space: a selective filter on ANY of the clustered columns skips most
files/row-groups.

Everything here is JVM-side column arithmetic (shift/and/or folds —
no UDFs) plus one extra aggregate pass to learn per-column min/max for
normalization. The write itself is ``repartitionByRange`` on the
interleaved key (range partitioning ⇒ disjoint key ranges per file) +
``sortWithinPartitions``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max-scale a numeric column into [0, 2^bits) as a long.
    Constant columns (max == min) map to 0."""
    span = cmax - cmin
    scaled = F.when(
        span > 0,
        ((col.cast("double") - cmin) / span) * float(2**bits - 1),
    ).otherwise(F.lit(0.0))
    return F.floor(scaled).cast("long")


def zorder_key(norm_cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of the already-normalized long
    columns round-robin (bit b of column i lands at position
    b * ncols + i). Pure shift/and/or fold — whole-stage-codegen
    friendly, no Python in the hot path.

    bits * ncols must stay below 64 — the top interleaved bit would
    land on the long's sign bit, flipping half the keyspace negative
    and splitting clusters across the range partitioning."""
    n = len(norm_cols)
    if bits * n > 63:
        raise ValueError(
            f"bits ({bits}) * ncols ({n}) = {bits * n} exceeds 63: the "
            f"interleaved key would overflow into the sign bit; use "
            f"bits <= {63 // n}"
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(norm_cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered on ``cols`` via Z-order.

    Two passes: (1) tiny aggregate for per-column min/max (broadcast
    back as a 1-row cross join — no driver collect), (2) range-
    partition + local sort on the interleaved key, then write. The
    key column is dropped before writing — layout is a storage
    property, not schema.

    ``bits`` is capped so the interleaved key fits in 63 bits (sign
    bit untouched) — with 4+ cluster columns the default 16 would
    otherwise push bits into the sign position and scatter clusters.
    """
    bits = min(bits, 63 // len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("double").alias(f"_min_{c}"),
                 F.max(c).cast("double").alias(f"_max_{c}")]
    bounds = df.agg(*aggs)
    # bounded: single-row min/max bounds
    with_key = df.join(F.broadcast(bounds)).withColumn(
        "_zkey",
        zorder_key(
            [
                _normalize_to_bits(
                    F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
                )
                for c in cols
            ],
            bits,
        ),
    ).drop(*[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])
    (
        with_key.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def file_column_spans(path: str, col: str) -> list[tuple[float, float]]:
    """Per-parquet-file (min, max) of ``col`` from footer statistics —
    the ranges the reader's file/row-group pruning consults. Used by
    tests to prove clustering narrows them; handy for layout audits."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                cc = rgm.column(ci)
                if cc.path_in_schema == col and cc.statistics is not None:
                    s = cc.statistics
                    if s.has_min_max:
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((float(lo), float(hi)))
    return spans


def compact_files(
    df: DataFrame,
    path: str,
    target_file_bytes: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Small-file compaction: rewrite ``df`` through one
    REBALANCE-hinted exchange so AQE coalesces tiny shuffle partitions
    (and SPLITS skewed ones) to the advisory partition size — output
    files land near the target size regardless of how fragmented the
    input was. This is the operational fix for the small-files problem
    (a 100 TB table accreted from streaming micro-batches or per-hour
    jobs easily reaches millions of KB-sized files, and scan planning
    starts to cost more than the scan).

    Spark-first: REBALANCE + AQE is the size-aware primitive —
    ``coalesce(n)`` needs the caller to guess ``n`` and cannot split a
    skewed partition; a bare ``repartition(n)`` shuffles to a FIXED
    width that is wrong at the next table size. The advisory size is
    applied via ``scoped_conf`` so nothing leaks into the session.
    At scale, run per partition-directory so compaction parallelizes
    across partitions and commits independently."""
    from ..session import scoped_conf

    spark = df.sparkSession
    rebalanced = df.hint("rebalance")
    if target_file_bytes is None:
        rebalanced.write.mode("overwrite").format(fmt).save(path)
        return
    with scoped_conf(
        spark,
        **{
            "spark.sql.adaptive.advisoryPartitionSizeInBytes":
                str(target_file_bytes),
        },
    ):
        rebalanced.write.mode("overwrite").format(fmt).save(path)
