"""Change-data-capture / incremental-maintenance operators.

A 100 TB corpus is not rebuilt from scratch — it is *maintained*:
nightly update batches upsert into the base table, and append-only
event logs are compacted to the latest record per key. Spark (without
a table format like Delta/Iceberg) expresses both relationally:

- ``merge_upsert``: FULL OUTER join base ⟗ updates on the key, COALESCE
  update columns over base columns. One shuffle on the key (or zero if
  both sides are bucketed on it); the result is the new base table.
- ``latest_per_key``: row_number() over (key ORDER BY version DESC) = 1
  — the standard log-compaction window. One shuffle.

Both are deterministic relational transforms, so the catalog queries
register full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key``: matched rows take
    every update column; unmatched base rows pass through; unmatched
    update rows insert. Columns must match by name (the relational
    MERGE special case where WHEN MATCHED updates all columns).

    Implemented as one full-outer shuffle join + per-column COALESCE
    (update side wins) — no driver-side state, scales by key
    partitioning alone.
    """
    assert set(base.columns) == set(updates.columns), "schemas must match"
    u = updates.select([F.col(c).alias(f"_u_{c}") for c in updates.columns])
    joined = base.join(u, base[key] == u[f"_u_{key}"], "full_outer")
    merged = joined.select(
        *[
            F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c)
            for c in base.columns
        ]
    )
    return merged


def latest_per_key(
    df: DataFrame, key: str, version_col: str, tiebreak: str | None = None
) -> DataFrame:
    """Log compaction: keep the newest record per key (highest
    ``version_col``; ties broken by ``tiebreak`` descending so the
    survivor is deterministic)."""
    order = [F.col(version_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
