"""Change-data-capture / incremental-maintenance operators.

A 100 TB corpus is not rebuilt from scratch — it is *maintained*:
nightly update batches upsert into the base table, and append-only
event logs are compacted to the latest record per key. Spark (without
a table format like Delta/Iceberg) expresses both relationally:

- ``merge_upsert``: FULL OUTER join base ⟗ updates on the key; matched
  rows take the update row wholesale (a NULL in an update column
  overwrites — per-column COALESCE would silently keep the base
  value). One shuffle on the key (or zero if both sides are bucketed
  on it); the result is the new base table.
- ``latest_per_key``: row_number() over (key ORDER BY version DESC) = 1
  — the standard log-compaction window. One shuffle.

Both are deterministic relational transforms, so the catalog queries
register full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``base`` on ``key``: matched rows take
    the update row WHOLESALE (including NULLs in non-key columns — the
    relational MERGE special case where WHEN MATCHED updates all
    columns); unmatched base rows pass through; unmatched update rows
    insert. Columns must match by name.

    Duplicate keys in the update batch are a semantic error (SQL MERGE
    rejects multiple source matches; a full-outer join would silently
    fan base rows out). Pass ``version_col`` to pre-compact the batch
    to its newest row per key (``latest_per_key``); without it, a
    plan-level guard raises on the first duplicate key. Either way the
    extra window reuses the join's hash partitioning on the key, so no
    additional shuffle.

    Implemented as one full-outer shuffle join + matched-row pick — no
    driver-side state, scales by key partitioning alone.
    """
    assert set(base.columns) == set(updates.columns), "schemas must match"
    if version_col is not None:
        updates = latest_per_key(updates, key, version_col, tiebreak)
    # explicit presence flag — keying "row came from updates" off the
    # update KEY's nullability corrupts NULL-key update rows: the
    # full-outer join never matches them (NULL = NULL is NULL), the
    # nullability test then reads them as base-side, and the select
    # emits an all-NULL row where SQL MERGE inserts the source row
    u = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in updates.columns],
        F.lit(True).alias("_u_present"),
    )
    if version_col is None:
        # dup-count window; the guard lives in the matched predicate
        # (NOT in the join key — rewriting the key column would hide
        # the window's hash partitioning from the join and cost an
        # extra exchange). NULL keys are exempt: SQL MERGE treats
        # NULL-key source rows as never-matching inserts, so several
        # of them are not "duplicate matches"
        w = Window.partitionBy(f"_u_{key}")
        u = u.withColumn("_u_dup", F.count(F.lit(1)).over(w))
        matched = F.when(
            (F.col("_u_dup") > 1) & F.col(f"_u_{key}").isNotNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"merge_upsert: duplicate update key '{key}'="),
                    F.col(f"_u_{key}").cast("string"),
                )
            ),
        ).otherwise(F.col("_u_present").isNotNull())
    else:
        matched = F.col("_u_present").isNotNull()
    joined = base.join(u, base[key] == u[f"_u_{key}"], "full_outer")
    return joined.select(
        *[
            F.when(matched, F.col(f"_u_{c}")).otherwise(F.col(c)).alias(c)
            for c in base.columns
        ]
    )


def merge_aggregates(
    base_agg: DataFrame,
    delta_agg: DataFrame,
    keys: list[str],
    merge_cols: list[str],
) -> DataFrame:
    """Algebraic partial-aggregate merge: ``new = base ⊎ delta``.

    The maintenance move that keeps 100 TB aggregates cheap: never
    re-scan the base table — aggregate only the delta batch and merge
    the partials. Valid for commutative-monoid measures (SUM, COUNT;
    AVG/VAR derive from (sum, count, sum_sq) partials), which is
    exactly the class Spark itself exploits for map-side partial
    aggregation.

    Implemented as union + re-aggregate — NOT a full-outer join: a
    null-safe join rewrites its keys to (coalesce(k), isnull(k)),
    which hides the input aggregates' hash partitioning and re-shuffles
    both sides in full; the union's final aggregate instead shuffles
    only the (already collapsed) partial rows, and groupBy handles
    null keys natively. A key present on one side only keeps its
    partial value (SUM ignores the absent side).
    """
    sums = [F.sum(c).alias(c) for c in merge_cols]
    return (
        base_agg.select(*keys, *merge_cols)
        .unionByName(delta_agg.select(*keys, *merge_cols))
        .groupBy(*keys)
        .agg(*sums)
    )


def merge_distinct_sketches(
    batch_aggs: list[DataFrame],
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Mergeable distinct-count maintenance: union per-batch HLL
    sketches and estimate — COUNT(DISTINCT) is NOT a monoid (can't
    merge via merge_aggregates' SUM), but its Datasketches HLL sketch
    is: union(sketch(A), sketch(B)) ≡ sketch(A ∪ B). At 100 TB this is
    how a running distinct-users-per-key stays current from daily
    delta sketches without ever rescanning the base — each input here
    is a tiny (key, sketch) aggregate, the merge shuffles only those
    collapsed rows. Build the inputs with
    ``df.groupBy(*keys).agg(F.hll_sketch_agg(col).alias("sketch"))``."""
    import functools

    unioned = functools.reduce(
        lambda a, b: a.unionByName(b),
        [b.select(*keys, sketch_col) for b in batch_aggs],
    )
    return unioned.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col))
        .alias("approx_distinct")
    )


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


def scd2_history(
    log: DataFrame,
    key: str,
    attr: str,
    version_col: str,
    tiebreak: str,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from an
    append-only change log: per key, order the log, COMPRESS runs of
    consecutive identical ``attr`` values (a change record that does
    not change the attribute must not open a new interval), then emit
    one row per surviving change with its validity interval
    [valid_from, valid_to) — valid_to = next change's version, NULL on
    the current row — and a per-key version number.

    Plan shape: two windows (lag for compression, lead + row_number
    for intervals) over the SAME (key × order) partitioning — Spark
    plans ONE shuffle and sorts once; the log never self-joins. At
    100 TB the history build cost is exactly one exchange of the
    change log, and an incremental variant only re-windows keys
    touched by the new batch.
    """
    order = [F.col(version_col).asc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    # NULL-safe run compression: `attr != _prev` is NULL (dropped!)
    # when a change record sets attr to NULL, silently losing the NULL
    # interval; and "_prev IS NULL" conflates the FIRST row with a
    # genuinely-NULL previous value (which must compress, not split).
    # A lag over a literal marks the first row unambiguously.
    changes = (
        log.withColumn("_prev", F.lag(attr).over(w))
        .withColumn("_first", F.lag(F.lit(1)).over(w).isNull())
        .filter(
            F.col("_first") | ~F.col(attr).eqNullSafe(F.col("_prev"))
        )
        .drop("_prev", "_first")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        changes.withColumn("valid_to", F.lead(version_col).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .select(
            F.col(key),
            F.col(attr),
            F.col(version_col).alias("valid_from"),
            "valid_to",
            F.col("version").cast("int").alias("version"),
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def maintain_join_view(
    view: DataFrame,
    delta_left: DataFrame,
    right: DataFrame,
    upsert_key: str,
    left_join_key: str,
    right_join_key: str,
) -> DataFrame:
    """Incremental maintenance of a materialized join view
    V = L ⋈ R when an upsert batch ΔL lands on the left side:

        V′ = (V ▷ keys(ΔL))  ∪  (ΔL ⋈ R)

    — retract every view row whose ``upsert_key`` (the LEFT table's
    row identity, distinct from the join key) appears in the batch
    (anti-join), then add the re-joined batch rows. Equivalent to
    recomputing (L upserted with ΔL) ⋈ R, without touching the
    untouched ~all of L: the classic delta-propagation rule of
    incremental view maintenance (Gupta & Mumick, "Maintenance of
    Materialized Views", IEEE Data Eng. Bull. 1995).

    ``view`` must carry the same columns the caller's ΔL ⋈ R
    projection produces (it IS that projection, materialized), and
    ΔL must be keyed (≤1 row per ``upsert_key`` — run
    ``latest_per_key`` first if the batch has internal history).

    Scale: the nightly delta batch is bounded by ingest, so both the
    retraction key set and the ΔL join side broadcast — V′ costs one
    scan of V plus one scan of R, ZERO shuffles of either, vs the
    full L ⋈ R recompute. Deletes compose the same way: feed the
    delete keys into the retraction and nothing into the addition.
    """
    keys = delta_left.select(F.col(upsert_key)).distinct()
    # bounded: by operator contract — ΔL is one ingest batch (nightly
    # CDC window), orders of magnitude below the materialized view
    kept = view.join(F.broadcast(keys), on=upsert_key, how="left_anti")
    # bounded: same ingest-batch contract as the retraction key set —
    # broadcasting ΔL turns ΔL ⋈ R into a shuffle-free scan of R
    added = F.broadcast(delta_left).join(
        right, on=F.col(left_join_key) == F.col(right_join_key), how="inner"
    )
    return kept.unionByName(added.select(*view.columns))


def scd2_pointintime_join(
    history: DataFrame,
    probes: DataFrame,
    key: str,
    ts_col: str,
    from_col: str = "valid_from_us",
    to_col: str = "valid_to_us",
) -> DataFrame:
    """Point-in-time (as-of) join against an SCD2 history: each probe
    row picks up the dimension version that was valid AT ITS OWN
    timestamp — key equality plus containment in the half-open
    validity interval [from, to) (NULL ``to`` = current version).
    This is the dimensional-model completion of ``scd2_history``: the
    history build answers "what changed when", this join answers
    "what was true when each fact happened".

    Scale: the equi-key (``key``) drives the join strategy — a hash
    or sort-merge join on the key with the interval containment as a
    post-join filter; per-key version counts are small (runs of
    changes), so the per-key fan-out is bounded. No nested-loop, no
    interval bucketing needed (unlike the general interval joins,
    the SCD2 right side has ~versions-per-key rows, not a scaled
    table)."""
    h = history.withColumnRenamed(key, "_hist_key")
    joined = probes.join(
        h,
        (F.col(key) == F.col("_hist_key"))
        & (F.col(ts_col) >= F.col(from_col))
        & (F.col(to_col).isNull() | (F.col(ts_col) < F.col(to_col))),
        "inner",
    )
    return joined.drop("_hist_key")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation: classify every key across two table
    snapshots as ``added`` / ``removed`` / ``changed`` by comparing a
    per-row md5 over the compared columns; ``unchanged`` rows are
    dropped — the diff is the deliverable. Callers pre-convert
    floats/timestamps to exact integer forms (``unix_micros``):
    float→string rendering is not engine-portable.

    The row hash concatenates FIXED-WIDTH per-column digests (each
    column: md5 of a null-flag prefix + value). A delimiter-joined
    concat is ambiguous the moment a value contains the delimiter
    (('x|y','z') vs ('x','y|z') hash equal → a real change classified
    'unchanged'), and a NULL sentinel is ambiguous against a value
    equal to the sentinel; digest concatenation has neither hole.

    This is the at-scale "what changed between yesterday's and today's
    copy" primitive (replication audit, CDC backfill validation). Scale
    shape: each side reduces to (key, row_hash) NARROWLY — full rows
    never shuffle — then ONE full-outer equi-join on the key (two
    key-partitioned exchanges, or zero on bucketed/co-partitioned
    snapshots). Output is diff-sized, not snapshot-sized.
    """
    def hashed(df: DataFrame) -> DataFrame:
        canon = F.concat_ws(
            "",
            *[
                F.md5(
                    F.concat(
                        F.when(F.col(c).isNull(), F.lit("N"))
                        .otherwise(F.lit("V")),
                        F.coalesce(F.col(c).cast("string"), F.lit("")),
                    )
                )
                for c in compare_cols
            ],
        )
        return df.select(*key_cols, F.md5(canon).alias("_h"))

    o = hashed(old)
    n = hashed(new)
    joined = o.withColumnRenamed("_h", "_h_old").join(
        n.withColumnRenamed("_h", "_h_new"), key_cols, "full_outer"
    )
    return (
        joined.withColumn(
            "diff_class",
            F.when(F.col("_h_old").isNull(), F.lit("added"))
            .when(F.col("_h_new").isNull(), F.lit("removed"))
            .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged")),
        )
        .filter(F.col("diff_class") != "unchanged")
        .select(*key_cols, "diff_class")
    )
