"""Equi-joins with explicit physical-strategy control — the heart of
the reference (SURVEY.md §2.3).

Reference mapping:
  * J1 repartition (reduce-side) join  — ``RepartitionJoin.java:21-178``
    → ``hint("shuffle_hash")``  (ShuffledHashJoinExec: hash-partition
    both sides on the key, build a hash table per partition). The
    reference's secondary-sort trick (buffer only the left side,
    ``RepartitionJoin.java:68-85``) is what SortMergeJoinExec does
    natively; ShuffledHashJoin is the closer analog of its hash variant.
  * J2 broadcast (map-side) join       — ``BroadcastJoin.java:24-157``
    → ``broadcast(small)`` (BroadcastHashJoinExec). No shuffle — unlike
    the reference, whose accidental identity reduce shuffles anyway
    (quirk Q2, ``BroadcastJoin.java:54``). We implement the *intended*
    semantics. Quirk Q1 (duplicate keys in the broadcast table silently
    dropped, ``BroadcastJoin.java:84``) is a reference bug we do NOT
    replicate: standard full cross-product semantics.
  * J3 sort-merge join                 — ``MergeJoin.java:34-292``
    → ``hint("merge")`` (SortMergeJoinExec). The reference's 5-job
    pipeline (key-extract ×2, total-order sort ×2, zip-merge) is what
    one SortMergeJoinExec does in a single stage pair: shuffle =
    range/hash partition + per-partition sort, then streaming merge.
    Its pre-sorted no-shuffle variant maps to co-bucketed tables — see
    ``sources.io.write_bucketed`` and tests/test_bucketed_join.py.

All three produce identical results (the strongest invariant in the
reference's design); tests cross-check them against each other and the
DuckDB oracle.

Scale notes (100 TB posture):
  * broadcast only under an explicit size budget — we check an estimate
    against a byte budget and refuse, mirroring the reference's OOM
    cliff at 3.8 GB (thesis ch. 6.3) but failing fast instead of GC
    death.
  * skew: AQE skew-join splitting replaces the reference's manual
    partition-count cap (``JoinSimulation.java:203-204``); for extreme
    single-key skew beyond AQE, ``salted_join`` explicitly salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STRATEGIES = ("repartition", "broadcast", "merge", "auto", "advised")

_HINTS = {
    "repartition": "shuffle_hash",
    "merge": "merge",
}


def _resolve_on(
    left: DataFrame, right: DataFrame, left_on: str, right_on: str
) -> Column:
    return left[left_on] == right[right_on]


def _size_estimate(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate in bytes (py4j returns
    scala BigInt for large values, plain int for small — str() covers
    both)."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def equi_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    strategy: str = "auto",
    broadcast_side: str = "right",
) -> DataFrame:
    """Binary equi-join with caller-chosen physical strategy.

    The reference signature is ``JoinConfig(inputs, indices, output,
    numReducers)`` (``JoinConfig.java:11-16``) + one of three Join
    classes; here the strategy is an argument and the shuffle width is
    ``spark.sql.shuffle.partitions`` (the numReducers analog).

    Unlike the reference (inner-only), all Spark join types are
    supported via ``how``.
    """
    right_on = right_on or left_on
    if strategy not in STRATEGIES:
        raise ValueError(f"strategy must be one of {STRATEGIES}, got {strategy!r}")
    if strategy == "advised":
        # the thesis Fig-6.11 tree picks the physical strategy from
        # engine statistics (advise_strategy); 'auto' instead leaves
        # the choice entirely to Catalyst
        strategy, _ = advise_strategy(left, right, left_on, right_on)
        if strategy == "broadcast":
            broadcast_side = (
                "right" if _size_estimate(right) <= _size_estimate(left) else "left"
            )
    on = _resolve_on(left, right, left_on, right_on)
    if strategy == "broadcast":
        if broadcast_side == "right":
            # bounded: by operator contract — semi-join reduction IS a dim-keys broadcast; use the runtime bloom filter for dims beyond broadcast size
            return left.join(F.broadcast(right), on, how)
        return F.broadcast(left).join(right, on, how)
    if strategy == "repartition":
        # the shuffle_hash hint marks its side as the BUILD side —
        # build the smaller relation's hash table (building the fact
        # side OOMs once partitions stop fitting in task memory; the
        # dim side stays O(|dim| / partitions) at any fact scale)
        if _size_estimate(right) <= _size_estimate(left):
            return left.join(right.hint(_HINTS[strategy]), on, how)
        return left.hint(_HINTS[strategy]).join(right, on, how)
    if strategy in _HINTS:
        # hint() attaches to the left side's logical subtree; Catalyst
        # applies it to the join above it.
        return left.hint(_HINTS[strategy]).join(right, on, how)
    return left.join(right, on, how)


def join_reference_style(
    left: DataFrame,
    right: DataFrame,
    left_index: int,
    right_index: int,
    strategy: str = "repartition",
) -> DataFrame:
    """The reference's exact logical query: inner equi-join of two
    positional-column tables on one column index each, output =
    ``key, left_row, right_row`` where each row is the comma-joined
    original line (output format at ``RepartitionJoin.java:61``:
    ``key TAB left,right``).

    Expects DataFrames from ``read_positional_csv`` (columns _c0.._cN).
    """
    lcols = [c for c in left.columns if c.startswith("_c")]
    rcols = [c for c in right.columns if c.startswith("_c")]
    l = left.select(
        F.col(f"_c{left_index}").alias("k"),
        F.concat_ws(",", *[F.col(c) for c in lcols]).alias("left_row"),
    )
    r = right.select(
        F.col(f"_c{right_index}").alias("k"),
        F.concat_ws(",", *[F.col(c) for c in rcols]).alias("right_row"),
    )
    joined = equi_join(l, r, "k", "k", "inner", strategy)
    return joined.select(l["k"].alias("k"), "left_row", "right_row")


def broadcast_budget_check(
    df: DataFrame, budget_bytes: int = 512 * 1024 * 1024,
    rows: int | None = None,
) -> int:
    """Fail fast if a to-be-broadcast side exceeds the byte budget.

    The reference discovers this limit by GC death at ~3.8 GB cached
    table (thesis ch. 6.3); we check Catalyst's size estimate up front.

    Caveat the round-10 double-skew sweep measured: Catalyst's
    estimate for a parquet scan is the (pruned) FILE bytes, and
    dictionary-heavy columns (e.g. the generator's 100-string pools)
    compress ~25× below their in-memory UnsafeRow width — a 30 M-row
    (long, string20) projection estimates ~55 MB on disk but builds a
    multi-GB hash relation. When the caller KNOWS the row count, pass
    ``rows`` and the check also enforces a schema-width floor
    (8 B row header + 8 B/field word + ``defaultSize`` per
    variable-width field, ×1.5 hash-relation overhead) — the floor
    can't be fooled by columnar compression. Returns the effective
    estimate in bytes.
    """
    est = _size_estimate(df)
    if rows is not None:
        # 20 B = Scala StringType.defaultSize (pyspark doesn't expose
        # defaultSize; the Scala constant is the stable public one)
        per_row = 8 + sum(
            8 + (20 if f.dataType.typeName() in ("string", "binary")
                 else 0)
            for f in df.schema.fields
        )
        est = max(est, int(rows * per_row * 1.5))
    if est > budget_bytes:
        raise ValueError(
            f"broadcast side estimated at {est} bytes exceeds budget "
            f"{budget_bytes}; use strategy='repartition' or 'merge'"
        )
    return est


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant shuffle join: salt the skewed (left/fact) side's
    key into ``salt`` sub-keys and explode the right (dim) side to
    match, so one hot key spreads over ``salt`` reducers.

    The reference's answer to skew was capping the partition count so
    the heaviest key fits one split (``JoinSimulation.java:203-204``) —
    which *serializes* the hot key. Salting parallelizes it instead.
    AQE's skew-join split usually suffices; this is the explicit tool
    for when it doesn't (e.g. a single key > one executor's memory).
    """
    right_on = right_on or left_on
    lsalt = left.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    rsalt = right.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    on = (lsalt[left_on] == rsalt[right_on]) & (lsalt["_salt"] == rsalt["_salt"])
    return lsalt.join(rsalt, on, "inner").drop("_salt")


def semi_join_reduced_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_on: str,
    dim_on: str | None = None,
    strategy: str = "repartition",
) -> DataFrame:
    """Semi-join-reduced shuffle join — the classic Bloom/semi-join
    optimization the thesis lists as future work (ch. 7 "Further
    Work": semi-join reduction of the shuffled side) and the reference
    never implements.

    The dim side's distinct keys are broadcast and applied as a
    left-semi filter to the fact side BEFORE the shuffle join, so only
    fact rows that can possibly match are shuffled. At 100 TB this is
    the difference between shuffling the whole fact table and shuffling
    the (often tiny) matching fraction when the dim side is selective.
    Spark can inject the same idea automatically as a runtime bloom
    filter (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this
    operator is the explicit, always-on form with exact keys.
    """
    dim_on = dim_on or fact_on
    keys = dim.select(dim_on).distinct()
    reduced = fact.join(
        # bounded: by operator contract — semi-join reduction IS a dim-keys broadcast; use the runtime bloom filter for dims beyond broadcast size
        F.broadcast(keys), fact[fact_on] == keys[dim_on], "left_semi"
    )
    return equi_join(reduced, dim, fact_on, dim_on, "inner", strategy)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` for the same key (left-outer semantics —
    unmatched left rows keep nulls). Every non-key column (the ts
    columns included) is payload and flows to the output, so the two
    sides' column names must be disjoint — with both sides carrying a
    natural ``ts`` the overlap check fires; rename one side first
    (``asof_nearest_join`` instead excludes raw ts columns and emits
    epoch-µs fields).

    Spark has no built-in as-of join (thesis ch. 7 lists temporal joins
    as future work; the reference implements none). Implemented as a
    composition of built-ins — union both sides tagged, then one
    window pass carrying the last-seen right payload forward
    (``last(..., ignorenulls)``) — a SINGLE shuffle on the key, no
    per-key cross product, no UDF: the shape that survives 100 TB of
    fact rows against a large right side (where the classic
    join-then-filter-max approach explodes).
    """
    from pyspark.sql.window import Window

    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    # the right payload travels as ONE nullable struct — per-column
    # last(ignorenulls) would skip a genuinely-NULL payload FIELD and
    # substitute the value from an OLDER right row, stitching one
    # output row out of two different right rows; last(struct) picks
    # the latest right ROW atomically (a left row's struct is NULL, a
    # right row's struct is non-null even when every field is NULL)
    rstruct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in rcols]
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_t).alias("_rrow"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols]).alias("_rrow"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows sort before left at equal timestamps (<= semantics);
    # the payload struct completes the order so two right rows sharing
    # (key, ts) yield a DETERMINISTIC survivor (the max by payload —
    # last() picks the final row of the tie group) instead of
    # whichever physical row order the shuffle produced
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_rrow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_ts",
        "_side",
        *[F.col(c) for c in lcols],
        F.last("_rrow", ignorenulls=True).over(w).alias("_rr"),
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_k").alias(on), *lcols,
        *[F.col("_rr")[c].alias(c) for c in rcols],
    )


_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _require_integral(op: str, *cols: tuple[DataFrame, str]) -> None:
    """Interval/band bucketing does exact integer tier/cell arithmetic;
    a fractional bound silently truncates into an undersized tier and
    DROPS matching pairs — reject loudly instead."""
    for df, c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, _INTEGRAL_TYPES):
            raise TypeError(
                f"{op}: column {c!r} must be integer-typed (got "
                f"{dt.simpleString()}); cast dates to epoch days / "
                "timestamps to epoch micros first"
            )


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str,
    hi_col: str,
    x_col: str,
    base_cell: int = 1,
) -> DataFrame:
    """Large-×-large two-sided inequality (interval containment) join:
    pairs with ``lo < x AND x < hi`` — the IEJoin-class capability the
    thesis discusses but never implements (ch. 5.4), generalized past
    ``band_join``'s single bucketizable width: here every interval can
    have a DIFFERENT width and neither side broadcasts.

    Dual-bucketed multi-tier plan (the hierarchical-grid scheme used
    by spatial/interval engines): tier ``t`` has cell size
    ``base_cell · 2^t``; each interval is assigned the smallest tier
    whose cell covers its width, so it overlaps AT MOST 2 cells of its
    own tier — replication ≤ 2 regardless of width mix. Each point
    probes one cell in every OCCURRING tier (the distinct-tier list is
    a tiny aggregate, broadcast). Candidates come from one EQUI-join
    on (tier, cell); the exact strict inequalities filter last. Cost:
    O(|intervals| · 2 + |points| · n_tiers) shuffled rows + matching
    candidates — never a nested loop, never O(|L|·|R|).

    The tier index is computed from ``log2`` then CORRECTED in exact
    integer arithmetic (``width > base_cell << t`` bumps one tier), so
    float rounding at power-of-2 boundaries can never under-cover.
    Columns must be INTEGER-typed (cast dates to epoch days,
    timestamps to epoch micros first) and disjoint between the two
    sides — the width/tier arithmetic truncates ``hi − lo`` to a long,
    so a fractional interval (lo=0.9, hi=2.05: true width 1.15,
    truncated 1) would be assigned one tier too small, span 3 cells
    while only 2 are emitted, and silently miss matching points;
    validated below rather than documented away. Intervals with
    ``hi <= lo`` match nothing under strict bounds and are dropped
    early.
    """
    if base_cell < 1:
        raise ValueError(f"base_cell must be >= 1, got {base_cell}")
    _require_integral(
        "interval_join",
        (intervals, lo_col), (intervals, hi_col), (points, x_col),
    )
    lo, hi, x = F.col(lo_col), F.col(hi_col), F.col(x_col)
    w = (hi - lo).cast("long")
    t0 = F.greatest(
        F.ceil(F.log2(w.cast("double") / F.lit(float(base_cell)))), F.lit(0)
    ).cast("int")
    cell = F.expr(f"shiftleft(CAST({base_cell} AS BIGINT), _ij_tier)")
    ivals = (
        intervals.filter(hi > lo)
        .withColumn("_ij_t0", t0)
        .withColumn(
            "_ij_tier",
            (
                F.col("_ij_t0")
                + F.when(
                    w
                    > F.expr(
                        f"shiftleft(CAST({base_cell} AS BIGINT), _ij_t0)"
                    ),
                    1,
                ).otherwise(0)
            ).cast("int"),
        )
        .drop("_ij_t0")
        .withColumn(
            "_ij_cell",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(lo / cell).cast("long"),
                        F.floor(hi / cell).cast("long"),
                    )
                )
            ),
        )
    )
    # bounded collect: distinct OCCURRING tiers — ≤ ~log2(max width)
    # values (a few dozen for any physical domain), fetched once so the
    # probe side explodes a literal array instead of cross-joining a
    # tier relation (which would plan as BroadcastNestedLoopJoin).
    tier_values = sorted(
        r[0] for r in ivals.select("_ij_tier").distinct().collect()
    ) or [0]
    pts = points.withColumn(
        "_ij_tier",
        F.explode(F.array(*[F.lit(int(t)) for t in tier_values])),
    ).withColumn("_ij_cell", F.floor(x / cell).cast("long"))
    return (
        ivals.join(pts, ["_ij_tier", "_ij_cell"])
        .filter((lo < x) & (x < hi))
        .drop("_ij_tier", "_ij_cell")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    base_cell: int = 1,
) -> DataFrame:
    """Large-×-large INTERVAL OVERLAP join: pairs of half-open
    intervals with ``l.lo < r.hi AND r.lo < l.hi`` — the temporal
    overlap predicate (two inequalities in opposite directions, both
    relations scaled, variable widths on BOTH sides; the
    interval-containment case is ``interval_join``).

    Every overlapping pair is found EXACTLY ONCE, at exactly one
    (tier, cell): tier ``T = max(t_left, t_right)`` (the coarser of
    the two intervals' own tiers — at T both intervals span ≤ 2 cells,
    and both cover the cell of their common point), in the cell
    containing ``greatest(lo_l, lo_r)`` — the overlap's first point,
    which lies in BOTH intervals, so its cell is in both replica sets,
    and it is unique per pair, so no DISTINCT is needed. Concretely:

      * branch 1 (``t_right = T ≥ t_left``): right at its OWN tier's
        ≤ 2 cells ⋈ left replicated to its ≤ 2 cells at every
        occurring right tier ≥ its own;
      * branch 2 (``t_left = T > t_right``): mirror, strict ``>`` so
        equal-tier pairs stay in branch 1 only;
      * union → exact overlap predicate AND the exactly-once cell
        condition.

    Candidates per own-tier interval ≈ the replicated intervals within
    one cell-width of it — O(local density), never the N² a shared
    coarse tier would produce if BOTH sides replicated upward (that
    variant measured 8× slower at sf0.1), and never a nested loop.
    Replication ≤ 2·|occurring tiers ≥ own| rows per interval (the
    occurring-tier lists are log-bounded; fetched once, bounded
    collects).

    Columns must be INTEGER-typed and disjoint between the two sides
    (same truncated-width hazard as ``interval_join`` — validated);
    pass slim (id, lo, hi) frames and re-attach payloads by id. Empty
    intervals (``hi <= lo``) match nothing and are dropped.
    """
    if base_cell < 1:
        raise ValueError(f"base_cell must be >= 1, got {base_cell}")
    _require_integral(
        "interval_overlap_join",
        (left, left_lo), (left, left_hi), (right, right_lo),
        (right, right_hi),
    )

    def _with_tier(df: DataFrame, lo: Column, hi: Column) -> DataFrame:
        w = (hi - lo).cast("long")
        t0 = F.greatest(
            F.ceil(F.log2(w.cast("double") / F.lit(float(base_cell)))),
            F.lit(0),
        ).cast("int")
        return df.filter(hi > lo).withColumn("_ij_t0", t0).withColumn(
            "_ij_tier",
            (
                F.col("_ij_t0")
                + F.when(
                    w
                    > F.expr(
                        f"shiftleft(CAST({base_cell} AS BIGINT), _ij_t0)"
                    ),
                    1,
                ).otherwise(0)
            ).cast("int"),
        ).drop("_ij_t0")

    cell_width = F.expr(f"shiftleft(CAST({base_cell} AS BIGINT), _ij_tier)")

    def _cells(df: DataFrame, lo: Column, hi: Column) -> DataFrame:
        return df.withColumn(
            "_ij_cell",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(lo / cell_width).cast("long"),
                        F.floor((hi - 1) / cell_width).cast("long"),
                    )
                )
            ),
        )

    def _replicated(df: DataFrame, lo: Column, hi: Column,
                    tiers: list[int], strict: bool) -> DataFrame:
        op = (lambda t: t > F.col("_ij_tier")) if strict \
            else (lambda t: t >= F.col("_ij_tier"))
        tier_arr = F.array(*[F.lit(int(t)) for t in sorted(tiers)])
        rep = df.withColumn(
            "_ij_t", F.explode(F.filter(tier_arr, op))
        ).drop("_ij_tier").withColumnRenamed("_ij_t", "_ij_tier")
        return _cells(rep, lo, hi)

    l_lo, l_hi = F.col(left_lo), F.col(left_hi)
    r_lo, r_hi = F.col(right_lo), F.col(right_hi)
    lt = _with_tier(left, l_lo, l_hi)
    rt = _with_tier(right, r_lo, r_hi)
    # bounded collect: occurring tiers per side — ≤ ~log2(max width).
    # ONE side-tagged union action instead of two per-side collects
    # (guide §1: the probes were two full construction-time jobs; the
    # union computes the identical two distinct sets in one)
    tier_rows = (
        lt.select(F.lit(0).alias("_s"), "_ij_tier")
        .unionByName(rt.select(F.lit(1).alias("_s"), "_ij_tier"))
        .distinct()
        .collect()
    )
    l_tiers = sorted(r[1] for r in tier_rows if r[0] == 0) or [0]
    r_tiers = sorted(r[1] for r in tier_rows if r[0] == 1) or [0]
    keys = ["_ij_tier", "_ij_cell"]
    cand1 = _replicated(lt, l_lo, l_hi, r_tiers, strict=False).join(
        _cells(rt, r_lo, r_hi), keys
    )
    cand2 = _cells(lt, l_lo, l_hi).join(
        _replicated(rt, r_lo, r_hi, l_tiers, strict=True), keys
    )
    exact = (l_lo < r_hi) & (r_lo < l_hi)
    once = F.col("_ij_cell") == F.floor(
        F.greatest(l_lo, r_lo) / cell_width
    ).cast("long")
    return (
        cand1.unionByName(cand2)
        .filter(exact & once)
        .drop("_ij_tier", "_ij_cell")
    )


def dominance_count(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    k_buckets: int | None = None,
) -> DataFrame:
    """Exact 2-D dominance count — the general IEJoin AGGREGATE: for
    every row ``a``, ``|{b : b.x > a.x AND b.y < a.y}|`` (two strict
    inequalities in opposite directions over one self-relation),
    WITHOUT materializing the quadratic pair set a pair join would
    produce (N=150 k rows ⇒ ~5.6 G qualifying pairs at sf0.1).

    Decomposition (both columns integer):
      * x-cells are the EXACT distinct x values (for a time axis, the
        M distinct days), so a same-x-cell pair can never satisfy the
        strict ``b.x > a.x`` — the x-strip vanishes by construction;
      * y is bucketed into K equal integer ranges. Pairs in strictly
        dominated (x' > x, yc' < yc) grid cells are counted by TWO
        incremental unbounded-preceding window passes over the dense
        M×K grid (suffix over x within each yc, then prefix over yc
        within each x) and fetched per row by ONE equi-join on the
        row's own (x, yc) — dense via sequence-explode so the probe
        cell always exists;
      * the same-y-bucket strip (yc equal, exact ``y_b < y_a`` and
        ``x_b > x_a``) is the only pair join, bounded by Σ|bucket|²
        ≈ N²/K.

    With K ≈ N/√M the grid (M·K) and the strip (N²/K) are BOTH
    O(N·√M) — linear in N for a fixed time domain, never quadratic,
    and every window is a growing frame (incremental, no per-row
    re-aggregation). ``k_buckets=None`` derives K from two bounded
    scalar aggregates. Returns (id_col, x, y, n_dominated) with zero
    counts included. Inputs must be int64; quantize first (epoch days
    / integer cents) — integer counts are engine-exact."""
    import math

    x, y = F.col(x_col), F.col(y_col)
    # rows missing either coordinate cannot be ranked OR dominate —
    # excluded up front (a NULL cell key would otherwise silently
    # null-reject them mid-plan, an inconsistent half-drop)
    t = df.select(F.col(id_col), x.alias("_dx"), y.alias("_dy")).filter(
        x.isNotNull() & y.isNotNull()
    )
    # bounded: 4 scalars (row count, distinct-x count, y bounds) — ONE
    # aggregate job (round 10: the former count / distinct-count / agg
    # trio ran three full input scans at construction; a single
    # partial-aggregated pass returns the same four scalars)
    n_rows, m_x, ymin, ymax = t.agg(
        F.count(F.lit(1)), F.countDistinct("_dx"),
        F.min("_dy"), F.max("_dy"),
    ).first()
    if n_rows == 0:
        # empty input: the binning scalars below would be None —
        # return the (empty) result instead of a TypeError
        return t.select(
            F.col(id_col), F.col("_dx").alias(x_col),
            F.col("_dy").alias(y_col),
            F.lit(0).cast("bigint").alias("n_dominated"),
        )
    if k_buckets is None:
        k_buckets = max(64, math.ceil(n_rows / math.sqrt(max(m_x, 1))))
    span = max(int(ymax) - int(ymin) + 1, 1)
    # integer bucket index — exact in any engine (no double division)
    yc = F.expr(f"((_dy - {int(ymin)}) * {int(k_buckets)}) DIV {span}")
    rows = t.withColumn("_dyc", yc)

    cells = rows.groupBy("_dx", "_dyc").agg(F.count(F.lit(1)).alias("_n"))
    grid = (
        rows.select("_dx").distinct()
        .withColumn(
            "_dyc",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.lit(int(k_buckets) - 1).cast("long"),
                )
            ),
        )
        .join(cells, ["_dx", "_dyc"], "left")
        .select("_dx", "_dyc", F.coalesce("_n", F.lit(0)).alias("_n"))
    )
    from pyspark.sql import Window

    w_sx = (
        Window.partitionBy("_dyc").orderBy(F.col("_dx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_py = (
        Window.partitionBy("_dx").orderBy("_dyc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = (
        grid.withColumn("_sx", F.coalesce(F.sum("_n").over(w_sx), F.lit(0)))
        .withColumn("_g", F.coalesce(F.sum("_sx").over(w_py), F.lit(0)))
        .select("_dx", "_dyc", "_g")
    )
    strip = (
        rows.select(F.col(id_col).alias("_ida"), F.col("_dx").alias("_xa"),
                    F.col("_dy").alias("_ya"), "_dyc")
        .join(rows.select(F.col("_dx").alias("_xb"),
                          F.col("_dy").alias("_yb"), "_dyc"), "_dyc")
        .filter((F.col("_yb") < F.col("_ya")) & (F.col("_xb") > F.col("_xa")))
        .groupBy("_ida")
        .agg(F.count(F.lit(1)).alias("_strip"))
    )
    return (
        rows.join(g, ["_dx", "_dyc"])
        .join(strip, rows[id_col] == strip["_ida"], "left")
        .select(
            F.col(id_col),
            F.col("_dx").alias("x"),
            F.col("_dy").alias("y"),
            (F.col("_g") + F.coalesce("_strip", F.lit(0)))
            .cast("long").alias("n_dominated"),
        )
    )


def iejoin_pairs(
    left: DataFrame,
    right: DataFrame,
    left_x: str,
    right_x: str,
    left_y: str,
    right_y: str,
    n_buckets: int = 8,
    edges: str = "uniform",
) -> DataFrame:
    """Exact inequality-PAIR join — the IEJoin query class (two strict
    inequalities in opposite directions: ``left.x < right.x AND
    left.y > right.y``; Khayyat et al., "Lightning Fast and Space
    Efficient Inequality Joins", VLDB'15). The last thesis-discussed-
    but-unimplemented item (thesis ch. 5.4 theta joins, "Further Work"
    ch. 7; SURVEY.md §2.3 "Absent"): where :func:`dominance_count`
    returns per-row COUNTS without materializing pairs, this returns
    the qualifying PAIRS themselves — the join form.

    Spark-native decomposition (the single-node IEJoin's sorted-array
    + permutation + bitmap walk doesn't distribute): a 2-D integer
    grid over both inequality columns, exact-int bucket math shared by
    both sides (two bounded 4-scalar aggregates fix the domain).
    Bucketing is monotone, so a qualifying pair's cells satisfy
    ``cx_l ≤ cx_r`` and ``cy_l ≥ cy_r``; each LEFT row replicates to
    exactly those candidate cells (two sequence-explodes: x-cells
    bx..B-1, y-cells 0..by) and each RIGHT row keeps its ONE home
    cell, so the candidate stage is a plain EQUI-join on (cx, cy) —
    never a BroadcastNestedLoopJoin/CartesianProduct — and every pair
    meets exactly once (the right side's home cell is unique; no
    DISTINCT needed). The exact predicate filters the boundary cells
    (same-bucket ties); interior cells pass it trivially.

    Cost model: left shuffle volume = |L| × (B−bx)(by+1) ≈ |L|·B²/4
    replicas; false candidates are confined to the ~2/B boundary
    strips, so candidate volume ≈ output + O(N²/B). Pick ``n_buckets``
    ≈ N^(1/2) / output-density for big inputs; the default 8 suits
    catalog-scale slices. Skew note: one hot (cx, cy) cell's cross
    product sits on a single join key (AQE splits shuffle partitions,
    not keys) — for heavily clustered domains pass
    ``edges="quantile"``: bucket boundaries come from approximate
    quantiles of the UNION of both sides per dimension (one bounded
    b−1-scalar probe per axis, Greenwald-Khanna — the same move as
    the dedup salt-splits' stats probe), so each bucket strip holds
    ~1/b of the data regardless of value clustering. Any monotone
    non-decreasing bucketing preserves the candidate-cell containment
    and the exactly-once guarantee, so the two modes are
    output-identical (pinned by test) and differ only in candidate
    volume / cell balance. Default stays "uniform": zero extra probe
    cost, and exact integer math with no quantile-sketch dependence.

    Columns must be INTEGER-typed (exact bucket math — quantize
    timestamps to epoch days / prices to cents first) and disjoint
    between the two sides. NULLs in either column cannot satisfy a
    strict inequality and are dropped up front on both sides.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if edges not in ("uniform", "quantile"):
        raise ValueError(
            f"edges must be 'uniform' or 'quantile', got {edges!r}"
        )
    _require_integral(
        "iejoin_pairs",
        (left, left_x), (left, left_y), (right, right_x), (right, right_y),
    )
    b = int(n_buckets)
    lx, ly = F.col(left_x), F.col(left_y)
    rx, ry = F.col(right_x), F.col(right_y)
    lt = left.filter(lx.isNotNull() & ly.isNotNull())
    rt = right.filter(rx.isNotNull() & ry.isNotNull())
    # bounded: 4 scalars per side fix the shared bucket domain — both
    # sides' aggregates ride ONE side-tagged union action (guide §1:
    # was two construction-time jobs for the same eight scalars)
    def _bounds(df, xc, yc, side):
        return df.agg(
            F.lit(side).alias("_s"),
            F.min(xc).alias("_x0"), F.max(xc).alias("_x1"),
            F.min(yc).alias("_y0"), F.max(yc).alias("_y1"),
        )

    bound_rows = {
        r[0]: r
        for r in _bounds(lt, lx, ly, 0)
        .unionByName(_bounds(rt, rx, ry, 1))
        .collect()
    }
    lb = bound_rows[0][1:]
    rb = bound_rows[1][1:]
    if lb[0] is None or rb[0] is None:
        # one side empty: empty result via a never-matching EQUI join
        # (a lit(False) join condition would plan as a nested loop)
        return (
            lt.withColumn("_ie_z", F.lit(0))
            .join(rt.withColumn("_ie_z", F.lit(1)), "_ie_z")
            .drop("_ie_z")
        )
    xmin = min(int(lb[0]), int(rb[0]))
    xspan = max(max(int(lb[1]), int(rb[1])) - xmin + 1, 1)
    ymin = min(int(lb[2]), int(rb[2]))
    yspan = max(max(int(lb[3]), int(rb[3])) - ymin + 1, 1)

    def _bucket(col: str, lo: int, span: int):
        # exact integer bucket index in [0, b) — engine-exact, no
        # double division (same math as dominance_count)
        return F.expr(f"(({col} - {lo}) * {b}) DIV {span}").cast("int")

    def _edge_bucket(col: str, cuts: list[float]):
        # index = count of interior edges <= value: monotone
        # non-decreasing into [0, b-1] for ANY sorted cut list
        # (duplicate cuts from heavy-hitter values just leave empty
        # buckets); O(b) per row over a literal array
        arr = ", ".join(f"CAST({float(e)!r} AS DOUBLE)" for e in cuts)
        return F.expr(
            f"aggregate(array({arr}), 0, "
            f"(acc, e) -> acc + IF({col} >= e, 1, 0))"
        ).cast("int")

    if edges == "quantile" and b > 1:
        probs = [i / b for i in range(1, b)]
        err = 1.0 / (4 * b)
        # ONE union scan probing both axes (multi-column
        # approxQuantile) — two per-axis unions would recompute the
        # full upstream twice for identical cuts
        xcuts, ycuts = (
            lt.select(lx.cast("double").alias("vx"),
                      ly.cast("double").alias("vy"))
            .union(rt.select(rx.cast("double").alias("vx"),
                             ry.cast("double").alias("vy")))
            .approxQuantile(["vx", "vy"], probs, err)
        )
        bx_l, by_l = _edge_bucket(left_x, xcuts), _edge_bucket(left_y, ycuts)
        bx_r, by_r = _edge_bucket(right_x, xcuts), _edge_bucket(right_y, ycuts)
    else:
        bx_l, by_l = _bucket(left_x, xmin, xspan), _bucket(left_y, ymin, yspan)
        bx_r, by_r = _bucket(right_x, xmin, xspan), _bucket(right_y, ymin, yspan)

    l2 = (
        lt.withColumn(
            "_ie_cx", F.explode(F.sequence(bx_l, F.lit(b - 1)))
        ).withColumn(
            "_ie_cy", F.explode(F.sequence(F.lit(0), by_l))
        )
    )
    r2 = rt.withColumn("_ie_cx", bx_r).withColumn("_ie_cy", by_r)
    return (
        l2.join(r2, ["_ie_cx", "_ie_cy"])
        .filter((lx < rx) & (ly > ry))
        .drop("_ie_cx", "_ie_cy")
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    width: float,
) -> DataFrame:
    """Large-×-large band (theta) join: pairs with
    ``|left_col - right_col| <= width`` — the join class the thesis
    discusses but never implements (ch. 5.4; SURVEY.md §2.3 "Absent").

    A nested-loop plan is quadratic and only viable when one side
    broadcasts (see the ``join_range_bands`` query for that case).
    This is the shape that scales: bucket both sides by
    ``floor(x / width)``; a qualifying pair's buckets differ by at
    most 1, so exploding the left row into its bucket ± 1 and
    EQUI-joining on the bucket finds every candidate exactly once
    (the right row's bucket is unique), then the exact band predicate
    filters. Cost: one 3× fan-out + a hash-partitioned shuffle join —
    O(matching pairs), never O(|L|·|R|).

    Column names must be disjoint between the two sides.
    """
    if not width > 0:
        raise ValueError(
            f"band_join width must be > 0, got {width}: width=0 makes the "
            f"bucket expression divide by zero (NULL buckets join nothing) "
            f"and negative widths silently invert the band semantics"
        )
    lb = F.floor(F.col(left_col) / F.lit(width)).cast("long")
    l_exp = left.withColumn(
        "_band_bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r_b = right.withColumn(
        "_band_bucket", F.floor(F.col(right_col) / F.lit(width)).cast("long")
    )
    return (
        l_exp.join(r_b, "_band_bucket")
        .filter(F.abs(F.col(left_col) - F.col(right_col)) <= F.lit(width))
        .drop("_band_bucket")
    )


def advise_strategy(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    broadcast_budget_bytes: int = 512 * 1024 * 1024,
    skew_threshold: float = 0.2,
    skew_sample_rows: int = 100_000,
) -> tuple[str, str]:
    """The thesis's manual join-strategy decision tree (Fig. 6.11,
    ch. 6.4.1) codified over engine statistics — the reference's
    'human optimizer' (SURVEY.md §4.1) as a function. Returns
    ``(strategy, reason)`` suitable for ``equi_join(strategy=...)``.

    Order of tests, per the figure:
      1. inputs pre-sorted & co-partitioned  → 'merge'
         (here: both plans already hash-partitioned on the join keys —
         e.g. co-bucketed tables — so SMJ runs with no Exchange);
      2. smaller side fits the broadcast budget → 'broadcast'
         (Catalyst size estimate, same source as
         ``broadcast_budget_check``);
      3. otherwise → 'repartition' (the thesis's default; also its
         high-skew recommendation — with AQE skew-split handling what
         the reference solved by capping partition counts).

    The skew probe (heaviest-key share of a bounded sample) is
    reported in the reason string for observability; it never changes
    the choice away from 'repartition' — matching the figure, where
    skew only steers *away* from merge/broadcast.

    Budget posture (round-10): ``broadcast_budget_bytes`` models what
    one executor can afford to hold; the default 512 MiB is tuned for
    the single-node bench, where the measured scorecard agrees with
    every decided pick. On a many-executor cluster the SAME relation
    is also replicated executor-count times over the network, so
    callers should pass a tighter budget there. Note also the
    estimate's known blind spots, both measured this round: (a)
    Catalyst reports pruned parquet FILE bytes, which dictionary-heavy
    columns undercut ~25× vs their in-memory width — when the caller
    knows the row count, ``broadcast_budget_check(df, rows=...)``
    enforces a schema-width floor the compression can't fool; (b) a
    build side with heavy duplicate keys (the double-skew experiment)
    makes BroadcastHashJoin pay per-match list iteration that the
    size estimate never sees — at equal bytes a dup-key build measured
    ~5× slower than the shuffle it was meant to avoid (REPORT.md
    double-skew table).
    """
    right_on = right_on or left_on

    # "pre-sorted & co-partitioned?" — ask Catalyst directly: plan the
    # hinted sort-merge join and see whether EnsureRequirements inserts
    # any Exchange. Zero exchanges ⇔ co-bucketed/co-partitioned inputs
    # (a bare bucketed scan hides its partitioning under
    # autoBucketedScan, so probing the join is the reliable check).
    from ..plans.explain import count_shuffles

    probe = left.hint("merge").join(
        right, left[left_on] == right[right_on], "inner"
    )
    if count_shuffles(probe) == 0:
        return "merge", "sort-merge join plans with zero Exchange (co-partitioned)"

    lsize, rsize = _size_estimate(left), _size_estimate(right)
    small = min(lsize, rsize)
    if small <= broadcast_budget_bytes:
        side = "right" if rsize <= lsize else "left"
        return "broadcast", (
            f"{side} side estimated {small} B <= budget {broadcast_budget_bytes} B"
        )

    probe_col, probe_df = (left_on, left) if lsize >= rsize else (right_on, right)
    # single action over one bounded sample: heaviest-key count and
    # sample size come from the same groupBy pass (two separate
    # collect/count actions could observe different limit() rows)
    stats = (
        probe_df.select(probe_col)
        .limit(skew_sample_rows)
        .groupBy(probe_col)
        .count()
        .agg(F.max("count").alias("top"), F.sum("count").alias("n"))
        .collect()[0]
    )
    n = stats["n"] or 0
    share = (stats["top"] / n) if n else 0.0
    skew_note = (
        f"hot key holds {share:.0%} of a {n}-row sample"
        if share >= skew_threshold
        else "no significant skew in sample"
    )
    return "repartition", f"no side fits broadcast budget; {skew_note}"


def join_cardinality_estimate(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    sample_buckets: int = 100,
    sample_take: int = 25,
    salt: str = "card",
) -> DataFrame:
    """Estimate |left ⋈ right| on an equi-key WITHOUT running the join
    — the output-size input the strategy advisor
    (``choose_join_strategy``) and the thesis's cost model
    (ch. 6 decision tree) need before picking repartition vs
    broadcast. Exact join size is Σ_k n_L(k)·n_R(k); the estimator
    computes that sum over a deterministic md5 HASH SAMPLE OF KEYS
    (every occurrence of a sampled key on both sides is kept, so
    per-key products are EXACT and skew is never smoothed away —
    unlike row-level Bernoulli sampling, which underestimates hot-key
    fan-out quadratically) and scales by the inverse sampling rate.

    Returns one row: sampled per-key pair sum, the scaled estimate,
    the exact value, and the relative error — the exact branch shares
    the per-key count aggregate with the sampled branch (exchange
    reuse), so the whole diagnostic costs two count aggregations and
    a key-histogram join, never the joined row set itself.

    Determinism: the sample is a pure function of (key, salt) via
    ``md5_hash32``, and est/rel_err are plain double arithmetic over
    exact BIGINT sums — engine-reproducible with NO rounding (exact
    integer ratios divide bit-identically cross-engine; rounding them
    is what diverges at decimal half-boundaries).
    """
    from .sampling import hash_bucket

    lk = (
        left.select(F.col(left_on).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_l"))
    )
    rk = (
        right.select(F.col(right_on).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    )
    per_key = lk.join(rk, "k").select(
        "k", (F.col("n_l") * F.col("n_r")).alias("pairs")
    )
    sampled = per_key.filter(
        hash_bucket("k", sample_buckets, salt) < sample_take
    ).agg(F.coalesce(F.sum("pairs"), F.lit(0))
          .cast("long").alias("sampled_pairs"))
    # coalesce: a zero-overlap join has an EMPTY per-key histogram and
    # sum-over-empty is NULL; the diagnostic row should say 0 pairs
    exact = per_key.agg(F.coalesce(F.sum("pairs"), F.lit(0))
                        .cast("long").alias("exact_pairs"))
    # bounded: two single-row aggregate scalars
    out = sampled.join(F.broadcast(exact))
    scale = F.lit(float(sample_buckets)) / F.lit(float(sample_take))
    est = F.col("sampled_pairs").cast("double") * scale
    return out.select(
        "sampled_pairs",
        est.alias("est_pairs"),
        "exact_pairs",
        # try_divide: disjoint key sets give exact_pairs = 0, and under
        # the repo's ANSI sessions plain '/' would raise DIVIDE_BY_ZERO
        # instead of returning the diagnostic row (NULL rel_err)
        F.try_divide(
            F.abs(est - F.col("exact_pairs").cast("double")),
            F.col("exact_pairs").cast("double"),
        ).alias("rel_err"),
    )


def grid_distance_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """2-D self-join on Euclidean distance: all unordered pairs with
    ``dist² ≤ radius²`` — the spatial analogue of ``band_join``
    (spatial blocking à la GeoSpark/Sedona's grid partitioner, built
    from relational primitives).

    Plan: snap each point to a ``radius × radius`` grid cell; a
    qualifying pair's cells differ by ≤ 1 in each axis, so exploding
    one side into its 3×3 cell neighborhood and EQUI-joining on the
    cell finds every candidate EXACTLY ONCE (the build row's home cell
    is unique — no DISTINCT pass), then the exact predicate filters.
    Cost: a 9× fan-out of one side + one hash-partitioned equi-join —
    O(candidates in neighboring cells), never the O(N²) cross join,
    and cell-hash partitioning spreads uniformly at any N.

    Coordinates are expected INTEGER (grid units): distances then stay
    in exact BIGINT arithmetic end-to-end — ``dist_sq`` is
    engine-bit-identical, no float epsilon anywhere. ``id_a < id_b``
    canonicalizes pair order.
    """
    if radius <= 0:
        raise ValueError(
            f"radius must be a positive integer, got {radius} "
            "(0 divides by zero building cells; negative inverts them)"
        )
    cx = F.floor(F.col(x_col) / radius).cast("long")
    cy = F.floor(F.col(y_col) / radius).cast("long")
    probe = points.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("_xa"),
        F.col(y_col).alias("_ya"),
        F.explode(
            F.flatten(
                F.array(*[
                    F.array(*[
                        F.struct(
                            (cx + dx).alias("_cx"), (cy + dy).alias("_cy")
                        )
                        for dy in (-1, 0, 1)
                    ])
                    for dx in (-1, 0, 1)
                ])
            )
        ).alias("_cell"),
    ).select("id_a", "_xa", "_ya", "_cell._cx", "_cell._cy")
    build = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("_xb"),
        F.col(y_col).alias("_yb"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    d2 = (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb")) + (
        F.col("_ya") - F.col("_yb")
    ) * (F.col("_ya") - F.col("_yb"))
    return (
        probe.join(build, ["_cx", "_cy"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (d2 <= F.lit(radius) * F.lit(radius))
        )
        .select("id_a", "id_b", d2.cast("bigint").alias("dist_sq"))
    )


def bloom_prune_stats(
    fact_keys: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    n_bits: int = 8192,
    n_hashes: int = 3,
    salt: str = "bl",
) -> DataFrame:
    """Bloom-filter runtime pruning (Bloom, CACM 1970) — the
    sideways-information-passing pattern every 100 TB engine applies
    before an expensive fact-side shuffle join (Spark's own
    ``spark.sql.optimizer.runtimeFilter.bloomFilter`` injects the same
    shape): hash the build-side join keys into an ``n_bits`` bitset,
    broadcast it, and drop probe rows whose key misses ANY of the
    ``n_hashes`` positions — only passes (members + a bounded
    false-positive residue) reach the shuffle.

    Unlike ``bloom_filter_agg``'s opaque binary, the bitset here is the
    md5 grid convention (`h_j(k) = md5(j:k:salt) % n_bits`), so every
    bit — and therefore the exact false-positive SET, not just a rate
    bound — replays bit-for-bit in any md5-capable engine: the oracle
    can hash-compare pruning decisions, which an opaque sketch can
    never prove.

    Plan shape: the bitset materializes as a ≤ ``n_bits``-row distinct
    position table (broadcast by construction); probing explodes each
    DISTINCT probe key ×``n_hashes`` and equi-joins the broadcast —
    a narrow pass over the key dictionary, the fact table itself is
    never rescanned or reshuffled. Returns one row per distinct probe
    key: (key, bloom_pass, is_member, is_false_pos) — aggregate or
    semi-join it against the fact as needed.
    """
    from .text import md5_hash32

    def positions(c):
        return [
            (
                md5_hash32(
                    F.concat(
                        F.lit(f"{j}:"), c.cast("string"), F.lit(salt)
                    )
                )
                % n_bits
            )
            for j in range(n_hashes)
        ]

    dkeys = dim_keys.select(F.col(key_col).alias("_k")).distinct()
    bits = (
        dkeys.select(
            F.explode(F.array(*positions(F.col("_k")))).alias("_pos")
        )
        .distinct()
        .withColumn("_set", F.lit(1))
    )
    pkeys = fact_keys.select(F.col(key_col)).distinct()
    cells = pkeys.select(
        key_col,
        F.posexplode(F.array(*positions(F.col(key_col)))).alias(
            "_j", "_pos"
        ),
    )
    # bounded: the bitset is at most n_bits distinct position rows
    probed = (
        cells.join(F.broadcast(bits), "_pos", "left")
        .groupBy(key_col)
        .agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce("_set", F.lit(0))))
            .alias("bloom_pass")
        )
    )
    member = dkeys.withColumn("_m", F.lit(True))
    return (
        probed.join(member, probed[key_col] == member["_k"], "left")
        .select(
            key_col,
            "bloom_pass",
            F.coalesce("_m", F.lit(False)).alias("is_member"),
            (F.col("bloom_pass") & F.coalesce(~F.col("_m"), F.lit(True)))
            .alias("is_false_pos"),
        )
    )


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Nearest-neighbor as-of join: for each left row, the right row
    (same key) temporally CLOSEST in either direction — the sensor /
    quote-alignment semantic where plain backward as-of silently drops
    rows that only have a later match. Equal distance resolves to the
    backward match; a right row at the exact left timestamp is a
    distance-0 backward match. Left-outer: keyless left rows keep
    NULLs and a NULL distance.

    Same scale shape as ``asof_join`` (its docstring has the union+
    window rationale): both sides tagged and unioned, then the
    backward pass (ascending last-seen carry) and the forward pass
    (descending re-sort, same technique) run over ONE key exchange —
    the second window re-sorts within partitions but never reshuffles.
    Tie groups (multiple right rows sharing (key, ts)) yield the
    max-payload survivor in BOTH directions (the forward window orders
    payload columns ascending under the descending timestamp so
    ``last`` lands on the same survivor the backward pass picks).
    Distances are exact epoch-µs BIGINTs.
    """
    from pyspark.sql.window import Window

    # timestamps are carried as exact epoch-µs BIGINTs (left_ts_us /
    # nearest_ts_us); raw timestamp columns never reach the output
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    tagged_l = left.select(
        F.col(on).alias("_k"),
        l_us.alias("_us"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        r_us.alias("_us"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c) for c in rcols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_us", "_side", *rcols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_us").desc(), F.col("_side").asc(), *rcols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # timestamp AND payload travel in ONE struct per direction, so the
    # picked row is atomic: per-column last(ignorenulls) would skip a
    # genuinely-NULL payload field and stitch the output from two
    # different right rows (worse here than in asof_join — the
    # reported nearest_ts_us and the payload could disagree)
    rstruct = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_us").alias("_rus"), *[F.col(c) for c in rcols]
        ),
    )
    carried = unioned.select(
        "_k", "_us", "_side", *lcols,
        F.last(rstruct, ignorenulls=True).over(w_back).alias("_b"),
        F.last(rstruct, ignorenulls=True).over(w_fwd).alias("_f"),
    ).filter(F.col("_side") == 1)
    bus, fus = F.col("_b")["_rus"], F.col("_f")["_rus"]
    bd = F.col("_us") - bus
    fd = fus - F.col("_us")
    pick_b = bus.isNotNull() & (fus.isNull() | (bd <= fd))
    return carried.select(
        F.col("_k").alias(on),
        F.col("_us").alias("left_ts_us"),
        *lcols,
        F.when(pick_b, bus).otherwise(fus).alias("nearest_ts_us"),
        *[
            F.when(pick_b, F.col("_b")[c])
            .otherwise(F.col("_f")[c])
            .alias(c)
            for c in rcols
        ],
        F.when(pick_b, bd)
        .when(fus.isNotNull(), fd)
        .alias("nearest_dist_us"),
    )
