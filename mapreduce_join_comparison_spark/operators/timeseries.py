"""Time-series resampling: fixed-bin downsample + gap fill + LOCF.

The hypertable/continuous-aggregate capability of time-series stores,
composed from Spark built-ins (the reference has no time dimension at
all; this is part of the scale extension alongside the events suite):

  1. bin each event to a fixed window (epoch-µs integer division —
     no timezone arithmetic, so any engine reproduces the bins),
  2. per (series, bin): event count + last observed value (window
     row_number, deterministic tiebreak on (ts, event_id)),
  3. build the dense bin grid (global [min, max] bin span × distinct
     series — both tiny aggregates; sequence+explode generates the
     grid without driver participation),
  4. left-join observations onto the grid and carry the last
     observation forward (``last(..., ignorenulls)`` over an
     unbounded-preceding row frame).

Scale notes: steps 1-2 are one partial-agg-collapsed shuffle of the
raw events; the grid is O(series × bins) ≪ O(events) and joins with
one exchange of the (already collapsed) per-bin rows. The LOCF window
serializes per series — with few long series, chunk the fill per
(series, day) and seed each chunk with the previous day's closing
value (documented here; the per-series form is what the catalog query
exercises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .aggregates import _nullsafe_broadcast_join


def _nullsafe_left_join(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """LEFT join on ``keys`` with NULL-safe equality — the left-outer
    sibling of ``aggregates._nullsafe_broadcast_join`` (same round-6
    lesson: a plain key-list join silently null-rejects the NULL
    series, so its bin aggregates vanish and the binned forms diverge
    from the direct windows they claim to reproduce). No forced
    broadcast: both sides here are bin-grain aggregates whose size
    tracks series × bins, and ``<=>`` is still hash-joinable."""
    renamed = right.select(
        *[F.col(k).alias(f"_nsl_{k}") for k in keys],
        *[c for c in right.columns if c not in keys],
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_nsl_{k}"))
        cond = c if cond is None else cond & c
    return left.join(renamed, cond, "left").drop(
        *[f"_nsl_{k}" for k in keys]
    )


def _dense_per_bin(
    events: DataFrame,
    bin_micros: int,
    series_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Shared resample front half: bin events, collapse each
    (series, bin) to (n_events, last observed value), left-join onto
    the dense series × [min, max] bin grid (gap bins carry NULL
    last_v). One partial-agg shuffle of the raw events; the grid is
    O(series × bins) ≪ O(events)."""
    us = F.unix_micros(F.col(ts_col))
    binned = events.select(
        F.col(series_col).alias("series"),
        F.floor(us / F.lit(bin_micros)).cast("bigint").alias("bin"),
        us.alias("_us"),
        F.col(value_col).alias("_v"),
        F.col(tiebreak_col).alias("_tb"),
    )
    w_last = Window.partitionBy("series", "bin").orderBy(
        F.col("_us").desc(), F.col("_tb").desc()
    )
    per_bin = (
        binned.withColumn("_rn", F.row_number().over(w_last))
        .groupBy("series", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("_rn") == 1, F.col("_v"))).alias("last_v"),
        )
    )
    bounds = binned.groupBy().agg(
        F.min("bin").alias("lo"), F.max("bin").alias("hi")
    )
    series = binned.select("series").distinct()
    grid = series.crossJoin(
        # bounded: single global (lo, hi) row
        F.broadcast(bounds).select(
            F.explode(F.sequence("lo", "hi")).alias("bin")
        )
    )
    return _nullsafe_left_join(grid, per_bin, ["series", "bin"])


def resample_locf(
    events: DataFrame,
    bin_micros: int = 900_000_000,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Dense per-series timeline at ``bin_micros`` resolution:
    (series, bin_start_us, n_events, value_locf) where gap bins carry
    n_events = 0 and the last observed value; bins before a series'
    first observation keep NULL."""
    joined = _dense_per_bin(
        events, bin_micros, series_col, ts_col, value_col, tiebreak_col
    )
    w_fill = (
        Window.partitionBy("series")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "series",
        (F.col("bin") * F.lit(bin_micros)).cast("bigint").alias("bin_start_us"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.round(
            F.last("last_v", ignorenulls=True).over(w_fill), 4
        ).alias("value_locf"),
    )


def resample_interpolate(
    events: DataFrame,
    bin_micros: int = 900_000_000,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """LINEAR-interpolation twin of ``resample_locf``: gap bins between
    two observations get the straight-line value between the previous
    and next observed (bin, value); bins after the last observation
    carry it forward (LOCF tail); bins before the first stay NULL.

    Cross-engine determinism: observed values quantize to integer
    MILLI-units first (the ``rolling_zscore_anomalies`` convention —
    a scale-0 round has no engine-divergent internal multiply), so
    every subsequent step — vm0 + ((vm1 − vm0)·(bin − b0)) / (b1 − b0),
    then /1000.0 — is a single correctly-rounded IEEE-754 op over
    EXACTLY-representable operands: any engine reproduces the double
    bit-for-bit, and the result ships UNROUNDED (a final ROUND(x, k)
    is where engines disagree on .5-boundary doubles). The observed-bin
    case is guarded by ``b1 ≤ b0`` (never a 0/0 division, whose
    NULL-vs-NaN semantics differ between engines).

    Scale: the shared ``_dense_per_bin`` shuffle, then prev/next
    observation lookups as two ignore-nulls ``last`` windows over ONE
    exchange — the "next" lookup runs over a DESCENDING re-sort with
    an unbounded-PRECEDING frame rather than the tempting
    ``first(...) over (current → unbounded following)``: Spark's
    unbounded-following frame re-evaluates the aggregate per row,
    O(rows²) in the partition (a year of minute bins per series would
    never finish), while both preceding-frame windows are incremental
    O(rows); the extra per-partition sort is the cheap price. Grid
    sized O(series × bins)."""
    joined = _dense_per_bin(
        events, bin_micros, series_col, ts_col, value_col, tiebreak_col
    ).withColumn("_vm", F.round(F.col("last_v") * 1000).cast("bigint"))
    w_prev = (
        Window.partitionBy("series")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("series")
        .orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bin = F.when(F.col("_vm").isNotNull(), F.col("bin"))
    vm0 = F.last("_vm", ignorenulls=True).over(w_prev)
    b0 = F.last(obs_bin, ignorenulls=True).over(w_prev)
    vm1 = F.last("_vm", ignorenulls=True).over(w_next)
    b1 = F.last(obs_bin, ignorenulls=True).over(w_next)
    interp_milli = (
        F.when(vm0.isNull(), F.lit(None).cast("double"))
        .when(vm1.isNull() | (b1 <= b0), vm0.cast("double"))
        .otherwise(vm0 + ((vm1 - vm0) * (F.col("bin") - b0)) / (b1 - b0))
    )
    return joined.select(
        "series",
        (F.col("bin") * F.lit(bin_micros)).cast("bigint").alias("bin_start_us"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        (interp_milli / F.lit(1000.0)).alias("value_interp"),
    )


def _finish_zscore(
    stats: DataFrame,
    series_col: str,
    id_col: str,
    min_points: int,
    z_threshold: float,
) -> DataFrame:
    """Shared z-score tail over exact int64 (_s1, _s2, _n, _vm, _us):
    both the direct RANGE-frame form and the binned two-level form end
    here, so "binned ≡ direct" is an identity of expression trees over
    identical integers — bit-equal doubles, not an approximation."""
    vm = F.col("_vm")
    mean = F.col("_s1") / F.col("_n")
    var = F.col("_s2") / F.col("_n") - mean * mean
    z = F.round((vm - mean) / F.sqrt(var), 4)
    return (
        stats.filter((F.col("_n") >= min_points) & (var > 0))
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= z_threshold)
        .select(
            F.col(id_col),
            F.col(series_col),
            F.col("_us").alias("ts_us"),
            (vm / 1000.0).alias("value"),
            "zscore",
            F.col("_n").cast("long").alias("n_window"),
        )
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_us: int = 24 * 3600 * 1_000_000,
    min_points: int = 30,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Time-range rolling z-score anomaly detection: per series, each
    point is scored against the mean/std of the trailing ``window_us``
    interval (RANGE frame over epoch micros — event-time, not
    row-count, so irregular series are handled correctly).

    Cross-engine determinism: values are quantized to integer
    MILLI-units first, so the windowed Σv and Σv² are EXACT int64
    window aggregates (no float summation-order drift); mean and
    population variance are then derived with the identical expression
    tree in both engines, and the threshold compares the ROUNDED
    z-score. One shuffle (the series × time sort).

    Cost model: Spark evaluates BOUNDED-START range frames by
    re-aggregating each row's frame (sums are not retractable), so the
    window pass is O(rows × frame_rows) per series — AND the whole
    series serializes into one partition. This direct form is kept as
    the reference/property-test twin; the scale path is
    ``rolling_zscore_anomalies_binned`` below, which produces
    bit-identical output in O(rows + bins × bins_per_window) with
    (series, bin)-parallel windows. The streaming analog is the
    watermarked sliding window.
    """
    w = (
        Window.partitionBy(series_col)
        .orderBy("_us")
        .rangeBetween(-window_us, 0)
    )
    vm = F.col("_vm")
    base = df.select(
        F.col(id_col),
        F.col(series_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.round(F.col(value_col) * 1000).cast("bigint").alias("_vm"),
    )
    stats = base.select(
        id_col,
        series_col,
        "_us",
        "_vm",
        F.sum(vm).over(w).alias("_s1"),
        F.sum(vm * vm).over(w).alias("_s2"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )
    return _finish_zscore(stats, series_col, id_col, min_points, z_threshold)


def rolling_zscore_anomalies_binned(
    df: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_us: int = 24 * 3600 * 1_000_000,
    min_points: int = 30,
    z_threshold: float = 3.0,
    bins_per_window: int = 24,
) -> DataFrame:
    """Two-level binned form of ``rolling_zscore_anomalies`` —
    BIT-IDENTICAL output, O(rows + bins × bins_per_window) instead of
    O(rows × frame_rows), and (series, bin)-parallel instead of one
    partition per series.

    Each point's trailing ``[t − W, t]`` interval is decomposed with
    bin width ``B = W / bins_per_window`` (``k = bins_per_window``,
    ``c = t DIV B``, all integer micros so every identity is exact):

      * FULL: bins ``c−k+1 … c−1`` lie entirely inside the interval —
        their Σv/Σv²/n come from one narrow per-(series, bin) partial
        aggregation, summed by a dense ROWS frame ``[-(k−1), -1]``
        over the per-series bin table (dense via sequence-explode so
        row offsets ARE time offsets; the table is O(bins) ≪ O(rows)).
      * PREF: the point's own bin ``c`` contributes its intra-bin
        prefix ``_us ≤ t`` — an unbounded-preceding RANGE window
        partitioned by (series, bin): incremental in Spark (growing
        frames never re-aggregate) and peer-inclusive, matching the
        direct frame's tie semantics at ``t``.
      * SUF: the oldest bin ``c−k`` (``(t−W) DIV B = c−k`` exactly
        when ``W = k·B``) contributes its suffix ``_us ≥ t−W``. Each
        point emits one PROBE row at ``(series, bin−k, t−W)``; probes
        union with the data rows and a descending-order
        unbounded-preceding RANGE window reads the suffix at exactly
        the probe instant — peers at ``t−W`` included, matching the
        direct frame's closed lower bound. Probes carry NULL value and
        a NULL data-marker, so they contribute nothing to any sum.

    Σv, Σv², n are int64 sums of int64 partials — associativity is
    exact, so the three-way split reproduces the direct form's
    integers bit-for-bit; the mean/variance/z expression tree is then
    literally shared (``_finish_zscore``), making binned ≡ direct an
    equality of doubles, not an approximation (property-tested on
    bin-boundary and timestamp-tie cases in tests/test_round5_ops.py).

    Scale shape: every exchange is O(rows) and keyed by (series, bin)
    or by ``id_col`` — no per-series serialization anywhere except the
    O(bins)-row FULL window. Requires ``id_col`` unique (the probe
    join-back is 1:1) and ``window_us % bins_per_window == 0``.
    """
    if window_us % bins_per_window:
        raise ValueError(
            f"window_us={window_us} must be a multiple of "
            f"bins_per_window={bins_per_window}"
        )
    bin_us = window_us // bins_per_window
    k = bins_per_window
    id_type = df.schema[id_col].dataType

    # the series key rides in a 1-field STRUCT: struct equality is
    # NULL-safe per field (a NULL series is a real group that matches
    # itself in plain equi-joins), and because EVERY stage keys on the
    # same struct, hash partitioning flows through unchanged — unlike
    # an eqNullSafe join condition, whose coalesce-rewritten keys hide
    # the upstream partitioning and cost two extra exchanges here
    # (measured 4 -> 6 against the pinned budget)
    base = df.select(
        F.col(id_col),
        F.struct(F.col(series_col)).alias("_skey"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.round(F.col(value_col) * 1000).cast("bigint").alias("_vm"),
    ).withColumn("_bin", F.expr(f"_us DIV {bin_us}"))

    per_bin = base.groupBy("_skey", "_bin").agg(
        F.sum("_vm").alias("b1"),
        F.sum(F.col("_vm") * F.col("_vm")).alias("b2"),
        F.count(F.lit(1)).alias("bn"),
    )
    span = base.groupBy("_skey").agg(
        F.min("_bin").alias("_lo"), F.max("_bin").alias("_hi")
    )
    dense = (
        span.select(
            "_skey",
            F.explode(F.sequence("_lo", "_hi")).alias("_bin"),
        )
        .join(per_bin, ["_skey", "_bin"], "left")
        .select(
            "_skey",
            "_bin",
            F.coalesce("b1", F.lit(0)).alias("b1"),
            F.coalesce("b2", F.lit(0)).alias("b2"),
            F.coalesce("bn", F.lit(0)).alias("bn"),
        )
    )
    if k > 1:
        w_full = (
            Window.partitionBy("_skey")
            .orderBy("_bin")
            .rowsBetween(-(k - 1), -1)
        )
        full = dense.select(
            "_skey",
            "_bin",
            F.sum("b1").over(w_full).alias("f1"),
            F.sum("b2").over(w_full).alias("f2"),
            F.sum("bn").over(w_full).alias("fn"),
        )
    else:
        full = dense.select(
            "_skey",
            "_bin",
            F.lit(None).cast("bigint").alias("f1"),
            F.lit(None).cast("bigint").alias("f2"),
            F.lit(None).cast("bigint").alias("fn"),
        )

    w_pref = (
        Window.partitionBy("_skey", "_bin")
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    pref = base.select(
        id_col,
        "_skey",
        "_us",
        "_vm",
        "_bin",
        F.sum("_vm").over(w_pref).alias("p1"),
        F.sum(F.col("_vm") * F.col("_vm")).over(w_pref).alias("p2"),
        F.count(F.lit(1)).over(w_pref).alias("pn"),
    )

    dat = base.select(
        F.lit(None).cast(id_type).alias("_pid"),
        F.col("_skey"),
        "_bin",
        "_us",
        "_vm",
        F.lit(1).alias("_one"),
    )
    probe = base.select(
        F.col(id_col).alias("_pid"),
        F.col("_skey"),
        (F.col("_bin") - k).alias("_bin"),
        (F.col("_us") - window_us).alias("_us"),
        F.lit(None).cast("bigint").alias("_vm"),
        F.lit(None).cast("int").alias("_one"),
    )
    w_suf = (
        Window.partitionBy("_skey", "_bin")
        .orderBy(F.col("_us").desc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    suf = (
        dat.unionByName(probe)
        .select(
            "_pid",
            F.sum("_vm").over(w_suf).alias("x1"),
            F.sum(F.col("_vm") * F.col("_vm")).over(w_suf).alias("x2"),
            F.count("_one").over(w_suf).alias("xn"),
        )
        .filter(F.col("_pid").isNotNull())
    )

    z = F.lit(0).cast("bigint")
    stats = (
        pref.join(full, ["_skey", "_bin"], "left")
        .join(suf, pref[id_col] == suf["_pid"], "left")
        .select(
            id_col,
            F.col("_skey")[series_col].alias(series_col),
            "_us",
            "_vm",
            (
                F.col("p1") + F.coalesce("f1", z) + F.coalesce("x1", z)
            ).alias("_s1"),
            (
                F.col("p2") + F.coalesce("f2", z) + F.coalesce("x2", z)
            ).alias("_s2"),
            (
                F.col("pn") + F.coalesce("fn", z) + F.coalesce("xn", z)
            ).alias("_n"),
        )
    )
    return _finish_zscore(stats, series_col, id_col, min_points, z_threshold)


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: assign each user to the ISO week of their
    FIRST event (the cohort), then count how many of each cohort's
    users are active in each subsequent week. The product-analytics
    workhorse (same shape as Mixpanel/Amplitude retention curves) —
    one (cohort_week, week_offset) cell per combination, with
    ``retention_ppm = active·10⁶ ÷ cohort_size`` as an exact integer
    ratio so every engine reproduces it bit-for-bit.

    Scale: ONE events-scale shuffle — the cohort week (min ts) and the
    distinct active weeks (collect_set, bounded by the span in weeks,
    with map-side partial merge) come out of the same user-keyed
    aggregate. Everything downstream is user-grain or smaller: the
    exploded user-weeks roll up to O(weeks²) cells, cohort sizes are a
    weeks-sized aggregate re-attached by broadcast. No join back to
    the event table, no window, nothing driver-side.
    """
    wk = lambda c: F.date_trunc("week", F.col(c)).cast("date")  # noqa: E731
    per_user = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week"),
        # bounded: distinct weeks per user ≤ data span in weeks
        F.collect_set(wk(ts_col)).alias("_weeks"),
    )
    cells = (
        per_user.select(
            "cohort_week", F.explode("_weeks").alias("act_week")
        )
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
    )
    sizes = per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    # bounded: one row per cohort week (≤ weeks in the data span)
    return (
        cells.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            F.expr("active_users * 1000000 DIV cohort_size").alias(
                "retention_ppm"
            ),
        )
    )


def markov_transitions(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: P(next state | current state), estimated from every
    consecutive pair in each entity's timeline — the click-path /
    next-action model behind product-flow sankeys and simple
    next-event predictors.

    Ordering is (ts, tiebreak) so ties are deterministic across
    engines; the last event of each entity emits no pair.
    ``prob`` is the raw double ratio of two exact BIGINTs
    (pair count ÷ from-state total), bit-identical cross-engine;
    ``prob_ppm`` is its exact integer form.

    Scale shape: ONE events-scale exchange — the per-entity window
    (hash-partitioned by entity, sorted within partitions) produces
    the (state, next) pairs, whose count aggregate carries map-side
    partial aggregation into a state-vocabulary-sized result. Row
    totals are a second vocabulary-sized aggregate OF THAT RESULT
    (no second pass over events) re-attached by broadcast.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    totals = pairs.groupBy("from_state").agg(
        F.sum("n_trans").cast("bigint").alias("from_total")
    )
    # bounded: one row per from-state (state vocabulary)
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n_trans",
        "from_total",
        F.expr("n_trans * 1000000 DIV from_total").alias("prob_ppm"),
        (
            F.col("n_trans").cast("double")
            / F.col("from_total").cast("double")
        ).alias("prob"),
    )


def sliding_window_distinct(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_hours: int = 24,
    slide_hours: int = 1,
) -> DataFrame:
    """Sliding-window exact distinct count — "distinct users in the
    trailing 24 h, reported hourly": the one dashboard aggregate a
    tumbling window can't produce and an HLL can only approximate.

    Standard at-scale rewrite: each event REPLICATES onto the
    ``window_hours / slide_hours`` report slots whose trailing window
    contains it (a bounded ``sequence`` explode — replication factor
    is the window/slide ratio, a design constant independent of data
    size), then exact distinct = the two-level (slot, id) dedup +
    count. Report slots are restricted to hours that actually contain
    events (the dashboard convention; trailing windows at the data's
    leading edge would otherwise emit partial phantom rows).

    Scale shape: explode is narrow (×window/slide); the (slot, id)
    distinct carries map-side partial dedup into one exchange; the
    per-slot count reuses that partitioning prefix; active slots
    re-attach by broadcast (calendar-bounded — hours in the retention
    window). For wider ratios (e.g. 30-day windows sliding hourly =
    720×) the mergeable-bitmap form (``bitmap_distinct`` per tumbling
    hour, OR-merged over the trailing window) replaces replication —
    documented here as the scale escape hatch.
    """
    if window_hours % slide_hours:
        raise ValueError(
            f"window_hours={window_hours} must be a multiple of "
            f"slide_hours={slide_hours} — integer slot division would "
            "silently shrink the effective window to "
            f"{(window_hours // slide_hours) * slide_hours} h"
        )
    n_slots = window_hours // slide_hours
    slide_us = slide_hours * 3_600_000_000
    # integer div — a double quotient rounds before the floor at
    # slot boundaries (unix micros ~1.7e15 sit in double's exact range
    # but their quotients don't)
    slot = F.expr(f"unix_micros({ts_col}) div {slide_us}")
    events = df.select(
        slot.alias("_slot"), F.col(id_col).alias("_id")
    )
    active = events.select(F.col("_slot").alias("report_slot")).distinct()
    replicated = events.select(
        F.explode(
            F.sequence(F.col("_slot"), F.col("_slot") + F.lit(n_slots - 1))
        ).alias("report_slot"),
        "_id",
    )
    per_slot = (
        # bounded: active slots are calendar hours in the data's span
        replicated.join(F.broadcast(active), "report_slot")
        .groupBy("report_slot", "_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("report_slot")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
    )
    return per_slot.select(
        (F.col("report_slot") * F.lit(slide_us)).alias("slot_start_us"),
        "n_distinct",
    )


def linear_attribution(
    df: DataFrame,
    user_col: str,
    event_id_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conv_type: str,
    touch_types: list[str],
    lookback_hours: int = 168,
) -> DataFrame:
    """Multi-touch linear attribution: every conversion's value splits
    evenly across the user's touch events inside the lookback window
    ending strictly before the conversion — the marketing-analytics
    workhorse between last-touch (an as-of join) and Shapley.

    Exactness: conversion values quantize to integer milli-units and
    each touch is credited ``value_milli DIV n_touches`` — an exact
    integer, deterministic in any engine (double credit sums would be
    summation-order-dependent). The per-touch-type report carries
    credit totals, pair counts, and distinct conversions reached.

    Scale shape: conversions and touches are two narrow filters of one
    scan; the pair join is USER-equi (never an interval cross join) —
    per-user histories are human-bounded, and a hot-user salt is the
    standard mitigation if not. The per-conversion touch count is a
    window over the join output partitioned by (user, conv) — the
    user-hash partitioning already clusters it, so no second exchange;
    the final per-type aggregate is touch-vocabulary-sized.
    """
    us = F.unix_micros(F.col(ts_col))
    lookback_us = lookback_hours * 3_600_000_000
    convs = df.filter(F.col(type_col) == conv_type).select(
        F.col(user_col).alias("_u"),
        F.col(event_id_col).alias("_cid"),
        us.alias("_cus"),
        F.round(F.col(value_col) * 1000).cast("bigint").alias("_vm"),
    )
    touches = df.filter(F.col(type_col).isin(touch_types)).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("touch_type"),
        us.alias("_tus"),
    )
    pairs = convs.join(touches, "_u").filter(
        (F.col("_tus") < F.col("_cus"))
        & (F.col("_tus") >= F.col("_cus") - F.lit(lookback_us))
    )
    # integer div keeps each credit an exact BIGINT; the (u, cid)
    # window rides the join's user-hash partitioning (no new exchange)
    credited = pairs.withColumn(
        "credit_milli",
        F.expr("_vm div count(1) over (partition by _u, _cid)"),
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_credits"),
        F.sum("credit_milli").cast("bigint").alias("attributed_milli"),
        F.count_distinct("_cid").cast("bigint").alias("n_convs_reached"),
    )


def activity_islands(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse each entity's active DAYS into
    maximal consecutive-day runs ("islands") — the streak/churn-gap
    primitive — via the classic ``day − row_number`` trick: within an
    entity, consecutive days share ``day − rn``, so islands fall out
    of one ordered window and a re-aggregate, with no self-join and no
    iteration. Output per entity: active-day count, island count,
    longest/first/last streak facts — all exact integers.

    Scale shape: the (entity, day) distinct carries map-side partial
    dedup into ONE entity-clustered exchange; the rn window and BOTH
    re-aggregates (island grain, then entity grain) reuse that same
    partitioning — no further shuffles.
    """
    day = (F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).cast(
        "bigint"
    )
    days = (
        df.select(F.col(entity_col).alias("_e"), day.alias("_day"))
        .distinct()
    )
    w = Window.partitionBy("_e").orderBy("_day")
    islands = (
        days.withColumn("_grp", F.col("_day") - F.row_number().over(w))
        .groupBy("_e", "_grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_len"),
            F.min("_day").alias("_start"),
        )
    )
    return islands.groupBy(F.col("_e").alias(entity_col)).agg(
        F.sum("_len").cast("bigint").alias("active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.max("_len").cast("bigint").alias("longest_streak"),
        F.min("_start").cast("bigint").alias("first_day"),
        F.max(F.col("_start") + F.col("_len") - 1)
        .cast("bigint")
        .alias("last_day"),
    )


def time_to_convert(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    start_type: str,
    convert_type: str,
) -> DataFrame:
    """Conversion-latency distribution: per entity, the FIRST
    ``start_type`` event and the first ``convert_type`` event at or
    after it; one summary row with exact-µs latency quantiles — the
    activation-funnel health metric.

    The conditional "first conversion ≥ first start" needs the
    per-entity min-start visible on every row, so it cannot collapse
    into one flat aggregate; instead a whole-partition MIN window
    attaches the start and the grouped conditional MIN follows — both
    over the SAME entity exchange (the groupBy reuses the window's
    hash partitioning), so the two-level reduction still costs one
    shuffle, no self-join. Latency quantiles interpolate on exact
    integer µs (dyadic — engine-exact unrounded); counts are exact
    BIGINTs. Output: one summary row.
    """
    us = F.unix_micros(F.col(ts_col))
    ev = df.select(
        F.col(entity_col).alias("_e"), F.col(type_col).alias("_t"),
        us.alias("_us"),
    ).filter(F.col("_t").isin([start_type, convert_type]))
    w = Window.partitionBy("_e")
    start_us = F.min(
        F.when(F.col("_t") == start_type, F.col("_us"))
    ).over(w)
    with_start = ev.withColumn("_start", start_us)
    per_entity = (
        with_start.filter(F.col("_start").isNotNull())
        .groupBy("_e")
        .agg(
            F.min("_start").alias("start_us"),
            F.min(
                F.when(
                    (F.col("_t") == convert_type)
                    & (F.col("_us") >= F.col("_start")),
                    F.col("_us"),
                )
            ).alias("convert_us"),
        )
    )
    lat = (F.col("convert_us") - F.col("start_us")).alias("_lat")
    return per_entity.select(lat).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_started"),
        F.count("_lat").cast("bigint").alias("n_converted"),
        F.min("_lat").cast("bigint").alias("min_lat_us"),
        F.expr("percentile(_lat, 0.25)").alias("p25_lat_us"),
        F.expr("percentile(_lat, 0.5)").alias("p50_lat_us"),
        F.expr("percentile(_lat, 0.75)").alias("p75_lat_us"),
        F.max("_lat").cast("bigint").alias("max_lat_us"),
    )


def disorder_audit(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    arrival_col: str,
) -> DataFrame:
    """Event-time disorder audit — the measurement that sizes a
    streaming watermark: per series, how far events arrive BEHIND the
    running event-time high-water mark when processed in arrival
    order. ``disorder = running_max(ts) − ts`` (0 for in-order
    events); a watermark of the observed p75/max bounds the state a
    `withWatermark` pipeline must keep and the late events it drops.

    Quantiles are interpolated on exact integer µs at QUARTER
    positions only ((n−1)·q has a dyadic fractional part for any n at
    q ∈ {.25,.5,.75}, so the interpolation arithmetic is exact in
    double and engine-identical; a p95/p99 would not be — use max and
    the ppm rate instead, which are exact).

    Scale shape: one series exchange; the running-max window and the
    per-series aggregate share it. Output: one row per series.
    """
    us = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(series_col).alias("_s"),
        F.col(arrival_col).alias("_arr"),
        us.alias("_us"),
    )
    w = (
        Window.partitionBy("_s")
        .orderBy("_arr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_dis = base.select(
        "_s", (F.max("_us").over(w) - F.col("_us")).alias("_dis")
    )
    return _finish_disorder(with_dis, series_col)


def _finish_disorder(with_dis: DataFrame, series_col: str) -> DataFrame:
    """Shared aggregate tail of the direct and binned disorder audits
    — identical expression tree, so binned ≡ direct reduces to the
    running-max identity."""
    return with_dis.groupBy(F.col("_s").alias(series_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("_dis") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.expr("percentile(_dis, 0.5)").alias("p50_disorder_us"),
        F.expr("percentile(_dis, 0.75)").alias("p75_disorder_us"),
        F.max("_dis").cast("bigint").alias("max_disorder_us"),
    ).select(
        series_col, "n", "n_late",
        F.expr("n_late * 1000000 div n").alias("late_ppm"),
        "p50_disorder_us", "p75_disorder_us", "max_disorder_us",
    )


def disorder_audit_binned(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    arrival_col: str,
    n_bins: int = 1024,
) -> DataFrame:
    """:func:`disorder_audit` with the running-max window in two-level
    binned form — BIT-IDENTICAL output (max is associative:
    running_max(r) = max(max of arrival-bins strictly before r's bin,
    intra-bin running max at r); the shared aggregate tail makes the
    equality one of integers). The direct form's window partition
    count = series count (event types — LOW cardinality) while rows
    per series grow with the corpus: the same round-5 scale-killer
    shape as the weighted median. Here the arrival axis is binned per
    series into ≤ n_bins + 1 equi-width cells; the intra window is
    (series, bin)-parallel, the bins-before running max runs over the
    BOUNDED bin table, and the per-bin maxes ride the intra exchange
    (plain max per bin — no order dependence). Requires unique
    ``arrival_col`` values within a series (the registered query uses
    event_id), as does the direct form's ROWS frame for deterministic
    output. A NULL series key survives both join-backs (NULL-safe
    ``<=>`` — round-6 advice) exactly as the direct form's window
    keeps it as a partition."""
    us = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(series_col).alias("_s"),
        F.col(arrival_col).alias("_arr"),
        us.alias("_us"),
    )
    # bounded: one row per series (the direct window's partition count)
    span = base.groupBy("_s").agg(
        F.min("_arr").alias("_lo"), F.max("_arr").alias("_hi")
    )
    binned = (
        _nullsafe_broadcast_join(base, span, ["_s"])
        .withColumn(
            "_bin",
            F.expr(f"(_arr - _lo) DIV (((_hi - _lo) DIV {n_bins}) + 1)"),
        )
        .drop("_lo", "_hi")
    )
    w_intra = (
        Window.partitionBy("_s", "_bin")
        .orderBy("_arr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = binned.select(
        "_s", "_bin", "_us",
        F.max("_us").over(w_intra).alias("_imax"),
    )
    # rides the intra exchange (groupBy keys = window partition keys)
    per_bin = intra.groupBy("_s", "_bin").agg(F.max("_us").alias("_bmax"))
    w_prev = (
        Window.partitionBy("_s")
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # bounded: ≤ (n_bins + 1) rows per series
    bin_cum = per_bin.select(
        "_s", "_bin", F.max("_bmax").over(w_prev).alias("_pmax")
    )
    with_dis = _nullsafe_broadcast_join(intra, bin_cum, ["_s", "_bin"]).select(
        "_s",
        (
            F.greatest(F.col("_imax"), F.coalesce("_pmax", F.col("_imax")))
            - F.col("_us")
        ).alias("_dis"),
    )
    return _finish_disorder(with_dis, series_col)
