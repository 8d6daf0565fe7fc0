"""Structured Streaming over the ``events`` table (scale extension —
the reference has no streaming at all, SURVEY.md §2.9; the driver
testdata ships an ``events`` table precisely so a stream path exists).

Design: every transformation is written against a plain DataFrame so
the SAME function body serves batch and streaming — Structured
Streaming's core contract (a streaming query is the incremental
execution of the batch plan). Streaming-only concerns (watermarks,
output mode, stateful processing) live in thin wrappers.

Scale notes (100 TB/day ingest posture):
  * windowed aggregation shuffles once on (window, event_type) with
    map-side partial aggregation; state size is bounded by the
    watermark — late data beyond it is dropped, so state never grows
    with input size.
  * ``dropDuplicatesWithinWatermark`` keeps only keys younger than the
    watermark — bounded-state streaming dedup.
  * sessionization: batch form is two window functions (one shuffle on
    user_id); streaming form is ``applyInPandasWithState`` with
    per-user timeout state — the custom-stateful-operator escape hatch
    for semantics Spark's built-ins can't express.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet physical ts type varies with the generator: parquet
# TIMESTAMP(NANOS) (Spark 4 reads it as LongType only, under
# spark.sql.legacy.parquet.nanosAsLong), naive TIMESTAMP(MICROS)
# (TIMESTAMP_NTZ), or UTC-adjusted (plain TIMESTAMP). readStream needs
# an explicit schema, so it is derived from the parquet footer and the
# matching normalization picked per type (sources.io.load_table does
# the same for batch).
def _events_stream_schema(sample_file: str):
    """(schema, normalize_fn) for the events file-source stream."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    ts_type = pq.read_schema(sample_file).field("ts").type
    fields = {
        "event_id": T.LongType(),
        "user_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
        "props": T.StringType(),
    }
    if pat.is_timestamp(ts_type) and ts_type.unit == "ns":
        ts_field, norm = T.LongType(), _nanos_to_ts  # needs nanosAsLong
    elif pat.is_timestamp(ts_type) and ts_type.tz is None:
        ts_field, norm = T.TimestampNTZType(), _naive_to_utc
    else:
        ts_field, norm = T.TimestampType(), lambda df: df
    schema = T.StructType(
        [T.StructField("event_id", fields["event_id"]),
         T.StructField("ts", ts_field),
         T.StructField("user_id", fields["user_id"]),
         T.StructField("event_type", fields["event_type"]),
         T.StructField("value", fields["value"]),
         T.StructField("props", fields["props"])]
    )
    return schema, norm


def _nanos_to_ts(df: DataFrame) -> DataFrame:
    # integer `div` truncates ns→µs like other engines; `/` would round
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _naive_to_utc(df: DataFrame) -> DataFrame:
    # naive-as-UTC; only reproducible with the session zone pinned to
    # UTC (load_events_stream pins it — see sources.io._naive_ts_to_utc)
    return df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))


def load_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over events parquet. Spark's file stream
    source monitors a DIRECTORY; a single-file path is staged via
    symlink into a derived temp dir. At scale the same plan reads a
    Kafka source — only this loader changes."""
    import hashlib
    import os
    import tempfile

    # Stateful streaming shuffles pay one state store per shuffle
    # partition per stateful operator per micro-batch; Spark's default
    # 200 is sized for large clusters and makes bounded availableNow
    # runs RocksDB/HDFS-state-bound (measured 25 s → 5 s on the
    # stream-stream interval join at sf0.01). Pin a bounded count
    # unless the session already tuned it away from Spark's default;
    # a real deployment sizes this to cluster cores × state volume.
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    # see sources.io.load_table: NTZ normalization needs a UTC session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if os.path.isfile(path):
        sample = path
        digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
        stage = os.path.join(tempfile.gettempdir(), f"stream-src-{digest}")
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, os.path.basename(path))
        if not os.path.exists(link):
            try:
                os.symlink(os.path.abspath(path), link)
            except FileExistsError:
                pass  # concurrent session staged it between the
                # exists-check and the symlink — same digest, same
                # target, so the loser just uses the winner's link
        path = stage
    else:
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            raise FileNotFoundError(
                f"no *.parquet files under stream source directory {path!r}"
            )
        # the stream schema is derived from ONE footer; a directory
        # mixing ts physical types (nanos vs micros vs UTC-adjusted)
        # would silently mis-read every other file, so reject it here
        ts_types = {str(pq.read_schema(f).field("ts").type) for f in files}
        if len(ts_types) > 1:
            raise ValueError(
                f"stream source {path!r} mixes ts physical types "
                f"{sorted(ts_types)}; a file-source stream needs one schema"
            )
        sample = files[0]
    schema, normalize = _events_stream_schema(sample)
    if any(f.name == "ts" and isinstance(f.dataType, T.LongType)
           for f in schema.fields):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize(reader.parquet(path))


def windowed_event_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Batch and streaming
    take the identical plan; pass ``watermark`` on streams to bound
    state (late rows beyond it are dropped)."""
    df = events.withWatermark("ts", watermark) if watermark else events
    return (
        df.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame, watermark: str = "1 hour", keys: list[str] | None = None
) -> DataFrame:
    """Streaming exact dedup with bounded state: drop rows whose key was
    already seen within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Gap-based sessionization, batch form: a session is a maximal run
    of a user's events with < gap between neighbors. Two window
    functions over one shuffle on user_id (lag → new-session flag →
    running sum = session index), then a per-session aggregate."""
    from pyspark.sql.window import Window

    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(ts_us).over(w)
    new_sess = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_us), 1
    ).otherwise(0)
    sessioned = events.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
    return sessioned.groupBy("user_id", "session_idx").agg(
        F.min(ts_us).alias("session_start_us"),
        F.max(ts_us).alias("session_end_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# output schema of the stateful sessionizer (closed sessions only)
SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_us", T.LongType()),
    T.StructField("session_end_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

# per-user state: ALL sessions still inside the watermark horizon,
# as parallel arrays ordered by start (the last one is the open
# session). A session leaves state only when the watermark passes its
# end + gap — holding successor-closed sessions too, because a LATE
# event above the watermark can still land within gap of a session
# the in-batch stream has already moved past (end + gap can exceed
# the watermark for successors closer than 2·gap).
_STATE_SCHEMA = T.StructType([
    T.StructField("starts", T.ArrayType(T.LongType())),
    T.StructField("lasts", T.ArrayType(T.LongType())),
    T.StructField("ns", T.ArrayType(T.LongType())),
    T.StructField("totals", T.ArrayType(T.DoubleType())),
    T.StructField("nvals", T.ArrayType(T.LongType())),
])


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``: per-user
    state = every session whose (end + gap) the event-time watermark
    has not passed; a session is EMITTED exactly when the watermark
    passes end + gap (never earlier — an event later in the same batch
    does not close it for emission, because a late arrival above the
    watermark can still merge into it, possibly bridging two pending
    sessions). Membership is a span test (a point within
    [start − gap, last + gap] is within gap of its nearest session
    event — internal gaps are ≤ gap by construction), and adding
    points only ever MERGES sessions, so (start, last, n, Σv) carries
    all needed state. State is O(active users × sessions inside one
    watermark horizon), independent of stream length — the
    100 TB-ingest-safe shape.

    Cross-path semantics match ``sessionize_batch``: sum_value is
    Decimal-HALF_UP-rounded to 4dp (Spark F.round's rule — Python
    ``round()`` is half-to-even and diverges at ties, the same pitfall
    ``rolling_anomaly_stateful`` documents); NULL values add an event
    but no sum contribution, and an all-NULL session emits a NULL
    sum_value exactly like ``F.round(F.sum(value), 4)``.

    The reference has no analog (SURVEY.md §2.9-§2.10); this is the
    engine's custom-stateful-operator surface.
    """
    import math as _math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_cols = [f.name for f in SESSION_SCHEMA.fields]

    def _row(user_id, s):
        start, last, n, total, nv = s
        sv = (
            None if nv == 0
            else float(
                Decimal(repr(total)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
            )
        )
        return [user_id, start, last, n, sv]

    def _split_ready(sessions, wm_us):
        ready = [s for s in sessions if s[1] + gap_us < wm_us]
        keep = [s for s in sessions if s[1] + gap_us >= wm_us]
        return ready, keep

    def _store(state, keep, wm_ms):
        state.update((
            [s[0] for s in keep], [s[1] for s in keep],
            [s[2] for s in keep], [s[3] for s in keep],
            [s[4] for s in keep],
        ))
        close_ms = (min(s[1] for s in keep) + gap_us) // 1000
        # Spark refuses a timeout at/behind the watermark
        state.setTimeoutTimestamp(max(close_ms, wm_ms + 1))

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        if state.hasTimedOut:
            sessions = [list(t) for t in zip(*state.get)]
            ready, keep = _split_ready(sessions, wm_us)
            if keep:
                _store(state, keep, wm_ms)
            else:
                state.remove()
            if ready:
                yield pd.DataFrame(
                    [_row(user_id, s) for s in ready], columns=out_cols
                )
            return
        pdf = pd.concat([p[["ts", "value"]] for p in pdf_iter]).sort_values("ts")
        # normalize to ns before the int cast — pandas may deliver
        # datetime64[us] or [ns] depending on Arrow conversion
        ts_us_seq = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).tolist()
        vals = pdf["value"].tolist()
        sessions = (
            [list(t) for t in zip(*state.get)] if state.exists else []
        )
        for t_us, v in zip(ts_us_seq, vals):
            isnull = v is None or (isinstance(v, float) and _math.isnan(v))
            absorb = [t_us, t_us, 1, 0.0 if isnull else v,
                      0 if isnull else 1]
            rest = []
            for s in sessions:
                if s[1] >= t_us - gap_us and s[0] <= t_us + gap_us:
                    absorb = [
                        min(absorb[0], s[0]), max(absorb[1], s[1]),
                        absorb[2] + s[2], absorb[3] + s[3],
                        absorb[4] + s[4],
                    ]
                else:
                    rest.append(s)
            rest.append(absorb)
            rest.sort(key=lambda s: s[0])
            sessions = rest
        ready, keep = _split_ready(sessions, wm_us)
        if keep:
            _store(state, keep, wm_ms)
        elif state.exists:
            state.remove()
        if ready:
            yield pd.DataFrame(
                [_row(user_id, s) for s in ready], columns=out_cols
            )

    return (
        # late-TOLERANCE is independent of the session gap: a longer
        # watermark delay only holds sessions in state longer (each is
        # still emitted exactly when the watermark passes end + gap),
        # so a replay with bounded disorder can set tolerance ≥ the
        # disorder and reproduce the batch result exactly
        events.withWatermark("ts", watermark or f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: a left row matches right rows of
    the same key whose timestamp lies in [left_ts - lookback, left_ts].
    Both sides carry watermarks and the join condition is time-bounded,
    so Spark can expire buffered state — the only stream-stream join
    shape whose state stays bounded on unbounded input. Works unchanged
    on batch frames (same plan; watermarks skipped). Column names must
    not overlap between the two sides."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[left_on] == right[right_on])
        & (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (right[right_ts] <= left[left_ts])
    )
    return left.join(right, cond, "inner")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    stream_on: str,
    dim_on: str,
) -> DataFrame:
    """Stream-static dimension enrichment: inner-join each micro-batch
    against a broadcast static table — the standard production shape
    for attaching dim attributes (user → account, device → model) to
    an event stream. No stream state at all: the static side is
    re-broadcast per micro-batch (picking up dim updates), the stream
    side stays append-only. Works unchanged on batch frames."""
    # bounded: enrichment dim is a dimension table by contract; swap to a stream-stream join when it outgrows broadcast
    return stream.join(F.broadcast(dim), stream[stream_on] == dim[dim_on], "inner")


def incremental_upsert_stream(
    stream_df: DataFrame,
    target_dir: str,
    key: str,
    version_col: str,
    tiebreak: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """``foreachBatch`` sink maintaining a latest-state table from an
    append stream — the streaming composition of the CDC operators:
    every micro-batch is unioned with the current snapshot and
    compacted to the newest record per key (version-aware upsert:
    "newer wins" regardless of arrival order, so late/out-of-order
    batches cannot regress a key).

    The target is a directory of immutable snapshots ``v000001..``;
    each batch writes the next snapshot rather than overwriting the
    one it is reading (Spark reads lazily — in-place overwrite of the
    input path is a correctness bug). The snapshot-chain is exactly
    how MERGE-capable table formats behave; swap this sink for
    Iceberg/Delta ``MERGE INTO`` in production and the stream side is
    unchanged.

    Returns the final snapshot as a DataFrame.
    """
    import glob
    import os
    import tempfile

    from ..operators.cdc import latest_per_key

    spark = stream_df.sparkSession

    def _snapshots() -> list[str]:
        # only COMPLETE snapshots: a failed attempt leaves a directory
        # without _SUCCESS, which must never be read back as state
        return sorted(
            d for d in glob.glob(os.path.join(target_dir, "v*"))
            if os.path.exists(os.path.join(d, "_SUCCESS"))
        )

    def _upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch's contract: the function MAY be re-executed for
        # the same batch_id after a failure. Idempotence: (1) a
        # complete snapshot carrying this batch_id's marker means the
        # previous attempt finished — skip; (2) otherwise the partial
        # dir (no _SUCCESS) is invisible to _snapshots and the retry
        # mode('overwrite')s the SAME index it targeted before.
        snaps = _snapshots()
        marker = f"_BATCH_{batch_id}"
        if snaps and os.path.exists(os.path.join(snaps[-1], marker)):
            return
        combined = (
            spark.read.parquet(snaps[-1]).unionByName(batch_df)
            if snaps
            else batch_df
        )
        merged = latest_per_key(combined, key, version_col, tiebreak)
        out = os.path.join(target_dir, f"v{len(snaps) + 1:06d}")
        merged.write.mode("overwrite").parquet(out)
        with open(os.path.join(out, marker), "w"):
            pass  # local-fs marker; a cloud deployment swaps this sink
            # for Iceberg/Delta MERGE, whose commits are atomic anyway

    q = (
        stream_df.writeStream.foreachBatch(_upsert_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="upsert_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = _snapshots()
    assert snaps, "stream produced no snapshot"
    return spark.read.parquet(snaps[-1])


def run_stream_to_memory(
    stream_df: DataFrame,
    output_mode: str = "append",
    name: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink as a DataFrame. Test/driver harness —
    production sinks are writeStream.format('parquet'|'kafka')."""
    qname = name or f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(qname)


ANOMALY_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("ts_us", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("zscore", T.DoubleType()),
    T.StructField("n_window", T.LongType()),
])
_ANOM_STATE_SCHEMA = T.StructType([
    T.StructField("us", T.ArrayType(T.LongType())),
    T.StructField("vm", T.ArrayType(T.LongType())),
])


def rolling_anomaly_stateful(
    events: DataFrame,
    window_us: int = 24 * 3600 * 1_000_000,
    min_points: int = 30,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Streaming form of ``timeseries.rolling_zscore_anomalies``: per
    event_type, ``applyInPandasWithState`` keeps the trailing 24 h of
    (epoch-µs, milli-value) pairs as integer arrays; each arriving
    event evicts expired entries, joins its equal-timestamp tie group
    (a RANGE frame includes ALL rows at the same instant, also the
    ones arriving later in the batch), and scores against the exact
    running Σv/Σv²/n. Because the state is integers and the mean/var/z
    expression tree matches the batch operator term for term, the
    stream's cumulative output EQUALS the batch query — so this
    streaming query carries the full relational oracle, like
    ``events_stream_upsert``.

    Requires TIME-ORDERED micro-batches per key (the staging chunker
    splits on timestamp thresholds, so equal timestamps can never
    straddle a batch boundary). State is O(events in 24 h) per series
    — bounded by ingest rate, not stream length.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_cols = [f.name for f in ANOMALY_SCHEMA.fields]

    def _vm(value: float) -> int:
        # replicate Spark's round(value*1000): BigDecimal.valueOf
        # rounds the SHORTEST DECIMAL string HALF_UP — python repr()
        # produces the identical shortest string
        return int(
            Decimal(repr(value * 1000)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )

    def update(key, pdf_iter, state: GroupState):
        (etype,) = key
        if state.hasTimedOut:
            # watermark passed last_event + window: every stored entry
            # is outside any future event's frame — drop the series'
            # state (idle-series GC; emits nothing, like the batch)
            state.remove()
            return
        pdf = pd.concat(list(pdf_iter))
        if pdf.empty:
            return
        pdf = pdf.sort_values(["ts", "event_id"])
        us_new = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).tolist()
        ids = pdf["event_id"].tolist()
        # NULL value: the batch twin counts the row in the frame
        # (count(lit(1))) but adds nothing to the sums and never scores
        # it (NULL z fails the threshold) — store vm=0 with score=False
        vms = [
            None if v is None or (isinstance(v, float) and math.isnan(v))
            else _vm(v)
            for v in pdf["value"].tolist()
        ]
        if state.exists:
            d_us, d_vm = state.get
            d_us, d_vm = list(d_us), list(d_vm)
        else:
            d_us, d_vm = [], []
        s1, s2 = sum(d_vm), sum(v * v for v in d_vm)
        rows = []
        i = 0
        while i < len(us_new):
            # tie group: all events at this exact instant enter the
            # frame together before any of them is scored
            j = i
            while j < len(us_new) and us_new[j] == us_new[i]:
                j += 1
            for g in range(i, j):
                vm_g = 0 if vms[g] is None else vms[g]
                d_us.append(us_new[g])
                d_vm.append(vm_g)
                s1 += vm_g
                s2 += vm_g * vm_g
            # evict strictly-older-than-frame entries (frame start
            # us - window_us is INCLUSIVE, matching RANGE ... PRECEDING)
            lo = us_new[i] - window_us
            k = 0
            while d_us[k] < lo:
                s1 -= d_vm[k]
                s2 -= d_vm[k] * d_vm[k]
                k += 1
            if k:
                d_us, d_vm = d_us[k:], d_vm[k:]
            n = len(d_us)
            if n >= min_points:
                mean = s1 / n
                var = s2 / n - mean * mean
                if var > 0:
                    for g in range(i, j):
                        if vms[g] is None:
                            continue  # NULL value: z is NULL in batch
                        # Spark F.round / DuckDB ROUND are HALF_UP on
                        # the shortest decimal string; Python round()
                        # is half-to-even on the binary double — use
                        # the same Decimal(repr) idiom as _vm so the
                        # stream matches the batch value bit-for-bit
                        z = float(
                            Decimal(
                                repr((vms[g] - mean) / math.sqrt(var))
                            ).quantize(
                                Decimal("0.0001"), rounding=ROUND_HALF_UP
                            )
                        )
                        if abs(z) >= z_threshold:
                            rows.append([
                                ids[g], etype, us_new[g],
                                vms[g] / 1000.0, z, n,
                            ])
            i = j
        state.update((d_us, d_vm))
        # idle-series GC: once the watermark passes last + window, no
        # future event's frame can reach any stored entry (its frame
        # start ts − window > last), so the state is dead weight —
        # without this, every series EVER seen pins its final 24 h of
        # arrays forever and state grows with distinct keys, not
        # active ones
        state.setTimeoutTimestamp(
            max(
                (d_us[-1] + window_us) // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    return (
        # 0-second watermark: the staging chunker already guarantees
        # time-ordered micro-batches (docstring contract), so nothing
        # is dropped as late; the watermark exists to drive the
        # idle-series timeout GC above
        events.withWatermark("ts", "0 seconds")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=_ANOM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via Spark's NATIVE ``session_window``
    — the engine-managed merging-session state the hand-rolled
    ``sessionize_stateful`` implements in Python. Works on batch AND
    streaming frames (the catalog query runs the stream; batch ≡
    stream is asserted in tests).

    Semantics (the builtin's, unit-test-proven): an event extends its
    predecessor's session while ``ts <= prev_ts + gap`` — INCLUSIVE,
    an event exactly ``gap`` later still merges, matching
    ``sessionize_batch``'s ``> gap`` new-session rule — and the
    reported session end is ``last_ts + gap`` (the window's close),
    not the last event time. The oracle replicates exactly that:
    new-session flag at ``diff > gap_us``, end = ``max(ts) + gap_us``.

    Scale shape: one shuffle on the grouping key; session merging is
    engine state, bounded by the watermark horizon in streaming (late
    rows beyond it are dropped instead of growing state forever).
    """
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    agg = src.groupBy(
        F.session_window("ts", gap), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return agg.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        "n_events",
        "sum_value",
    )


# output schema of the per-user running-stats stateful operators
RUNNING_STATS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("run_cnt", T.LongType()),
    T.StructField("run_sum_milli", T.LongType()),
])

_RUNNING_STATS_STATE_SCHEMA = "cnt BIGINT, vsum BIGINT"


def _has_protobuf() -> bool:
    """``transformWithStateInPandas`` launches a separate streaming
    Python driver worker that imports the Spark Connect protobufs; if
    ``google.protobuf`` is absent that worker crashes at init
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Gate the TWS
    path on the import so environments without protobuf fall back to
    ``applyInPandasWithState`` cleanly.

    Container-constraint note (round-6 check): this build environment
    has no ``google.protobuf`` and no package-index network access
    (``pip download protobuf`` returns nothing), so the dependency
    genuinely cannot exist here — the TWS twin stays import-gated and
    its two tests stay environment-skips. On any normal Spark 4
    deployment (protobuf ships with Spark Connect) the gate passes
    and the TWS path runs."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def _running_stats_input(events: DataFrame) -> DataFrame:
    """Exact-integer projection shared by both forms: epoch-µs event
    time and the engine-proven milli-value conversion
    (``CAST(ROUND(value*1000) AS BIGINT)`` — same expression the
    z-score family oracles replay)."""
    return events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 1000).cast("bigint").alias("vm"),
    )


def user_running_stats_batch(events: DataFrame) -> DataFrame:
    """Batch twin: per-user cumulative event count and exact milli-sum
    in (ts, event_id) order — one shuffle on user_id, two window
    functions sharing it."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _running_stats_input(events).select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("run_cnt"),
        F.sum("vm").over(w).cast("bigint").alias("run_sum_milli"),
    )


def user_running_stats_stateful(events: DataFrame) -> DataFrame:
    """Per-user running stats via ``applyInPandasWithState``: a
    GroupState carries the exact integer (count, milli-sum) pair
    across micro-batches and every input event is emitted exactly
    once (append) with its running aggregates.

    State is O(active users) — two int64s per user, independent of
    stream length (the 100 TB-ingest-safe shape). Rows within a
    micro-batch are sorted by (event-time, event_id) before folding,
    so with in-order file arrival the output equals the batch window
    query row-for-row; the arithmetic is pure int64, so the equality
    is exact, not approximate.

    ``user_running_stats_tws`` is the same operator on Spark 4's new
    ``transformWithStateInPandas`` API (typed ValueState handles);
    it needs ``google.protobuf`` for its separate driver worker, so
    this GroupState form is the portable default.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        pdf = pd.concat(list(pdf_iter))
        if pdf.empty:
            return
        pdf = pdf.sort_values(["us", "event_id"])
        if state.exists:
            cnt0, sum0 = state.get
        else:
            cnt0, sum0 = 0, 0
        n = len(pdf)
        # NULL value → NULL vm → NaN here: it adds an event but no sum
        # contribution (the batch window's SUM skips NULLs; without the
        # fill, cumsum poisons every later row and int() crashes the
        # query). Sole divergence: an all-NULL prefix reports 0 where
        # SQL's SUM reports NULL — int64 state can't carry the
        # distinction
        run_sum = pdf["vm"].fillna(0).astype("int64").cumsum() + sum0
        state.update((cnt0 + n, int(run_sum.iloc[-1])))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "run_cnt": pd.Series(
                    range(cnt0 + 1, cnt0 + n + 1), index=pdf.index
                ),
                "run_sum_milli": run_sum,
            }
        )

    return (
        _running_stats_input(events)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_RUNNING_STATS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_running_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running stats via ``transformWithStateInPandas`` —
    Spark 4's NEW arbitrary-stateful API (StatefulProcessor + typed
    state handles). Identical semantics and exact-int64 output to
    ``user_running_stats_stateful``; kept as the forward-looking form
    (TWS adds typed ListState/MapState, TTL, and timers the old API
    lacks). Requires ``google.protobuf`` (the TWS driver worker
    imports it); call sites should gate on ``_has_protobuf()``.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", _RUNNING_STATS_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timer_values):
            pdf = pd.concat(list(rows)).sort_values(["us", "event_id"])
            if self._agg.exists():
                cnt0, sum0 = self._agg.get()
            else:
                cnt0, sum0 = 0, 0
            n = len(pdf)
            run_cnt = pd.Series(range(cnt0 + 1, cnt0 + n + 1), index=pdf.index)
            # same NULL-vm fill as the GroupState form (kept in sync)
            run_sum = pdf["vm"].fillna(0).astype("int64").cumsum() + sum0
            self._agg.update((cnt0 + n, int(run_sum.iloc[-1])))
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "run_cnt": run_cnt,
                    "run_sum_milli": run_sum,
                }
            )

        def close(self) -> None:
            pass

    return (
        _running_stats_input(events)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningStats(),
            outputStructType=RUNNING_STATS_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )


def drift_reference_histogram(
    ref_events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """Static PSI baseline from a BATCH reference slice: per group, the
    value span plus a WIDE equal-width bin histogram (cr_0..cr_{b-1},
    n_ref). Bounded output — one row per group — so the stream side
    can broadcast it. Bin membership matches
    ``aggregates.psi_drift`` expression-for-expression (IEEE-exact
    min/max/sub/div/floor), so a batch PSI over the same slices is
    bit-identical to the streaming one."""
    # NULL values have no bin: excluded from the monitor entirely (both
    # here and in stream_drift_psi), so counts and totals stay coherent
    base = ref_events.select(
        group_col, F.col(value_col).cast("double").alias("_v")
    ).filter(F.col("_v").isNotNull())
    span = base.groupBy(group_col).agg(
        F.min("_v").alias("_vmin"), F.max("_v").alias("_vmax"),
        F.count(F.lit(1)).cast("bigint").alias("n_ref"),
    )
    from ..operators.aggregates import _nullsafe_broadcast_join

    # bounded: one span row per group (group cardinality is a label
    # set, never the corpus); NULL-safe so a NULL group key keeps its
    # baseline, matching the batch monitor's contract
    binned = _nullsafe_broadcast_join(base, span, [group_col]).select(
        group_col,
        _psi_bin_expr("_v", "_vmin", "_vmax", n_bins).alias("_bin"),
        "_vmin", "_vmax", "n_ref",
    )
    return binned.groupBy(group_col).agg(
        F.max("_vmin").alias("_vmin"), F.max("_vmax").alias("_vmax"),
        F.max("n_ref").alias("n_ref"),
        *[
            F.sum(F.when(F.col("_bin") == b, 1).otherwise(0))
            .cast("bigint")
            .alias(f"cr_{b}")
            for b in range(n_bins)
        ],
    )


def _psi_bin_expr(v: str, vmin: str, vmax: str, n_bins: int):
    """Shared with the batch monitor — ONE definition
    (``operators.aggregates.psi_bin_expr``) so the two monitors and
    the SQL oracles cannot drift apart."""
    from ..operators.aggregates import psi_bin_expr

    return psi_bin_expr(v, vmin, vmax, n_bins)


def _sql_lit(v, dt: str) -> str:
    """Render one driver-side value as a Spark-SQL literal for the
    VALUES-freeze in ``stream_drift_psi``. Non-finite doubles need the
    string-cast form (``repr()`` yields ``nan``/``inf``, which don't
    resolve as SQL); bool is checked before the int fallback because
    it's an int subclass and would otherwise be retyped BIGINT."""
    if v is None:
        return f"CAST(NULL AS {dt})"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        # repr() is the shortest round-trip form: the parsed double is
        # bit-identical
        return f"CAST({v!r} AS DOUBLE)"
    return f"CAST({int(v)} AS BIGINT)"


def stream_drift_psi(
    events: DataFrame,
    ref_hist: DataFrame,
    cutoff_us: int,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 10,
    window: str = "1 day",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming PSI drift monitor: per (tumbling window, group), the
    Population Stability Index of the live value distribution against
    the static reference histogram — the alert a continuously-fed
    training pipeline keeps on its feature stream.

    Plan shape: stream ⋈ broadcast(static one-row-per-group baseline)
    attaches span + reference counts to each row (stateless, before
    the aggregation, the supported stream-static join position), then
    ONE streaming aggregation computes the live histogram as n_bins
    conditional sums — no chained stateful operators, so every output
    row is a pure function of closed-window counts. The PSI itself is
    a stateless projection: per-bin terms rounded to exact nano-ints,
    summed as BIGINTs (summation-order-free — same policy as
    ``aggregates.psi_drift``), ONE ln() per bin under the 6dp rounding
    headroom. Batch and stream take the identical plan (pass the
    batch events DataFrame for the batch twin); state is
    O(groups × windows-in-flight), bins ride in columns not rows.
    """
    df = events.filter(
        (F.unix_micros(F.col("ts")) >= F.lit(cutoff_us))
        & F.col(value_col).isNotNull()  # no bin for NULL: see histogram
    )
    if watermark:
        df = df.withWatermark("ts", watermark)
    from ..operators.aggregates import _nullsafe_broadcast_join

    # bounded collect: ref_hist is ONE row per group (drift_reference_
    # histogram's contract), so freeze it into a literal VALUES
    # relation — the static side of a stream join re-executes per
    # micro-batch, and leaving the two-aggregate histogram lineage
    # live measured ~2× on the end-to-end query; a VALUES relation is
    # a plan literal with nothing to re-run (and, unlike
    # createDataFrame, no RDD-backed scan)
    hist_rows = ref_hist.collect()
    if hist_rows:
        fields = ref_hist.schema.fields
        values = ", ".join(
            "(" + ", ".join(
                _sql_lit(row[f.name], f.dataType.simpleString().upper())
                for f in fields
            ) + ")"
            for row in hist_rows
        )
        names = ", ".join(f.name for f in fields)
        ref_hist = events.sparkSession.sql(
            f"SELECT * FROM VALUES {values} AS t({names})"
        )

    # NULL-safe so a NULL group is monitored like any other (the batch
    # twin keeps it, so the stream must too)
    binned = _nullsafe_broadcast_join(df, ref_hist, [group_col]).select(
        "ts", group_col, "n_ref",
        _psi_bin_expr(value_col, "_vmin", "_vmax", n_bins).alias("_bin"),
        *[f"cr_{b}" for b in range(n_bins)],
    )
    agg = binned.groupBy(F.window("ts", window), group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cur"),
        F.max("n_ref").alias("n_ref"),
        *[F.max(f"cr_{b}").alias(f"cr_{b}") for b in range(n_bins)],
        *[
            F.sum(F.when(F.col("_bin") == b, 1).otherwise(0))
            .cast("bigint")
            .alias(f"cc_{b}")
            for b in range(n_bins)
        ],
    )

    # ONE shared term definition with the batch monitor (see
    # psi_term_nano's note: empty-both bins are NOT zero when the
    # slice sizes differ, so the fold runs over all n_bins columns)
    from ..operators.aggregates import psi_term_nano

    def term_nano(b: int):
        return psi_term_nano(
            F.col(f"cr_{b}"), F.col(f"cc_{b}"),
            F.col("n_ref"), F.col("n_cur"), n_bins,
        )

    tn = term_nano(0)
    for b in range(1, n_bins):
        tn = tn + term_nano(b)
    return agg.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        group_col, "n_ref", "n_cur",
        F.round(tn.cast("double") / 1e9, 6).alias("psi"),
    )
