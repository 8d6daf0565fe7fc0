"""Streaming soak: 20+ micro-batches through the stateful operators,
under BOTH state-store providers (HDFS-backed default and RocksDB),
asserting the stream-equals-batch oracles hold at every batch count.
A single availableNow mega-batch exercises none of the state
eviction/reload paths a production stream lives in; 24 single-file
triggers force state to persist and reload across 24 micro-batches
per provider. (Round-3 verdict, Next-round #8.)"""

from __future__ import annotations

import datetime
import glob as g
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.timeseries import (
    rolling_zscore_anomalies,
)
from mapreduce_join_comparison_spark.session import scoped_conf
from mapreduce_join_comparison_spark.streaming.events import (
    load_events_stream,
    rolling_anomaly_stateful,
    windowed_event_agg,
)

# soak lane (round 11): multi-minute streaming state-store soaks;
# tests/test_streaming.py keeps the per-operator streaming coverage.
pytestmark = pytest.mark.soak

N_CHUNKS = 24
ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


@pytest.fixture(scope="module")
def soaked(spark, tmp_path_factory):
    """(batch_df, staged_chunk_dir): 3 series x 200 minutes with
    spikes, written as 24 time-ordered single-row-group files so
    maxFilesPerTrigger=1 yields 24 micro-batches."""
    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for minute in range(200):
        for si, series in enumerate(("cpu", "mem", "io")):
            value = 10.0 + ((minute * 7 + si * 3) % 5) * 0.5
            if minute % 37 == 36:
                value += 500.0 + si  # periodic spikes -> anomalies
            rows.append((eid, series,
                         base + datetime.timedelta(minutes=minute), value))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts timestamp, value double"
    )

    tmp = tmp_path_factory.mktemp("soak")
    stage = tmp / "stage"
    os.makedirs(stage)
    per = 200 // N_CHUNKS + 1
    with scoped_conf(
        spark,
        **{"spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS"},
    ):
        for i in range(N_CHUNKS):
            lo, hi = i * per, (i + 1) * per
            chunk = df.filter(
                (F.minute("ts") + 60 * F.hour("ts") >= lo)
                & (F.minute("ts") + 60 * F.hour("ts") < hi)
            ).withColumn("user_id", F.lit(0)).withColumn("props", F.lit("{}"))
            out = str(tmp / f"c{i}")
            chunk.coalesce(1).write.parquet(out)
            (part,) = g.glob(out + "/part-*.parquet")
            shutil.copy(part, str(stage / f"c{i:03d}.parquet"))
    return df, str(stage)


def _run_counted(stream_df, output_mode="append"):
    """Run to completion, returning (result_df, n_micro_batches)."""
    qname = f"soak_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] > 0
    )
    return stream_df.sparkSession.table(qname), n_batches


def _provider_params():
    return [
        pytest.param(None, id="hdfs-default"),
        pytest.param(ROCKSDB, id="rocksdb"),
    ]


@pytest.mark.parametrize("provider", _provider_params())
def test_anomaly_soak_matches_batch(spark, soaked, provider):
    df, stage = soaked
    batch = sorted(
        (r["event_id"], r["zscore"], r["n_window"])
        for r in rolling_zscore_anomalies(
            df, min_points=30, z_threshold=3.0
        ).collect()
    )
    assert len(batch) >= 10, "fixture produced too few anomalies"

    confs = {}
    if provider:
        confs["spark.sql.streaming.stateStore.providerClass"] = provider
    with scoped_conf(spark, **confs):
        stream = load_events_stream(spark, stage, max_files_per_trigger=1)
        try:
            out, n_batches = _run_counted(
                rolling_anomaly_stateful(
                    stream, min_points=30, z_threshold=3.0
                )
            )
            got = sorted(
                (r["event_id"], r["zscore"], r["n_window"])
                for r in out.collect()
            )
        except Exception as exc:  # pragma: no cover - env-specific
            if provider and "RocksDB" in str(exc):
                pytest.skip(f"RocksDB provider unavailable: {exc}")
            raise
    assert n_batches >= 20, f"only {n_batches} micro-batches ran"
    assert got == batch


@pytest.mark.parametrize("provider", _provider_params())
def test_windowed_agg_soak_matches_batch(spark, soaked, provider):
    df, stage = soaked
    batch = sorted(
        tuple(r) for r in windowed_event_agg(df, window="15 minutes")
        .collect()
    )
    confs = {}
    if provider:
        confs["spark.sql.streaming.stateStore.providerClass"] = provider
    with scoped_conf(spark, **confs):
        stream = load_events_stream(spark, stage, max_files_per_trigger=1)
        try:
            out, n_batches = _run_counted(
                windowed_event_agg(
                    stream, window="15 minutes", watermark="30 minutes"
                ),
                output_mode="append",
            )
            got = sorted(tuple(r) for r in out.collect())
        except Exception as exc:  # pragma: no cover - env-specific
            if provider and "RocksDB" in str(exc):
                pytest.skip(f"RocksDB provider unavailable: {exc}")
            raise
    assert n_batches >= 20, f"only {n_batches} micro-batches ran"
    # append mode emits a window only once the watermark passes its
    # end; with time-ordered chunks, exactly the windows ending before
    # max_ts - watermark are guaranteed out — assert that set
    # precisely, and that every emitted value matches batch.
    (max_us,) = df.agg(F.max(F.unix_micros("ts"))).first()
    horizon = max_us - 30 * 60 * 1_000_000
    window_us = 15 * 60 * 1_000_000
    must_emit = {
        (w, t) for w, t, _, _ in batch if w + window_us <= horizon
    }
    emitted = {(w, t) for w, t, _, _ in got}
    assert must_emit <= emitted, sorted(must_emit - emitted)
    batch_map = {(w, t): (n, s) for w, t, n, s in batch}
    for w, t, n, s in got:
        assert batch_map[(w, t)] == (n, s), (w, t)
