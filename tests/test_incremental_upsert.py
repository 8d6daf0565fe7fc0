"""Streaming incremental upsert (foreachBatch + CDC compaction): a
stream of event chunks maintaining a latest-state-per-user table must
converge to exactly the batch answer, regardless of how the input was
chunked into micro-batches."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from mapreduce_join_comparison_spark.operators.cdc import latest_per_key
from mapreduce_join_comparison_spark.sources.io import load_table
from mapreduce_join_comparison_spark.streaming.events import (
    incremental_upsert_stream,
    load_events_stream,
)

from conftest import SF_SMOKE, rows_set


@pytest.fixture()
def chunked_events_dir(spark, tmp_path):
    """events split into 3 single-file chunks (by event_id mod) so
    maxFilesPerTrigger=1 yields 3 micro-batches."""
    events = load_table(spark, SF_SMOKE, "events")
    stage = tmp_path / "chunks"
    stage.mkdir()
    for i in range(3):
        out = tmp_path / f"chunk{i}"
        (
            spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
            .filter(f"event_id % 3 = {i}")
            .coalesce(1)
            .write.parquet(str(out))
        )
        (part,) = glob.glob(str(out / "part-*.parquet"))
        shutil.copy(part, stage / f"c{i}.parquet")
    return events, str(stage)


def test_streamed_upsert_converges_to_batch_compaction(
    spark, tmp_path, chunked_events_dir
):
    events, stage = chunked_events_dir
    stream = load_events_stream(spark, stage, max_files_per_trigger=1)
    final = incremental_upsert_stream(
        stream,
        str(tmp_path / "state"),
        key="user_id",
        version_col="ts",
        tiebreak="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    expected = latest_per_key(events, "user_id", "ts", tiebreak="event_id")
    assert rows_set(final) == rows_set(expected)
    # multiple micro-batches actually happened (snapshot per batch)
    snaps = sorted(glob.glob(str(tmp_path / "state" / "v*")))
    assert len(snaps) == 3
