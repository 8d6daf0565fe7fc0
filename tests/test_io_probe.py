"""Driver-side parquet footer probe edge cases (sources/io.py)."""

from __future__ import annotations

from mapreduce_join_comparison_spark.sources.io import _nanos_timestamp_cols


def test_nanos_probe_degrades_on_remote_uri_schemes():
    """pyarrow raises ArrowInvalid (a ValueError) for URI schemes it
    doesn't recognize — the probe must degrade to 'no nanos columns'
    on hdfs:// / s3:// paths, as its docstring promises, instead of
    crashing the load."""
    for path in (
        "hdfs://namenode:9000/warehouse/events.parquet",
        "s3://bucket/prefix/events.parquet",
        "weird-scheme://x/y.parquet",
    ):
        assert _nanos_timestamp_cols(path) == []


def test_nanos_probe_missing_local_file_is_empty():
    assert _nanos_timestamp_cols("/no/such/dir/events.parquet") == []
