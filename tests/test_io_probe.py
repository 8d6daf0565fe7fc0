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


def test_load_recipe_remote_uri_falls_back_to_inference():
    """The cached-recipe loader must degrade exactly like the nanos
    probe on non-local paths: no schema (→ Spark-side inference), no
    normalization lists."""
    from mapreduce_join_comparison_spark.sources.io import _load_recipe

    schema, ns_cols, ntz_cols = _load_recipe(
        "s3://bucket/prefix/events.parquet"
    )
    assert schema is None and ns_cols == [] and ntz_cols is None


def test_declared_schema_load_equals_inference_load(spark):
    """Round-10 loader optimization: load_table now declares the scan
    schema from one cached pyarrow footer read (no per-load Spark
    inference JOB) and reads µs-naive timestamps directly as LTZ
    (no to_utc_timestamp projection — timestamp predicates push down
    to the scan). This pins the declared-schema path bit-identical to
    the old inference + _naive_ts_to_utc path on every driver table."""
    from conftest import SF_SMOKE

    from mapreduce_join_comparison_spark.sources.io import (
        _naive_ts_to_utc,
        load_table,
    )

    for name in ("events", "orders", "lineitem", "documents"):
        new = load_table(spark, SF_SMOKE, name)
        old = _naive_ts_to_utc(
            spark.read.parquet(f"{SF_SMOKE}/{name}.parquet")
        )
        assert new.schema == old.schema, name
        assert new.exceptAll(old).count() == 0, name
        assert old.exceptAll(new).count() == 0, name


def test_timestamp_predicate_pushes_down_to_scan(spark):
    """The old NTZ→LTZ projection sat between the scan and every
    timestamp filter, so range predicates never reached PushedFilters
    (guide §6). The declared-schema path must push them down."""
    from conftest import SF_SMOKE

    from mapreduce_join_comparison_spark.plans.explain import physical_plan
    from mapreduce_join_comparison_spark.sources.io import load_table

    events = load_table(spark, SF_SMOKE, "events")
    plan = physical_plan(
        events.filter("ts >= TIMESTAMP '1995-01-01 00:00:00'")
    )
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
