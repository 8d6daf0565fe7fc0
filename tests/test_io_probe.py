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


def test_directory_table_loads_with_declared_schema(spark, tmp_path):
    """Round-11 fix: a DIRECTORY of part-files (every real 100 TB
    table) used to make _load_recipe re-raise pyarrow's
    IsADirectoryError instead of loading. Now the footer probe reads
    the first part-file (the same one-footer contract Spark's own
    default inference applies), so directory tables get the declared
    schema AND load identically to inference."""
    from mapreduce_join_comparison_spark.sources.io import (
        _load_recipe,
        load_table,
    )

    d = tmp_path / "multi.parquet"
    spark.range(100).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v"
    ).repartition(3).write.parquet(str(d))
    assert len([p for p in d.iterdir() if p.suffix == ".parquet"]) > 1
    schema, ns_cols, ntz_cols = _load_recipe(str(d))
    assert schema is not None and ns_cols == [] and ntz_cols == []
    df = load_table(spark, str(tmp_path), "multi")
    assert df.count() == 100
    assert [f.name for f in df.schema.fields] == ["id", "v"]


def test_unreadable_directory_table_falls_back_to_inference(tmp_path):
    """A directory whose part-files cannot be footer-probed (e.g. a
    non-parquet stray, or an empty dir) must fall back to Spark-side
    inference — return no recipe — never raise."""
    from mapreduce_join_comparison_spark.sources.io import _load_recipe

    d = tmp_path / "bad.parquet"
    d.mkdir()
    (d / "part-00000.parquet").write_bytes(b"not parquet at all")
    schema, ns_cols, ntz_cols = _load_recipe(str(d))
    assert schema is None and ns_cols == [] and ntz_cols is None
    empty = tmp_path / "empty.parquet"
    empty.mkdir()
    schema, ns_cols, ntz_cols = _load_recipe(str(empty))
    assert schema is None and ns_cols == [] and ntz_cols is None


def test_nested_nanos_timestamp_falls_back_to_inference():
    """ADVICE r10: _arrow_to_spark_type mapped NESTED ns timestamps to
    LongType, but load_table's nanos→µs projection only rewrites
    top-level columns — a nested ns column would silently flow as raw
    nano longs. Nested ns must now unmap the whole schema (→ Spark
    inference, which fails loudly with the nanosAsLong hint)."""
    import pyarrow as pa

    from mapreduce_join_comparison_spark.sources.io import (
        _arrow_to_spark_type,
    )

    ns = pa.timestamp("ns")
    assert _arrow_to_spark_type(pa.list_(ns)) is None
    assert _arrow_to_spark_type(pa.struct([("t", ns)])) is None
    # top-level ns stays on the nanosAsLong long path
    from pyspark.sql import types as T

    assert _arrow_to_spark_type(ns) == T.LongType()
