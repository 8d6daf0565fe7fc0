"""Z-order clustered writes must (a) preserve data exactly and
(b) measurably narrow per-file min/max spans on EVERY clustered
column versus an unclustered write — that narrowing is precisely what
parquet file/row-group pruning consults at scan time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.sources.layout import (
    file_column_spans,
    write_zordered,
    zorder_key,
)

from conftest import SF_SMOKE, rows_set


@pytest.fixture(scope="module")
def layout_paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "user_id", "value")
    )
    plain = str(base / "plain")
    # unclustered baseline with the same file count: round-robin spread
    ev.repartition(8).write.mode("overwrite").parquet(plain)
    zordered = str(base / "zordered")
    write_zordered(ev, zordered, ["user_id", "value"], num_files=8)
    return ev, plain, zordered


def test_zorder_preserves_rows(spark, layout_paths):
    ev, _, zordered = layout_paths
    assert rows_set(spark.read.parquet(zordered)) == rows_set(ev)


@pytest.mark.parametrize("col", ["user_id", "value"])
def test_zorder_narrows_file_spans(spark, layout_paths, col):
    _, plain, zordered = layout_paths
    def mean_span(path):
        spans = file_column_spans(path, col)
        assert spans, f"no footer stats for {col} in {path}"
        return sum(hi - lo for lo, hi in spans) / len(spans)
    # every file of the unclustered write spans ~the full domain;
    # z-ordered files must cover well under half of it on average —
    # on BOTH clustered columns at once (single-column sort can't).
    assert mean_span(zordered) < 0.5 * mean_span(plain)


def test_zorder_key_locality(spark):
    """Interleaving puts bit b of column i at position b*n+i: points
    close in every dimension get close keys (locality), and the key
    of (0,0) is 0 / the key of (max,max) is all-ones."""
    df = spark.createDataFrame(
        [(0, 0), (2**16 - 1, 2**16 - 1), (1, 0), (0, 1)], "x long, y long"
    )
    out = {
        (r.x, r.y): r.k
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], 16).alias("k")
        ).collect()
    }
    assert out[(0, 0)] == 0
    assert out[(2**16 - 1, 2**16 - 1)] == 2**32 - 1
    assert out[(1, 0)] == 1          # x occupies even bit positions
    assert out[(0, 1)] == 2          # y occupies odd bit positions


# --- small-file compaction ----------------------------------------------

def test_compaction_collapses_files_and_preserves_rows(spark, tmp_path):
    import glob

    from mapreduce_join_comparison_spark.sources.layout import compact_files

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "user_id", "value")
    )
    small = str(tmp_path / "small")
    compacted = str(tmp_path / "compacted")
    ev.repartition(64).write.mode("overwrite").parquet(small)
    n_small = len(glob.glob(f"{small}/*.parquet"))
    assert n_small == 64
    compact_files(
        spark.read.parquet(small), compacted,
        target_file_bytes=64 * 1024 * 1024,
    )
    n_compacted = len(glob.glob(f"{compacted}/*.parquet"))
    # the whole sf0.001 events table is far below one 64 MB target
    # partition: AQE must coalesce the 64 fragments to a handful
    assert n_compacted <= 4, f"{n_compacted} files after compaction"
    assert rows_set(spark.read.parquet(compacted)) == rows_set(ev)


def test_compaction_restores_advisory_conf(spark, tmp_path):
    from mapreduce_join_comparison_spark.sources.layout import compact_files

    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    before = spark.conf.get(key)
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    compact_files(df, str(tmp_path / "out"), target_file_bytes=1234567)
    assert spark.conf.get(key) == before
