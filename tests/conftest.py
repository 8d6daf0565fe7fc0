from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_join_comparison_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": "/tmp/spark-graft-warehouse",
            "spark.driver.memory": "4g",
        },
    )
    yield spark


@pytest.fixture(autouse=True)
def _restore_session_conf():
    """CLI entry points call ``get_spark(manual_join_strategy=True)``,
    and builder configs apply to an existing session — so an in-process
    ``cli.main`` run leaves ``autoBroadcastJoinThreshold=-1`` behind and
    later plan-shape tests see broadcasts degrade to shuffle joins.
    Restore the suite's conf after every test."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.conf.set("spark.sql.shuffle.partitions", "8")
        s.conf.unset("spark.sql.autoBroadcastJoinThreshold")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from mapreduce_join_comparison_spark.sources import load_tables

    return load_tables(spark, sf_dir)


def rows_set(df, ndigits: int = 6):
    """Order-insensitive, float-rounded comparable form of a DataFrame.
    Sort key is repr-based so rows containing None still sort."""

    def norm(v):
        if isinstance(v, float):
            return round(v, ndigits)
        return v

    return sorted(
        (tuple(norm(v) for v in row) for row in df.collect()), key=repr
    )
