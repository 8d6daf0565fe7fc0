"""Prove the AQE skew-split path actually fires on our join plans.

The reference's merge join hard-fails at skew 1.2 / >=36M rows
(data/results_speedup_1.2.csv:13-15); our posture is that AQE splits
the Zipf hot key's partition at runtime instead. The 256 MB default
threshold is sized for cluster partitions, so at local row counts the
mechanism silently never engages — the round-3 verdict flagged the
10M-row skew-1.2 repartition cell as the one curve diverging from the
reference's flat-repartition story. These tests scale the thresholds
to local sizes (session.LOCAL_SKEW_CONF — the same conf bench.py's
sweep uses) and assert the executed adaptive plan really contains a
skew-split shuffle read, for BOTH shuffle strategies we expose."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.generator import generate_zipf_pair
from mapreduce_join_comparison_spark.operators.joins import equi_join
from mapreduce_join_comparison_spark.session import (
    LOCAL_SKEW_CONF,
    scoped_conf,
)

N_ROWS = 3_000_000  # hot key at s=1.2 ~ 570k dupes -> tens of MB


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("skew_stage")
    dim, fact = generate_zipf_pair(
        spark, N_ROWS, N_ROWS // 10, s=1.2, seed=42
    )
    fact.write.parquet(str(tmp / "fact"))
    dim.write.parquet(str(tmp / "dim"))
    return (spark.read.parquet(str(tmp / "fact")),
            spark.read.parquet(str(tmp / "dim")))


def _executed_plan_after_run(df) -> str:
    # aggregate to one row so collect() executes THIS DataFrame's
    # QueryExecution (the join sits inside; AQE finalizes it). The
    # aggregate touches BOTH payload columns — a bare count() lets
    # column pruning strip everything but the 8-byte key, shrinking
    # the shuffle below any skew threshold and voiding the test.
    probe = df.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("a1")).alias("_la"),
        F.sum(F.length("d1")).alias("_ld"),
    )
    (row,) = probe.collect()
    assert row["n"] > 0
    return probe._jdf.queryExecution().executedPlan().toString()


# a cluster-morphic partition count: with only 8 local partitions the
# non-hot rows dominate every partition and the median is a third of
# the hot partition — the 5x factor heuristic correctly stays quiet.
# Real deployments run hundreds of shuffle partitions, making the
# median small and the hot-key partition stand out; 64 reproduces that
# geometry at 3M rows.
_PARTS = {"spark.sql.shuffle.partitions": "64"}


@pytest.mark.parametrize("strategy", ["repartition", "merge"])
def test_skew_split_fires_on_hot_key(spark, staged, strategy):
    fact, dim = staged
    with scoped_conf(spark, **LOCAL_SKEW_CONF, **_PARTS):
        df = equi_join(fact, dim.selectExpr("k AS dk", "a1 AS d1"),
                       "k", "dk", "inner", strategy)
        plan = _executed_plan_after_run(df)
    assert ("skewed" in plan) or ("skew=true" in plan), (
        f"{strategy}: no skew-split marker in the executed plan — the "
        f"hot-key partition ran as one straggler:\n{plan[:4000]}"
    )


def test_skew_split_absent_without_scaled_conf(spark, staged):
    """Control: under the cluster-sized default thresholds the local
    hot key is below 256 MB and must NOT trigger a split — confirms
    the marker assertion above is detecting the conf, not noise."""
    fact, dim = staged
    with scoped_conf(spark, **_PARTS):
        df = equi_join(fact, dim.selectExpr("k AS dk", "a1 AS d1"),
                       "k", "dk", "inner", "repartition")
        plan = _executed_plan_after_run(df)
    assert "skewed" not in plan and "skew=true" not in plan, plan[:4000]
