"""Round-5 (session 4) batch 7: Poisson bootstrap CI, Gini
concentration, disorder audit.

The bootstrap's weight draw is replayed in pure Python (same md5
thresholds) and the replicate means re-derived exactly; Gini is
checked against the O(n log n) sorted-rank reference on hand data;
disorder against a serial running-max walk."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    _POISSON1_THRESHOLDS,
    gini_concentration,
    poisson_bootstrap_ci,
)
from mapreduce_join_comparison_spark.operators.timeseries import disorder_audit


def _py_weight(eid, b, salt="boot"):
    # replicate b draws chunk b%4 of md5(id:j) with j = b//4 — four
    # 32-bit uniforms per hash, mirroring the operator
    hexd = hashlib.md5(f"{eid}:{b // 4}{salt}".encode()).hexdigest()
    c = b % 4
    h = int(hexd[8 * c:8 * c + 8], 16)
    for k, t in enumerate(_POISSON1_THRESHOLDS):
        if h < t:
            return k
    return 8


def test_bootstrap_replays_in_python(spark):
    vals = [(i, 100 + 7 * i) for i in range(40)]
    df = spark.createDataFrame(vals, "event_id bigint, vm bigint")
    got = poisson_bootstrap_ci(
        df, "event_id", F.col("vm"), n_reps=20
    ).collect()[0]
    # replay: per replicate weighted mean, order stats at ranks
    # max(1, int(.025*20)) = 1 and min(20, int(.975*20)+1) = 20
    means = []
    for b in range(20):
        ws = [(_py_weight(i, b), v) for i, v in vals]
        sw = sum(w for w, _ in ws)
        means.append(sum(w * v for w, v in ws) / sw)
    means.sort()
    assert got["n_rows"] == 40
    assert got["mean_full"] == sum(v for _, v in vals) / 40
    assert got["ci_lo"] == means[0]
    assert got["ci_hi"] == means[19]
    assert got["ci_lo"] <= got["mean_full"] <= got["ci_hi"]


def test_bootstrap_weights_mean_near_one(spark):
    # sanity on the inverse-CDF itself: mean weight over many draws ~ 1
    n = 5000
    ws = [_py_weight(i, 0) for i in range(n)]
    assert 0.95 < sum(ws) / n < 1.05
    assert max(ws) <= 8


def _gini_reference(freqs):
    xs = sorted(freqs)
    n, t = len(xs), sum(xs)
    s = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * s - (n + 1) * t) / (n * t)


def test_gini_uniform_zero_and_skewed(spark):
    uniform = spark.createDataFrame(
        [(k,) for k in range(10) for _ in range(3)], "k bigint"
    )
    r = gini_concentration(uniform, "k").collect()[0]
    assert (r["n_keys"], r["n_rows"], r["max_freq"], r["gini"]) == (
        10, 30, 3, 0.0,
    )
    # skewed: freqs 1,1,1,1,6  -> reference formula
    rows = [(k,) for k in range(4)] + [(99,)] * 6
    skewed = spark.createDataFrame(rows, "k bigint")
    r2 = gini_concentration(skewed, "k").collect()[0]
    assert r2["gini"] == pytest.approx(_gini_reference([1, 1, 1, 1, 6]), rel=1e-12)
    assert r2["max_freq"] == 6 and r2["n_keys"] == 5


def test_disorder_audit_hand_case(spark):
    # arrival order (event_id) vs event time: series A arrives
    # 10,30,20,40 -> disorders 0,0,10,0; series B in order -> all 0
    rows = [
        ("A", 1, 10), ("A", 2, 30), ("A", 3, 20), ("A", 4, 40),
        ("B", 5, 1), ("B", 6, 2),
    ]
    df = spark.createDataFrame(rows, "s string, eid bigint, us bigint").select(
        "s", "eid", F.timestamp_micros("us").alias("ts")
    )
    got = {
        r["s"]: (r["n"], r["n_late"], r["late_ppm"], r["max_disorder_us"])
        for r in disorder_audit(df, "s", "ts", "eid").collect()
    }
    assert got == {"A": (4, 1, 250000, 10), "B": (2, 0, 0, 0)}
