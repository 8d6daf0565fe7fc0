"""Round-5 (session 4) operators: binned skyline, grid distance
join, count-min sketch, cohort retention.

The skyline and grid join are blocked/binned decompositions of
quadratic or globally-ordered problems — the tests brute-force the
naive definition on adversarial small inputs (ties, boundaries,
duplicates) and require EXACT set equality, so any lossy blocking or
off-by-one frame shows up immediately. Count-min is checked for its
two defining properties (one-sided error, linearity/mergeability);
cohort retention against a hand-computed matrix."""

from __future__ import annotations

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.joins import grid_distance_join
from mapreduce_join_comparison_spark.operators.sampling import (
    countmin_estimate,
    countmin_sketch,
)
from mapreduce_join_comparison_spark.operators.sorts import skyline_2d
from mapreduce_join_comparison_spark.operators.timeseries import cohort_retention

# --------------------------------------------------------------- skyline


def _brute_skyline(pts):
    """Naive O(n²) skyline, minimizing both dims: keep p unless some q
    has q ≤ p in both dims and < in at least one."""
    out = []
    for i, (px, py) in enumerate(pts):
        dominated = any(
            qx <= px and qy <= py and (qx < px or qy < py)
            for j, (qx, qy) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((px, py))
    return sorted(out)


def _spark_skyline(spark, pts, bins):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id bigint, x double, y double",
    )
    rows = skyline_2d(df, "x", "y", bins=bins).collect()
    return sorted((r["x"], r["y"]) for r in rows)


def test_skyline_tie_semantics(spark):
    # (1,5) dominated by equal-x smaller-y (1,3); (4,3) dominated by
    # smaller-x equal-y (1,3); duplicates (2,2)×2 both kept; (1,3)
    # survives ((2,2) trades x for y — incomparable)
    pts = [(1, 5), (1, 3), (4, 3), (2, 2), (2, 2), (0, 9), (9, 0)]
    expect = _brute_skyline(pts)
    assert expect == [(0, 9), (1, 3), (2, 2), (2, 2), (9, 0)]
    for bins in (1, 2, 7, 64):
        assert _spark_skyline(spark, pts, bins) == expect, f"bins={bins}"


def test_skyline_single_point_and_empty(spark):
    assert _spark_skyline(spark, [(3, 4)], 8) == [(3.0, 4.0)]
    df = spark.createDataFrame([], "id bigint, x double, y double")
    assert skyline_2d(df, "x", "y").count() == 0


def test_skyline_identical_x_everywhere(spark):
    # one x value: frontier = the min-y rows only (both duplicates)
    pts = [(5, 9), (5, 2), (5, 2), (5, 7)]
    assert _spark_skyline(spark, pts, 4) == [(5.0, 2.0), (5.0, 2.0)]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    ),
    bins=st.sampled_from([1, 2, 5, 32]),
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_skyline_matches_bruteforce(spark, pts, bins):
    # small integer grid maximizes tie/duplicate collisions — exactly
    # where a strict/non-strict prefix-min mixup diverges
    assert _spark_skyline(spark, pts, bins) == _brute_skyline(
        [(float(x), float(y)) for x, y in pts]
    )


# ------------------------------------------------------ grid distance


def _brute_pairs(pts, radius):
    out = []
    for (ia, xa, ya), (ib, xb, yb) in itertools.combinations(pts, 2):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= radius * radius:
            a, b = sorted((ia, ib))
            out.append((a, b, d2))
    return sorted(out)


def _spark_pairs(spark, pts, radius):
    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    rows = grid_distance_join(df, "id", "x", "y", radius).collect()
    return sorted((r["id_a"], r["id_b"], r["dist_sq"]) for r in rows)


def test_grid_join_boundary_inclusive(spark):
    # exactly radius apart (axis + diagonal 3-4-5) is INCLUDED; one
    # unit farther is not; pairs straddling a cell boundary are found
    pts = [(1, 0, 0), (2, 5, 0), (3, 3, 4), (4, 0, 6), (5, 100, 100)]
    assert _spark_pairs(spark, pts, 5) == _brute_pairs(pts, 5)
    got = _spark_pairs(spark, pts, 5)
    assert (1, 2, 25) in got and (1, 3, 25) in got
    assert all(p[0] != 5 and p[1] != 5 for p in got)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    coords=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=2,
        max_size=30,
        unique=True,
    ),
    radius=st.sampled_from([1, 4, 9]),
)
def test_grid_join_matches_bruteforce(spark, coords, radius):
    # dense little grid: many same-cell, adjacent-cell, and
    # exactly-on-radius pairs; each found exactly once
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    assert _spark_pairs(spark, pts, radius) == _brute_pairs(pts, radius)


# --------------------------------------------------------- count-min


def _toy(spark, values):
    return spark.createDataFrame([(v,) for v in values], "k string")


def test_countmin_one_sided_and_exact_when_sparse(spark):
    values = ["a"] * 7 + ["b"] * 3 + ["c"] * 1
    sk = countmin_sketch(_toy(spark, values), "k", depth=4, width=256)
    probes = _toy(spark, ["a", "b", "c"])
    est = {
        r["k"]: r["cm_est"]
        for r in countmin_estimate(sk, probes, "k", depth=4, width=256).collect()
    }
    # 3 distinct keys in a 4×256 grid: no collisions, estimates exact
    assert est == {"a": 7, "b": 3, "c": 1}
    # grid mass conservation: every row sums to N
    rowsum = {
        r["row_j"]: r["s"]
        for r in sk.groupBy("row_j").agg(F.sum("cnt").alias("s")).collect()
    }
    assert rowsum == {j: len(values) for j in range(4)}


def test_countmin_estimate_never_undercounts(spark):
    # tiny width forces collisions; CM error is strictly one-sided
    values = [f"k{i % 23}" for i in range(300)]
    df = _toy(spark, values)
    sk = countmin_sketch(df, "k", depth=3, width=8)
    true = {v: values.count(v) for v in set(values)}
    probes = _toy(spark, sorted(set(values)))
    for r in countmin_estimate(sk, probes, "k", depth=3, width=8).collect():
        assert r["cm_est"] >= true[r["k"]], r


def test_countmin_merge_is_elementwise_add(spark):
    # linearity: sketch(A ⊎ B) == sketch(A) + sketch(B) cell-by-cell —
    # the property that makes shard/delta sketches compose
    a = ["x"] * 5 + ["y"] * 2
    b = ["y"] * 4 + ["z"] * 3
    kw = dict(depth=4, width=16)
    cells = lambda vals: {  # noqa: E731
        (r["row_j"], r["col_h"]): r["cnt"]
        for r in countmin_sketch(_toy(spark, vals), "k", **kw).collect()
    }
    merged = cells(a)
    for cell, cnt in cells(b).items():
        merged[cell] = merged.get(cell, 0) + cnt
    assert merged == cells(a + b)


def test_countmin_absent_probe_key_reports_collision_floor(spark):
    # a key never inserted estimates ≥ 0 (0 if its cells are empty)
    sk = countmin_sketch(_toy(spark, ["a", "b"]), "k", depth=4, width=256)
    est = countmin_estimate(sk, _toy(spark, ["zzz"]), "k", depth=4, width=256)
    [r] = est.collect()
    assert r["cm_est"] in (0, 1)


# --------------------------------------------------- cohort retention


def test_cohort_retention_hand_case(spark):
    # two Monday-anchored cohorts: u1,u2 start wk0 (u1 returns wk1);
    # u3 starts wk1. 2024-01-01 is a Monday.
    rows = [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-03 10:00:00"),
        (1, "2024-01-09 10:00:00"),
        (3, "2024-01-10 10:00:00"),
        (1, "2024-01-01 12:00:00"),  # same-week repeat: not double-counted
    ]
    df = spark.createDataFrame(rows, "user_id bigint, s string").select(
        "user_id", F.to_timestamp("s").alias("ts")
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_ppm"],
        )
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1000000),
        ("2024-01-01", 1): (1, 2, 500000),
        ("2024-01-08", 0): (1, 1, 1000000),
    }


def test_cohort_week0_is_always_full(spark):
    # by construction every user is active in their cohort week
    df = spark.createDataFrame(
        [(i % 17, f"2024-01-{1 + i % 28:02d} 08:00:00") for i in range(200)],
        "user_id bigint, s string",
    ).select("user_id", F.to_timestamp("s").alias("ts"))
    for r in cohort_retention(df).filter(F.col("week_offset") == 0).collect():
        assert r["active_users"] == r["cohort_size"]
        assert r["retention_ppm"] == 1000000
