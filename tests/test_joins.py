"""Join strategy correctness: all three physical strategies produce the
same result (the reference's core invariant), plan assertions prove the
intended physical operator ran, and golden fixtures from the reference's
``simulation/simple_tables/`` are reproduced relationally (FIXTURES.md F1).
"""

from __future__ import annotations

import pytest

from mapreduce_join_comparison_spark.operators.joins import (
    STRATEGIES,
    equi_join,
    salted_join,
)
from mapreduce_join_comparison_spark.plans.explain import (
    JOIN_EXEC,
    assert_no_exchange,
    physical_plan,
)

from conftest import rows_set

# FIXTURES.md F1 — the reference's golden smoke pair, as literal rows.
# t1: unique-ish keys; t2: duplicate keys up to 5x, non-matching 90/91.
T1 = [(0, "a0"), (1, "a1"), (2, "a2"), (3, "a3"), (4, "a4"), (5, "a5"),
      (6, "a6"), (7, "a7"), (8, "ü"), (11, "a11"), (92, "a92"), (93, "a93")]
T1_NONUNIQUE = [(0, "a0"), (1, "a1"), (2, "a2"), (3, "a3"), (4, "a4"),
                (5, "a5"), (6, "a6x"), (6, "a6y"), (6, "a6z"),
                (7, "a7x"), (7, "a7y"), (7, "a7z")]
T2 = ([(0, "b0"), (1, "b1"), (2, "b2"), (3, "b3"), (4, "b4"), (5, "b5")]
      + [(6, f"b6_{i}") for i in range(3)]
      + [(7, f"b7_{i}") for i in range(5)]
      + [(90, "b90"), (91, "b91")]
      + [(1, "b1_dup"), (2, "b2_dup"), (3, "b3_dup")]
      + [(8, "ä"), (9, "b9"), (10, "b10")])


@pytest.fixture(scope="module")
def fixture_tables(spark):
    t1 = spark.createDataFrame(T1, "k bigint, a string")
    t1n = spark.createDataFrame(T1_NONUNIQUE, "k bigint, a string")
    t2 = spark.createDataFrame(T2, "k2 bigint, b string")
    return t1, t1n, t2


def expected_inner(left, right):
    """Relational oracle in plain Python: full per-key cross product."""
    out = []
    for lk, lv in left:
        for rk, rv in right:
            if lk == rk:
                out.append((lk, lv, rk, rv))
    return sorted(out)


@pytest.mark.parametrize("strategy", ["repartition", "broadcast", "merge", "auto"])
def test_strategies_agree_on_fixture(spark, fixture_tables, strategy):
    t1, _, t2 = fixture_tables
    result = equi_join(t1, t2, "k", "k2", "inner", strategy)
    assert rows_set(result) == expected_inner(T1, T2)


@pytest.mark.parametrize("strategy", ["repartition", "broadcast", "merge"])
def test_duplicate_both_sides_cross_product(spark, fixture_tables, strategy):
    # Quirk Q1 (reference broadcast join drops duplicate build rows) must
    # NOT reproduce: all strategies give the full cross product.
    _, t1n, t2 = fixture_tables
    result = equi_join(t1n, t2, "k", "k2", "inner", strategy)
    expected = expected_inner(T1_NONUNIQUE, T2)
    assert rows_set(result) == expected
    # key 7: 3 left x 5 right = 15 pairs
    assert sum(1 for r in expected if r[0] == 7) == 15


@pytest.mark.parametrize("strategy", ["repartition", "broadcast", "merge"])
def test_physical_operator_matches_strategy(spark, fixture_tables, strategy):
    t1, _, t2 = fixture_tables
    result = equi_join(t1, t2, "k", "k2", "inner", strategy)
    assert JOIN_EXEC[strategy] in physical_plan(result)


def test_broadcast_has_no_shuffle(spark, fixture_tables):
    # Reference quirk Q2: its broadcast join shuffled anyway
    # (BroadcastJoin.java:54). Ours must not.
    t1, _, t2 = fixture_tables
    result = equi_join(t1, t2, "k", "k2", "inner", "broadcast")
    assert_no_exchange(result)


@pytest.mark.parametrize("how", ["left", "right", "full", "left_semi", "left_anti"])
def test_extended_join_types(spark, fixture_tables, how):
    # Beyond the reference (inner-only): all join types supported.
    t1, _, t2 = fixture_tables
    result = equi_join(t1, t2, "k", "k2", how)
    matched_left = {k for k, _ in T1} & {k for k, _ in T2}
    if how == "left_semi":
        assert result.count() == len([1 for k, _ in T1 if k in matched_left])
    elif how == "left_anti":
        assert result.count() == len([1 for k, _ in T1 if k not in matched_left])
    elif how == "left":
        inner = len(expected_inner(T1, T2))
        unmatched = len([1 for k, _ in T1 if k not in matched_left])
        assert result.count() == inner + unmatched


def test_strategies_agree_on_testdata(spark, tables):
    dfs = {
        s: equi_join(tables["customer"], tables["orders"], "c_custkey",
                     "o_custkey", "inner", s)
        for s in STRATEGIES
    }
    counts = {s: df.count() for s, df in dfs.items()}
    assert len(set(counts.values())) == 1, counts
    assert counts["auto"] > 0


def test_salted_join_matches_plain(spark, tables):
    plain = equi_join(tables["orders"], tables["customer"], "o_custkey",
                      "c_custkey").count()
    salted = salted_join(tables["orders"], tables["customer"], "o_custkey",
                         "c_custkey", salt=8).count()
    assert plain == salted


def test_band_join_matches_naive_and_avoids_nested_loop(spark):
    """band_join must equal the naive cross-filter on every edge case
    (exact-width boundary, bucket-boundary straddle, negatives) and
    plan as an EQUI join — no BroadcastNestedLoopJoin anywhere."""
    from mapreduce_join_comparison_spark.operators.joins import band_join
    from mapreduce_join_comparison_spark.plans.explain import simple_plan

    left = spark.createDataFrame(
        [(1, -10.0), (2, 0.0), (3, 4.9), (4, 5.0), (5, 123.45)], "lid int, lv double"
    )
    right = spark.createDataFrame(
        [(10, -5.1), (11, -5.0), (12, 0.0), (13, 9.9), (14, 10.0), (15, 128.44)],
        "rid int, rv double",
    )
    width = 5.0
    got = band_join(left, right, "lv", "rv", width)
    naive = left.crossJoin(right).filter(f"abs(lv - rv) <= {width}")
    assert rows_set(got) == rows_set(naive)
    assert "BroadcastNestedLoopJoin" not in simple_plan(got)


def test_iejoin_pairs_matches_naive_and_avoids_nested_loop(spark):
    """iejoin_pairs (the IEJoin pair class: l.x < r.x AND l.y > r.y)
    must equal the naive cross-filter on edge cases — bucket-boundary
    ties, equal x/y values (strict predicates), negatives, a
    single-value y domain — at several bucket counts including
    n_buckets larger than the domain, and plan as an EQUI join."""
    from mapreduce_join_comparison_spark.operators.joins import iejoin_pairs
    from mapreduce_join_comparison_spark.plans.explain import simple_plan

    rows = [(1, 0, 50), (2, 0, 10), (3, 3, 50), (4, 3, 10),
            (5, -7, -2), (6, 10, 50), (7, 10, 10), (8, 5, 5),
            (9, 5, 5), (10, 2, -2)]
    left = spark.createDataFrame(
        [(i, x, y) for i, x, y in rows], "lid long, lx long, ly long")
    right = spark.createDataFrame(
        [(i, x, y) for i, x, y in rows], "rid long, rx long, ry long")
    naive = rows_set(
        left.crossJoin(right).filter("lx < rx AND ly > ry")
    )
    for b in (1, 2, 8, 64):
        got = iejoin_pairs(left, right, "lx", "rx", "ly", "ry",
                           n_buckets=b)
        assert rows_set(got) == naive, f"n_buckets={b}"
    plan = simple_plan(
        iejoin_pairs(left, right, "lx", "rx", "ly", "ry"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_iejoin_pairs_quantile_edges_identical_and_balanced(spark):
    """edges="quantile" (the clustered-domain upgrade path): bucket
    boundaries from per-axis union quantiles must yield the EXACT
    same pairs as the uniform grid (any monotone bucketing preserves
    candidate-cell containment + exactly-once), still plan as an
    EQUI join, and on a pathologically clustered domain (99% of mass
    in 1% of the value range) must spread the home cells across
    multiple buckets where the uniform grid collapses to one."""
    from pyspark.sql import functions as F

    from mapreduce_join_comparison_spark.operators.joins import iejoin_pairs
    from mapreduce_join_comparison_spark.plans.explain import simple_plan

    # 200 rows clustered in [0, 20), 2 outliers at 2_000_000: the
    # uniform 8-bucket grid puts the cluster entirely in bucket 0
    rows = [(i, i % 20, (i * 7) % 20) for i in range(200)]
    rows += [(1000, 2_000_000, 2_000_000), (1001, 1_999_999, 1_999_998)]
    left = spark.createDataFrame(
        [(i, x, y) for i, x, y in rows], "lid long, lx long, ly long")
    right = spark.createDataFrame(
        [(i, x, y) for i, x, y in rows], "rid long, rx long, ry long")
    naive = rows_set(
        left.crossJoin(right).filter("lx < rx AND ly > ry"))
    for b in (2, 8):
        got = iejoin_pairs(left, right, "lx", "rx", "ly", "ry",
                           n_buckets=b, edges="quantile")
        assert rows_set(got) == naive, f"quantile n_buckets={b}"
    q = iejoin_pairs(left, right, "lx", "rx", "ly", "ry",
                     n_buckets=8, edges="quantile")
    plan = simple_plan(q)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan

    # balance: the quantile cuts must split the clustered mass —
    # checked through the same union+approxQuantile probe the
    # operator runs:
    probs = [i / 8 for i in range(1, 8)]
    cuts = (left.select(F.col("lx").cast("double").alias("v"))
            .union(right.select(F.col("rx").cast("double").alias("v")))
            .approxQuantile("v", probs, 1.0 / 32))
    # quantile cuts must split the cluster (not all sit at the
    # outlier end): at least 4 distinct cut values inside [0, 20)
    assert len({c for c in cuts if c < 20}) >= 4, cuts
    with pytest.raises(ValueError):
        iejoin_pairs(left, right, "lx", "rx", "ly", "ry",
                     edges="nonsense")


def test_iejoin_pairs_nulls_empty_and_type_guard(spark):
    """NULL coordinates can never satisfy a strict inequality and are
    dropped; an empty side yields an empty (still equi-join) plan; a
    non-integer column is rejected up front (exact bucket math)."""
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.joins import iejoin_pairs
    from mapreduce_join_comparison_spark.plans.explain import simple_plan

    left = spark.createDataFrame(
        [(1, 0, 9), (2, None, 9), (3, 1, None)],
        "lid long, lx long, ly long")
    right = spark.createDataFrame(
        [(10, 5, 1), (11, None, 1)], "rid long, rx long, ry long")
    got = rows_set(iejoin_pairs(left, right, "lx", "rx", "ly", "ry"))
    assert got == rows_set(
        spark.createDataFrame(
            [(1, 0, 9, 10, 5, 1)],
            "lid long, lx long, ly long, rid long, rx long, ry long",
        )
    )
    empty = right.filter("rid < 0")
    out = iejoin_pairs(left, empty, "lx", "rx", "ly", "ry")
    assert out.count() == 0
    plan = simple_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    dbl = spark.createDataFrame([(1, 0.5, 1.0)], "rid long, rx double, ry double")
    with _pytest.raises(TypeError):
        iejoin_pairs(left, dbl, "lx", "rx", "ly", "ry")


def test_advise_strategy_follows_thesis_decision_tree(spark, tables, tmp_path):
    """The codified Fig-6.11 tree: small dim → broadcast; huge-vs-huge
    (budget 0) → repartition; co-bucketed → merge."""
    from mapreduce_join_comparison_spark.operators.joins import advise_strategy
    from mapreduce_join_comparison_spark.sources.io import write_bucketed

    customer, orders = tables["customer"], tables["orders"]
    s, why = advise_strategy(orders, customer, "o_custkey", "c_custkey")
    assert s == "broadcast", why
    s, why = advise_strategy(
        orders, customer, "o_custkey", "c_custkey", broadcast_budget_bytes=0
    )
    assert s == "repartition", why

    spark.sql("DROP TABLE IF EXISTS adv_c")
    spark.sql("DROP TABLE IF EXISTS adv_o")
    write_bucketed(customer, "adv_c", ["c_custkey"], 4, path=str(tmp_path / "c"))
    write_bucketed(orders, "adv_o", ["o_custkey"], 4, path=str(tmp_path / "o"))
    bc, bo = spark.table("adv_c"), spark.table("adv_o")
    s, why = advise_strategy(bo, bc, "o_custkey", "c_custkey",
                             broadcast_budget_bytes=0)
    assert s == "merge", why


def test_equi_join_advised_strategy(spark, tables):
    """strategy='advised' must both pick a sensible plan (broadcast for
    the small dim) and produce the exact inner-join result."""
    from mapreduce_join_comparison_spark.operators.joins import equi_join
    from mapreduce_join_comparison_spark.plans.explain import simple_plan

    customer, orders = tables["customer"], tables["orders"]
    j = equi_join(orders, customer, "o_custkey", "c_custkey",
                  strategy="advised")
    assert "BroadcastHashJoin" in simple_plan(j)
    plain = equi_join(orders, customer, "o_custkey", "c_custkey")
    assert rows_set(j) == rows_set(plain)
