"""PageRank correctness against a pure-python reference implementation
of the same recurrence, plus loop/persistence mechanics."""

from __future__ import annotations

import pytest

from mapreduce_join_comparison_spark.operators.graph import pagerank

EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]


def _reference_ranks(edges, iterations, damping):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    deg = {}
    for u, _ in set(edges):
        deg[u] = deg.get(u, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for u, v in set(edges):
            contrib[v] += ranks[u] / deg[u]
        ranks = {
            v: (1.0 - damping) / n + damping * contrib[v] for v in nodes
        }
    return ranks


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_reference(spark, iterations):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=iterations, damping=0.85).collect()
    }
    want = _reference_ranks(EDGES, iterations, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_duplicate_edges_count_once(spark):
    df = spark.createDataFrame(EDGES + EDGES[:2], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=2).collect()}
    want = _reference_ranks(EDGES, 2, 0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_persist_every_truncates_lineage(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    chained = pagerank(df, iterations=4, damping=0.85, persist_every=10)
    persisted = pagerank(df, iterations=4, damping=0.85, persist_every=2)
    a = {r.node: r.rank for r in chained.collect()}
    b = {r.node: r.rank for r in persisted.collect()}
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_pagerank_checkpoint_bounds_plan_depth(spark):
    """Round-11: the loop localCheckpoints every ``persist_every``
    iterations, so the final plan's operator count must be BOUNDED by
    the per-window shape — independent of total iteration count (the
    old persist-only loop grew ~3 operators per iteration forever)."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    short = pagerank(df, iterations=6, damping=0.85, persist_every=5)
    long = pagerank(df, iterations=21, damping=0.85, persist_every=5)
    n_short = len(short._jdf.queryExecution().optimizedPlan().toString().splitlines())
    n_long = len(long._jdf.queryExecution().optimizedPlan().toString().splitlines())
    # both end exactly one iteration past their last checkpoint, so
    # the trees must be the SAME shape (a scan of the checkpointed
    # RDD + one iteration), not proportional to 6 vs 21
    assert n_long <= n_short + 2, (n_short, n_long)
