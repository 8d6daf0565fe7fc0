"""Generator correctness: determinism, distribution shape, reference
semantics (uniform modulo keys, dim = exact key set, Zipf hot-key mass
≈ count / H(N, s))."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_join_comparison_spark.generator import (
    DEFAULT_ATTR_LENGTHS,
    generalized_harmonic,
    generate_dim,
    generate_uniform_pair,
    generate_zipf_fact,
    generate_zipf_pair,
    max_zipf_repeats,
    zipf_inverse_cdf,
)

from conftest import rows_set


def test_zipf_inverse_cdf_properties():
    p = np.linspace(0.0, 0.999, 5000)
    v = zipf_inverse_cdf(p, 0.8, 1000.0)
    assert v.min() >= 1
    assert v.max() <= 1000
    # monotone non-decreasing in p
    assert np.all(np.diff(v) >= 0)
    # hottest value (k=1) has mass ~ 1/H(N,s)
    frac_hot = np.mean(v == 1)
    expect = 1.0 / generalized_harmonic(1000, 0.8)
    assert abs(frac_hot - expect) < 0.02


def test_zipf_s1_rejected():
    with pytest.raises(ValueError):
        zipf_inverse_cdf(np.array([0.5]), 1.0, 100.0)


def test_uniform_pair_semantics(spark):
    t1, t2 = generate_uniform_pair(spark, 1000, 100, seed=1)
    rows = t1.groupBy("k").count().collect()
    assert len(rows) == 100
    assert all(r["count"] == 10 for r in rows)
    assert rows_set(t1) == rows_set(t2)


def test_dim_exact_key_set(spark):
    dim = generate_dim(spark, 500, seed=3)
    keys = sorted(r["k"] for r in dim.select("k").collect())
    assert keys == list(range(500))


def test_attr_lengths_and_pool(spark):
    dim = generate_dim(spark, 200, seed=5)
    rows = dim.collect()
    for i, length in enumerate(DEFAULT_ATTR_LENGTHS):
        vals = {r[f"a{i + 1}"] for r in rows}
        assert all(len(v) == length for v in vals)
        assert len(vals) <= 100  # pool-bounded


def test_generation_deterministic(spark):
    a = generate_zipf_fact(spark, 2000, 200, 0.9, seed=11)
    b = generate_zipf_fact(spark, 2000, 200, 0.9, seed=11)
    assert rows_set(a) == rows_set(b)
    c = generate_zipf_fact(spark, 2000, 200, 0.9, seed=12)
    assert rows_set(a) != rows_set(c)  # attrs differ with seed


def test_zipf_hot_key_mass(spark):
    n, uniq, s = 20000, 1000, 0.8
    fact = generate_zipf_fact(spark, n, uniq, s, seed=7)
    hot = fact.filter("k = 1").count()
    expect = max_zipf_repeats(uniq, s, n)
    assert abs(hot - expect) / expect < 0.1


def test_zipf_pair_join_all_fact_rows_match(spark):
    # every fact key is in [1, N] ⊂ dim keys ∪ {N}; dim holds 0..N-1 so
    # keys 1..N-1 match; key N (p→1 tail) may not. Join preserves ≈all rows.
    dim, fact = generate_zipf_pair(spark, 5000, 500, 0.5, seed=9)
    joined = fact.join(dim, "k", "inner")
    assert joined.count() >= fact.filter("k < 500").count()


def test_double_skew_pair(spark):
    t1, t2 = generate_zipf_pair(spark, 3000, 300, 0.7, seed=13, double_skew=True)
    assert rows_set(t1) == rows_set(t2)


def test_zipf_pole_fails_fast_on_driver(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.generator import generate_zipf_fact

    # the guard must raise at plan-construction time (driver), not from
    # a worker mid-job
    with _pytest.raises(ValueError, match="pole"):
        generate_zipf_fact(spark, 100, 10, s=1.0)


def test_chunked_staging_equals_monolithic(spark, tmp_path):
    """stage_zipf_fact_chunked (round-10, the >=400M scaleup tail's
    zero-shuffle staging) must write EXACTLY generate_zipf_fact's
    table: each chunk keeps the global n_rows denominator, so the
    slices union bit-for-bit — including an uneven last chunk."""
    from mapreduce_join_comparison_spark.generator import (
        stage_zipf_fact_chunked,
    )

    n, u, s = 10_001, 1_000, 0.7  # uneven: 3 chunks of 3334/3334/3333
    path = str(tmp_path / "fact_chunks")
    stage_zipf_fact_chunked(spark, n, u, s, path, seed=7, chunks=3)
    staged = rows_set(spark.read.parquet(path))
    mono = rows_set(generate_zipf_fact(spark, n, u, s, seed=7))
    assert staged == mono
    assert len(spark.read.parquet(path).collect()) == n
