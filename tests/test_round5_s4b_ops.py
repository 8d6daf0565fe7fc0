"""Round-5 (session 4) batch 2: bloom runtime pruning, basket
affinity, Markov transitions.

The bloom filter's pruning decisions are replayed in pure Python
(same md5 arithmetic) and required to match EXACTLY — not just the
rate, the per-key decision set. Affinity and transitions check
hand-computed matrices including the tie/ordering edge cases."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import basket_affinity
from mapreduce_join_comparison_spark.operators.joins import bloom_prune_stats
from mapreduce_join_comparison_spark.operators.timeseries import (
    markov_transitions,
)

# ----------------------------------------------------------------- bloom


def _py_positions(key, n_bits, n_hashes, salt="bl"):
    return {
        int(hashlib.md5(f"{j}:{key}{salt}".encode()).hexdigest()[:8], 16)
        % n_bits
        for j in range(n_hashes)
    }


def _py_bloom(dim_keys, probe_keys, n_bits, n_hashes):
    bits = set()
    for k in dim_keys:
        bits |= _py_positions(k, n_bits, n_hashes)
    out = {}
    for k in set(probe_keys):
        passed = _py_positions(k, n_bits, n_hashes) <= bits
        member = k in set(dim_keys)
        out[k] = (passed, member, passed and not member)
    return out


def _spark_bloom(spark, dim_keys, probe_keys, n_bits, n_hashes):
    dim = spark.createDataFrame([(k,) for k in dim_keys], "k bigint")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k bigint")
    rows = bloom_prune_stats(
        probe, dim, "k", n_bits=n_bits, n_hashes=n_hashes
    ).collect()
    return {
        r["k"]: (r["bloom_pass"], r["is_member"], r["is_false_pos"])
        for r in rows
    }


def test_bloom_members_always_pass_and_decisions_replay(spark):
    # tiny bitset (64 bits) forces false positives; the exact decision
    # set must match the pure-python replay of the same md5 grid
    dim = list(range(0, 40, 2))
    probe = list(range(60))
    got = _spark_bloom(spark, dim, probe, n_bits=64, n_hashes=3)
    expect = _py_bloom(dim, probe, n_bits=64, n_hashes=3)
    assert got == expect
    # every true member passes (no false negatives — bloom's contract)
    for k in dim:
        assert got[k][0] and got[k][1] and not got[k][2]
    # with 20 keys x 3 hashes in 64 bits, collisions exist
    assert any(fp for _, _, fp in got.values())


def test_bloom_no_false_negatives_large_bitset(spark):
    # roomy bitset: everything non-member should (almost surely) fail;
    # spot-verified against the replay either way
    dim = [1, 2, 3]
    probe = [1, 2, 3, 1000, 2000, 3000]
    got = _spark_bloom(spark, dim, probe, n_bits=8192, n_hashes=3)
    assert got == _py_bloom(dim, probe, 8192, 3)
    assert all(got[k] == (True, True, False) for k in dim)


def test_bloom_duplicate_probe_rows_collapse(spark):
    # probing is over DISTINCT keys: duplicates in the fact produce
    # one decision row each
    dim = spark.createDataFrame([(1,)], "k bigint")
    probe = spark.createDataFrame([(1,), (1,), (2,), (2,)], "k bigint")
    rows = bloom_prune_stats(probe, dim, "k", n_bits=1024).collect()
    assert len(rows) == 2


# -------------------------------------------------------------- affinity


def test_basket_affinity_hand_case(spark):
    # baskets: {a,b,c}, {a,b}, {a}, {b,c} — duplicate item rows in a
    # basket count once
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "b bigint, i string")
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_count"], r["count_a"], r["count_b"],
            r["support_ppm"], r["lift"],
        )
        for r in basket_affinity(df, "b", "i").collect()
    }
    # N=4; counts a=3 b=3 c=2; pairs ab=2 ac=1 bc=2
    assert got == {
        ("a", "b"): (2, 3, 3, 500000, 2 * 4 / (3 * 3)),
        ("a", "c"): (1, 3, 2, 250000, 1 * 4 / (3 * 2)),
        ("b", "c"): (2, 3, 2, 500000, 2 * 4 / (3 * 2)),
    }


def test_basket_affinity_singleton_baskets_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "b bigint, i string"
    )
    assert basket_affinity(df, "b", "i").count() == 0


# ----------------------------------------------------------- transitions


def test_markov_transitions_hand_case(spark):
    # user 1: A->B->A ; user 2: A->A ; user 3: B (no pair)
    rows = [
        (1, "A", 10, 1), (1, "B", 20, 2), (1, "A", 30, 3),
        (2, "A", 10, 4), (2, "A", 20, 5),
        (3, "B", 10, 6),
    ]
    df = spark.createDataFrame(
        rows, "u bigint, s string, t bigint, e bigint"
    )
    got = {
        (r["from_state"], r["to_state"]): (
            r["n_trans"], r["from_total"], r["prob_ppm"], r["prob"]
        )
        for r in markov_transitions(df, "u", "s", "t", "e").collect()
    }
    assert got == {
        ("A", "B"): (1, 2, 500000, 0.5),
        ("A", "A"): (1, 2, 500000, 0.5),
        ("B", "A"): (1, 1, 1000000, 1.0),
    }


def test_markov_tiebreak_is_deterministic(spark):
    # equal timestamps: ordering falls to the tiebreak column, so the
    # sequence is A(e=1) -> B(e=2) -> C(e=3) regardless of input order
    rows = [(1, "C", 10, 3), (1, "A", 10, 1), (1, "B", 10, 2)]
    df = spark.createDataFrame(
        rows, "u bigint, s string, t bigint, e bigint"
    )
    got = {
        (r["from_state"], r["to_state"])
        for r in markov_transitions(df, "u", "s", "t", "e").collect()
    }
    assert got == {("A", "B"), ("B", "C")}
