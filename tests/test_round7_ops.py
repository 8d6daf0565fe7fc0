"""Round-7 NULL/degenerate parity (round-6 advice): the window-free
`group_mode` rewrite and every binned decomposition re-attach per-group
state via join-backs, and a plain equi-join silently drops NULL group
keys that the direct single-window forms emit. All join-backs are now
NULL-safe (`<=>`), `group_mode`'s tie-break is NULLS-FIRST like the
old rank window, and `weighted_median_binned` handles the
all-zero-weight group the direct threshold handles. These tests pin
each of those against the direct forms (Row equality — the
decompositions claim BIT-IDENTICAL output)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    group_mode,
    ks_two_sample,
    ks_two_sample_binned,
    weighted_median,
    weighted_median_binned,
)


def test_group_mode_null_group_key(spark):
    # the NULL group is a group: the old rank-window form emitted it,
    # the join-back must too (NULL-safe <=>)
    rows = [("a", 1), ("a", 1), ("a", 2),
            (None, 7), (None, 7), (None, 9)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {r["g"]: (r["mode_value"], r["mode_count"])
           for r in group_mode(df, ["g"], F.col("v")).collect()}
    assert out == {"a": (1, 2), None: (7, 2)}


def test_group_mode_null_value_tie_nulls_first(spark):
    # NULL value tied at max count wins the tie-break (the window's
    # default ascending order is NULLS FIRST; plain min() skips NULLs)
    rows = [("a", None), ("a", None), ("a", 3), ("a", 3),
            ("b", None), ("b", 5), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {r["g"]: (r["mode_value"], r["mode_count"])
           for r in group_mode(df, ["g"], F.col("v")).collect()}
    assert out == {"a": (None, 2), "b": (5, 2)}


def test_group_mode_null_group_plan_is_broadcast_hash(spark):
    # <=> is still a hash-join condition: no BroadcastNestedLoopJoin
    # sneaks in with the NULL-safe join-back
    rows = [("a", i % 3) for i in range(10)] + [(None, 1)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    plan = group_mode(df, ["g"], F.col("v"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Window" not in plan


def _wm_both(spark, rows, n_bins_set=(1, 3, 64)):
    df = spark.createDataFrame(rows, "g string, v bigint, w bigint")
    direct = weighted_median(
        df, ["g"], F.col("v"), F.col("w")
    ).orderBy("g").collect()
    for nb in n_bins_set:
        binned = weighted_median_binned(
            df, ["g"], F.col("v"), F.col("w"), n_bins=nb
        ).orderBy("g").collect()
        assert binned == direct, f"n_bins={nb}: {binned} != {direct}"
    return direct


def test_wm_binned_null_group_key(spark):
    rows = [("a", 10, 1), ("a", 20, 3),
            (None, 5, 2), (None, 6, 1), (None, 7, 2)]
    direct = _wm_both(spark, rows)
    by_g = {r["g"]: r["weighted_median"] for r in direct}
    assert by_g[None] == 6  # cum at 6 is 3, 2*3 >= 5


def test_wm_binned_zero_weight_group(spark):
    # all-zero weights: direct's 2*cum >= tot holds at every value, so
    # it emits (0, min v); the binned crossing filter must not drop it
    rows = [("z", 40, 0), ("z", 10, 0), ("z", 30, 0),
            ("a", 1, 2), ("a", 2, 5)]
    direct = _wm_both(spark, rows)
    by_g = {r["g"]: (r["total_weight"], r["weighted_median"])
            for r in direct}
    assert by_g["z"] == (0, 10)


def test_wm_binned_zero_weight_null_group_combined(spark):
    rows = [(None, 9, 0), (None, 4, 0)]
    direct = _wm_both(spark, rows)
    assert direct[0]["g"] is None
    assert (direct[0]["total_weight"], direct[0]["weighted_median"]) \
        == (0, 4)


def test_ks_binned_null_group_key(spark):
    rows = (
        [("a", True, v) for v in (1, 2, 3, 10)]
        + [("a", False, v) for v in (2, 3, 4, 9)]
        + [(None, True, v) for v in (1, 5, 9)]
        + [(None, False, v) for v in (2, 6, 7)]
    )
    df = spark.createDataFrame(rows, "g string, arm boolean, v bigint")
    direct = ks_two_sample(
        df, ["g"], F.col("arm"), F.col("v")
    ).orderBy("g").collect()
    for nb in (1, 4, 64):
        binned = ks_two_sample_binned(
            df, ["g"], F.col("arm"), F.col("v"), n_bins=nb
        ).orderBy("g").collect()
        assert binned == direct, f"n_bins={nb}"
    assert {r["g"] for r in direct} == {"a", None}


def test_avro_roundtrip_or_environment_gate(spark):
    # SURVEY §2.1's last free-in-Spark format. The short "avro" name
    # needs the spark-avro module's DataSourceRegister entry, which
    # this pyspark build omits — but the implementation classes ship
    # inside spark-sql, so sources/io names the FileFormat class
    # directly; the probe must answer cleanly either way, and where it
    # answers True the roundtrip must be lossless
    import pytest

    from mapreduce_join_comparison_spark.sources.io import (
        avro_roundtrip,
        has_avro_datasource,
    )

    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet") \
        .select("n_nationkey", "n_name", "n_regionkey")
    if not has_avro_datasource(spark):
        pytest.skip("avro implementation classes absent "
                    "(documented gate: sources/io.has_avro_datasource)")
    back = avro_roundtrip(spark, nation, "/tmp/spark_graft_avro_rt")
    assert sorted(back.collect()) == sorted(nation.collect())
    assert back.schema == nation.schema


def test_prefix_index_probe_threshold_guard(spark):
    # round-6 advice: probing below the build threshold is UNSOUND
    # (stored prefixes too short -> silently incomplete pairs); the
    # build (k, threshold) is persisted as TBLPROPERTIES and enforced
    import pytest

    from mapreduce_join_comparison_spark.operators.dedup import (
        build_prefix_index,
        prefix_filter_jaccard_pairs_indexed,
        prefix_filter_probe_delta,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    build_prefix_index(docs, k=3, threshold=0.5, table_prefix="t_pfx_guard")
    # >= build threshold: valid (superset index), must not raise
    ok = prefix_filter_jaccard_pairs_indexed(
        spark, threshold=0.6, table_prefix="t_pfx_guard")
    assert ok.columns == ["id_a", "id_b", "jaccard"]
    with pytest.raises(ValueError, match="below the build threshold"):
        prefix_filter_jaccard_pairs_indexed(
            spark, threshold=0.3, table_prefix="t_pfx_guard")
    delta = docs.limit(5)
    with pytest.raises(ValueError, match="below the build threshold"):
        prefix_filter_probe_delta(
            spark, delta, threshold=0.3, table_prefix="t_pfx_guard")
    with pytest.raises(ValueError, match="shingle k"):
        prefix_filter_probe_delta(
            spark, delta, k=5, threshold=0.6, table_prefix="t_pfx_guard")
    # an index without the build properties (pre-guard build) refuses
    # to probe
    spark.sql(
        "ALTER TABLE t_pfx_guard_dict UNSET TBLPROPERTIES "
        "('spark_graft.k', 'spark_graft.threshold_milli')"
    )
    with pytest.raises(ValueError, match="rebuild"):
        prefix_filter_jaccard_pairs_indexed(
            spark, threshold=0.6, table_prefix="t_pfx_guard")


def _simhash_brute(sigs_rows, max_hamming):
    out = set()
    for i, (ida, sa) in enumerate(sigs_rows):
        for idb, sb in sigs_rows[i + 1:]:
            h = bin(sa ^ sb).count("1")
            if h <= max_hamming:
                a, b = min(ida, idb), max(ida, idb)
                out.add((a, b, h))
    return out


def test_simhash_hot_bucket_guard_exact(spark):
    # round-6 verdict "What's wrong #2": a hot (block, bval) bucket
    # must be salt-split into triangle cells (bounded per-task
    # candidate volume) and pairs must come out ONCE from their first
    # agreeing block — the guarded form is exact enumeration, not
    # sampling, so it must equal brute force AND the effectively
    # unguarded form (huge cap) on the same signatures
    from mapreduce_join_comparison_spark.operators.dedup import (
        _simhash_candidate_pairs,
    )

    # one deliberately hot bucket: 800 docs agree on block 0 (low 8
    # bits = 0x2A) with varied high bits, so candidates are quadratic
    # in the bucket but verified pairs are sparse; plus some docs
    # agreeing on several blocks (multi-block dedup path) and noise
    rows = []
    for i in range(800):
        rows.append((i, ((i * 2654435761) % (1 << 24)) << 8 | 0x2A))
    for i in range(40):  # identical sigs -> agree on ALL blocks
        rows.append((1000 + i, 0x0F0F0F0F))
    for i in range(40):  # hamming 1 neighbours of the clique
        rows.append((2000 + i, 0x0F0F0F0F ^ (1 << (i % 32))))
    sigs = spark.createDataFrame(rows, "id bigint, simhash bigint")
    expected = _simhash_brute(rows, max_hamming=3)
    guarded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in _simhash_candidate_pairs(
            sigs, bits=32, max_hamming=3, blocks=4, bucket_cap=100
        ).collect()
    }
    unguarded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in _simhash_candidate_pairs(
            sigs, bits=32, max_hamming=3, blocks=4, bucket_cap=10**9
        ).collect()
    }
    assert guarded == expected and unguarded == expected
    assert len(expected) > 0
    # per-cell volume bound: with cap=100 the 880-member block-0
    # bucket splits into g = ceil(880/100) = 9 hash groups; the
    # largest group (hash-balanced) stays well under 3x cap, so no
    # cell exceeds ~ (3 cap)^2 candidates
    from collections import Counter
    g = -(-880 // 100)
    assert g == 9
    grp = Counter()
    for r in spark.createDataFrame(
        [(i,) for i, s in rows if s & 0xFF == 0x2A], "id bigint"
    ).select(F.pmod(F.hash("id"), F.lit(g)).alias("r")).collect():
        grp[r["r"]] += 1
    assert max(grp.values()) <= 3 * 100


def test_simhash_query_no_distinct_exchange(spark):
    # the candidate stream carries no duplicates any more: no
    # HashAggregate-backed distinct over the pair set in the plan
    from mapreduce_join_comparison_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = simhash_near_dup_pairs(docs, max_hamming=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan
    # sanity: still produces pairs on the real corpus
    assert out.count() > 0


def test_prefix_family_has_no_window(spark):
    # round-7 scale fix: the dense-rank shingle dictionary serialized
    # the whole (corpus-growing) vocabulary through a SINGLE-PARTITION
    # window — the struct (docfreq, shingle) canonical id needs no
    # global window at all; pin that none of the three AllPairs plans
    # ever reintroduces one (an unpartitioned WindowExec = one task at
    # 100 TB). Round 8 added a PARTITIONED window (posting counts over
    # sid, for the hot-shingle salt-split) — that one is distributed
    # and allowed; the assertion therefore forbids only windows with
    # an empty partition spec.
    import re

    from mapreduce_join_comparison_spark import queries_catalog as qc
    from mapreduce_join_comparison_spark.plans.explain import simple_plan

    for key in ("dedup_prefix_filter", "dedup_prefix_filter_indexed",
                "dedup_prefix_filter_delta"):
        plan = simple_plan(qc.QUERIES[key](spark, "/root/testdata/sf0.001"))
        for line in plan.splitlines():
            m = re.search(r"\bWindow\b", line)
            if not m:
                continue
            # WindowExec explain: "Window [funcs], [partitionExprs],
            # [orderExprs]" — a global window has no partition group
            groups = re.findall(r"\[[^\]]*\]", line)
            assert len(groups) >= 2 and groups[1].strip("[] "), (
                key, line,
            )


def _bpe_rows(df):
    return sorted(
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in df.collect()
    )


# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_bpe_batched_equals_sequential(spark):
    # round-7 directive #6: the batched merge loop must be
    # BIT-IDENTICAL to sequential — same merges, same ranks, same
    # recorded counts — on corpora crafted to stress the batch rule:
    # tied counts, chained pairs (b follows a), merged symbols that
    # re-enter later merges, and a Zipf-ish frequency decay
    from mapreduce_join_comparison_spark.operators.bpe import bpe_merges

    corpora = [
        ["the theme there then the other theory",
         "hash hashing hashed rehash hash",
         "low lower lowest slower slow low"],
        ["aaaa abab ba ba", "abab abab aaaa ba"],        # ties + chains
        ["xy xy xy xyz xyz zyx", "yz yz zy zy xy"],      # shared symbols
        ["aa"] * 5 + ["ab"] * 4 + ["bc"] * 3 + ["cd"] * 2,
    ]
    for texts in corpora:
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        for n in (3, 8):
            seq = _bpe_rows(bpe_merges(df, n_merges=n, batch_k=1))
            for k in (2, 4, 8):
                bat = _bpe_rows(bpe_merges(df, n_merges=n, batch_k=k))
                assert bat == seq, f"n={n} k={k} texts={texts[:1]}"


def test_bpe_batched_cuts_driver_round_trips(spark):
    # on the driver corpus the realized batch must actually shrink the
    # number of pair-count rounds (each round = one _pair_counts call)
    import mapreduce_join_comparison_spark.operators.bpe as bpe_mod

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    calls = {"n": 0}
    orig = bpe_mod._pair_counts

    def counting(seqs):
        calls["n"] += 1
        return orig(seqs)

    bpe_mod._pair_counts = counting
    try:
        calls["n"] = 0
        seq = _bpe_rows(bpe_mod.bpe_merges(docs, n_merges=8, batch_k=1))
        seq_rounds = calls["n"]
        calls["n"] = 0
        bat = _bpe_rows(bpe_mod.bpe_merges(docs, n_merges=8, batch_k=8))
        bat_rounds = calls["n"]
    finally:
        bpe_mod._pair_counts = orig
    assert bat == seq
    assert seq_rounds == 8 and bat_rounds < seq_rounds, \
        f"{bat_rounds} vs {seq_rounds}"


def test_bpe_select_batch_rule_is_conservative():
    # unit-pin the exact batch rule: a pair sharing a symbol with an
    # accepted merge ends the batch; a count not strictly dominating
    # 2x the best sharing/cutoff bound ends the batch
    from mapreduce_join_comparison_spark.operators.bpe import _select_batch

    rows = [
        {"l": "a", "r": "b", "cnt": 100},
        {"l": "c", "r": "d", "cnt": 90},   # disjoint, 90 > 2*40 -> in
        {"l": "a", "r": "x", "cnt": 40},   # shares 'a' -> batch ends
        {"l": "e", "r": "f", "cnt": 39},
    ]
    got = _select_batch(rows, batch_k=8, complete=True)
    assert [(l, r) for l, r, _ in got] == [("a", "b"), ("c", "d")]
    # the dominance rule: second pair NOT accepted when its count is
    # within 2x of a later pair that shares a symbol with the first
    rows2 = [
        {"l": "a", "r": "b", "cnt": 100},
        {"l": "c", "r": "d", "cnt": 60},   # 60 <= 2*40 -> batch ends
        {"l": "x", "r": "a", "cnt": 40},
    ]
    got2 = _select_batch(rows2, batch_k=8, complete=True)
    assert [(l, r) for l, r, _ in got2] == [("a", "b")]
    # k=1 is plain sequential: first pair only, unconditionally
    got3 = _select_batch(rows, batch_k=1, complete=True)
    assert [(l, r) for l, r, _ in got3] == [("a", "b")]


def test_disorder_audit_binned_null_series(spark):
    from mapreduce_join_comparison_spark.operators.timeseries import (
        disorder_audit,
        disorder_audit_binned,
    )

    rows = (
        [(i, "up", i * 10) for i in range(1, 20)]
        + [(100 + i, None, 900 - i * 10) for i in range(1, 20)]
    )
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, us bigint"
    ).select(
        "event_id", "event_type", F.timestamp_micros("us").alias("ts")
    )
    direct = disorder_audit(
        df, "event_type", "ts", "event_id"
    ).orderBy("event_type").collect()
    for nb in (1, 2, 64):
        binned = disorder_audit_binned(
            df, "event_type", "ts", "event_id", n_bins=nb
        ).orderBy("event_type").collect()
        assert binned == direct, f"n_bins={nb}"
    assert {r["event_type"] for r in direct} == {"up", None}
