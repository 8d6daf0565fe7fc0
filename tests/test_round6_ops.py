"""Round-6 operators: the value-axis binned cumulative decomposition
(`_binned_value_cumsums`) behind `weighted_median_binned` and
`ks_two_sample_binned` must reproduce the direct single-window forms
BIT-FOR-BIT — PREV (bounded bin table) + INTRA ((group, bin)-parallel
prefix) is exact BIGINT associativity, so equality here is Row
equality, not approx. Cases stress where a value binning can silently
diverge: values exactly on bin-width multiples, all-equal values
(width collapses to 1), negative values (DIV semantics), single-row
groups, tie weights at the 2·cum = W boundary, and n_bins larger than
the grid. `group_mode`'s window-free argmax rewrite is pinned on
crafted ties."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import (
    group_mode,
    ks_two_sample,
    ks_two_sample_binned,
    weighted_median,
    weighted_median_binned,
)


def _wm_df(spark, rows):
    # rows: (group, value, weight)
    return spark.createDataFrame(rows, "g string, v bigint, w bigint")


def _assert_wm_binned_equals_direct(spark, rows, n_bins_set=(1, 2, 3, 7, 64)):
    df = _wm_df(spark, rows)
    direct = weighted_median(
        df, ["g"], F.col("v"), F.col("w")
    ).orderBy("g").collect()
    for nb in n_bins_set:
        binned = weighted_median_binned(
            df, ["g"], F.col("v"), F.col("w"), n_bins=nb
        ).orderBy("g").collect()
        assert binned == direct, f"n_bins={nb}: {binned} != {direct}"
    return direct


def test_wm_bin_boundary_values(spark):
    # values are exact multiples of every small width: boundary rows
    # must land in the bin whose intra-prefix includes them
    rows = [("a", i * 6, 1) for i in range(1, 30)]
    out = _assert_wm_binned_equals_direct(spark, rows)
    assert out[0]["weighted_median"] == 15 * 6  # 2*15 >= 29 -> v at rank 15


def test_wm_all_equal_values(spark):
    # hi == lo -> width 1, a single bin; PREV is empty everywhere
    rows = [("a", 42, w) for w in (1, 2, 3)]
    out = _assert_wm_binned_equals_direct(spark, rows)
    assert out[0]["weighted_median"] == 42 and out[0]["total_weight"] == 6


def test_wm_negative_values(spark):
    # (_v - lo) keeps DIV non-negative; order must survive the shift
    rows = [("a", v, 1) for v in (-100, -3, -2, 5, 7)]
    out = _assert_wm_binned_equals_direct(spark, rows)
    assert out[0]["weighted_median"] == -2  # cum 3 of 5: 2*3 >= 5


def test_wm_halfweight_tie(spark):
    # 2*cum == W exactly at the lower value: lower median semantics
    rows = [("a", 1, 5), ("a", 2, 5)]
    out = _assert_wm_binned_equals_direct(spark, rows)
    assert out[0]["weighted_median"] == 1


def test_wm_single_row_groups_and_mixed(spark):
    rows = [("solo", 9, 4)] + [("b", v, v) for v in range(1, 50)]
    _assert_wm_binned_equals_direct(spark, rows)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1, max_size=40,
    ),
    n_bins=st.sampled_from([1, 2, 5, 16]),
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_wm_property_random(spark, data, n_bins):
    df = _wm_df(spark, data)
    direct = weighted_median(
        df, ["g"], F.col("v"), F.col("w")
    ).orderBy("g").collect()
    binned = weighted_median_binned(
        df, ["g"], F.col("v"), F.col("w"), n_bins=n_bins
    ).orderBy("g").collect()
    assert binned == direct


def _ks_df(spark, rows):
    # rows: (group, arm, value)
    return spark.createDataFrame(rows, "g string, arm boolean, v bigint")


def test_ks_binned_equals_direct(spark):
    rows = (
        [("a", True, v) for v in (1, 1, 2, 5, 9, 9, 12)]
        + [("a", False, v) for v in (0, 2, 2, 3, 9, 30)]
        + [("b", True, v) for v in range(10)]
        + [("b", False, v) for v in range(5, 15)]
        # one-arm group: n0 = 0 -> d_den 0 -> try_divide NULL, both forms
        + [("only1", True, v) for v in (1, 2)]
    )
    df = _ks_df(spark, rows)
    direct = ks_two_sample(
        df, ["g"], F.col("arm"), F.col("v")
    ).orderBy("g").collect()
    for nb in (1, 2, 3, 64):
        binned = ks_two_sample_binned(
            df, ["g"], F.col("arm"), F.col("v"), n_bins=nb
        ).orderBy("g").collect()
        assert binned == direct, f"n_bins={nb}"
    only1 = [r for r in direct if r["g"] == "only1"][0]
    assert only1["ks_d"] is None and only1["d_den"] == 0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.booleans(),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1, max_size=40,
    ),
    n_bins=st.sampled_from([1, 3, 8]),
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_ks_property_random(spark, data, n_bins):
    df = _ks_df(spark, data)
    direct = ks_two_sample(
        df, ["g"], F.col("arm"), F.col("v")
    ).orderBy("g").collect()
    binned = ks_two_sample_binned(
        df, ["g"], F.col("arm"), F.col("v"), n_bins=n_bins
    ).orderBy("g").collect()
    assert binned == direct


def test_group_mode_tiebreak_without_window(spark):
    # two values tie at max count -> smallest value wins; the rewrite
    # (max-count broadcast join-back) must preserve the pinned order
    rows = [("a", 5), ("a", 5), ("a", 3), ("a", 3), ("a", 9),
            ("b", 7)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {r["g"]: (r["mode_value"], r["mode_count"])
           for r in group_mode(df, ["g"], F.col("v")).collect()}
    assert out == {"a": (3, 2), "b": (7, 1)}


def test_benford_emits_all_nine_digits(spark):
    # values whose leading digits cover only {1, 2}: digits 3-9 must
    # still emit rows with n_obs = 0 and chi2_contrib = expected
    # (round-5 advice: absent digits silently dropped their chi2 term)
    from mapreduce_join_comparison_spark.operators.aggregates import (
        benford_digit_audit,
    )

    df = spark.createDataFrame([(100,), (150,), (200,)], "cents bigint")
    out = benford_digit_audit(df, F.col("cents")).orderBy("digit").collect()
    assert [r["digit"] for r in out] == list(range(1, 10))
    by_d = {r["digit"]: r for r in out}
    assert by_d[1]["n_obs"] == 2 and by_d[2]["n_obs"] == 1
    for d in range(3, 10):
        assert by_d[d]["n_obs"] == 0
        # chi2 is rounded 6dp, expected 4dp — compare to tolerance
        assert abs(by_d[d]["chi2_contrib"] - by_d[d]["expected"]) < 1e-4


def test_cardinality_estimate_zero_overlap(spark):
    # disjoint key sets: exact_pairs = 0 must yield NULL rel_err, not
    # an ANSI DIVIDE_BY_ZERO (round-5 advice)
    from mapreduce_join_comparison_spark.operators.joins import (
        join_cardinality_estimate,
    )

    left = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    right = spark.createDataFrame([(i + 1000,) for i in range(50)],
                                  "k bigint")
    row = join_cardinality_estimate(left, right, "k", "k").collect()[0]
    assert row["exact_pairs"] == 0 and row["rel_err"] is None


def test_prefix_index_two_job_matches_single_query(spark):
    # build + probe must reproduce the single-query operator exactly,
    # and the probe must ride the bucketing: the only exchange is the
    # candidate-pair aggregate, and neither bucketed scan re-sorts on
    # its bucket key for the groupBy/joins
    from mapreduce_join_comparison_spark.operators.dedup import (
        build_prefix_index,
        prefix_filter_jaccard_pairs,
        prefix_filter_jaccard_pairs_indexed,
    )
    from mapreduce_join_comparison_spark.plans.explain import (
        count_shuffles,
        simple_plan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    single = prefix_filter_jaccard_pairs(
        docs, k=3, threshold=0.3
    ).orderBy("id_a", "id_b").collect()
    build_prefix_index(docs, k=3, threshold=0.3, table_prefix="t_pfx_test")
    probe = prefix_filter_jaccard_pairs_indexed(
        spark, threshold=0.3, table_prefix="t_pfx_test"
    )
    indexed = probe.orderBy("id_a", "id_b").collect()
    assert indexed == single and len(single) > 0
    # round 8: the hot-sid salt-split gates on the dict table's
    # max_df; this corpus is cold, so the probe keeps its single
    # exchange (the candidate-pair aggregate riding the bucketing)
    assert count_shuffles(probe) <= 1, simple_plan(probe)
    # bucketed reads: the probe scans tables, not loose parquet
    plan = simple_plan(probe)
    assert "Bucketed: true" in plan, plan


def test_group_mode_plan_has_no_window(spark):
    rows = [("a", i % 3) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    plan = group_mode(df, ["g"], F.col("v"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


def test_disorder_audit_binned_equals_direct(spark):
    # running max decomposes as max(prev-bins max, intra running max);
    # stress: first bin (no prev), strictly increasing ts (no late),
    # strictly decreasing ts (all late), single-row series
    from mapreduce_join_comparison_spark.operators.timeseries import (
        disorder_audit,
        disorder_audit_binned,
    )

    rows = (
        [(i, "up", i * 10) for i in range(1, 40)]
        + [(i, "down", 4000 - i * 10) for i in range(1, 40)]
        + [(i, "saw", (i * 37) % 200) for i in range(1, 40)]
        + [(1, "solo", 99)]
    )
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, us bigint"
    ).select(
        "event_id", "event_type", F.timestamp_micros("us").alias("ts")
    )
    direct = disorder_audit(
        df, "event_type", "ts", "event_id"
    ).orderBy("event_type").collect()
    for nb in (1, 2, 5, 64):
        binned = disorder_audit_binned(
            df, "event_type", "ts", "event_id", n_bins=nb
        ).orderBy("event_type").collect()
        assert binned == direct, f"n_bins={nb}"
    by_s = {r["event_type"]: r for r in direct}
    assert by_s["up"]["n_late"] == 0
    assert by_s["down"]["n_late"] == 38  # every row after the first
    assert by_s["solo"]["max_disorder_us"] == 0


def test_hybrid_rrf_fusion_semantics(spark):
    # tiny corpus where the two runs disagree: doc in ONE run only
    # contributes a single RRF term; both-run docs outrank it; ties
    # break on corpus_id
    from mapreduce_join_comparison_spark.operators.similarity import (
        hybrid_rrf_fusion,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),    # lexically close to 0
            (2, "zeta eta theta iota"),          # lexically unrelated
            (3, "alpha beta gamma delta kappa"),  # lexically closest to 0
        ],
        "doc_id bigint, text string",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),   # dense-orthogonal to 0
            (2, [0.9, 0.1]),   # dense-close to 0
            (3, [0.8, 0.2]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    out = hybrid_rrf_fusion(
        docs, embs, n_queries=1, k_each=3, k_final=4
    ).collect()
    by_doc = {r["corpus_id"]: r for r in out}
    # doc 3 leads both runs for query 0 (lexical superset + top cosine
    # after 2? cosine(0,3)=0.97, cosine(0,2)=0.994 -> dense: 2 then 3)
    assert by_doc[3]["rank_lex"] == 1
    assert by_doc[2]["rank_dense"] == 1
    # doc 2 shares no shingle with query 0: lexical rank NULL, still
    # fused through its dense term
    assert by_doc[2]["rank_lex"] is None
    assert abs(by_doc[2]["rrf_score"] - 1.0 / 61) < 1e-12
    # two-term fused scores: exactly coalesce(lex)+coalesce(dense)
    for r in out:
        expect = (1.0 / (60 + r["rank_lex"]) if r["rank_lex"] else 0.0) + (
            1.0 / (60 + r["rank_dense"]) if r["rank_dense"] else 0.0
        )
        assert abs(r["rrf_score"] - expect) < 1e-15
    # final ranking is rrf desc, corpus_id asc, contiguous from 1
    ranks = sorted(r["final_rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))


def test_reward_normalize_groups(spark):
    # one 3-member group (known z-scores), one zero-variance group,
    # one singleton: variance guard must yield NULL, never inf/NaN
    from mapreduce_join_comparison_spark import queries_catalog as qc

    import math
    import os
    import tempfile

    rows = [
        (1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0),   # mean 2, sd_pop sqrt(2/3)
        (4, 20, 5.0), (5, 20, 5.0),                  # zero variance
        (6, 30, 7.0),                                # singleton
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        # single parquet FILE like the driver testdata (load_table
        # footer-sniffs with pyarrow, which rejects directories)
        pq.write_table(
            pa.table({
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([0] * len(rows), pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array(["x"] * len(rows)),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }),
            os.path.join(d, "events.parquet"),
        )
        out = qc.QUERIES["pipeline_reward_normalize"](spark, d).collect()
    by_e = {r["event_id"]: r for r in out}
    # z for 1000,2000,3000 milli: (v*3 - 6000)/sqrt(3*14e6 - 36e6)
    denom = math.sqrt(3 * (1000**2 + 2000**2 + 3000**2) - 6000**2)
    assert abs(by_e[1]["advantage"] - (1000 * 3 - 6000) / denom) < 1e-12
    assert abs(by_e[3]["advantage"] - (3000 * 3 - 6000) / denom) < 1e-12
    assert by_e[2]["advantage"] == 0.0
    assert by_e[4]["advantage"] is None and by_e[5]["advantage"] is None
    assert by_e[6]["advantage"] is None


# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_prefix_delta_probe_exact_vs_naive(spark):
    # incremental probe must equal the naive delta x corpus truth,
    # including delta docs whose vocabulary the index never saw
    from mapreduce_join_comparison_spark.operators.dedup import (
        build_prefix_index,
        prefix_filter_probe_delta,
        shingles,
    )

    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d x y"), (3, "p q r s t u"),
         (4, "m n o p q r")],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame(
        [(100, "a b c d e g"),        # near-dup of 1
         (101, "zz yy xx ww vv uu"),  # fully unseen vocabulary
         (102, "p q r s t u"),        # exact dup of 3
         (103, "q r")],               # shorter than k: single shingle
        "doc_id bigint, text string",
    )
    build_prefix_index(corpus, k=3, threshold=0.3,
                       table_prefix="t_delta_probe")
    got = prefix_filter_probe_delta(
        spark, delta, k=3, threshold=0.3, table_prefix="t_delta_probe"
    ).orderBy("delta_id", "corpus_id").collect()
    ds = delta.select(
        F.col("doc_id").alias("delta_id"), shingles("text", 3).alias("sa")
    )
    cs = corpus.select(
        F.col("doc_id").alias("corpus_id"), shingles("text", 3).alias("sb")
    )
    naive = (
        ds.crossJoin(cs)
        .withColumn("common", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            (F.col("common")
             / (F.size("sa") + F.size("sb") - F.col("common")))
            .cast("double"),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("delta_id", "corpus_id", "jaccard")
        .orderBy("delta_id", "corpus_id")
        .collect()
    )
    assert got == naive and len(got) >= 2
    by_pair = {(r["delta_id"], r["corpus_id"]): r["jaccard"] for r in got}
    assert by_pair[(102, 3)] == 1.0
    assert abs(by_pair[(100, 1)] - 0.6) < 1e-12
    assert all(d != 101 for d, _ in by_pair)  # unseen-only: no partner
