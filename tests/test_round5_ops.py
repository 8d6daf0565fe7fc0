"""Round-5 operators: the binned two-level rolling z-score
(`rolling_zscore_anomalies_binned`) must reproduce the direct
RANGE-frame form BIT-FOR-BIT — the split into full-bin / intra-bin
prefix / oldest-bin suffix is exact int64 arithmetic ending in the
shared `_finish_zscore` expression tree, so equality here is Row
equality on doubles, not approx. The cases below stress exactly where
a binned decomposition can silently diverge: points on bin
boundaries, points exactly window_us apart (closed lower bound),
timestamp peers, empty interior bins, and degenerate bin counts."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.timeseries import (
    rolling_zscore_anomalies,
    rolling_zscore_anomalies_binned,
)

# small deterministic scale for hand-built cases: W = 240 µs, k bins
W = 240


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, us bigint, value double"
    )
    return df.select(
        "event_id", "event_type",
        F.timestamp_micros("us").alias("ts"), "value",
    )


def _assert_binned_equals_direct(spark, rows, window_us=W, ks=(1, 2, 3, 4)):
    ev = _events(spark, rows)
    direct = rolling_zscore_anomalies(
        ev, window_us=window_us, min_points=1, z_threshold=0.0
    ).orderBy("event_id").collect()
    for k in ks:
        if window_us % k:
            continue
        binned = rolling_zscore_anomalies_binned(
            ev, window_us=window_us, min_points=1, z_threshold=0.0,
            bins_per_window=k,
        ).orderBy("event_id").collect()
        assert binned == direct, f"bins_per_window={k}: {binned} != {direct}"
    return direct


def test_bin_boundary_points(spark):
    # every point sits exactly on a bin boundary for k=4 (B=60); the
    # intra-bin prefix must still include the boundary peer itself
    rows = [(i, "s", i * 60, float(i % 7) / 8) for i in range(1, 20)]
    out = _assert_binned_equals_direct(spark, rows)
    assert out  # non-degenerate: some rows survive var > 0


def test_window_start_tie_is_inclusive(spark):
    # pairs exactly window_us apart: the older point sits AT t − W and
    # the direct RANGE frame includes it (closed lower bound) — the
    # binned suffix probe must include its peers too
    rows = [
        (1, "s", 100, 1.0),
        (2, "s", 100 + W, 5.0),     # frame = {1, 2}
        (3, "s", 101 + W, 9.0),     # frame = {2, 3}: row 1 just expired
        (4, "s", 100 + 2 * W, 3.0),  # frame = {2?, 3, 4}: 2 is AT t−W... of 4
    ]
    out = _assert_binned_equals_direct(spark, rows)
    by_id = {r["event_id"]: r["n_window"] for r in out}
    # direct semantics: row 3's frame excludes row 1 (us=100 < 101)
    assert by_id.get(3, 2) == 2


def test_timestamp_peers_within_and_across_bins(spark):
    rows = [
        (1, "s", 50, 1.0),
        (2, "s", 50, 2.0),    # peer pair mid-bin
        (3, "s", 60, 3.0),    # on k=4 bin boundary
        (4, "s", 60, 7.0),    # peer pair ON the boundary
        (5, "s", 60 + W, 4.0),  # probe lands exactly on the 60-peers
        (6, "s", 61 + W, 8.0),
    ]
    _assert_binned_equals_direct(spark, rows)


def test_empty_interior_bins_and_gaps(spark):
    # gaps longer than the window: old bins are entirely absent from
    # per_bin and only exist through the dense sequence grid
    rows = [(i, "s", us, float(i)) for i, us in enumerate(
        [0, 10, 20, 1000, 1010, 5000, 5000, 5240, 5241], start=1
    )]
    _assert_binned_equals_direct(spark, rows)


def test_multiple_series_and_min_points_threshold(spark):
    rows = [(i, f"s{i % 3}", i * 7, float((i * i) % 11)) for i in range(60)]
    ev = _events(spark, rows)
    for mp in (1, 5):
        direct = rolling_zscore_anomalies(
            ev, window_us=W, min_points=mp, z_threshold=0.5
        ).orderBy("event_id").collect()
        binned = rolling_zscore_anomalies_binned(
            ev, window_us=W, min_points=mp, z_threshold=0.5,
            bins_per_window=4,
        ).orderBy("event_id").collect()
        assert binned == direct


def test_indivisible_bin_count_rejected(spark):
    with pytest.raises(ValueError):
        rolling_zscore_anomalies_binned(
            _events(spark, [(1, "s", 0, 1.0)]),
            window_us=100, bins_per_window=3,
        )


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    uss=st.lists(st.integers(min_value=0, max_value=1200),
                 min_size=2, max_size=25),
    k=st.sampled_from([1, 2, 4, 8]),
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_binned_equals_direct_property(spark, uss, k):
    rows = [
        (i, "a" if us % 3 else "b", us, float(us % 13) / 8)
        for i, us in enumerate(sorted(uss), start=1)
    ]
    ev = _events(spark, rows)
    direct = rolling_zscore_anomalies(
        ev, window_us=W, min_points=1, z_threshold=0.0
    ).orderBy("event_id").collect()
    binned = rolling_zscore_anomalies_binned(
        ev, window_us=W, min_points=1, z_threshold=0.0, bins_per_window=k
    ).orderBy("event_id").collect()
    assert binned == direct


# --- multi-tier interval join -------------------------------------------

def _brute_interval(ivals, pts):
    return sorted(
        (i_id, p_id)
        for (i_id, lo, hi) in ivals
        for (p_id, x) in pts
        if lo < x < hi
    )


def _run_interval(spark, ivals, pts, base_cell=4):
    from mapreduce_join_comparison_spark.operators.joins import interval_join

    idf = spark.createDataFrame(ivals, "iid bigint, lo bigint, hi bigint")
    pdf = spark.createDataFrame(pts, "pid bigint, x bigint")
    out = interval_join(idf, pdf, "lo", "hi", "x", base_cell=base_cell)
    return sorted((r["iid"], r["pid"]) for r in out.collect())


def test_interval_join_known_answer(spark):
    ivals = [(1, 0, 10), (2, 5, 6), (3, 100, 101)]
    pts = [(1, 5), (2, 10), (3, 100), (4, 3)]
    # strict bounds: x=10 is NOT inside (0,10); (5,6) contains no int;
    # (100,101) contains no int
    assert _run_interval(spark, ivals, pts) == [(1, 1), (1, 4)]


def test_interval_join_matches_bruteforce_mixed_widths(spark):
    # widths spanning 4 orders of magnitude: tiers 0..~10 all occur,
    # wide intervals must still replicate to only 2 cells of THEIR tier
    ivals, pts = [], []
    for i in range(200):
        lo = (i * 37) % 1000
        w = [1, 3, 17, 250, 4096][i % 5]
        ivals.append((i, lo, lo + w))
    for p in range(300):
        pts.append((p, (p * 13) % 1100 - 20))  # includes negatives
    expected = _brute_interval(ivals, pts)
    assert _run_interval(spark, ivals, pts) == expected
    # and each qualifying pair appears EXACTLY once (no replica dupes)
    got = _run_interval(spark, ivals, pts, base_cell=1)
    assert got == expected


def test_interval_join_boundary_strictness(spark):
    # points exactly at lo, at hi, and at cell boundaries of every tier
    ivals = [(1, 8, 16), (2, 16, 48), (3, 0, 256)]
    pts = [(i, v) for i, v in enumerate([0, 8, 9, 15, 16, 17, 32, 48, 255, 256])]
    assert _run_interval(spark, ivals, pts) == _brute_interval(ivals, pts)


def test_interval_join_empty_and_degenerate(spark):
    # hi <= lo intervals match nothing; empty interval side returns an
    # empty (but well-formed) result
    ivals = [(1, 10, 10), (2, 20, 15)]
    pts = [(1, 10), (2, 17)]
    assert _run_interval(spark, ivals, pts) == []


def test_interval_join_rejects_bad_base_cell(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.joins import interval_join

    idf = spark.createDataFrame([(1, 0, 5)], "iid bigint, lo bigint, hi bigint")
    pdf = spark.createDataFrame([(1, 3)], "pid bigint, x bigint")
    with _pytest.raises(ValueError):
        interval_join(idf, pdf, "lo", "hi", "x", base_cell=0)


def test_interval_join_no_nested_loop_plan(spark):
    from mapreduce_join_comparison_spark.operators.joins import interval_join
    from mapreduce_join_comparison_spark.plans.explain import simple_plan

    idf = spark.range(1000).select(
        F.col("id").alias("iid"),
        (F.col("id") * 7 % 500).alias("lo"),
        (F.col("id") * 7 % 500 + 1 + F.col("id") % 64).alias("hi"),
    )
    pdf = spark.range(2000).select(
        F.col("id").alias("pid"), (F.col("id") % 600).alias("x")
    )
    plan = simple_plan(interval_join(idf, pdf, "lo", "hi", "x"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# --- fused argmin cell assignment ----------------------------------------

def test_argmin_fold_equals_sort_form(spark):
    """The nprobe=1 fused argmin fold (cast fused into the zip_with,
    first-occurrence tiebreak) must pick the SAME cell as the general
    sort form for every vector — including dot-product ties, which the
    duplicated-centroid pool below forces."""
    from mapreduce_join_comparison_spark.operators.similarity import (
        _nearest_cell_argmin_expr,
        _nearest_cells_expr,
    )

    cents = [
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],   # duplicate of cell 0: tie → first wins
        [0.5, 0.5, 0.0],
    ]
    rows = [(i, [float((i * 7) % 5) / 4, float((i * 3) % 7) / 6,
                 float(i % 3) / 2]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<float>")
    got = df.select(
        "vec_id",
        F.element_at(_nearest_cells_expr("v", cents, 1), 1).alias("a"),
        _nearest_cell_argmin_expr("v", cents).alias("b"),
    ).collect()
    assert got and all(r["a"] == r["b"] for r in got), got


# --- interval overlap join -----------------------------------------------

def _brute_overlap(av, bv):
    return sorted(
        (ia, ib)
        for (ia, lo_a, hi_a) in av
        for (ib, lo_b, hi_b) in bv
        if lo_a < hi_b and lo_b < hi_a
    )


def _run_overlap(spark, av, bv, base_cell=4):
    from mapreduce_join_comparison_spark.operators.joins import (
        interval_overlap_join,
    )

    adf = spark.createDataFrame(av, "ia bigint, lo_a bigint, hi_a bigint")
    bdf = spark.createDataFrame(bv, "ib bigint, lo_b bigint, hi_b bigint")
    out = interval_overlap_join(
        adf, bdf, "lo_a", "hi_a", "lo_b", "hi_b", base_cell=base_cell
    )
    return sorted((r["ia"], r["ib"]) for r in out.collect())


def test_overlap_known_answer(spark):
    av = [(1, 0, 10), (2, 20, 25)]
    bv = [(1, 9, 11), (2, 10, 12), (3, 25, 30), (4, 19, 21)]
    # half-open: [0,10) meets [9,11) but NOT [10,12); [20,25) meets
    # [19,21) but NOT [25,30)
    assert _run_overlap(spark, av, bv) == [(1, 1), (2, 4)]


def test_overlap_exactly_once_no_duplicates(spark):
    # wide x wide same-tier pairs sharing BOTH cells, plus cross-tier
    # pairs — each qualifying pair must appear exactly once without
    # any distinct in the plan
    av = [(i, i * 3, i * 3 + w) for i, w in
          enumerate([1, 5, 30, 200, 7, 64], start=1)]
    bv = [(i, i * 11 - 15, i * 11 - 15 + w) for i, w in
          enumerate([2, 40, 3, 100, 8, 1000], start=1)]
    expected = _brute_overlap(av, bv)
    for bc in (1, 4):
        got = _run_overlap(spark, av, bv, base_cell=bc)
        assert got == expected, f"base_cell={bc}"
        assert len(got) == len(set(got))


def test_overlap_matches_bruteforce_dense(spark):
    av = [(i, (i * 37) % 500, (i * 37) % 500 + [1, 9, 33, 250][i % 4])
          for i in range(120)]
    bv = [(i, (i * 53) % 520 - 10, (i * 53) % 520 - 10 + [2, 17, 70][i % 3])
          for i in range(130)]
    assert _run_overlap(spark, av, bv) == _brute_overlap(av, bv)


def test_overlap_empty_and_degenerate(spark):
    av = [(1, 5, 5), (2, 9, 3)]          # empty intervals
    bv = [(1, 0, 100)]
    assert _run_overlap(spark, av, bv) == []
    # one side entirely empty after the hi>lo filter
    assert _run_overlap(spark, [(1, 7, 7)], [(1, 0, 10)]) == []


# --- 2-D dominance count (IEJoin aggregate) -------------------------------

def _brute_dominance(rows):
    return {
        ia: sum(1 for (ib, xb, yb) in rows if xb > xa and yb < ya)
        for (ia, xa, ya) in rows
    }


def _run_dominance(spark, rows, k=None):
    from mapreduce_join_comparison_spark.operators.joins import dominance_count

    df = spark.createDataFrame(rows, "rid bigint, x bigint, y bigint")
    out = dominance_count(df, "x", "y", "rid", k_buckets=k)
    return {r["rid"]: r["n_dominated"] for r in out.collect()}


def test_dominance_known_answer(spark):
    rows = [(1, 0, 100), (2, 1, 50), (3, 2, 150), (4, 3, 10)]
    # 1 is dominated-over by (2: later+cheaper) and (4); 3 by (4); ties
    # in neither direction count
    assert _run_dominance(spark, rows) == {1: 2, 2: 1, 3: 1, 4: 0}


def test_dominance_matches_bruteforce(spark):
    rows = [(i, (i * 7) % 40, ((i * i) % 97) * 3 + i % 2)
            for i in range(180)]
    expected = _brute_dominance(rows)
    # several bucket counts, incl. K=1 (everything in the strip) and a
    # K far above the y cardinality (strip nearly empty)
    for k in (None, 1, 8, 1024):
        assert _run_dominance(spark, rows, k) == expected, f"k={k}"


def test_dominance_ties_and_extremes(spark):
    rows = [
        (1, 5, 5), (2, 5, 5),     # identical points: dominate nothing
        (3, 5, 4),                # same x as 1/2 — strict x excludes
        (4, 6, 5),                # same y as 1/2 — strict y excludes
        (5, 6, 4),                # dominates 1 and 2
        (6, 4, 1_000_000_000),    # y span stress for the bucketing
    ]
    assert _run_dominance(spark, rows) == _brute_dominance(rows)


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (text.bm25_rank)
# ---------------------------------------------------------------------------

import math


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _bm25_reference(texts, queries, k1=1.2, b=0.75, top_k=10):
    """Serial Python reference with the SAME float operation order as
    the operator (left-to-right per-term chain starting at 0.0)."""
    toks = [t.strip().lower().split() for t in texts]
    n = len(toks)
    avgdl = sum(len(x) for x in toks) / n
    out = []
    for qid in sorted(queries):
        scored = []
        for d, tk in enumerate(toks):
            s = 0.0
            matched = 0
            for term in queries[qid]:
                tf = float(tk.count(term))
                dfq = float(sum(1 for x in toks if term in x))
                idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
                s = s + idf * (
                    tf * (k1 + 1.0)
                    / (tf + k1 * ((1.0 - b) + b * (len(tk) / avgdl)))
                )
                matched = max(matched, int(tf))
            if matched > 0:
                scored.append((round(s, 6), d))
        scored.sort(key=lambda r: (-r[0], r[1]))
        for rnk, (s, d) in enumerate(scored[:top_k], start=1):
            out.append((qid, d, s, rnk))
    return sorted(out)


def test_bm25_matches_serial_reference(spark):
    from mapreduce_join_comparison_spark.operators.text import bm25_rank

    texts = [
        "hash join hash join table",
        "merge sort merge sort window",
        "table scan fast scan",
        "the quick brown fox",
        "hash table scan scan scan",
        "join join join join",
        "window spark window spark sort",
    ]
    queries = {"qa": ["hash", "join"], "qb": ["scan", "window", "sort"]}
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rnk"])
        for r in bm25_rank(_docs(spark, texts), queries, top_k=3).collect()
    )
    assert got == _bm25_reference(texts, queries, top_k=3)


def test_bm25_single_term_query_and_no_match(spark):
    from mapreduce_join_comparison_spark.operators.text import bm25_rank

    texts = ["alpha beta", "beta beta gamma", "delta"]
    queries = {"one": ["beta"], "none": ["zzz"]}
    rows = bm25_rank(_docs(spark, texts), queries, top_k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # no-match query contributes zero rows (integer pre-filter), it
    # does NOT emit the whole corpus at score 0
    assert "none" not in by_q
    ranked = sorted(by_q["one"], key=lambda r: r["rnk"])
    assert [r["doc_id"] for r in ranked] == [1, 0]  # tf 2 beats tf 1
    assert ranked[0]["score"] > ranked[1]["score"] > 0


def test_bm25_tie_breaks_on_doc_id(spark):
    from mapreduce_join_comparison_spark.operators.text import bm25_rank

    # identical docs -> identical rounded scores; rank must be doc-id
    texts = ["same words here", "same words here", "same words here"]
    rows = bm25_rank(
        _docs(spark, texts), {"q": ["words"]}, top_k=2
    ).collect()
    ranked = sorted(rows, key=lambda r: r["rnk"])
    assert [r["doc_id"] for r in ranked] == [0, 1]
    assert ranked[0]["score"] == ranked[1]["score"]


def test_bm25_top_k_caps_output(spark):
    from mapreduce_join_comparison_spark.operators.text import bm25_rank

    texts = [f"common word {i}" for i in range(20)]
    rows = bm25_rank(_docs(spark, texts), {"q": ["common"]}, top_k=5).collect()
    assert len(rows) == 5
    assert sorted(r["rnk"] for r in rows) == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# Hash-sampled join-cardinality estimation (joins.join_cardinality_estimate)
# ---------------------------------------------------------------------------


def _kv(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k bigint")


def test_join_cardinality_exact_branch_matches_real_join(spark):
    from mapreduce_join_comparison_spark.operators.joins import (
        join_cardinality_estimate,
    )

    left = _kv(spark, [1, 1, 1, 2, 2, 3, 5])
    right = _kv(spark, [1, 2, 2, 2, 4, 5, 5])
    row = join_cardinality_estimate(left, right, "k", "k").collect()[0]
    real = left.join(right, "k").count()
    assert row["exact_pairs"] == real == 3 * 1 + 2 * 3 + 1 * 2


def test_join_cardinality_full_sample_is_exact(spark):
    from mapreduce_join_comparison_spark.operators.joins import (
        join_cardinality_estimate,
    )

    left = _kv(spark, list(range(50)) + [7] * 20)
    right = _kv(spark, list(range(0, 100, 2)) + [7] * 10)
    row = join_cardinality_estimate(
        left, right, "k", "k", sample_buckets=100, sample_take=100
    ).collect()[0]
    assert row["sampled_pairs"] == row["exact_pairs"]
    assert row["est_pairs"] == float(row["exact_pairs"])
    assert row["rel_err"] == 0.0


def test_join_cardinality_sample_keeps_hot_key_products_exact(spark):
    """Key-level sampling: a sampled key contributes its FULL n_l*n_r
    product — the estimate is a sum over a key subset, so every
    sampled term appears in the exact sum and the sampled sum can
    never exceed the exact sum."""
    from mapreduce_join_comparison_spark.operators.joins import (
        join_cardinality_estimate,
    )
    from mapreduce_join_comparison_spark.operators.sampling import hash_bucket

    keys = list(range(40)) + [13] * 100  # hot key 13
    left = _kv(spark, keys)
    right = _kv(spark, keys)
    row = join_cardinality_estimate(
        left, right, "k", "k", sample_buckets=100, sample_take=50,
        salt="card",
    ).collect()[0]
    # serial replica of the sampled sum via the same md5 bucketing
    per_key = {}
    for k in keys:
        per_key[k] = per_key.get(k, 0) + 1
    sampled_keys = {
        r["k"]
        for r in _kv(spark, sorted(per_key))
        .select("k", hash_bucket("k", 100, "card").alias("b"))
        .collect()
        if r["b"] < 50
    }
    want = sum(per_key[k] ** 2 for k in sampled_keys)
    assert row["sampled_pairs"] == want
    assert row["sampled_pairs"] <= row["exact_pairs"]


def test_join_cardinality_disjoint_sides(spark):
    from mapreduce_join_comparison_spark.operators.joins import (
        join_cardinality_estimate,
    )

    row = join_cardinality_estimate(
        _kv(spark, [1, 2, 3]), _kv(spark, [4, 5, 6]), "k", "k",
        sample_buckets=100, sample_take=100,
    ).collect()[0]
    # no co-occurring keys: exact 0; rel_err is 0/0 -> NaN, reported
    # as-is rather than masked
    assert row["exact_pairs"] is None or row["exact_pairs"] == 0


# ---------------------------------------------------------------------------
# Distributed BPE merge induction (bpe.bpe_merges)
# ---------------------------------------------------------------------------


def _bpe_reference(texts, n_merges):
    """Serial BPE (Sennrich): all-adjacent pair counts weighted by
    word freq; argmax with (cnt desc, pair lexicographic) tie-break;
    leftmost non-overlapping greedy merge."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                words[w] += 1
    seqs = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] += words[w]
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def _bpe_rows(df):
    return sorted(
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in df.collect()
    )


def test_bpe_known_answer(spark):
    from mapreduce_join_comparison_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame(
        [(0, "aaaa abab"), (1, "ba ba ba aaaa")], "doc_id bigint, text string"
    )
    got = _bpe_rows(bpe_merges(df, n_merges=4))
    # iter1: (a,a)=6 (overlap counted); iter2: (b,a)=4; iter3 merges
    # the merged symbols (aa,aa)=2; iter4 tie at 1 -> lexicographic
    assert got == [
        (1, "a", "a", 6),
        (2, "b", "a", 4),
        (3, "aa", "aa", 2),
        (4, "a", "ba", 1),
    ]


def test_bpe_matches_serial_reference(spark):
    from mapreduce_join_comparison_spark.operators.bpe import bpe_merges

    texts = [
        "the theme there then the other theory",
        "hash hashing hashed rehash hash",
        "low lower lowest slower slow low",
        "new newer newest renew news new new",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    for n in (1, 5, 10):
        got = _bpe_rows(bpe_merges(df, n_merges=n, persist_every=2))
        assert got == sorted(_bpe_reference(texts, n)), f"n_merges={n}"


def test_bpe_greedy_nonoverlapping_merge(spark):
    from mapreduce_join_comparison_spark.operators.bpe import bpe_merges

    # 'aaa' with merge (a,a): greedy leftmost -> [aa, a]; the pair
    # count next round must see (aa, a), never (a, aa)
    df = spark.createDataFrame([(0, "aaa aaa")], "doc_id bigint, text string")
    got = _bpe_rows(bpe_merges(df, n_merges=2))
    assert got == [(1, "a", "a", 4), (2, "aa", "a", 2)]


def test_bpe_stops_when_no_pairs_remain(spark):
    from mapreduce_join_comparison_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([(0, "a b a b c")], "doc_id bigint, text string")
    got = _bpe_rows(bpe_merges(df, n_merges=5))
    assert got == []  # single-char words carry no adjacent pairs


def test_bpe_encode_stats_matches_serial_reference(spark):
    from mapreduce_join_comparison_spark.operators.bpe import bpe_encode_stats

    texts = [
        "the theme there then the",
        "hash hashing hashed rehash hash",
        "low lower lowest slower slow",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    n = 6
    # serial: re-run reference merges, then segment each word
    merges = _bpe_reference(texts, n)
    def encode(word):
        seq = list(word)
        for _, l, r, _cnt in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r); i += 2
                else:
                    out.append(seq[i]); i += 1
            seq = out
        return seq
    want = {}
    for d, t in enumerate(texts):
        ws = [w for w in t.strip().lower().split() if w]
        want[d] = (len(ws), sum(len(encode(w)) for w in ws))
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode_stats(df, n_merges=n).collect()
    }
    assert got == want
    # tokens compress: between word count and char count
    for d, t in enumerate(texts):
        ws = [w for w in t.strip().lower().split() if w]
        assert len(ws) <= got[d][1] <= sum(len(w) for w in ws)


# ---------------------------------------------------------------- priority sample


def _docs_df(spark, rows):
    """rows: (group, key, weight)"""
    return spark.createDataFrame(rows, "grp string, key bigint, w bigint")


class TestPrioritySample:
    def _sample(self, spark, rows, k):
        from mapreduce_join_comparison_spark.operators.sampling import (
            priority_sample_per_group,
        )

        return priority_sample_per_group(
            _docs_df(spark, rows), "grp", "key", "w", k=k
        )

    def test_small_group_is_exact(self, spark):
        """Group with ≤ k rows: whole group sampled, τ absent, and the
        estimator is EXACT (w_est == w for every row)."""
        rows = [("a", i, 10 * (i + 1)) for i in range(5)]
        out = self._sample(spark, rows, k=10).collect()
        assert {r["key"] for r in out} == set(range(5))
        assert all(r["w_est"] == float(r["weight"]) for r in out)

    def test_tau_bounds_and_estimator(self, spark):
        """Group with > k rows: exactly k rows kept, every kept
        priority strictly above τ is not required (ties broken by
        key), but every kept priority ≥ τ and w_est = max(w, τ)."""
        rows = [("a", i, (i % 7) + 1) for i in range(40)]
        k = 8
        out = self._sample(spark, rows, k=k).collect()
        assert len(out) == k
        # τ = the (k+1)-th priority must lower-bound all kept priorities
        from mapreduce_join_comparison_spark.operators.sampling import (
            priority_sample_per_group,
        )

        kp1 = priority_sample_per_group(
            _docs_df(spark, rows), "grp", "key", "w", k=k + 1
        ).collect()
        tau = min(r["priority"] for r in kp1)
        for r in out:
            assert r["priority"] >= tau
            assert r["w_est"] == max(float(r["weight"]), tau)

    def test_membership_stable_under_repartition(self, spark):
        rows = [("g%d" % (i % 3), i, (i * 13) % 50 + 1) for i in range(300)]
        a = self._sample(spark, rows, k=6).collect()
        b_df = _docs_df(spark, rows).repartition(17)
        from mapreduce_join_comparison_spark.operators.sampling import (
            priority_sample_per_group,
        )

        b = priority_sample_per_group(b_df, "grp", "key", "w", k=6).collect()
        key = lambda r: (r["grp"], r["key"], r["rnk"], r["priority"])
        assert sorted(map(key, a)) == sorted(map(key, b))

    def test_zero_weight_rows_dropped(self, spark):
        rows = [("a", 1, 0), ("a", 2, 5), ("a", 3, -2)]
        out = self._sample(spark, rows, k=10).collect()
        assert [r["key"] for r in out] == [2]

    def test_estimator_tracks_total_weight(self, spark):
        """DLT subset-sum estimator sanity on a real-ish distribution:
        Σ max(w, τ) over the k-sample lands within a generous band of
        the group's true total (relative error ~1/√k in expectation;
        the band below is deliberately loose — one deterministic draw,
        not a mean over draws)."""
        import random

        rng = random.Random(7)
        rows = [("a", i, rng.randint(1, 1000)) for i in range(2000)]
        true_total = sum(w for _, _, w in rows)
        out = self._sample(spark, rows, k=64).collect()
        est = sum(r["w_est"] for r in out)
        assert 0.5 * true_total < est < 2.0 * true_total


# ------------------------------------------------------------------ KMV sketch


class TestKMVDistinct:
    def _kmv(self, spark, rows, k=64):
        from mapreduce_join_comparison_spark.operators.sampling import (
            kmv_distinct_per_group,
        )

        df = spark.createDataFrame(rows, "grp string, v bigint")
        return kmv_distinct_per_group(df, "grp", "v", k=k)

    def test_small_group_exact_path(self, spark):
        rows = [("a", i) for i in range(10)] * 3  # duplicates collapse
        out = self._kmv(spark, rows, k=64).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_exact"] == 10
        assert r["kth_min"] is None
        assert r["est_distinct"] == 10.0

    def test_estimator_accuracy_at_k64(self, spark):
        """Beyer et al. estimator: rel. std err ≈ 1/√(k−2) ≈ 12.7 % at
        k=64 — assert one deterministic draw lands within ±40 %."""
        n = 20_000
        rows = [("a", i) for i in range(n)]
        r = self._kmv(spark, rows, k=64).collect()[0]
        assert r["n_exact"] == n
        assert 0.6 * n < r["est_distinct"] < 1.4 * n

    def test_sketch_merges_by_union_keep_k(self, spark):
        """Shard-combinability: union of two shard sketches, keep the
        k smallest, equals the whole-data sketch."""
        from mapreduce_join_comparison_spark.operators.sampling import (
            md5_hash32,
        )
        k = 16
        rows = [("a", i) for i in range(500)]
        whole = self._kmv(spark, rows, k=k).collect()[0]
        import hashlib

        def h(v):
            return int(
                hashlib.md5((str(v) + "kmv").encode()).hexdigest()[:8], 16
            )

        shard1 = sorted(h(v) for _, v in rows[:250])[:k]
        shard2 = sorted(h(v) for _, v in rows[250:])[:k]
        merged = sorted(set(shard1) | set(shard2))[:k]
        assert whole["kth_min"] == merged[-1]

    def test_duplicates_do_not_move_estimate(self, spark):
        base = [("a", i) for i in range(300)]
        r1 = self._kmv(spark, base, k=32).collect()[0]
        r2 = self._kmv(spark, base * 5, k=32).collect()[0]
        assert (r1["kth_min"], r1["est_distinct"]) == (
            r2["kth_min"], r2["est_distinct"]
        )

    def test_jaccard_estimate_tracks_exact(self, spark):
        """Ĵ from merged bottom-k sketches vs the true Jaccard on
        constructed overlapping sets (|A∩B|/|A∪B| = 1000/3000):
        k=64 → rel std err ≈ 1/√k ≈ 12 %; assert a generous band."""
        from mapreduce_join_comparison_spark.operators.sampling import (
            kmv_jaccard_matrix,
        )

        rows = [("a", i) for i in range(2000)] + [
            ("b", i) for i in range(1000, 3000)
        ]
        df = spark.createDataFrame(rows, "grp string, v bigint")
        r = kmv_jaccard_matrix(df, "grp", "v", k=64).collect()[0]
        true_j = 1000 / 3000
        assert abs(r["est_jaccard"] - true_j) < 0.15
        assert r["union_k"] == 64  # union is large: sketch saturated

    def test_merged_sketch_is_union_sketch(self, spark):
        """The k smallest of two sketches' union equal the bottom-k
        sketch of the unioned data — mergeability, pairwise form."""
        from mapreduce_join_comparison_spark.operators.sampling import (
            kmv_sketch_per_group,
        )

        rows_a = [("a", i) for i in range(300)]
        rows_b = [("b", i) for i in range(150, 450)]
        df = spark.createDataFrame(
            rows_a + rows_b, "grp string, v bigint"
        )
        sk = {r["grp"]: r["sketch"]
              for r in kmv_sketch_per_group(df, "grp", "v", k=16).collect()}
        both = spark.createDataFrame(
            [("u", v) for _, v in rows_a + rows_b], "grp string, v bigint"
        )
        want = kmv_sketch_per_group(both, "grp", "v", k=16).collect()[0][
            "sketch"
        ]
        merged = sorted(set(sk["a"]) | set(sk["b"]))[:16]
        assert merged == sorted(want)
