"""Round-7 continuation operators: distributed exact-int Lloyd k-means
(`kmeans_lloyd`), PSI drift (`psi_drift`), and temperature sampling
(`temperature_rebalance`).

k-means is pinned against a pure-Python replay of the identical
trajectory (same quantization, same md5 init, same floor-div update,
same lowest-cid tie-break) — exact Row equality, not approx, because
every step is integer arithmetic. PSI is pinned on hand-computable
cases (identical distributions → 0; a fully shifted distribution →
the closed-form smoothed value). Temperature sampling pins the
"scarcest stratum kept whole" exactness claim (x/x == 1.0 in IEEE)
and the ∝ √n token shape.
"""

from __future__ import annotations

import pytest

import hashlib
import math

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.aggregates import psi_drift
from mapreduce_join_comparison_spark.operators.sampling import (
    hash_bucket,
    temperature_rebalance,
)
from mapreduce_join_comparison_spark.operators.similarity import kmeans_lloyd


# ------------------------------------------------------------------ k-means


def _py_kmeans(rows, dim, k, iters, scale=1_000_000, salt=":km7"):
    """Reference replay of kmeans_lloyd's exact trajectory in plain
    Python ints."""
    q = {
        vid: [math.floor(float(x) * scale + 0.5) for x in vec]
        for vid, vec in rows
    }
    order = sorted(
        q, key=lambda v: (hashlib.md5(f"{v}{salt}".encode()).hexdigest(), v)
    )
    cents = [(i, list(q[v])) for i, v in enumerate(order[:k])]

    def assign(c):
        out = {}
        for vid, qv in q.items():
            best = None
            for cid, cv in c:
                d = sum((y - x) * (y - x) for y, x in zip(cv, qv))
                if best is None or d < best[0]:
                    best = (d, cid)
            out[vid] = best
        return out

    for _ in range(iters):
        a = assign(cents)
        sums, counts = {}, {}
        for vid, (_, cid) in a.items():
            counts[cid] = counts.get(cid, 0) + 1
            s = sums.setdefault(cid, [0] * dim)
            for i, v in enumerate(q[vid]):
                s[i] += v
        cents = [
            (cid, [s // counts[cid] for s in sums[cid]])
            for cid in sorted(sums)
        ]
    return {vid: (d, cid) for vid, (d, cid) in assign(cents).items()}


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(vid, [float(x) for x in vec]) for vid, vec in rows],
        "vec_id bigint, embedding array<float>",
    )


def test_kmeans_matches_python_replay(spark):
    # 40 vectors in 4 well-separated blobs + noise dims
    rows = []
    for i in range(40):
        blob = i % 4
        vec = [0.2 * blob + 0.001 * (i % 7) - 0.05, -0.3 + 0.15 * blob] + [
            0.01 * ((i * 13 + j) % 11 - 5) for j in range(6)
        ]
        rows.append((i, vec))
    got = {
        r.vec_id: (r.dist, r.cluster)
        for r in kmeans_lloyd(_emb_df(spark, rows), dim=8, k=4, iters=3).collect()
    }
    want = _py_kmeans(rows, dim=8, k=4, iters=3)
    assert got == want


def test_kmeans_cluster_ids_survive_empty_cluster(spark):
    # k=3 over 2 tight far-apart blobs: one seed's cluster must empty
    # out after an update; remaining ids must stay the ORIGINAL cids
    # (the literal carries cids — not re-indexed positions)
    rows = [(i, [0.3] * 4) for i in range(6)] + [
        (10 + i, [-0.3] * 4) for i in range(6)
    ]
    out = kmeans_lloyd(_emb_df(spark, rows), dim=4, k=3, iters=2)
    got = {r.vec_id: (r.dist, r.cluster) for r in out.collect()}
    want = _py_kmeans(rows, dim=4, k=3, iters=2)
    assert got == want
    # exactly-equal members of a blob all land in one cluster at dist 0
    assert len({got[i] for i in range(6)}) == 1
    assert all(got[i][0] == 0 for i in range(6))


def test_kmeans_tie_breaks_to_lowest_cid(spark):
    # a vector equidistant from two identical-distance centroids: the
    # fold's strict < keeps the lowest cid (oracle: ORDER BY dist, cid)
    rows = [(0, [0.1, 0.0]), (1, [-0.1, 0.0]), (2, [0.0, 0.0])]
    out = kmeans_lloyd(_emb_df(spark, rows), dim=2, k=2, iters=1)
    got = {r.vec_id: (r.dist, r.cluster) for r in out.collect()}
    want = _py_kmeans(rows, dim=2, k=2, iters=1)
    assert got == want


# ------------------------------------------------------------------ PSI


def _psi_df(spark, rows):
    # rows: (grp, value, is_ref)
    return spark.createDataFrame(rows, "g string, v double, r boolean")


def test_psi_zero_for_identical_distributions(spark):
    rows = []
    for i in range(100):
        rows.append(("a", float(i % 10), True))
        rows.append(("a", float(i % 10), False))
    out = psi_drift(
        _psi_df(spark, rows), ["g"], F.col("v"), F.col("r")
    ).collect()
    assert len(out) == 1
    assert out[0].n_ref == 100 and out[0].n_cur == 100
    assert out[0].psi == 0.0


def test_psi_known_value_full_shift(spark):
    # ref all in bin 0 (v=0), cur all at the max (clamps to bin 9):
    # smoothed p/q per the Laplace-1/2 closed form. The 8 bins empty
    # on BOTH sides still contribute — n_ref (51) != n_cur (50), so
    # p = 1/(2*51+10) != 1/(2*50+10) = q under the smoothing — the
    # sum must run over the FULL 10-bin grid
    n = 50
    rows = [("a", 0.0, True) for _ in range(n)]
    rows += [("a", 10.0, True)]  # pins vmax so width > 0
    rows += [("a", 10.0, False) for _ in range(n)]
    out = psi_drift(
        _psi_df(spark, rows), ["g"], F.col("v"), F.col("r")
    ).collect()[0]

    def term(cr, cc, nr, nc):
        p = (2 * cr + 1) / (2 * nr + 10)
        q = (2 * cc + 1) / (2 * nc + 10)
        t = (p - q) * math.log(
            ((2 * cr + 1) * (2 * nc + 10)) / ((2 * cc + 1) * (2 * nr + 10))
        )
        return round(t * 1e9)

    nano = (
        term(n, 0, n + 1, n)          # bin 0: ref-only mass
        + term(1, n, n + 1, n)        # bin 9: the vmax ref row + cur
        + 8 * term(0, 0, n + 1, n)    # bins 1-8: empty-both, nonzero
    )
    assert out.psi == round(nano / 1e9, 6)
    assert out.n_ref == n + 1 and out.n_cur == n


def test_psi_group_without_reference_rows_drops(spark):
    rows = [("a", 1.0, True), ("a", 2.0, False), ("b", 3.0, False)]
    out = psi_drift(_psi_df(spark, rows), ["g"], F.col("v"), F.col("r"))
    assert [r.g for r in out.collect()] == ["a"]


def test_psi_constant_reference_span_uses_bin_zero(spark):
    # vmax == vmin in the reference: every row (ref and cur) lands in
    # bin 0 — PSI must be exactly 0, not NaN/div-by-zero
    rows = [("a", 5.0, True)] * 10 + [("a", 99.0, False)] * 10
    out = psi_drift(
        _psi_df(spark, rows), ["g"], F.col("v"), F.col("r")
    ).collect()[0]
    assert out.psi == 0.0


# ------------------------------------------------------- temperature mix


def _docs_df(spark, sizes: dict[str, tuple[int, int]]):
    # sizes: lang -> (n_docs, tokens_per_doc)
    rows, did = [], 0
    for lang, (n, tpd) in sizes.items():
        for _ in range(n):
            rows.append((did, lang, " ".join(["tok"] * tpd)))
            did += 1
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_temperature_keeps_scarcest_stratum_whole(spark):
    df = _docs_df(spark, {"en": (400, 10), "zh": (7, 10)})
    out = temperature_rebalance(df, alpha=0.5).collect()
    kept = {}
    for r in out:
        kept[r.lang] = kept.get(r.lang, 0) + 1
    # keep_frac(zh) = r/max(r) = x/x = exactly 1.0: every zh doc kept
    assert kept["zh"] == 7
    assert kept["en"] < 400


def test_temperature_kept_tokens_proportional_to_sqrt(spark):
    # 4x the tokens should keep ~2x the tokens (∝ √n); md5 buckets are
    # uniform enough at 4000/1000 docs for a ±10 % band
    df = _docs_df(spark, {"en": (4000, 10), "de": (1000, 10)})
    out = temperature_rebalance(df, alpha=0.5)
    kept = {
        r.lang: r.t
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    ratio = kept["en"] / kept["de"]
    assert 1.8 < ratio < 2.2, ratio


def test_temperature_membership_is_hash_stable(spark):
    # kept set is a pure function of (doc_id, salt): re-running and
    # re-partitioning cannot change membership
    df = _docs_df(spark, {"en": (200, 5), "fr": (50, 5)})
    a = {r.doc_id for r in temperature_rebalance(df, alpha=0.5).collect()}
    b = {
        r.doc_id
        for r in temperature_rebalance(df.repartition(7), alpha=0.5).collect()
    }
    assert a == b
    # and it is exactly the md5-bucket predicate on the kept fraction
    assert a, "sanity: non-empty"


def test_hash_bucket_matches_oracle_primitive(spark):
    # the '0x' || substr(md5(...), 1, 8) DuckDB idiom == md5_hash32
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", hash_bucket("doc_id", 10_000, "temp").alias("b")
        ).collect()
    }
    for vid in range(100):
        h = hashlib.md5(f"{vid}temp".encode()).hexdigest()
        assert got[vid] == int(h[:8], 16) % 10_000


# -------------------------------------------------- preference pairs


def test_preference_pairs_tie_breaks_and_zero_margin(spark):
    from mapreduce_join_comparison_spark.queries_catalog import QUERIES

    # build a tiny events-shaped table and exercise the same operator
    # shape directly (struct-max argmax with ties)
    rows = [
        # group 1: max tie between events 11/12 -> chosen 11; min is 13
        (1, 11, 5.0), (1, 12, 5.0), (1, 13, 1.0),
        # group 2: min tie between 22/23 -> rejected 22
        (2, 21, 9.0), (2, 22, 2.0), (2, 23, 2.0),
        # group 3: all equal -> zero margin -> dropped
        (3, 31, 4.0), (3, 32, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, value double"
    )
    r = df.select(
        "user_id", "event_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("rm"),
    )
    g = r.groupBy("user_id").agg(
        F.max(F.struct(F.col("rm"), (-F.col("event_id")).alias("nid")))
        .alias("_c"),
        F.min(F.struct(F.col("rm"), F.col("event_id"))).alias("_j"),
    )
    out = {
        row.user_id: (row.chosen, row.rejected, row.margin)
        for row in g.select(
            "user_id",
            (-F.col("_c.nid")).alias("chosen"),
            F.col("_j.event_id").alias("rejected"),
            (F.col("_c.rm") - F.col("_j.rm")).alias("margin"),
        )
        .filter(F.col("margin") > 0)
        .collect()
    }
    assert out == {1: (11, 13, 4000), 2: (21, 22, 7000)}


# -------------------------------------------------- streaming drift


def test_stream_drift_psi_batch_twin_matches_psi_drift(spark):
    """stream_drift_psi on a BATCH frame with one window spanning the
    whole current slice must equal aggregates.psi_drift on the same
    split — same bins, same smoothing, same nano-int terms."""
    from mapreduce_join_comparison_spark.streaming.events import (
        drift_reference_histogram,
        stream_drift_psi,
    )

    rows = []
    for i in range(200):
        # ref (us < cutoff): uniform over [0, 10); cur: shifted up for
        # group a, identical for group b. Group a's slice sizes are
        # UNEQUAL (200 ref vs 150 cur) and its shift empties bins on
        # both sides — the exact case where skipping empty-both bins
        # used to make batch and stream disagree
        rows.append(("a", 10_000 + i, float(i % 10)))
        if i < 150:
            rows.append(("a", 200_000 + i, float(i % 10) + 4.0))
        rows.append(("b", 20_000 + i, float(i % 7)))
        rows.append(("b", 600_000 + i, float(i % 7)))
    df = spark.createDataFrame(
        rows,
        "event_type string, us bigint, value double",
    ).select(
        "event_type",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "value",
    )
    cutoff = 100_000
    ref = df.filter(F.unix_micros("ts") < cutoff)
    hist = drift_reference_histogram(ref, n_bins=10)
    # one giant window covers every current row (all within day 0)
    got = {
        (r.event_type,): (r.n_ref, r.n_cur, r.psi)
        for r in stream_drift_psi(
            df, hist, cutoff, n_bins=10, window="7 days"
        ).collect()
    }
    want = {
        (r.event_type,): (r.n_ref, r.n_cur, r.psi)
        for r in psi_drift(
            df,
            ["event_type"],
            F.col("value"),
            F.unix_micros("ts") < cutoff,
            n_bins=10,
        ).collect()
    }
    assert got == want
    # the shifted distribution must register as drifted, the stable not
    assert got[("a",)][2] > 0.25
    assert got[("b",)][2] == 0.0


# ---------------------------------------------- k-means property test

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-400, max_value=400).map(
                lambda m: m / 1000.0
            ),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=25,
    ),
    k=st.sampled_from([1, 2, 4]),
    iters=st.sampled_from([1, 2]),
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_kmeans_trajectory_property(spark, vecs, k, iters):
    """Whatever the data (duplicates, collinear points, k > distinct
    points, clusters that empty out), the Spark trajectory equals the
    pure-Python exact replay Row-for-Row."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    got = {
        r.vec_id: (r.dist, r.cluster)
        for r in kmeans_lloyd(
            _emb_df(spark, rows), dim=3, k=k, iters=iters
        ).collect()
    }
    want = _py_kmeans(rows, dim=3, k=k, iters=iters)
    assert got == want


def test_psi_null_group_key_is_kept(spark):
    # a NULL group key is a real group: the span re-attach is
    # NULL-safe (round-6-advice lesson), so its PSI row must appear
    rows = [(None, float(i % 5), True) for i in range(40)]
    rows += [(None, float(i % 5), False) for i in range(40)]
    rows += [("a", 1.0, True), ("a", 2.0, False)]
    out = {
        r.g: r.psi
        for r in psi_drift(
            _psi_df(spark, rows), ["g"], F.col("v"), F.col("r")
        ).collect()
    }
    assert set(out) == {None, "a"}
    assert out[None] == 0.0


def test_stream_drift_null_values_excluded_coherently(spark):
    # NULL values have no bin: excluded from the monitor entirely, so
    # n_ref/n_cur equal the sum of histogram cells, not the raw row
    # count (keeps the operator coherent with its relational oracle)
    from mapreduce_join_comparison_spark.streaming.events import (
        drift_reference_histogram,
        stream_drift_psi,
    )

    rows = [("a", 1_000 + i, float(i % 5)) for i in range(50)]
    rows += [("a", 1_500 + i, None) for i in range(7)]       # ref nulls
    # same shape AND same count as ref: Laplace smoothing cancels
    # exactly only at equal n, making psi == 0.0 a sharp assertion
    rows += [("a", 200_000 + i, float(i % 5)) for i in range(50)]
    rows += [("a", 200_500 + i, None) for i in range(9)]     # cur nulls
    df = spark.createDataFrame(
        rows, "event_type string, us bigint, value double"
    ).select(
        "event_type", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    hist = drift_reference_histogram(
        df.filter(F.unix_micros("ts") < 100_000), n_bins=10
    )
    out = stream_drift_psi(df, hist, 100_000, n_bins=10,
                           window="7 days").collect()
    assert len(out) == 1
    assert out[0].n_ref == 50 and out[0].n_cur == 50
    assert out[0].psi == 0.0


def test_kmeans_pandas_assignment_bit_identical(spark):
    # the Arrow-batched exact-int argmin must reproduce the literal
    # HOF fold Row-for-Row (ties included), and both must match the
    # Python replay
    rows = []
    for i in range(60):
        rows.append((i, [0.01 * ((i * 7 + j * 3) % 23 - 11)
                         for j in range(8)]))
    # salt in exact duplicates and tie shapes
    rows += [(100 + i, rows[i][1]) for i in range(10)]
    df = _emb_df(spark, rows)
    lit_out = {
        r.vec_id: (r.dist, r.cluster)
        for r in kmeans_lloyd(
            df, dim=8, k=5, iters=2, assign_via="literal"
        ).collect()
    }
    pd_out = {
        r.vec_id: (r.dist, r.cluster)
        for r in kmeans_lloyd(
            df, dim=8, k=5, iters=2, assign_via="pandas"
        ).collect()
    }
    assert lit_out == pd_out
    assert lit_out == _py_kmeans(rows, dim=8, k=5, iters=2)


# ------------------------------------------------- batched BPE self-pair


def test_bpe_self_pair_merge_ends_batch(spark):
    """Review counterexamples: an accepted SELF-pair (x, x) creates
    (xx, x)/(xx, xx) adjacencies whose generator is the accepted pair
    itself — invisible to later_sharing — so the batch must not
    accept a weaker disjoint pair over them. Both corpora diverged
    before the self_half bound; batched must equal sequential."""
    from mapreduce_join_comparison_spark.operators.bpe import bpe_merges

    corpora = [
        ["ac"] * 7 + ["bbb"] * 10,
        ["bbbbb"] * 20 + ["bbbba"] * 6 + ["aa"] * 10 + ["aba"]
        + ["aaabbbb"] * 10,
    ]
    for words in corpora:
        df = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id bigint, text string"
        )
        seq = sorted(
            tuple(r) for r in bpe_merges(df, n_merges=4, batch_k=1).collect()
        )
        for k in (2, 8):
            bat = sorted(
                tuple(r)
                for r in bpe_merges(df, n_merges=4, batch_k=k).collect()
            )
            assert bat == seq, f"k={k} words={words[:2]}"


def test_bpe_select_batch_self_half_bound():
    # unit-pin: after accepting a self-pair with count C, the next
    # disjoint candidate needs cnt > 2*(C//2); at or below, batch ends
    from mapreduce_join_comparison_spark.operators.bpe import _select_batch

    rows = [
        {"l": "b", "r": "b", "cnt": 20},
        {"l": "a", "r": "c", "cnt": 20},   # 20 <= 2*(20//2) -> ends
    ]
    got = _select_batch(rows, batch_k=8, complete=True)
    assert [(l, r) for l, r, _ in got] == [("b", "b")]
    rows2 = [
        {"l": "b", "r": "b", "cnt": 20},
        {"l": "a", "r": "c", "cnt": 21},   # 21 > 20 -> accepted
    ]
    got2 = _select_batch(rows2, batch_k=8, complete=True)
    assert [(l, r) for l, r, _ in got2] == [("b", "b"), ("a", "c")]


def test_stream_drift_null_group_key_is_monitored(spark):
    # the batch monitor keeps a NULL group; the stream must too (both
    # re-attaches are NULL-safe) — and their values must agree
    from mapreduce_join_comparison_spark.streaming.events import (
        drift_reference_histogram,
        stream_drift_psi,
    )

    rows = []
    for i in range(60):
        rows.append((None, 1_000 + i, float(i % 6)))
        rows.append((None, 200_000 + i, float(i % 6)))
        rows.append(("a", 2_000 + i, float(i % 4)))
        rows.append(("a", 300_000 + i, float(i % 4)))
    df = spark.createDataFrame(
        rows, "event_type string, us bigint, value double"
    ).select(
        "event_type", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    cutoff = 100_000
    hist = drift_reference_histogram(
        df.filter(F.unix_micros("ts") < cutoff), n_bins=10
    )
    got = {
        r.event_type: (r.n_ref, r.n_cur, r.psi)
        for r in stream_drift_psi(
            df, hist, cutoff, n_bins=10, window="7 days"
        ).collect()
    }
    want = {
        r.g: (r.n_ref, r.n_cur, r.psi)
        for r in psi_drift(
            df.withColumnRenamed("event_type", "g"),
            ["g"], F.col("value"),
            F.unix_micros("ts") < cutoff, n_bins=10,
        ).collect()
    }
    assert set(got) == {None, "a"}
    assert got == want


# --------------------------------------------- review-pass-4 hardening


def test_hash_split_partitions_null_keys(spark):
    from mapreduce_join_comparison_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (None,)], "k bigint"
    )
    train, hold = hash_split(df, "k", train_pct=50, buckets=100)
    # a PARTITION: every row (including NULL keys) lands in exactly
    # one side
    assert train.count() + hold.count() == 5
    both = train.intersect(hold).count()
    assert both == 0


def test_kmv_ignores_null_values(spark):
    from mapreduce_join_comparison_spark.operators.sampling import (
        kmv_distinct_per_group,
    )

    base = [("g", str(i)) for i in range(40)]
    df1 = spark.createDataFrame(base, "g string, v string")
    df2 = spark.createDataFrame(
        base + [("g", None)] * 3, "g string, v string"
    )
    k = 16
    a = kmv_distinct_per_group(df1, "g", "v", k=k).collect()[0]
    b = kmv_distinct_per_group(df2, "g", "v", k=k).collect()[0]
    # NULLs are not values: sketch, k-th minimum, and estimate all
    # identical (previously the NULL hash consumed bottom-k rank 1)
    assert (a.n_exact, a.kth_min, a.est_distinct) == (
        b.n_exact, b.kth_min, b.est_distinct
    )


def test_reservoir_null_keys_do_not_always_win(spark):
    from mapreduce_join_comparison_spark.operators.sampling import (
        hash_reservoir_per_group,
    )

    rows = [("g", i) for i in range(100)] + [("g", None)] * 3
    df = spark.createDataFrame(rows, "g string, k bigint")
    out = hash_reservoir_per_group(df, "g", "k", k=50).collect()
    ranks_of_null = [r.sample_rank for r in out if r.k is None]
    # the NULL keys hash via the sentinel: deterministic rank, not
    # automatic ranks 1..3
    assert ranks_of_null != [1, 2, 3]
    assert len(out) == 50


def test_mp4_sniff_is_box_size_agnostic(spark):
    from mapreduce_join_comparison_spark.operators.multimodal import (
        sniff_format,
    )

    rows = [
        (bytes.fromhex("0000001C") + b"ftypisom" + b"\x00" * 8,),  # 0x1C
        (bytes.fromhex("00000018") + b"ftypmp42" + b"\x00" * 8,),  # 0x18
        (b"not a container at all!!",),
    ]
    df = spark.createDataFrame(rows, "blob binary")
    got = [r.f for r in df.select(sniff_format("blob").alias("f")).collect()]
    assert got == ["mp4", "mp4", "unknown"]


def test_multimodal_decoders_tolerate_null_blobs(spark):
    from mapreduce_join_comparison_spark.operators.multimodal import (
        decode_image_features,
        extract_audio_features,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 24), (2, None)],
        "doc_id bigint, blob binary",
    )
    assert decode_image_features(df).count() == 1
    assert sample_frames(df, n_frames=2).count() == 2  # 1 blob x 2 frames
    assert extract_audio_features(df).count() == 1


# --------------------------------------------- review-pass-5 hardening


def test_merge_upsert_null_key_updates_insert(spark):
    from mapreduce_join_comparison_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    ups = spark.createDataFrame(
        [(2, "B"), (None, "x"), (None, "y")], "k bigint, v string"
    )
    out = merge_upsert(base, ups, "k")
    rows = {(r.k, r.v) for r in out.collect()}
    # SQL MERGE semantics: NULL-key source rows never match — they
    # insert (previously: corrupted to an all-NULL row, and two of
    # them spuriously tripped the duplicate-key guard)
    assert rows == {(1, "a"), (2, "B"), (None, "x"), (None, "y")}


def test_scd2_history_null_attr_interval(spark):
    from mapreduce_join_comparison_spark.operators.cdc import scd2_history

    log = spark.createDataFrame(
        [
            (1, "A", 10, 100),
            (1, None, 20, 101),   # change TO NULL: its own interval
            (1, None, 25, 102),   # same NULL run: compressed
            (1, "A", 30, 103),    # change back: third interval
        ],
        "k bigint, attr string, v bigint, tb bigint",
    )
    out = scd2_history(log, "k", "attr", "v", "tb").orderBy("version")
    got = [(r.attr, r.valid_from, r.valid_to) for r in out.collect()]
    assert got == [("A", 10, 20), (None, 20, 30), ("A", 30, None)]


def test_snapshot_diff_delimiter_injection(spark):
    from mapreduce_join_comparison_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, "x|y", "z")], "k bigint, a string, b string")
    new = spark.createDataFrame([(1, "x", "y|z")], "k bigint, a string, b string")
    out = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    # ('x|y','z') vs ('x','y|z') previously hashed EQUAL and the
    # change vanished; fixed-width per-column digests disambiguate
    assert [(r.k, r.diff_class) for r in out] == [(1, "changed")]
    # NULL vs a value equal to the old sentinel also distinguishes
    old2 = spark.createDataFrame([(1, None)], "k bigint, a string")
    new2 = spark.createDataFrame([(1, "\x00")], "k bigint, a string")
    assert snapshot_diff(old2, new2, ["k"], ["a"]).count() == 1


def test_chunk_windows_rejects_gap_stride(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.text import chunk_windows

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_windows(df, window=10, stride=100)


def test_bm25_rejects_quoted_query_id(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.text import bm25_rank

    df = spark.createDataFrame([(1, "hello world")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="query id"):
        bm25_rank(df, {"q's": ["hello"]})


# --------------------------------------------- review-pass-6 hardening


def test_asof_join_null_payload_not_stitched(spark):
    from mapreduce_join_comparison_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [(1, 10, 100, "early"), (1, 20, None, None)],
        "k bigint, r_ts bigint, price bigint, src string",
    )
    left = spark.createDataFrame([(1, 30)], "k bigint, l_ts bigint")
    out = asof_join(left, right, "k", "l_ts", "r_ts").collect()
    # the ts=20 row is the as-of match; its NULL price must NOT be
    # replaced by the stale 100 from ts=10 (per-column ignorenulls
    # stitched rows before the struct carry)
    assert [(r.price, r.src) for r in out] == [(None, None)]


def test_asof_nearest_payload_matches_reported_ts(spark):
    from mapreduce_join_comparison_spark.operators.joins import (
        asof_nearest_join,
    )
    from pyspark.sql import functions as F

    right = spark.createDataFrame(
        [(1, 10_000_000, 100), (1, 20_000_000, None)],
        "k bigint, us bigint, price bigint",
    ).select("k", F.timestamp_micros("us").alias("ts"), "price")
    left = spark.createDataFrame(
        [(1, 21_000_000)], "k bigint, us bigint"
    ).select("k", F.timestamp_micros("us").alias("ts"))
    out = asof_nearest_join(left, right, "k").collect()[0]
    # nearest row is us=20s whose price is NULL: the payload must come
    # from THAT row, not the older one
    assert out.nearest_ts_us == 20_000_000
    assert out.price is None


def test_binned_zscore_null_series_equals_direct(spark):
    from mapreduce_join_comparison_spark.operators.timeseries import (
        rolling_zscore_anomalies,
        rolling_zscore_anomalies_binned,
    )
    from pyspark.sql import functions as F

    rows = []
    for i in range(60):
        # a NULL series interleaved with a real one; inject outliers
        v = 1000.0 if i in (40, 50) else float(i % 7)
        rows.append((i, None, i * 600_000_000, v))
        rows.append((1000 + i, "a", i * 600_000_000, v))
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, us bigint, value double"
    ).select(
        "event_id", "event_type",
        F.timestamp_micros("us").alias("ts"), "value",
    )
    kw = dict(window_us=6_000_000_000, min_points=5, z_threshold=2.0)
    direct = {
        (r.event_id, r.zscore)
        for r in rolling_zscore_anomalies(df, **kw).collect()
    }
    binned = {
        (r.event_id, r.zscore)
        for r in rolling_zscore_anomalies_binned(
            df, bins_per_window=6, **kw
        ).collect()
    }
    assert direct == binned
    assert any(eid < 1000 for eid, _ in binned), "NULL series missing"


def test_resample_locf_null_series_kept(spark):
    from mapreduce_join_comparison_spark.operators.timeseries import (
        resample_locf,
    )
    from pyspark.sql import functions as F

    rows = [(1, None, 0, 5.0), (2, None, 1_800_000_000, 7.0),
            (3, "a", 0, 1.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, us bigint, value double"
    ).select(
        "event_id", "event_type",
        F.timestamp_micros("us").alias("ts"), "value",
    )
    out = resample_locf(df, bin_micros=900_000_000)
    by_series = {}
    for r in out.collect():
        by_series.setdefault(r.series, []).append(r)
    # the NULL series keeps its observations (previously every one of
    # its bins reported n_events=0 via the null-rejecting grid join)
    assert sum(r.n_events for r in by_series[None]) == 2


def test_dominance_count_empty_and_null_coords(spark):
    from mapreduce_join_comparison_spark.operators.joins import (
        dominance_count,
    )

    empty = spark.createDataFrame([], "id bigint, x bigint, y bigint")
    assert dominance_count(empty, "x", "y", "id").count() == 0
    withnulls = spark.createDataFrame(
        [(1, 1, 1), (2, None, 5), (3, 2, None)],
        "id bigint, x bigint, y bigint",
    )
    out = dominance_count(withnulls, "x", "y", "id").collect()
    assert [r.id for r in out] == [1]


def test_interval_join_rejects_fractional_bounds(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.joins import (
        interval_join,
    )

    ivals = spark.createDataFrame(
        [(0.9, 2.05)], "lo double, hi double"
    )
    pts = spark.createDataFrame([(1,)], "x bigint")
    with _pytest.raises(TypeError, match="integer-typed"):
        interval_join(ivals, pts, "lo", "hi", "x")


def test_guards_sliding_window_and_grid_radius(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.joins import (
        grid_distance_join,
    )
    from mapreduce_join_comparison_spark.operators.timeseries import (
        sliding_window_distinct,
    )

    pts = spark.createDataFrame([(1, 0, 0)], "id bigint, x bigint, y bigint")
    with _pytest.raises(ValueError, match="radius"):
        grid_distance_join(pts, "id", "x", "y", radius=0)
    ev = spark.createDataFrame([(1, 1)], "user_id bigint, us bigint")
    with _pytest.raises(ValueError, match="multiple"):
        sliding_window_distinct(
            ev, "us", "user_id", window_hours=24, slide_hours=7
        )


# --------------------------------------------- review-pass-7 hardening


def test_skyline_null_coords_and_wide_range(spark):
    from mapreduce_join_comparison_spark.operators.sorts import skyline_2d

    df = spark.createDataFrame(
        [(0, 5), (10, 1), (None, 0), (3, None)],
        "x bigint, y bigint",
    )
    got = {(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()}
    # NULL-coordinate rows neither join nor dominate the frontier
    # (a NULL x previously landed in the last bin NULLS-FIRST and its
    # y=0 wrongly dominated the true frontier point (10, 1))
    assert got == {(0, 5), (10, 1)}
    # wide-range BIGINT x: (x-lo)*bins overflows long; double binning
    # stays monotone and the frontier is exact
    wide = spark.createDataFrame(
        [(-4 * 10**18, 5), (0, 3), (4 * 10**18, 1)], "x bigint, y bigint"
    )
    got_w = {(r.x, r.y) for r in skyline_2d(wide, "x", "y").collect()}
    assert got_w == {(-4 * 10**18, 5), (0, 3), (4 * 10**18, 1)}


def test_hypercube_null_keys_match_chain_semantics(spark):
    from mapreduce_join_comparison_spark.operators.multiway import (
        hypercube_triangle_join,
        triangle_join,
    )

    r = spark.createDataFrame([(1, None), (1, 2)], "a bigint, b bigint")
    s = spark.createDataFrame([(None, 3), (2, 3)], "b bigint, c bigint")
    t = spark.createDataFrame([(3, 1)], "c bigint, a bigint")
    hyper = {tuple(x) for x in hypercube_triangle_join(r, s, t).collect()}
    chain = {tuple(x) for x in triangle_join(r, s, t).collect()}
    # SQL inner-join semantics: NULL keys never match — pandas NaN
    # merge inside the cells previously fabricated a NULL triangle
    assert hyper == chain == {(1, 2, 3)}


def test_pagerank_empty_graph(spark):
    from mapreduce_join_comparison_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank(edges).count() == 0


def test_ivf_train_guards(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.similarity import (
        train_ivf_centroids,
    )

    empty = spark.createDataFrame([], "embedding array<float>")
    with _pytest.raises(ValueError, match="empty corpus"):
        train_ivf_centroids(empty, dim=8)
    wrongdim = spark.createDataFrame(
        [([0.1] * 4,)], "embedding array<float>"
    )
    with _pytest.raises(ValueError, match="declared dim"):
        train_ivf_centroids(wrongdim, dim=8)


def test_top_k_per_group_reserved_column(spark):
    import pytest as _pytest

    from mapreduce_join_comparison_spark.operators.sorts import (
        top_k_per_group,
    )

    df = spark.createDataFrame([(1, 2, 3)], "g bigint, v bigint, _rn bigint")
    with _pytest.raises(ValueError, match="_rn"):
        top_k_per_group(df, ["g"], "v", 1)
