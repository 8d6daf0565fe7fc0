"""Round-4 scale-extension operators: inverted index, exact-dedup
survivorship policy, per-group deterministic reservoir sampling.
Known-answer literal tests plus the invariants each operator's
docstring promises (rank-capped postings, policy-ordered survivor,
repartition-stable sample membership, rank-prefix shrinkability)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.dedup import exact_dedup_survivor
from mapreduce_join_comparison_spark.operators.sampling import (
    hash_reservoir_per_group,
)
from mapreduce_join_comparison_spark.operators.text import inverted_index


# --- inverted index ------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_inverted_index_known_answer(spark):
    df = _docs(spark, [
        (1, "a b c"),
        (2, "b c"),
        (3, "c a  a"),   # duplicate token within doc counts once
    ])
    out = {r["term"]: (r["doc_freq"], r["postings_head"])
           for r in inverted_index(df).collect()}
    assert out == {
        "a": (2, "1,3"),
        "b": (2, "1,2"),
        "c": (3, "1,2,3"),
    }


def test_inverted_index_caps_postings_not_docfreq(spark):
    df = _docs(spark, [(i, "hot") for i in range(1, 31)])
    (row,) = inverted_index(df, max_postings=5).collect()
    assert row["doc_freq"] == 30
    # head = the 5 SMALLEST ids, numerically ordered (not lexicographic:
    # ids 10, 11, ... must not displace 2..5)
    assert row["postings_head"] == "1,2,3,4,5"


def test_inverted_index_python_replay(spark):
    rows = [(i, " ".join(f"w{(i * j) % 7}" for j in range(5)))
            for i in range(1, 40)]
    expected: dict[str, list[int]] = {}
    for doc_id, txt in rows:
        for t in set(txt.split()):
            expected.setdefault(t, []).append(doc_id)
    got = {r["term"]: (r["doc_freq"], r["postings_head"])
           for r in inverted_index(_docs(spark, rows), max_postings=3).collect()}
    assert got == {
        t: (len(ids), ",".join(str(i) for i in sorted(ids)[:3]))
        for t, ids in expected.items()
    }


# --- exact-dedup survivorship -------------------------------------------

def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )


def test_survivor_prefers_priority_source(spark):
    df = _corpus(spark, [
        (5, "same text", "src_crawl"),
        (9, "same  TEXT ", "src_curated"),   # normalizes equal
        (7, "other", "src_crawl"),
    ])
    out = {r["doc_id"]: r["n_copies"]
           for r in exact_dedup_survivor(df).collect()}
    # doc 9 wins its group (curated < crawl lexicographically? no —
    # "src_crawl" < "src_curated", so doc 5 survives); assert the
    # actual lexicographic rule, not an intuition about trust
    assert out == {5: 2, 7: 1}


def test_survivor_id_tiebreak_within_source(spark):
    df = _corpus(spark, [
        (12, "dup", "s0"),
        (3, "dup", "s0"),
        (8, "dup", "s1"),
    ])
    (row,) = [r for r in exact_dedup_survivor(df).collect()]
    assert (row["doc_id"], row["n_copies"]) == (3, 3)


def test_survivor_copy_counts_conserve_rows(spark):
    rows = [(i, f"t{i % 4}", f"s{i % 2}") for i in range(20)]
    out = exact_dedup_survivor(_corpus(spark, rows))
    assert out.agg(F.sum("n_copies")).collect()[0][0] == 20
    assert out.count() == 4


# --- per-group hash reservoir -------------------------------------------

def _md5_rank_key(doc_id: int, salt: str = "rsv") -> int:
    return int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16)


def test_reservoir_sizes_and_membership(spark):
    rows = [(i, f"g{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = hash_reservoir_per_group(df, "grp", "doc_id", k=10).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["grp"], []).append(r)
    assert {g: len(v) for g, v in by_group.items()} == {
        "g0": 10, "g1": 10, "g2": 10
    }
    # membership replays in python: the k smallest by (md5 prefix, id)
    for g, members in by_group.items():
        ids = [i for i, gg in rows if gg == g]
        want = sorted(ids, key=lambda i: (_md5_rank_key(i), i))[:10]
        assert sorted(r["doc_id"] for r in members) == sorted(want)
        # sample_rank is the hash-order rank, usable to shrink to k'<k
        top3 = [r["doc_id"] for r in sorted(members, key=lambda r: r["sample_rank"])[:3]]
        assert top3 == want[:3]


def test_reservoir_stable_under_repartition(spark):
    rows = [(i, f"g{i % 2}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    a = {(r["grp"], r["doc_id"], r["sample_rank"])
         for r in hash_reservoir_per_group(df, "grp", "doc_id", k=7).collect()}
    b = {(r["grp"], r["doc_id"], r["sample_rank"])
         for r in hash_reservoir_per_group(
             df.repartition(13), "grp", "doc_id", k=7).collect()}
    assert a == b


def test_reservoir_small_group_returns_all(spark):
    df = spark.createDataFrame(
        [(1, "g"), (2, "g")], "doc_id bigint, grp string"
    )
    assert hash_reservoir_per_group(df, "grp", "doc_id", k=50).count() == 2


# --- deterministic shuffle shards ---------------------------------------

from mapreduce_join_comparison_spark.operators.sampling import shuffle_shards  # noqa: E402


def _md5_shuffle_key(doc_id: int, salt: str = "shuf") -> int:
    return int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16)


def test_shuffle_shards_python_replay(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 201)], "doc_id bigint")
    out = shuffle_shards(df, "doc_id", n_shards=4).collect()
    # every row assigned; shard = h % 4; pos = 1-based rank by (h, id)
    assert len(out) == 200
    by_shard: dict[int, list] = {}
    for r in out:
        assert r["shard_id"] == _md5_shuffle_key(r["doc_id"]) % 4
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard, members in by_shard.items():
        ids = [i for i in range(1, 201) if _md5_shuffle_key(i) % 4 == shard]
        want = sorted(ids, key=lambda i: (_md5_shuffle_key(i), i))
        got = [r["doc_id"] for r in sorted(members, key=lambda r: r["pos_in_shard"])]
        assert got == want
        # dense 1-based ranks within the shard
        assert sorted(r["pos_in_shard"] for r in members) == list(
            range(1, len(members) + 1)
        )


def test_shuffle_shards_stable_under_repartition_and_salt(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id bigint")
    a = {(r["doc_id"], r["shard_id"], r["pos_in_shard"])
         for r in shuffle_shards(df, "doc_id").collect()}
    b = {(r["doc_id"], r["shard_id"], r["pos_in_shard"])
         for r in shuffle_shards(df.repartition(17), "doc_id").collect()}
    assert a == b
    # a different salt yields a different permutation (fresh epoch order)
    c = {(r["doc_id"], r["shard_id"], r["pos_in_shard"])
         for r in shuffle_shards(df, "doc_id", salt="epoch2").collect()}
    assert a != c


# --- quality percentile prune -------------------------------------------

from mapreduce_join_comparison_spark.operators.text import (  # noqa: E402
    quality_percentile_prune,
    quality_score,
)


def test_quality_prune_threshold_replay(spark):
    # mixed-quality corpus: clean prose vs punctuation soup
    rows = []
    for i in range(1, 61):
        if i % 3 == 0:
            txt = "the quick brown fox jumps over the lazy dog " * 6
        elif i % 3 == 1:
            txt = "@@ ## !! ?? %% " * 10
        else:
            txt = "some words and a few of the tokens here " * 3
        rows.append((i, "en", txt))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    q = {
        r["doc_id"]: r["qm"]
        for r in df.select(
            "doc_id",
            F.round(quality_score("text") * 1000).cast("bigint").alias("qm"),
        ).collect()
    }
    # python replay of the integer threshold rule: smallest milli-score
    # whose cumulative count reaches 30% of n (ties at threshold kept)
    n = len(q)
    cum = 0
    thr = None
    for qm in sorted(set(q.values())):
        cum += sum(1 for v in q.values() if v == qm)
        if cum * 100 >= 30 * n:
            thr = qm
            break
    kept = quality_percentile_prune(df, drop_pct=30).collect()
    assert {r["doc_id"] for r in kept} == {d for d, v in q.items() if v >= thr}
    for r in kept:
        assert r["q_milli"] == q[r["doc_id"]]
    # the drop never exceeds the requested fraction
    assert len(kept) >= n - (30 * n) // 100


def test_quality_prune_separates_low_from_high(spark):
    rows = [(i, "en", "the quick brown fox jumps over the lazy dog " * 6)
            for i in range(1, 40)]
    rows += [(100 + i, "en", "!! ?? @@ " * 20) for i in range(1, 15)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    # all 14 junk docs share ONE milli-score bucket (identical text) at
    # ~26% of the corpus. drop_pct=25: the threshold lands ON that
    # bucket (cum 14 >= 13.25) and ties at the threshold are kept ->
    # nothing drops. drop_pct=30: the threshold passes it -> exactly
    # the junk drops (26% <= 30%), prose survives whole.
    kept_25 = {r["doc_id"]
               for r in quality_percentile_prune(df, drop_pct=25).collect()}
    assert kept_25 == {i for i, *_ in rows}
    kept = quality_percentile_prune(df, drop_pct=30).collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert kept_ids == set(range(1, 40))
    dropped = {i for i, *_ in rows} - kept_ids
    assert dropped == {100 + i for i in range(1, 15)}


# --- linear-interpolation resample --------------------------------------

from mapreduce_join_comparison_spark.operators.timeseries import (  # noqa: E402
    resample_interpolate,
)


_EPOCH0 = 1704067200  # 2024-01-01T00:00:00Z in epoch seconds


def _events(spark, rows):
    import datetime

    data = [
        (eid, datetime.datetime(2024, 1, 1, 0, 0, 0)
         + datetime.timedelta(seconds=sec), series, float(v))
        for eid, sec, series, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id bigint, ts timestamp, event_type string, value double"
    )


def test_interpolate_known_answer(spark):
    # 1-second bins; series 'a' observed at bins 0 (v=1.0) and 3 (v=4.0):
    # interior gap bins 1, 2 get the straight line 2.0, 3.0
    df = _events(spark, [(1, 0, "a", 1.0), (2, 3, "a", 4.0)])
    out = {
        int(r["bin_start_us"] // 1_000_000) - _EPOCH0: r["value_interp"]
        for r in resample_interpolate(df, bin_micros=1_000_000).collect()
    }
    assert out == {0: 1.0, 1: 2.0, 2: 3.0, 3: 4.0}


def test_interpolate_leading_null_and_locf_tail(spark):
    # series 'b' spans the global grid [0, 4] via series 'a'; 'b' is
    # observed only at bins 1 and 2 -> bin 0 NULL (before first obs),
    # bins 3-4 carry 7.0 forward (LOCF tail)
    df = _events(spark, [
        (1, 0, "a", 1.0), (2, 4, "a", 1.0),
        (3, 1, "b", 5.0), (4, 2, "b", 7.0),
    ])
    rows = resample_interpolate(df, bin_micros=1_000_000).collect()
    b = {int(r["bin_start_us"] // 1_000_000) - _EPOCH0: r["value_interp"]
         for r in rows if r["series"] == "b"}
    assert b == {0: None, 1: 5.0, 2: 7.0, 3: 7.0, 4: 7.0}


def test_interpolate_last_obs_in_bin_wins_and_thirds(spark):
    # two events land in bin 0 -> the later one (v=0.0) is the bin value;
    # gap of 3 bins to v=1.0 interpolates exact thirds in milli space
    df = _events(spark, [
        (1, 0, "a", 9.9), (2, 0, "a", 0.0), (3, 3, "a", 1.0),
    ])
    out = {int(r["bin_start_us"] // 1_000_000) - _EPOCH0: r["value_interp"]
           for r in resample_interpolate(df, bin_micros=1_000_000).collect()}
    assert out[0] == 0.0 and out[3] == 1.0
    assert abs(out[1] - 1000 / 3 / 1000) < 1e-12
    assert abs(out[2] - 2000 / 3 / 1000) < 1e-12


# --- product quantization ------------------------------------------------

from mapreduce_join_comparison_spark.operators.similarity import (  # noqa: E402
    pq_assign,
    pq_codebook,
)


def test_pq_assign_matches_numpy_reference(spark):
    import numpy as np

    dim, m, k, seed = 64, 4, 4, 11
    rng = np.random.RandomState(99)
    vecs = rng.randn(40, dim).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in pq_assign(df, dim=dim, m=m, k=k, seed=seed).collect()}
    cb = np.array(pq_codebook(dim, m, k, seed))  # (m, k, sub)
    sub = dim // m
    for i, v in enumerate(vecs):
        v64 = v.astype("float64")
        err = 0.0
        for j in range(m):
            sl = v64[j * sub:(j + 1) * sub]
            d = ((sl - cb[j]) ** 2).sum(axis=1)
            code = int(d.argmin())  # numpy argmin = first occurrence
            assert got[i][f"code{j}"] == code, (i, j)
            err += float(d.min())
        # numpy pairwise-sums; the operator folds sequentially — allow
        # only summation-order slack, nothing more
        assert abs(got[i]["recon_err"] - err) < 1e-9


def test_pq_assign_ties_break_to_lowest_code(spark):
    import numpy as np

    # craft a codebook where codewords 0 and 2 are IDENTICAL in every
    # subspace by seeding then overwriting is impossible through the
    # public API — instead pick the vector exactly between two
    # codewords of a 2-word codebook: equidistant -> code 0 must win
    dim, m, k, seed = 8, 2, 2, 5
    cb = pq_codebook(dim, m, k, seed)
    sub = dim // m
    mid = []
    for j in range(m):
        a = np.array(cb[j][0])
        b = np.array(cb[j][1])
        mid.extend(((a + b) / 2.0).tolist())
    df = spark.createDataFrame(
        [(0, [float(x) for x in mid])], "vec_id bigint, embedding array<float>"
    )
    (row,) = pq_assign(df, dim=dim, m=m, k=k, seed=seed).collect()
    # float32 storage of the midpoint can tip exact equality; assert
    # the tie rule only when the distances actually tie in float64
    v = np.array(mid, dtype="float32").astype("float64")
    for j in range(m):
        d0 = float(((v[j * sub:(j + 1) * sub] - np.array(cb[j][0])) ** 2).sum())
        d1 = float(((v[j * sub:(j + 1) * sub] - np.array(cb[j][1])) ** 2).sum())
        if d0 == d1:
            assert row[f"code{j}"] == 0
        else:
            assert row[f"code{j}"] == (0 if d0 < d1 else 1)
