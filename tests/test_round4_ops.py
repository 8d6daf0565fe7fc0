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
