"""Sampling (hash split, stratified) and TF-IDF operator tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)
from mapreduce_join_comparison_spark.operators.text import tfidf_top_terms


def test_hash_split_partitions_exactly(spark, tables):
    docs = tables["documents"]
    train, hold = hash_split(docs, "doc_id", train_pct=80, salt="s")
    n, nt, nh = docs.count(), train.count(), hold.count()
    assert nt + nh == n
    # disjoint by construction; verify anyway
    assert train.join(hold, "doc_id", "inner").count() == 0
    # roughly 80/20 (binomial over ~500 docs)
    assert 0.6 < nt / n < 0.95


def test_hash_split_deterministic_and_salt_sensitive(spark, tables):
    docs = tables["documents"]
    a1, _ = hash_split(docs, "doc_id", train_pct=50, salt="x")
    a2, _ = hash_split(docs, "doc_id", train_pct=50, salt="x")
    b1, _ = hash_split(docs, "doc_id", train_pct=50, salt="y")
    ids = lambda d: {r.doc_id for r in d.select("doc_id").collect()}  # noqa: E731
    assert ids(a1) == ids(a2)
    assert ids(a1) != ids(b1)


def test_stratified_sample_respects_strata(spark, tables):
    docs = tables["documents"]
    out = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.0}, seed=1)
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "de" not in langs
    n_en = docs.filter("lang = 'en'").count()
    assert out.filter("lang = 'en'").count() == n_en


def test_tfidf_known_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date date")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 'apple' tf=2/3, df=1 → tfidf = 2/3*ln(3); banana tf=1/3 df=2
    top1 = sorted(by_doc[1], key=lambda r: r.rnk)[0]
    assert top1.term == "apple"
    assert abs(top1.tfidf - round(2 / 3 * math.log(3), 6)) < 1e-9
    # every doc has ≤2 ranked terms, ranks are 1..k
    for rows in by_doc.values():
        assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))


def test_tfidf_no_python_udf_in_plan(spark, tables):
    plan = tfidf_top_terms(tables["documents"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stratified_hash_sample_deterministic(spark, tables):
    from mapreduce_join_comparison_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = tables["documents"]
    fractions = {"en": 0.5, "de": 0.25}
    a = stratified_hash_sample(docs, "lang", fractions, key_col="doc_id")
    b = stratified_hash_sample(docs, "lang", fractions, key_col="doc_id")
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # pure function of (key, salt): identical re-runs
    langs = {r["lang"] for r in a.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # strata without a fraction drop
    # per-stratum rates land near their targets (md5 buckets ~uniform)
    n_en_all = docs.filter("lang = 'en'").count()
    n_en = a.filter("lang = 'en'").count()
    assert abs(n_en / n_en_all - 0.5) < 0.1
    # a different salt decorrelates membership
    c = stratified_hash_sample(
        docs, "lang", fractions, key_col="doc_id", salt="other"
    )
    ids_c = sorted(r["doc_id"] for r in c.select("doc_id").collect())
    assert ids_c != ids_a


def test_sequence_packing_invariants(spark):
    from mapreduce_join_comparison_spark.pipeline import sequence_packing

    df = spark.createDataFrame(
        [(i, "w " * 100, "en") for i in range(1, 21)],
        "doc_id bigint, text string, lang string",
    )
    out = sequence_packing(df, budget=250, n_shards=2).collect()
    assert len(out) == 20
    by_stream = {}
    for r in out:
        by_stream.setdefault((r["lang"], r["shard"]), []).append(r)
    for rows in by_stream.values():
        rows.sort(key=lambda r: r["doc_id"])
        # offsets are a gapless cumsum in doc_id order within a stream
        expect = 0
        for r in rows:
            assert r["start_offset"] == expect
            assert r["pack_id"] == expect // 250
            expect += r["n_tokens"]
    # each 100-token doc starts in pack floor(offset/250): docs at
    # offsets 0,100,200 share pack 0, the 300-offset doc opens pack 1
    first = min(by_stream.values(), key=lambda rows: -len(rows))
    packs = [r["pack_id"] for r in sorted(first, key=lambda r: r["doc_id"])]
    assert packs[:4] == [0, 0, 0, 1]


def test_mix_rebalance_hits_target_ratios(spark, tables):
    from mapreduce_join_comparison_spark.operators.sampling import mix_rebalance

    docs = tables["documents"]
    targets = {"en": 0.5, "de": 0.25, "es": 0.25}
    out = mix_rebalance(docs, targets).collect()
    langs = {r["lang"] for r in out}
    assert langs <= set(targets)  # absent langs dropped

    kept = {}
    for r in out:
        kept[r["lang"]] = kept.get(r["lang"], 0) + r["n_tokens"]
    total = sum(kept.values())
    # post-filter token shares approximate the targets (md5-bucket
    # granularity + per-doc token quantization put a few % of noise on
    # a 500-doc corpus)
    for lang, t in targets.items():
        assert abs(kept[lang] / total - t) < 0.08, (lang, kept[lang] / total)

    # downsample-only: no stratum gains tokens
    orig = {
        r["lang"]: r["cur"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.expr(r"size(split(trim(text), '\\s+'))")).alias("cur"))
        .collect()
    }
    for lang in kept:
        assert kept[lang] <= orig[lang]

    # deterministic: same inputs, same membership
    again = mix_rebalance(docs, targets).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_stratified_hash_sample_half_up_thresholds(spark):
    """fraction × buckets landing exactly on .5 rounds HALF-UP, not
    Python's half-to-even: 0.45 × 10 = 4.5 must keep buckets 0–4
    (45 %), not 0–3 (40 %). Verified end-to-end with buckets=10 and a
    key set engineered to cover every bucket."""
    from mapreduce_join_comparison_spark.operators.sampling import (
        hash_bucket,
        stratified_hash_sample,
    )

    df = spark.createDataFrame(
        [(str(i), "en") for i in range(400)], "doc_id string, lang string"
    )
    out = stratified_hash_sample(
        df, "lang", {"en": 0.45}, key_col="doc_id", buckets=10, salt="h"
    )
    kept_buckets = {
        r.b
        for r in out.select(
            hash_bucket("doc_id", 10, "h").alias("b")
        ).distinct().collect()
    }
    assert kept_buckets == {0, 1, 2, 3, 4}, kept_buckets


def test_rebalance_keeps_null_keys(spark):
    """A NULL doc_id routes through the NUL sentinel (same contract as
    hash_split/shuffle_shards) instead of silently dropping: with
    keep_frac = 1 for its stratum, every row — including the NULL-keyed
    one — survives both rebalancers."""
    from mapreduce_join_comparison_spark.operators.sampling import (
        mix_rebalance,
        temperature_rebalance,
    )

    df = spark.createDataFrame(
        [("a", "en", "w w w"), (None, "en", "x x"), ("c", "en", "y")],
        "doc_id string, lang string, text string",
    )
    # single stratum → keep_frac is exactly 1.0 in both rules
    t = temperature_rebalance(df, alpha=0.5).collect()
    m = mix_rebalance(df, {"en": 1.0}).collect()
    assert len(t) == 3 and any(r.doc_id is None for r in t)
    assert len(m) == 3 and any(r.doc_id is None for r in m)
