"""Property-based checks for the pipeline operators whose Spark
implementations use non-obvious constructions (sorted-array run folds,
sharded cumsum, dense-grid LOCF): random inputs must match a direct
Python reference implementation.
"""

from __future__ import annotations

import pytest

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_join_comparison_spark.operators.text import repetition_metrics
from mapreduce_join_comparison_spark.operators.timeseries import resample_locf
from mapreduce_join_comparison_spark.pipeline import sequence_packing

TOKEN = st.sampled_from(["a", "b", "ab", "the", "x1", "Ü"])
DOC = st.lists(TOKEN, min_size=1, max_size=12).map(" ".join)


@given(texts=st.lists(DOC, min_size=1, max_size=8))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_metrics_match_counter_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    for i, text in enumerate(texts):
        toks = text.lower().split()
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        r = got[i]
        assert r["n_tokens"] == len(toks)
        # unrounded exact quotients: python's x/y is the same IEEE double
        assert r["distinct_ratio"] == len(set(toks)) / len(toks)
        assert r["top_token_frac"] == (
            max(collections.Counter(toks).values()) / len(toks)
        )
        expect_bi = (
            max(collections.Counter(bigrams).values()) / len(bigrams)
            if bigrams
            else 0.0
        )
        assert r["top_bigram_frac"] == expect_bi


@given(
    lens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=12),
    budget=st.integers(min_value=5, max_value=60),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sequence_packing_matches_serial_reference(spark, lens, budget):
    df = spark.createDataFrame(
        [(i, "t " * n, "en") for i, n in enumerate(lens)],
        "doc_id bigint, text string, lang string",
    )
    out = sequence_packing(df, budget=budget, n_shards=2)
    rows = sorted(out.collect(), key=lambda r: (r["shard"], r["doc_id"]))
    offsets: dict = {}
    for r in rows:
        key = (r["lang"], r["shard"])
        expect = offsets.get(key, 0)
        assert r["start_offset"] == expect
        assert r["pack_id"] == expect // budget
        offsets[key] = expect + r["n_tokens"]


EVENT = st.tuples(
    st.integers(min_value=0, max_value=300),   # seconds offset
    st.sampled_from(["a", "b"]),               # series
    st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
)


@given(events=st.lists(EVENT, min_size=1, max_size=20))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_resample_locf_matches_serial_reference(spark, events):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=sec), series, float(v))
        for i, (sec, series, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    bin_us = 60_000_000
    got = {
        (r["series"], r["bin_start_us"]): (r["n_events"], r["value_locf"])
        for r in resample_locf(df, bin_micros=bin_us).collect()
    }

    # serial reference
    bins = [sec // 60 for sec, _, _ in events]
    lo, hi = min(bins), max(bins)
    per_bin: dict = collections.defaultdict(list)
    for i, (sec, series, v) in enumerate(events):
        per_bin[(series, sec // 60)].append((sec, i, float(v)))
    all_series = {s for _, s, _ in events}
    assert len(got) == len(all_series) * (hi - lo + 1)
    base_us = int(base.timestamp()) * 1_000_000  # tz-naive treated as UTC
    for series in sorted(all_series):
        locf = None
        for b in range(lo, hi + 1):
            obs = per_bin.get((series, b), [])
            if obs:
                locf = max(obs)[2]  # last by (sec, event_id)
            n, v = got[(series, base_us + b * bin_us)]
            assert n == len(obs)
            expect = None if locf is None else round(locf, 4)
            if v is None or expect is None:
                assert v == expect
            else:
                assert abs(v - expect) < 1e-9


@given(texts=st.lists(DOC, min_size=1, max_size=8))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_classifier_score_matches_md5_reference(spark, texts):
    """Random corpora: the JVM fold must equal a direct python replay
    of bucket → Knuth weight → milli margin."""
    import hashlib

    from mapreduce_join_comparison_spark.operators.text import (
        CLASSIFIER_BUCKETS,
        CLASSIFIER_KNUTH,
        classifier_score,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in classifier_score(df).collect()}
    for i, text in enumerate(texts):
        toks = text.lower().split()

        def w(t):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            return ((h % CLASSIFIER_BUCKETS) * CLASSIFIER_KNUTH) % 2001 - 1000

        margin = sum(w(t) for t in toks)
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["score"] == margin / (len(toks) * 1000.0)
        assert r["keep"] == (margin >= 0)


@given(texts=st.lists(DOC, min_size=1, max_size=8))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# soak lane (round 11): full-size property sweep — a smaller default-
# lane twin (or the catalog oracle) keeps this property covered.
@pytest.mark.soak
def test_bigram_fluency_matches_counter_reference(spark, texts):
    """Random corpora: transition milli-scores and known flags must
    equal a Counter-based python replay (floor division, corpus-wide
    counts)."""
    from mapreduce_join_comparison_spark.operators.text import bigram_fluency

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in bigram_fluency(df).collect()}
    all_bigrams = collections.Counter()
    prefix = collections.Counter()
    per_doc: dict[int, list[str]] = {}
    for i, text in enumerate(texts):
        toks = text.lower().split()
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        per_doc[i] = bgs
        all_bigrams.update(bgs)
        prefix.update(bg.split(" ")[0] for bg in bgs)
    for i, bgs in per_doc.items():
        if not bgs:
            assert i not in got  # no bigrams → no output row
            continue
        tm = sum((all_bigrams[bg] * 1000) // prefix[bg.split(" ")[0]]
                 for bg in bgs)
        known = sum(1 for bg in bgs if all_bigrams[bg] >= 2)
        r = got[i]
        assert r["n_bigrams"] == len(bgs)
        assert r["fluency"] == tm / (len(bgs) * 1000.0)
        assert r["known_frac"] == known / len(bgs)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3),                      # key
                  st.sampled_from(["a", "b", "c"]),        # attr
                  st.integers(0, 50)),                     # version
        min_size=1, max_size=30, unique=True,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_matches_python_replay(spark, rows):
    """Random change logs: interval build must equal a direct replay
    (sort, compress runs, lead intervals). Tiebreak is a synthetic
    unique id so duplicate (key, version) pairs stay deterministic."""
    from mapreduce_join_comparison_spark.operators.cdc import scd2_history

    data = [(k, a, v, i) for i, (k, a, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, a string, v int, t int")
    got = sorted(
        ((r["k"], r["a"], r["valid_from"], r["valid_to"], r["version"],
          r["is_current"]) for r in scd2_history(
            df, key="k", attr="a", version_col="v", tiebreak="t"
        ).collect())
    )
    expect = []
    bykey: dict[int, list] = collections.defaultdict(list)
    for k, a, v, t in data:
        bykey[k].append((v, t, a))
    for k, log in bykey.items():
        log.sort()
        changes = [e for i, e in enumerate(log)
                   if i == 0 or e[2] != log[i - 1][2]]
        for j, (v, t, a) in enumerate(changes):
            nxt = changes[j + 1][0] if j + 1 < len(changes) else None
            expect.append((k, a, v, nxt, j + 1, nxt is None))
    assert got == sorted(expect)


def _md5_32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_shingles(text: str, k: int) -> list[str]:
    toks = text.lower().split()
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


@given(texts=st.lists(DOC, min_size=2, max_size=8))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_containment_matches_python_reference(spark, texts):
    """Random corpora: the bucket-local pair generation must equal the
    direct python computation (distinct shingle hashes, df cap, shared
    counts, containment vs |A|)."""
    from mapreduce_join_comparison_spark.operators.dedup import (
        substring_containment_pairs,
    )

    K, MAX_DF, MIN_SHARED = 3, 4, 1
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["shared_ngrams"], r["containment"])
        for r in substring_containment_pairs(
            df, k=K, max_df=MAX_DF, min_shared=MIN_SHARED
        ).collect()
    )
    by_doc = {i: {_md5_32(s) for s in _py_shingles(t, K)}
              for i, t in enumerate(texts)}
    dfreq: dict[int, int] = collections.Counter(
        h for hs in by_doc.values() for h in hs
    )
    expect = []
    for a in by_doc:
        for b in by_doc:
            if a >= b:
                continue
            shared = sum(
                1 for h in by_doc[a] & by_doc[b] if dfreq[h] <= MAX_DF
            )
            if shared >= MIN_SHARED:
                expect.append(
                    (a, b, shared, shared / len(by_doc[a]))
                )
    assert got == sorted(expect)


@given(texts=st.lists(DOC, min_size=2, max_size=8))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_boilerplate_removal_matches_python_reference(spark, texts):
    """Random corpora: positional cover + rewrite must equal a direct
    python replay (distinct-shingle df, covered positions, surviving
    tokens re-joined)."""
    from mapreduce_join_comparison_spark.operators.text import (
        remove_boilerplate,
    )

    K, MIN_DOCS = 3, 2
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in remove_boilerplate(df, k=K, min_docs=MIN_DOCS).collect()}
    dfreq = collections.Counter(
        h for t in texts
        for h in {_md5_32(s) for s in _py_shingles(t, K)}
    )
    boiler = {h for h, c in dfreq.items() if c >= MIN_DOCS}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        n = len(toks)
        covered: set[int] = set()
        sh = _py_shingles(t, K)
        for p, s in enumerate(sh, start=1):
            if _md5_32(s) in boiler:
                covered.update(range(p, min(p + K - 1, n) + 1))
        kept = [toks[j - 1] for j in range(1, n + 1) if j not in covered]
        assert got[i] == (" ".join(kept), n, n - len(kept))


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 1),                      # cell-ish direction
            st.floats(0.01, 1.0, allow_nan=False),  # magnitude
            st.floats(-0.3, 0.3, allow_nan=False),  # off-axis noise
        ),
        min_size=2, max_size=12,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_semdedup_matches_python_replay(spark, vecs):
    """Random 2-d vectors vs a python replay of the full SemDeDup rule:
    top-1 cell by dot (cell-index tiebreak), within-cell pairs at
    ROUNDED cosine ≥ tau (HALF_UP on the shortest decimal repr — the
    exact Spark semantics), dropped = higher id, keeper = smallest
    qualifying lower id."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from mapreduce_join_comparison_spark.operators.dedup import (
        semdedup_dropped,
    )

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (i, [mag if ax == 0 else noise, mag if ax == 1 else noise])
        for i, (ax, mag, noise) in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    tau = 0.9
    got = sorted(
        (r["vec_id"], r["cell"], r["dup_of"], r["cosine"])
        for r in semdedup_dropped(df, cents, tau=tau).collect()
    )

    def spark_round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"),
                                      rounding=ROUND_HALF_UP)
        )

    def cell_of(v):
        dots = [sum(a * b for a, b in zip(v, c)) for c in cents]
        best = max(dots)
        return dots.index(best)  # first index wins ties, like the sort

    def cos(u, v):
        dot = sum(a * b for a, b in zip(u, v))
        nu = math.sqrt(sum(a * a for a in u))
        nv = math.sqrt(sum(a * a for a in v))
        return dot / (nu * nv)

    cells = {i: cell_of(v) for i, v in rows}
    expect = []
    for i, vi in rows:
        hits = [
            (j, spark_round6(cos(vj, vi)))
            for j, vj in rows
            if j < i and cells[j] == cells[i]
            and spark_round6(cos(vj, vi)) >= tau
        ]
        if hits:
            j, c = min(hits)
            expect.append((i, cells[i], j, c))
    assert got == sorted(expect)


@given(events=st.lists(EVENT, min_size=1, max_size=20))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_resample_interpolate_matches_serial_reference(spark, events):
    from datetime import datetime, timedelta

    from mapreduce_join_comparison_spark.operators.timeseries import (
        resample_interpolate,
    )

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=sec), series, float(v))
        for i, (sec, series, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    )
    bin_us = 60_000_000
    got = {
        (r["series"], r["bin_start_us"]): (r["n_events"], r["value_interp"])
        for r in resample_interpolate(df, bin_micros=bin_us).collect()
    }

    # serial reference: last-in-bin observation quantized to milli,
    # straight line between observed bins, LOCF tail, leading None
    per_bin: dict = collections.defaultdict(list)
    for i, (sec, series, v) in enumerate(events):
        per_bin[(series, sec // 60)].append((sec, i, float(v)))
    bins = [sec // 60 for sec, _, _ in events]
    lo, hi = min(bins), max(bins)
    all_series = {s for _, s, _ in events}
    assert len(got) == len(all_series) * (hi - lo + 1)
    base_us = int(base.timestamp()) * 1_000_000
    for series in sorted(all_series):
        obs_bins = sorted(
            b for (s, b) in per_bin if s == series
        )
        # milli quantization replays Spark's F.round (HALF_UP on the
        # repr) — python round() is half-even, so go via Decimal
        from decimal import ROUND_HALF_UP, Decimal

        def vm_of(b):
            v = max(per_bin[(series, b)])[2]
            return int(
                Decimal(repr(v * 1000)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )

        for b in range(lo, hi + 1):
            n, v = got[(series, base_us + b * bin_us)]
            assert n == len(per_bin.get((series, b), []))
            prevs = [x for x in obs_bins if x <= b]
            nexts = [x for x in obs_bins if x >= b]
            if not prevs:
                expect = None
            elif not nexts:
                expect = vm_of(prevs[-1]) / 1000.0
            else:
                b0, b1 = prevs[-1], nexts[0]
                vm0, vm1 = vm_of(b0), vm_of(b1)
                if b1 <= b0:
                    expect = float(vm0) / 1000.0
                else:
                    expect = (vm0 + ((vm1 - vm0) * (b - b0)) / (b1 - b0)) / 1000.0
            if v is None or expect is None:
                assert v == expect, (series, b, v, expect)
            else:
                assert v == expect, (series, b, v, expect)
