"""Text analysis + dedup operators: known-answer literal tests and
corpus-level invariants (MinHash estimates track true Jaccard; SimHash
Hamming distance small for near-identical docs; LSH candidates ⊇
high-similarity pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators import dedup, text

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "The quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick  brown fox JUMPS over the lazy dog"),  # exact dup of 1 (normalized)
    (4, "completely different content about spark engines and parquet files"),
    (5, "der hund ist nicht die katze und der vogel"),    # German markers
    (6, "el que la casa es de madera y el perro"),        # Spanish markers
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_token_count(spark, docs):
    rows = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", text.token_count("text").alias("n")).collect()}
    assert rows[1] == 9
    assert rows[4] == 9


def test_stopword_and_punct(spark, docs):
    r = docs.filter("doc_id = 1").select(
        text.stopword_ratio("text").alias("sw"),
        text.punct_ratio("text").alias("p"),
    ).collect()[0]
    assert abs(r["sw"] - 2 / 9) < 1e-9  # "The", "the"
    assert r["p"] == 0.0


def test_lang_id(spark, docs):
    rows = {r["doc_id"]: r["l"] for r in docs.select(
        "doc_id", text.lang_id("text").alias("l")).collect()}
    assert rows[1] == "en"
    assert rows[5] == "de"
    assert rows[6] == "es"


def test_fingerprint_normalization(spark, docs):
    fp = {r["doc_id"]: r["f"] for r in docs.select(
        "doc_id", text.document_fingerprint("text").alias("f")).collect()}
    assert fp[1] == fp[3]  # case/whitespace-insensitive
    assert fp[1] != fp[2]


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 2, 4, 5, 6]  # 3 collapsed into 1
    copies = {r["doc_id"]: r["n_copies"] for r in out}
    assert copies[1] == 2


def test_ngram_jaccard_pairs(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()
    pairset = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert (1, 3) in pairset and pairset[(1, 3)] == 1.0
    assert (1, 2) in pairset and 0.4 < pairset[(1, 2)] < 1.0
    assert not any(4 in p for p in pairset)


def test_minhash_estimates_track_jaccard(spark, docs):
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.0).collect()}
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16,
                                            k=3).collect()}
    assert (1, 3) in est and est[(1, 3)] == 1.0
    if (1, 2) in est:
        assert abs(est[(1, 2)] - exact[(1, 2)]) < 0.35  # 64-hash variance
    # dissimilar docs must not surface as strong candidates
    assert est.get((1, 4), 0.0) < 0.2


def test_simhash_near_dups(spark, docs):
    sigs = {r["id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    ham_12 = bin(sigs[1] ^ sigs[2]).count("1")
    ham_14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham_12 < ham_14
    assert sigs[1] == sigs[3]
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    assert any(r["id_a"] == 1 and r["id_b"] == 3 for r in pairs)


def test_rolling_hash_fingerprint_robust_to_suffix(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra suffix tokens"), (3, "unrelated words here")],
        "doc_id bigint, text string",
    )
    fp = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", text.rolling_hash_fingerprint("text").alias("f")).collect()}
    assert fp[1] == fp[2]  # min window hash survives the suffix edit
    assert fp[1] != fp[3]


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "The analysis of the data shows that the results are consistent "
                "with the expected trends and the method is sound over many trials " * 2),
            (2, "#### !!!! @@@@ $$$$ %%%% ^^^^ &&&& ****"),
        ],
        "doc_id bigint, text string",
    )
    scores = {r["doc_id"]: r["q"] for r in df.select(
        "doc_id", text.quality_score("text").alias("q")).collect()}
    assert scores[1] > scores[2]
    assert 0.0 <= scores[2] < 0.5 < scores[1] <= 1.0


def test_redact_pii_known_answers(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org, call 555-123-4567, "
                "ssn 123-45-6789, host 10.0.0.1 end"),
            (2, "no pii here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        text.redact_pii("text").alias("clean"),
        *text.pii_counts("text"),
    ).collect()}
    assert out[1]["clean"] == (
        "mail <EMAIL> and <EMAIL>, call <PHONE>, ssn <SSN>, host <IP> end"
    )
    assert (out[1]["n_email"], out[1]["n_ssn"], out[1]["n_ip"],
            out[1]["n_phone"]) == (2, 1, 1, 1)
    assert out[2]["clean"] == "no pii here at all"
    assert sum([out[2]["n_email"], out[2]["n_ssn"], out[2]["n_ip"],
                out[2]["n_phone"]]) == 0


def test_contamination_check_known_overlap(spark):
    eval_set = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares many 3-grams with the eval doc
            (1, "we saw the quick brown fox jumps over the fence"),
            # shares none
            (2, "parquet row groups compress columnar data well"),
        ],
        "doc_id bigint, text string",
    )
    hits = {r["doc_id"]: r["overlap"] for r in dedup.contamination_check(
        corpus, eval_set, k=3, min_overlap=1).collect()}
    # "the quick brown", "quick brown fox", "brown fox jumps",
    # "fox jumps over", "jumps over the"
    assert hits == {1: 5}


def test_repetition_metrics_known_answers(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "spam spam spam spam"),
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in text.repetition_metrics(df).collect()}

    # doc 1: 9 tokens, 8 distinct ("the" x2), 8 distinct bigrams
    r = rows[1]
    assert r["n_tokens"] == 9
    # unrounded exact quotients: python's x/y is the same IEEE double
    assert r["distinct_ratio"] == 8 / 9
    assert r["top_token_frac"] == 2 / 9
    assert r["top_bigram_frac"] == 0.125
    assert r["keep"] is False  # 0.125 > 0.12 bigram threshold

    # doc 2: degenerate loop — 1 distinct token, "spam spam" x3 of 3
    r = rows[2]
    assert r["n_tokens"] == 4
    assert r["distinct_ratio"] == 0.25
    assert r["top_token_frac"] == 1.0
    assert r["top_bigram_frac"] == 1.0
    assert r["keep"] is False

    # doc 3: all-distinct healthy text passes both thresholds
    r = rows[3]
    assert r["distinct_ratio"] == 1.0
    assert r["top_bigram_frac"] == 1 / 9
    assert r["keep"] is True


def test_data_mix_report_known_answers(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three", "en", "web"),
            (2, "four five", "en", "web"),
            (3, "sechs sieben acht", "de", "web"),
            (4, "neuf dix", "fr", "books"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    out = {(r["lang"], r["source"]): r for r in text.data_mix_report(df).collect()}
    assert out[("en", "web")]["n_docs"] == 2
    assert out[("en", "web")]["n_tokens"] == 5
    assert out[("de", "web")]["n_tokens"] == 3
    assert out[("fr", "books")]["n_tokens"] == 2
    assert abs(out[("en", "web")]["token_share"] - 0.5) < 1e-9
    assert abs(sum(r["token_share"] for r in out.values()) - 1.0) < 1e-6


def test_incremental_minhash_flags_new_dups_only(spark, docs):
    # corpus = docs 1,4,5,6 (indexed once); batch = docs 2,3
    corpus = docs.filter("doc_id IN (1, 4, 5, 6)")
    batch = docs.filter("doc_id IN (2, 3)")
    index = dedup.minhash_signatures(corpus, num_hashes=16, k=3, seed=42).select(
        F.col("id").alias("doc_id"), "signature"
    )
    out = dedup.incremental_minhash_dedup(
        batch, index, num_hashes=16, bands=4, k=3, seed=42
    ).collect()
    pairs = {(r["new_id"], r["corpus_id"]): r["est_jaccard"] for r in out}
    # every pair is new-vs-corpus: left side only batch ids, right only corpus ids
    assert all(n in (2, 3) and c in (1, 4, 5, 6) for n, c in pairs)
    # doc 3 is doc 1 up to case/whitespace -> identical signature, est 1.0
    assert pairs[(3, 1)] == 1.0
    # doc 2 (near-dup of 1) collides on some band with high agreement
    assert pairs.get((2, 1), 0.0) >= 0.5


def test_chunk_windows_known_answers(spark):
    df = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(100))),  # 100 tokens
         (2, "only three tokens")],
        "doc_id bigint, text string",
    )
    out = text.chunk_windows(df, window=64, stride=48).collect()
    chunks = {}
    for r in out:
        chunks[(r["doc_id"], r["chunk_idx"])] = r
    # doc 1: chunks at offsets 0 and 48 -> 2 chunks, second is 52 tokens
    assert {(d, i) for d, i in chunks if d == 1} == {(1, 0), (1, 1)}
    assert chunks[(1, 0)]["chunk_tokens"] == 64
    assert chunks[(1, 0)]["chunk_text"].startswith("0 1 2 ")
    assert chunks[(1, 1)]["chunk_tokens"] == 52
    assert chunks[(1, 1)]["chunk_text"].startswith("48 49 ")
    assert chunks[(1, 1)]["chunk_text"].endswith(" 99")
    # short doc: exactly one (truncated) chunk
    assert {(d, i) for d, i in chunks if d == 2} == {(2, 0)}
    assert chunks[(2, 0)]["chunk_tokens"] == 3
    # overlap property: chunk 1 begins inside chunk 0's token range
    assert "48" in chunks[(1, 0)]["chunk_text"].split()


# ------------------------------------------------- prefix-filter jaccard


def test_prefix_filter_equals_naive_on_corpus(spark, tables):
    """The AllPairs/PPJoin prefix filter must lose NOTHING: identical
    output to the every-shared-shingle naive plan at the same
    threshold, on the real corpus."""
    from mapreduce_join_comparison_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = tables["documents"]
    naive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(
            docs, k=3, threshold=0.3
        ).collect()
    }
    assert fast == naive
    assert len(fast) > 0  # the corpus does contain near-dups


def test_prefix_filter_handles_identical_and_disjoint(spark):
    from mapreduce_join_comparison_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),      # identical
        (3, "one two three four five six seven eight"),  # disjoint
        (4, "alpha beta gamma delta epsilon eta"),       # near-dup of 1/2
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_jaccard_pairs(
            df, k=3, threshold=0.3
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert (1, 3) not in got and (2, 3) not in got and (3, 4) not in got
    # 6 tokens -> 4 shingles; docs 1 and 4 share 3 of 5 distinct: J=0.6
    assert abs(got[(1, 4)] - 0.6) < 1e-12
    assert got[(1, 4)] == got[(2, 4)]


def _jaccard_brute(texts: dict, k: int, t: float) -> set:
    """Exact Jaccard >= t pairs by brute force over k-word shingles."""
    def sh(text):
        w = text.strip().lower().split()
        if len(w) < k:
            return {" ".join(w)}
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}

    shs = {i: sh(t_) for i, t_ in texts.items()}
    ids = sorted(texts)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(shs[a] & shs[b])
            union = len(shs[a] | shs[b])
            if union and inter / union >= t:
                out.add((a, b))
    return out


def _hot_cluster_corpus(rng_mod: int = 7):
    """60 near-copies of one base doc (every pair J >> 0.3) plus 40
    unrelated docs — the pathological cluster that collapses every
    prefix shingle's posting list / LSH bucket to the whole cluster."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu").split()
    texts = {}
    for i in range(60):
        words = list(base)
        words[i % len(words)] = f"mut{i}"  # ~1-word mutation
        texts[i] = " ".join(words)
    for i in range(40):
        texts[100 + i] = " ".join(
            f"w{(i * 13 + j * (rng_mod + i % 5)) % 997}" for j in range(26)
        )
    return texts


def test_prefix_filter_hot_sid_guard_exact(spark):
    """The hot-shingle salt-split must be exact enumeration: with a
    tiny cap (many triangle cells) the pair set equals brute force AND
    the effectively-unguarded form (huge cap)."""
    from mapreduce_join_comparison_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    texts = _hot_cluster_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    expected = _jaccard_brute(texts, k=3, t=0.3)
    assert len(expected) > 1500  # the 60-clique alone is 1770 pairs

    def pairs(cap):
        return {
            (r["id_a"], r["id_b"])
            for r in prefix_filter_jaccard_pairs(
                df, k=3, threshold=0.3, sid_cap=cap
            ).collect()
        }

    assert pairs(7) == expected      # g = ceil(60/7) = 9 groups, 45 cells
    assert pairs(10**9) == expected  # unguarded baseline


def test_minhash_lsh_hot_bucket_guard_exact(spark):
    """Triangle-split LSH candidates must equal the unguarded form's
    pair set exactly (same bands, same signatures — the split only
    redistributes the bucket self-join)."""
    from mapreduce_join_comparison_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    texts = _hot_cluster_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )

    def pairs(cap):
        return {
            (r["id_a"], r["id_b"], round(r["est_jaccard"], 9))
            for r in minhash_lsh_pairs(df, bucket_cap=cap).collect()
        }

    guarded, unguarded = pairs(7), pairs(10**9)
    assert guarded == unguarded
    assert len(guarded) >= 1000  # most clique pairs collide on a band


def test_incremental_minhash_hot_bucket_guard_exact(spark):
    """Bipartite grid split: batch-vs-corpus candidates with a hot
    cluster straddling both sides must match the unguarded join."""
    from mapreduce_join_comparison_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    texts = _hot_cluster_corpus()
    new = spark.createDataFrame(
        [(i, t) for i, t in texts.items() if i % 4 == 0],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(i, t) for i, t in texts.items() if i % 4 != 0],
        "doc_id long, text string",
    )
    idx = minhash_signatures(corpus).withColumnRenamed("id", "doc_id")

    def pairs(cap):
        return {
            (r["new_id"], r["corpus_id"], round(r["est_jaccard"], 9))
            for r in incremental_minhash_dedup(
                new, idx, bucket_cap=cap
            ).collect()
        }

    guarded, unguarded = pairs(5), pairs(10**9)
    assert guarded == unguarded
    assert len(guarded) > 300
