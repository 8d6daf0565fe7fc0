"""Text analysis for training-data pipelines (scale extension; north
star per SURVEY.md §7.4): tokenization, quality scoring, language ID,
document fingerprinting, shingling.

All hot-path expressions are JVM-side builtins (split / higher-order
array functions / md5) inside whole-stage codegen — no Python UDFs — so
the same code runs unchanged over 100 TB of documents: narrow
(per-row) transforms, no shuffle at all unless the caller aggregates.

Deterministic hashing convention: ``md5_hash32`` (first 8 hex chars of
md5 → int) is used wherever a test oracle must reproduce the hash in
another engine; xxhash64 (faster, JVM-only) is used where parity isn't
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"
# BPE-ish subword split: letters / digits / single punctuation.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = (
    "the a an of and to in is it that for on as with by this at from or be".split()
)

# tiny per-language marker lexicons for the n-gram/lexicon heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "es": ("el", "la", "que", "de", "es"),
    "fr": ("le", "la", "et", "est", "que"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_PATTERN)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-regex token count — a cheap proxy for BPE token counts:
    maximal letter runs + digit runs + individual punctuation marks
    (RE2-compatible pattern, so any engine reproduces it)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), F.lit(0))
    ).cast("long")


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (punct / F.greatest(F.length(c), F.lit(1))).cast("double")


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (total / F.greatest(F.size(toks), F.lit(1))).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: rewards moderate length,
    healthy stopword presence, low punctuation density, plausible mean
    word length. Deterministic arithmetic (SQL-oracle-able)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 5.0)
    mtl = mean_token_len(c)
    wordlen_score = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return ((len_score + sw_score + punct_pen + wordlen_score) / 4.0).cast("double")


def quality_percentile_prune(
    df: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id", "lang"),
    drop_pct: int = 30,
) -> DataFrame:
    """Drop the lowest-quality ``drop_pct`` percent of the corpus by
    quality-score percentile — the "keep the top X% by classifier
    score" pruning step of a training-data pipeline.

    The percentile threshold is computed EXACTLY without a global sort
    or a collect-all ``percentile()`` aggregate (both scale hazards):
    scores quantize to integer milli-units (≤ 1001 distinct values in
    [0, 1000]), so a groupBy histogram is a BOUNDED aggregate; the
    threshold is the smallest milli-score whose cumulative count
    reaches ``drop_pct``% (integer arithmetic — ``cum·100 ≥ pct·n`` —
    so both engines pick the identical bucket), found with a window
    over ≤ 1001 rows and broadcast back as a single-row join.

    Rows AT the threshold bucket are kept (the drop is ≤ drop_pct%).
    Plan: one narrow scoring pass feeding a bounded-cardinality
    shuffle, a tiny window, and a broadcast filter over a second
    narrow scan — nothing grows with corpus size except the two scans.
    """
    from pyspark.sql.window import Window

    qm = F.round(quality_score(text_col) * 1000).cast("bigint")
    scored = df.select(*keep_cols, qm.alias("q_milli"))
    hist = scored.groupBy("q_milli").agg(F.count(F.lit(1)).alias("_c"))
    w_cum = Window.orderBy("q_milli").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "q_milli",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(Window.partitionBy()).alias("_n"),
    )
    thr = (
        cum.filter(F.col("_cum") * 100 >= F.lit(drop_pct) * F.col("_n"))
        .agg(F.min("q_milli").alias("_q_thr"))
    )
    return (
        # bounded: single-row threshold scalar
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("q_milli") >= F.col("_q_thr"))
        .select(*keep_cols, "q_milli")
    )


def lang_id(col: Column | str) -> Column:
    """Marker-lexicon language ID: argmax over per-language marker-token
    hit counts; 'und' when nothing matches. Ties break by language code
    order (deterministic).

    Built as ``greatest`` + a flat when-chain so each hit-count
    expression appears ~2× (a nested best-so-far fold duplicates them
    exponentially). For feature *pipelines* prefer ``text_features``,
    which materializes hit counts as columns first."""
    toks_lower = F.transform(tokens(col), lambda t: F.lower(t))
    scores = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[code]])
        hits = F.size(F.filter(toks_lower, lambda t: F.array_contains(markers, t)))
        scores.append((code, hits))
    best_hits = F.greatest(*[h for _, h in scores]) if len(scores) > 1 else scores[0][1]
    out = F.lit("und")
    for code, hits in reversed(scores):
        out = F.when(hits == best_hits, F.lit(code)).otherwise(out)
    return F.when(best_hits > 0, out).otherwise(F.lit("und"))


def md5_hash32(col: Column) -> Column:
    """Deterministic 32-bit hash reproducible in any engine with md5:
    int(md5(x)[:8], 16). Used for shingle/token hashing under test
    oracles."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def document_fingerprint(col: Column | str) -> Column:
    """Content fingerprint over normalized text (lowercased,
    whitespace-collapsed): md5 hex. Equal fingerprint ⇔ equal normalized
    content — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def rolling_hash_fingerprint(col: Column | str, window: int = 4) -> Column:
    """Winnowing-style fingerprint: min over rolling token-window hashes
    — robust to local edits (same minimum survives most changes).
    Built from higher-order array functions, no UDF."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    n = F.size(toks)
    # same shifted-zip construction as `shingles` (one slice per shift,
    # not one per window — the per-window slice form is O(n²) per row)
    z = toks
    for j in range(2, window + 1):
        shifted = F.slice(toks, j, F.greatest(n - j + 1, F.lit(0)))
        z = F.zip_with(z, shifted, lambda a, b: F.concat_ws(" ", a, b))
    window_hashes = F.transform(
        F.slice(z, 1, F.greatest(n - window + 1, F.lit(1))),
        lambda w: md5_hash32(w),
    )
    return F.array_min(window_hashes).cast("bigint")


# PII patterns: restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB oracles) — char classes, bounded
# repetition, \b; no lookaround/backrefs. Order matters: email before
# phone/IP so its digit-bearing local parts are consumed first, SSN
# (3-2-4) before phone (3-3-4).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
]


def pii_counts(col: Column | str) -> list[Column]:
    """Per-category PII match counts (aliased n_<category>) — RAW
    pattern occurrences on the unredacted text, each category scanned
    independently. Where categories overlap (an SSN-shaped digit run
    inside an email local part), counts can exceed what ``redact_pii``
    actually replaces, because redaction consumes text in chained
    order (email first) — the audit answers "how much PII-shaped
    content exists", not "how many replacements were made". Narrow
    projection, JVM regex, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        .cast("int").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its category token (<EMAIL>,
    <SSN>, <IP>, <PHONE>) — the standard pre-training scrub pass.
    Chained regexp_replace, one pass per category; all JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (array<string>) — input to Jaccard /
    MinHash dedup.

    Built as a zip of k-1 SHIFTED copies of the token array
    (``zip_with(toks, slice(toks, j, ...), concat_ws)`` chained), so
    each row does k-1 slices total. The obvious
    ``transform(sequence(1, n-k+1), i -> slice(toks, i, k))`` form
    slices once PER SHINGLE — O(n²) array copies per row in
    interpreted (non-codegen) higher-order-function eval; measured
    ~30× slower on 54-token docs. Shingles shorter than k at the tail
    never appear (slice to n-k+1), matching the oracle SQL; docs with
    < k tokens yield one shingle of all their tokens (concat_ws skips
    the null padding zip_with adds to the short side).
    """
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    n = F.size(toks)
    z = toks
    for j in range(2, k + 1):
        shifted = F.slice(toks, j, F.greatest(n - j + 1, F.lit(0)))
        z = F.zip_with(z, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(F.slice(z, 1, F.greatest(n - k + 1, F.lit(1))))


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_distinct_ratio: float = 0.3, max_top_bigram_frac: float = 0.12,
) -> DataFrame:
    """Gopher-style intra-document repetition metrics + keep flag —
    the standard pre-training filter for boilerplate / degenerate
    loops (Rae et al. 2021 §A1.1, adapted to token granularity since
    the corpus is single-line text):

    - ``distinct_ratio``   distinct tokens / total tokens
    - ``top_token_frac``   occurrences of the most frequent token / n
    - ``top_bigram_frac``  occurrences of the most frequent bigram /
      bigram count
    - ``keep``             distinct_ratio ≥ τ₁ AND top_bigram_frac ≤ τ₂

    Plan shape: FULLY NARROW — no explode, no join; the only possible
    exchange is ``fan_out``'s local-mode repartition (a single-file
    scan would otherwise run every interpreted fold on one core —
    measured 8×; a no-op on any multi-split source at scale). The
    max multiplicity of a term list is the longest equal-run in its
    sorted form, computed per-row by a JVM-side ``aggregate`` fold
    (struct state: previous term / current run / best run) inside
    whole-stage codegen. The earlier explode→(id, term) partial-agg
    formulation was correct but paid 4 shuffles of the exploded corpus
    (~2 s at sf0.1); this form is a pure projection — at 100 TB it
    scales with scan bandwidth alone. Bigrams use the same shifted-zip
    construction as ``shingles``.
    """
    from ..sources.io import fan_out

    df = fan_out(df)
    toks_low = F.transform(tokens(text_col), lambda t: F.lower(t))
    n = F.size(toks_low)
    bigrams = F.slice(
        F.zip_with(
            toks_low,
            F.slice(toks_low, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        1,
        F.greatest(n - 1, F.lit(0)),
    )

    def max_run(arr: Column) -> Column:
        """Longest equal-run in sort_array(arr) = max multiplicity."""
        state = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

        def step(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(F.sort_array(arr), state, step, lambda acc: acc["best"])

    base = df.select(
        F.col(id_col),
        n.alias("_n"),
        F.size(F.array_distinct(toks_low)).alias("_n_distinct"),
        max_run(toks_low).alias("_top_cnt"),
        F.size(bigrams).alias("_n_bi"),
        max_run(bigrams).alias("_top_bi_cnt"),
    )
    # int/int quotients are bit-identical across engines — and must NOT
    # be rounded: these exact rationals land on decimal half-boundaries
    # (e.g. 29/80 = 0.3625) where Spark rounds the shortest decimal
    # string and DuckDB rounds the binary value, disagreeing by 1e-6
    distinct_ratio = F.col("_n_distinct") / F.col("_n")
    top_token_frac = F.col("_top_cnt") / F.col("_n")
    top_bigram_frac = F.coalesce(
        F.when(F.col("_n_bi") > 0, F.col("_top_bi_cnt") / F.col("_n_bi")),
        F.lit(0.0),
    )
    return base.select(
        id_col,
        F.col("_n").cast("long").alias("n_tokens"),
        distinct_ratio.cast("double").alias("distinct_ratio"),
        top_token_frac.cast("double").alias("top_token_frac"),
        top_bigram_frac.cast("double").alias("top_bigram_frac"),
        (
            (distinct_ratio >= F.lit(min_distinct_ratio))
            & (top_bigram_frac <= F.lit(max_top_bigram_frac))
        ).alias("keep"),
    )


def chunk_windows(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token windows — the
    pre-embedding chunking step of a retrieval pipeline: chunks start
    at offsets 0, stride, 2·stride, …; the last chunk begins at the
    final stride position that still adds new tokens, so
    n_chunks = 1 + max(0, ceil((n − window) / stride)).

    Fully narrow: tokenize once, explode a per-row index sequence,
    slice the token array per index. Returns (id, chunk_idx,
    chunk_tokens, chunk_text).
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # the n_chunks formula's "last chunk still adds new tokens"
        # guarantee holds only for overlapping-or-adjacent windows; a
        # gap stride would emit phantom EMPTY chunks past the text
        raise ValueError(
            f"stride ({stride}) must not exceed window ({window})"
        )
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n - F.lit(window)) / F.lit(stride)).cast("int")
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_idx") * F.lit(stride) + F.lit(1), window
    )
    return base.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def data_mix_report(
    df: DataFrame,
    lang_col: str = "lang",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token budget per (lang, source) stratum with each stratum's
    share of the total — the data-mix planning report a pretraining
    pipeline runs before sampling weights are chosen.

    One shuffle: tokens are counted per-row (narrow), partial-agg
    collapses map-side, and the share is a window over the *aggregated*
    frame (|langs × sources| rows — single tiny partition, irrelevant
    at any corpus size).
    """
    from pyspark.sql.window import Window

    agg = df.groupBy(lang_col, source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return agg.select(
        lang_col,
        source_col,
        "n_docs",
        "n_tokens",
        # unrounded: the int/int quotient is bit-identical cross-engine;
        # rounding it is what diverges at decimal half-boundaries
        (F.col("n_tokens") / total).alias("token_share"),
    )


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document features in one narrow pass, tokenizing ONCE.

    Layered selects: layer 1 materializes the token arrays, layer 2
    derives every feature from those array *columns* (attribute
    references are free to repeat), layer 3 composes the quality score
    from the feature columns. The flat form — each feature expression
    tokenizing independently — re-ran split/transform ~10× per row
    (Catalyst inlines shared subtrees unless duplicating them is
    expensive, and per-feature expressions hide the sharing); measured
    ~10× slower at sf0.1. Still zero shuffles and one scan — modulo
    ``fan_out``'s local-mode spread (round 10: this was the one
    narrow text pass WITHOUT it, so the interpreted HOF folds ran on
    the single scan core; a no-op on any multi-split source at scale).
    """
    from ..sources.io import fan_out

    df = fan_out(df)
    c = F.col(text_col)
    toks_l = df.select(
        "*",
        tokens(text_col).alias("_toks"),
        F.transform(tokens(text_col), lambda t: F.lower(t)).alias("_toks_low"),
    )
    n = F.size(F.col("_toks"))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    sw_hits = F.size(F.filter(F.col("_toks_low"), lambda t: F.array_contains(sw, t)))
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    total_len = F.aggregate(
        F.transform(F.col("_toks"), lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    codes = sorted(LANG_MARKERS)
    lang_hit_cols = []
    for code in codes:
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[code]])
        lang_hit_cols.append(
            F.size(F.filter(F.col("_toks_low"),
                            lambda t: F.array_contains(markers, t)))
            .alias(f"_h_{code}")
        )
    # lang hit counts materialize as columns first: the argmax fold
    # nests each `when` inside the next, so building it over the raw
    # filter expressions duplicates them exponentially — over attribute
    # references the duplication is free.
    feats = toks_l.select(
        "*",
        n.cast("long").alias("n_tokens"),
        (sw_hits / F.greatest(n, F.lit(1))).cast("double").alias("stopword_ratio"),
        (punct / F.greatest(F.length(c), F.lit(1))).cast("double").alias("punct_ratio"),
        (total_len / F.greatest(n, F.lit(1))).cast("double").alias("mean_token_len"),
        document_fingerprint(text_col).alias("fingerprint"),
        *lang_hit_cols,
    )
    best = F.lit("und")
    best_score = F.lit(0)
    for code in reversed(codes):
        hits = F.col(f"_h_{code}")
        is_better = hits >= best_score
        best = F.when(is_better, F.lit(code)).otherwise(best)
        best_score = F.when(is_better, hits).otherwise(best_score)
    feats = feats.select(
        "*",
        F.when(best_score > 0, best).otherwise(F.lit("und")).alias("lang_pred"),
    ).drop(*[f"_h_{code}" for code in codes])
    len_score = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    sw_score = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 5.0)
    mtl = F.col("mean_token_len")
    wordlen_score = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return feats.select(
        "*",
        ((len_score + sw_score + punct_pen + wordlen_score) / 4.0)
        .cast("double")
        .alias("quality"),
    ).drop("_toks", "_toks_low")


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
) -> DataFrame:
    """Top-``top_n`` TF-IDF terms per document — the classic corpus
    statistic (keyword extraction / quality signals) the reference has
    no analog for.

    tf = term count / doc length; idf = ln(N / docfreq). Shuffles:
    (id,term) counts, term docfreq, the docfreq scoring join, and the
    per-doc top-k window. The docfreq side is O(vocabulary) — at
    corpus scale that is billions of distinct terms, so it is NOT
    force-broadcast: AQE broadcasts it when its runtime size is small
    and falls back to a shuffle join on ``term`` when it isn't.  Only
    the one-ROW corpus count carries an explicit broadcast hint.
    Ranking uses the 6dp-ROUNDED score (desc, then term asc) so rank
    boundaries are reproducible across engines' last-ulp ln()
    differences.
    """
    from pyspark.sql.window import Window

    from ..sources.io import fan_out

    base = (
        fan_out(df)
        .select(
            F.col(id_col).alias("id"),
            F.transform(tokens(text_col), lambda t: F.lower(t)).alias("toks"),
        )
        .select("id", F.size("toks").alias("n_toks"), F.explode("toks").alias("term"))
    )
    tf = base.groupBy("id", "n_toks", "term").agg(F.count(F.lit(1)).alias("cnt"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    ndocs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        # bounded: single-row corpus count
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col("id"),
            "term",
            F.round(
                (F.col("cnt").cast("double") / F.col("n_toks"))
                * F.log(F.col("n_docs").cast("double") / F.col("df_t")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select(F.col("id").alias(id_col), "term", "tfidf", "rnk")
    )


def boilerplate_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-frequency boilerplate detection (the n-gram analog of
    CCNet/RefinedWeb line-level dedup — this corpus has no line
    structure, so the repeated-content unit is the k-token shingle):
    a shingle occurring in ≥ ``min_docs`` distinct documents is
    boilerplate; per-doc output counts total vs boilerplate shingles
    and their ratio — the "duplicated-content fraction" a quality
    gate thresholds on.

    Scale shape: shingles are distinct per doc, so the document
    frequency is a plain COUNT per hash with map-side partial agg.
    Only the set of hashes ABOVE the threshold flows back into the
    match join. Its size is corpus-df-dependent (true boilerplate is
    few shingles repeated massively, but a low ``min_docs`` over a
    huge corpus isn't bounded), so the join carries NO forced
    broadcast hint: AQE broadcasts it when its runtime size is small
    and degrades to a hash-partitioned equi-join on ``h`` when it
    isn't — never an OOM. Per-doc totals come from a separate fully
    narrow pass (array size, no explode); no all-pairs stage anywhere.
    """
    from ..sources.io import fan_out

    df = fan_out(df)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, k)).alias("s"),
    ).select("id", md5_hash32(F.col("s")).alias("h"))
    boiler_hashes = (
        sh.groupBy("h")
        # DISTINCT documents, as the docstring promises: shingles are
        # per-doc distinct STRINGS, but two distinct strings in the
        # SAME doc can collide to one 32-bit hash — count('*') would
        # then count that doc twice toward min_docs
        # (remove_boilerplate was already hardened this way)
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("h")
    )
    # the over-threshold set is corpus-df-dependent (unbounded by
    # construction) — no forced broadcast; AQE broadcasts it when its
    # runtime size is small and shuffle-joins on h when it isn't
    n_boiler = (
        sh.join(boiler_hashes, "h")
        .groupBy("id")
        .agg(F.count("*").alias("n_boilerplate"))
    )
    sizes = df.select(
        F.col(id_col).alias("id"),
        F.size(shingles(text_col, k)).cast("long").alias("n_shingles"),
    )
    return (
        sizes.join(n_boiler, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            F.coalesce(F.col("n_boilerplate"), F.lit(0))
            .cast("long").alias("n_boilerplate"),
            # unrounded int/int quotient — bit-identical cross-engine;
            # rounding diverges at decimal half-boundaries
            (
                F.coalesce(F.col("n_boilerplate"), F.lit(0))
                / F.col("n_shingles")
            ).alias("boilerplate_ratio"),
        )
    )


# Hashing-trick linear classifier (fastText-style quality scorer):
# token → bucket via md5 (engine-portable), bucket → weight via a
# Knuth multiplicative hash into integer MILLI-units. Keeping the
# fold in int64 makes the margin EXACT — no float summation order
# to disagree on across engines — and one final division produces
# the identical double everywhere.
CLASSIFIER_BUCKETS = 4096
CLASSIFIER_KNUTH = 2654435761


def classifier_margin_milli(col: Column | str) -> Column:
    """Σ w(token) in integer milli-units: w(t) = ((md5_32(t) mod B)
    · KNUTH mod 2001) − 1000 ∈ [−1000, 1000]. A frozen random linear
    model — stand-in for trained fastText/logistic weights, which
    would ship as a broadcast bucket→weight table with identical plan
    shape. JVM-side fold, no UDF, no shuffle."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    weights = F.transform(
        toks,
        lambda t: (
            (md5_hash32(t) % CLASSIFIER_BUCKETS) * CLASSIFIER_KNUTH
        ) % 2001 - 1000,
    )
    return F.aggregate(
        weights, F.lit(0).cast("bigint"), lambda acc, w: acc + w
    )


def classifier_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Model-scoring pass: per-doc mean token weight (the linear
    margin) and a keep/drop verdict at margin ≥ 0 — the shape of
    every classifier-based quality filter (fastText LM filtering,
    DCLM-style quality classifiers) run as a narrow, shuffle-free
    projection over the corpus."""
    from ..sources.io import fan_out

    df = fan_out(df)
    n = token_count(text_col)
    margin = classifier_margin_milli(text_col)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        # unrounded: margin and n are exact ints, so the quotient is
        # bit-identical in any engine; rounding a quotient that can sit
        # exactly on a decimal half-boundary is what diverges
        (margin / (n * 1000.0)).alias("score"),
        (margin >= 0).alias("keep"),
    )


def bigram_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    known_min_count: int = 2,
) -> DataFrame:
    """Count-based language-model fluency filter (the deterministic
    relative of CCNet's LM-perplexity gate): score each document by
    how typical its token transitions are under the corpus's own
    bigram statistics.

    Per bigram occurrence: trans_milli = ⌊1000·C(w₁w₂) / C₁(w₁)⌋ —
    the corpus conditional transition frequency in integer MILLI-units
    (integer floor-division, so per-doc sums are EXACT and engine-
    order-free; a float log-prob sum would drift with aggregation
    order). Per doc: mean transition score, fraction of bigrams seen
    ≥ ``known_min_count`` times corpus-wide, and a keep flag.

    Scale shape: one exploded pass over doc bigrams feeds two counts
    (bigram, prefix) with map-side partial agg; both join back
    co-partitioned on their keys; the per-doc re-agg is the final
    shuffle. Hot bigrams are exactly the well-known ones — skew splits
    under AQE, and no stage is ever pairwise in documents.

    Documents with fewer than 2 tokens have NO bigrams and therefore
    NO row in the output (there is nothing to score — explode drops
    them); a quality gate joining on the verdict should left-join and
    choose its own policy for scoreless docs.
    """
    from ..sources.io import fan_out

    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    n = F.size(toks)
    bigram_arr = F.slice(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        1,
        F.greatest(n - 1, F.lit(0)),
    )
    occ = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(bigram_arr).alias("bg"),
    ).withColumn("pfx", F.split(F.col("bg"), " ")[0])
    bg_counts = occ.groupBy("bg").agg(F.count("*").alias("c_bg"))
    pfx_counts = occ.groupBy("pfx").agg(F.count("*").alias("c_pfx"))
    scored = (
        occ.join(bg_counts, "bg")
        .join(pfx_counts, "pfx")
        .withColumn(
            "trans_milli", F.expr("(c_bg * 1000) div c_pfx").cast("bigint")
        )
        .withColumn(
            "known", F.when(F.col("c_bg") >= known_min_count, 1).otherwise(0)
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("trans_milli").alias("_sum_tm"),
            F.sum("known").alias("_n_known"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            # unrounded: exact-int quotients are bit-identical in any
            # engine; ROUND is what diverges when the rational lands on
            # a decimal half-boundary (2613/80000 = 0.0326625 did)
            (
                F.col("_sum_tm") / (F.col("n_bigrams") * 1000.0)
            ).alias("fluency"),
            (F.col("_n_known") / F.col("n_bigrams")).alias("known_frac"),
            (
                (F.col("_sum_tm") / (F.col("n_bigrams") * 1000.0) >= 0.05)
                & (F.col("_n_known") / F.col("n_bigrams") >= 0.5)
            ).alias("keep"),
        )
    )


def positional_shingles(col: Column | str, k: int = 4) -> Column:
    """Array of k-token shingles WITH position: element i (0-based) is
    the shingle starting at token i+1. Same shifted-zip construction
    as ``shingles`` but without the distinct — positions matter here."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    n = F.size(toks)
    z = toks
    for j in range(2, k + 1):
        shifted = F.slice(toks, j, F.greatest(n - j + 1, F.lit(0)))
        z = F.zip_with(z, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(z, 1, F.greatest(n - k + 1, F.lit(1)))


def remove_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    min_docs: int = 3,
) -> DataFrame:
    """Boilerplate REMOVAL (not just flagging): every token covered by
    a corpus-frequent k-shingle is cut from the document — the
    RefinedWeb/CCNet passage-scrub rewritten as positional array
    surgery, entirely in JVM higher-order functions.

    Shape: (1) distinct-shingle document frequency → the
    over-threshold hash set (corpus-df-dependent, so no forced
    broadcast — AQE picks); (2) positional shingle explode
    joins that set → per-doc sorted start positions (one doc-id
    shuffle); (3) narrow rewrite — token j survives unless some start
    s covers it (s ≤ j ≤ s+k−1), then the survivors re-concatenate.
    BOTH engines must block on the same 32-bit shingle hash
    (``md5_hash32``): at corpus scale hash collisions are expected and
    must replicate, or a collision-merged document frequency crosses
    the threshold in one engine only.
    """
    from ..sources.io import fan_out

    df = fan_out(df)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, k)).alias("s"),
    ).select("id", md5_hash32(F.col("s")).alias("h"))
    # document frequency counts DOCS per hash: two distinct shingle
    # strings colliding to one 32-bit hash inside the same doc must
    # count that doc once, exactly like the oracle's DISTINCT
    # (doc_id, hh) — count_distinct keeps the map-side partial dedup.
    boiler_hashes = (
        sh.groupBy("h").agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("h")
    )
    pos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(positional_shingles(text_col, k)).alias("p0", "s"),
    ).select("id", (F.col("p0") + 1).alias("start"),
             md5_hash32(F.col("s")).alias("h"))
    # corpus-df-dependent set: AQE decides broadcast vs shuffle (see
    # boilerplate_stats)
    starts = (
        pos.join(boiler_hashes, "h")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("start")).alias("_starts"))
    )
    # The rewrite references _toks and _covered ONLY as bound column
    # attributes inside the lambdas: Spark's interpreted higher-order
    # functions re-evaluate every captured NON-attribute subexpression
    # once PER ARRAY ELEMENT, so the earlier inline form (covered =
    # <transform-flatten-distinct tree> captured by the filter lambda)
    # rebuilt the whole covered set — and re-split the document — for
    # every position j: O(n²·k) string work per doc, measured 260 s
    # for the sf1 rewrite stage alone vs ~16 s for all of the index
    # stages. As attributes they are evaluated once per ROW (the
    # membership scan itself stays, but over ints). Lowering the
    # STRING before the whitespace split (exactly the oracle's
    # lower-then-split) keeps _toks lambda-free, which also avoids the
    # Spark 4 lambda-array attribute-binding trap documented in the
    # verify skill. Each expensive alias is referenced by ≥2 output
    # expressions (n_removed = size(_covered), the exact complement of
    # size(_kept)) so CollapseProject never inlines it back into a
    # lambda body.
    joined = (
        df.join(starts, df[id_col] == starts["id"], "left")
        .withColumn(
            "_toks",
            F.split(F.trim(F.lower(F.col(text_col))), TOKEN_PATTERN),
        )
        .withColumn("_n", F.size("_toks"))
        .withColumn(
            "_sarr",
            F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
        )
        # materialize the covered-position set FIRST, then
        # membership-test: a nested lambda (filter(seq, j ->
        # exists(starts, s -> s<=j<=s+k))) mis-binds the outer lambda
        # variable inside the inner one
        .withColumn(
            "_covered",
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.col("_sarr"),
                        lambda s: F.sequence(
                            s, F.least(s + F.lit(k - 1), F.col("_n"))
                        ),
                    )
                )
            ),
        )
        .withColumn(
            "_kept",
            F.filter(
                F.sequence(F.lit(1), F.col("_n")),
                lambda j: ~F.array_contains(F.col("_covered"), j),
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(
            " ",
            F.transform(
                F.col("_kept"), lambda j: F.element_at(F.col("_toks"), j)
            ),
        ).alias("clean_text"),
        F.col("_n").cast("long").alias("n_tokens"),
        F.size("_covered").cast("long").alias("n_removed"),
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 20,
) -> DataFrame:
    """Term → posting-list index: ``(term, doc_freq, postings_head)``
    where ``postings_head`` is the ``max_postings`` smallest doc ids
    joined with ','. The classic MapReduce workload (scale extension;
    the reference's WordCount-shaped pipelines stop at counting —
    ``RepartitionJoin.java`` tags rows but never builds an index).

    Scale plan: per-doc ``array_distinct`` makes (doc, term) pairs
    unique WITHOUT a distinct shuffle; one hash Exchange on ``term``
    feeds both the row_number window and the group-by (same key, so
    Catalyst reuses the partitioning). The posting list is capped by
    rank BEFORE collect_list, so per-group state is O(max_postings),
    not O(doc_freq) — a hot term with 10⁹ postings costs a count and
    a 20-element array, never an unbounded buffer."""
    from pyspark.sql.window import Window

    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), TOKEN_PATTERN))
        ).alias("term"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") <= max_postings, F.col("doc_id"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings_head"),
        )
    )


def bm25_rank(
    df: DataFrame,
    queries: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval: score every document against a small set
    of keyword queries and keep the ``top_k`` per query — the ranking
    stage the inverted index (``inverted_index``) feeds in a search /
    retrieval-eval pipeline (the reference's WordCount-shaped jobs
    never rank; scale extension per SURVEY §2 "beyond").

    score(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) (the
    non-negative Robertson–Sparck-Jones form).

    Scale shape: the query term set is a LITERAL (queries are few and
    tiny — a search workload parameter, not data), so per-doc term
    frequencies are fully NARROW ``size(filter(toks, = term))``
    expressions — no token explode, no (doc, term) shuffle, the
    corpus is scanned exactly once. Corpus stats (N, avgdl, df per
    query term) reduce to ONE row via map-side partial aggregation and
    re-attach by broadcast (bounded: 1 row). Non-matching documents
    are dropped by an exact integer predicate (max tf > 0) BEFORE the
    per-query top-k window, so the window input is the docs matching
    ≥1 query term, not the corpus. Scores are rounded to 6 dp and
    ranked on the rounded value with a doc-id tiebreak, so a last-ulp
    ln() difference can never flip a rank across engines (same
    convention as ``tfidf_top_terms``).
    """
    from pyspark.sql.window import Window

    terms = sorted({t for ts in queries.values() for t in ts})
    t_idx = {t: i for i, t in enumerate(terms)}

    def _eq(term: str):
        # factory, NOT `lambda x, t=t: ...` — a 2-parameter lambda is
        # interpreted by F.filter as the (element, index) signature
        return lambda x: x == F.lit(term)

    toks = F.split(F.trim(F.lower(F.col(text_col))), TOKEN_PATTERN)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        *[
            F.size(F.filter("toks", _eq(t))).cast("long").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    # bounded: single-row global-stats frame
    scored = base.join(F.broadcast(stats))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")

    def term_score(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        dfreq = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - dfreq + F.lit(0.5))
            / (dfreq + F.lit(0.5))
        )
        return idf * (
            tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)))
        )

    # ALL query scores in one projection, then a stack() unpivot — a
    # per-query union of filtered branches would rescan the corpus
    # once per query (measured: 6 parquet scans for 3 queries); this
    # shape scans it once for the doc pass + once for the stats pass
    per_query_cols = []
    stack_args: list[str] = []
    for j, qid in enumerate(sorted(queries)):
        if "'" in qid or "\\" in qid:
            # qid is interpolated into the stack() expression as a SQL
            # string literal — a quote would break (or alter) the
            # parsed expression. Reject rather than escape: query ids
            # are caller-chosen labels, not data
            raise ValueError(
                f"query id {qid!r} must not contain quotes/backslashes"
            )
        qterms = queries[qid]
        # left-to-right sum in the query's declared term order — the
        # oracle spells the same chain so float addition order matches
        s: Column = F.lit(0.0)
        for t in qterms:
            s = s + term_score(t_idx[t])
        tf_cols = [F.col(f"tf_{t_idx[t]}") for t in qterms]
        matched = tf_cols[0] if len(tf_cols) == 1 else F.greatest(*tf_cols)
        per_query_cols += [
            F.round(s, 6).alias(f"score_{j}"),
            (matched > 0).cast("int").alias(f"matched_{j}"),
        ]
        stack_args.append(f"'{qid}', score_{j}, matched_{j}")
    wide = scored.select("doc_id", *per_query_cols)
    stacked = wide.select(
        "doc_id",
        F.expr(
            f"stack({len(queries)}, {', '.join(stack_args)}) "
            "AS (query_id, score, matched)"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        stacked.filter(F.col("matched") > 0)
        .select("query_id", "doc_id", "score")
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= top_k)
    )
