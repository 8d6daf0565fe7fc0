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


def lang_id(col: Column | str) -> Column:
    """Marker-lexicon language ID: argmax over per-language marker-token
    hit counts; 'und' when nothing matches. Ties break by language code
    order (deterministic)."""
    toks_lower = F.transform(tokens(col), lambda t: F.lower(t))
    scores = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[code]])
        hits = F.size(F.filter(toks_lower, lambda t: F.array_contains(markers, t)))
        scores.append((code, hits))
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate reversed so earlier codes win ties via > comparison
    for code, hits in reversed(scores):
        is_better = hits >= best_score
        best = F.when(is_better, F.lit(code)).otherwise(best)
        best_score = F.when(is_better, hits).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


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
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    window_hashes = F.transform(
        idx,
        lambda i: md5_hash32(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.array_min(window_hashes).cast("bigint")


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (array<string>) — input to Jaccard /
    MinHash dedup."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document features in one narrow pass."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        stopword_ratio(text_col).alias("stopword_ratio"),
        punct_ratio(text_col).alias("punct_ratio"),
        mean_token_len(text_col).alias("mean_token_len"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        document_fingerprint(text_col).alias("fingerprint"),
    )
