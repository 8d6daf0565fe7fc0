"""Sampling operators for training-data pipelines (scale extension;
the reference has no sampling — its only sampler is the internal
``InputSampler.RandomSampler`` feeding the total-order partitioner,
``MergeJoin.java:194-196``).

Two kinds matter at 100 TB:
  * ``hash_split`` — DETERMINISTIC content-hash bucketing for
    train/validation/test splits. Pure narrow projection (no shuffle,
    no state, no seed file): every engine that can md5 reproduces the
    same split, membership is stable under re-runs, re-partitioning,
    and incremental arrival — the properties RAND()-based splits lack.
  * ``stratified_sample`` — per-stratum fractions via ``sampleBy``
    (seeded Bernoulli per row; approximate counts, exact strata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_hash32


def hash_bucket(col: Column | str, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets) from md5 of the column value (+
    optional salt so independent splits of the same data decorrelate).
    md5_hash32 is non-negative, so plain ``%`` is already a pmod."""
    c = F.col(col) if isinstance(col, str) else col
    return (md5_hash32(F.concat(c.cast("string"), F.lit(salt))) % buckets).cast(
        "int"
    )


def hash_split(
    df: DataFrame,
    on: str,
    train_pct: int = 80,
    buckets: int = 100,
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, holdout) split on a key column's content
    hash. Splitting on a stable document KEY (not the text) keeps a
    doc in the same side even if its text is later cleaned/re-encoded;
    splitting on content dedups leakage instead — caller's choice of
    ``on``."""
    b = hash_bucket(on, buckets, salt)
    return df.filter(b < train_pct), df.filter(b >= train_pct)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): one scan, no
    shuffle; counts are approximate (binomial), strata exact."""
    return df.sampleBy(strata_col, fractions, seed)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    buckets: int = 10_000,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key's md5
    bucket falls below ``fraction × buckets`` for its stratum (strata
    absent from ``fractions`` drop). The RNG-free analogue of
    ``sampleBy``: same one-scan/no-shuffle cost, but membership is an
    engine-independent pure function of (key, salt) — reproducible
    across engines and stable under re-runs, repartitioning, and
    incremental arrival, which is what a training-data mix needs.
    Fraction granularity is 1/buckets."""
    thresholds = F.create_map(
        *[F.lit(x) for k, v in fractions.items() for x in (k, float(v))]
    )
    thr = F.coalesce(thresholds[F.col(strata_col)], F.lit(0.0))
    return df.filter(hash_bucket(key_col, buckets, salt) < thr * buckets)
