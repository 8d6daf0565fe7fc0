"""Skewed-pair data generator — the reference's ``DataGenerator``
surface (SURVEY.md §2.11 G1-G4) re-expressed as distributed, lazy,
seed-deterministic DataFrame construction.

Reference semantics preserved:
  * G1 uniform pair   — key = ``i % unique_values``, both tables
    identical (``DataGenerator.java:102-123``).
  * G2 Zipf pair      — dim = every key 0..N-1 exactly once
    (reference shuffles the order — irrelevant relationally); fact key
    = ``zipf_inverse_cdf(i/nRows, s, N)`` for i = 0..nRows-1 —
    *deterministic* inverse-CDF over an equi-spaced probability grid,
    not random draws (``DataGenerator.java:150``).
  * G3 parallel write — free: ``df.write`` parallelism replaces the
    reference's thread-per-file writer (which was accidentally
    sequential — ``.run()`` not ``.start()``, ``DataGenerator.java:230``).
  * G4 double-skew    — both tables Zipf (``DataGenerator.java:240-259``).
  * Attributes        — 3 random strings of lengths 20/100/80, each
    drawn from a pool of 100 pre-generated strings
    (``DataGenerator.java:13-48``, ``JoinSimulation.java:91-93``). We
    build the pools driver-side with a seeded RNG and pick JVM-side via
    ``md5(id:attr:seed) % pool`` — no Python in the per-row hot path,
    and (unlike xxhash64) replayable by any engine, so the catalog
    registers a full value-hash DuckDB oracle for the generator.

The Zipf inverse CDF is the Newton-iteration approximation from the
public article the reference cites (medium.com/@jasoncrease/zipf,
``DataGenerator.java:300-336``), vectorized over numpy arrays and run
as an Arrow-batched pandas UDF — the one place Python-side compute is
warranted (SURVEY.md §2.10).

Scale posture: everything derives from ``spark.range`` (a parallel,
partitioned source); nothing is collected; a 10-billion-row fact table
generates in parallel across all executors with O(pool) driver memory.
"""

from __future__ import annotations

import random
import string

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ALPHABET = string.ascii_uppercase + string.ascii_lowercase + "123456789"
POOL_SIZE = 100
DEFAULT_ATTR_LENGTHS = (20, 100, 80)  # JoinSimulation.java:91-93


def generalized_harmonic(n: int, m: float) -> float:
    """H(n, m) = sum_{k=1..n} 1/k^m  (DataGenerator.java:94-100)."""
    k = np.arange(1, n + 1, dtype=np.float64)
    return float(np.sum(1.0 / np.power(k, m)))


def max_zipf_repeats(n_unique: int, s: float, count: int) -> float:
    """Expected occurrences of the hottest key: count / H(N, s)
    (DataGenerator.java:72-80). Used by the bench harness to size
    skew-aware partitioning, as the reference's JoinSimulation.java:203
    did."""
    return count / generalized_harmonic(n_unique, s)


def zipf_inverse_cdf(p: np.ndarray, s: float, n: float) -> np.ndarray:
    """Vectorized approximate inverse CDF of Zipf(s, N) over p∈[0,1).

    Newton iteration on the integral approximation of the generalized
    harmonic sum (public derivation: medium.com/@jasoncrease/zipf;
    reference port at DataGenerator.java:314-336). s must not equal 1.
    """
    if s == 1.0:
        raise ValueError("s=1 is a pole of the approximation; use s=1.01")
    p = np.asarray(p, dtype=np.float64)
    if np.any((p < 0) | (p > 1)):
        raise ValueError("p must be within [0, 1]")
    tol = 0.01
    x = np.full(p.shape, n / 2.0, dtype=np.float64)
    d = p * (
        12.0 * (n ** (1.0 - s) - 1.0) / (1.0 - s)
        + 6.0
        - 6.0 * n ** (-s)
        + s
        - n ** (-1.0 - s) * s
    )
    active = np.ones(p.shape, dtype=bool)
    # Newton converges in a handful of steps; hard-cap for safety.
    for _ in range(200):
        xa = x[active]
        m = xa ** (-2.0 - s)
        mx = m * xa
        mxx = mx * xa
        mxxx = mxx * xa
        a = 12.0 * (mxxx - 1.0) / (1.0 - s) + 6.0 * (1.0 - mxx) + (s - mx * s) - d[active]
        b = 12.0 * mxx + 6.0 * (s * mx) + (m * s * (s + 1.0))
        newx = np.maximum(1.0, xa - a / b)
        still = np.abs(newx - xa) > tol
        x[active] = newx
        nxt = active.copy()
        nxt[active] = still
        if not nxt.any():
            break
        active = nxt
    return x.astype(np.int64)


def _string_pool(length: int, rng: random.Random) -> list[str]:
    """Pool of POOL_SIZE fixed-length random strings
    (DataGenerator.java:36-46)."""
    return [
        "".join(rng.choice(ALPHABET) for _ in range(length))
        for _ in range(POOL_SIZE)
    ]


def attr_pools(
    seed: int, attr_lengths: tuple[int, ...] = DEFAULT_ATTR_LENGTHS
) -> list[list[str]]:
    """The per-attribute string pools for a seed — one seeded RNG
    consumed across all attributes, in order. Public so the catalog
    oracle can embed the identical pools as SQL literals."""
    rng = random.Random(seed)
    return [_string_pool(length, rng) for length in attr_lengths]


def _attr_columns(
    seed: int, attr_lengths: tuple[int, ...] = DEFAULT_ATTR_LENGTHS
) -> list[Column]:
    """One column expr per attribute: deterministic JVM-side pool pick
    ``pool[int(md5('id:attr:seed')[:8], 16) % POOL_SIZE]`` — md5 so the
    pick is engine-reproducible (DuckDB: ('0x' || substr(md5(...), 1,
    8))::BIGINT), unlike Spark-private xxhash64."""
    cols = []
    for idx, pool_strings in enumerate(attr_pools(seed, attr_lengths)):
        pool = F.array(*[F.lit(s) for s in pool_strings])
        digest = F.md5(
            F.concat_ws(
                ":",
                F.col("id").cast("string"),
                F.lit(str(idx)),
                F.lit(str(seed)),
            )
        )
        pick = (
            F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
            % POOL_SIZE
        ).cast("int")
        cols.append(F.element_at(pool, pick + 1).alias(f"a{idx + 1}"))
    return cols


def generate_uniform_pair(
    spark: SparkSession,
    n_rows: int,
    unique_values: int,
    seed: int = 42,
    attr_lengths: tuple[int, ...] = DEFAULT_ATTR_LENGTHS,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """G1: both tables identical, key = i % unique_values."""
    base = spark.range(0, n_rows, numPartitions=num_partitions)
    df = base.select(
        (F.col("id") % unique_values).alias("k"), *_attr_columns(seed, attr_lengths)
    )
    return df, df


def generate_zipf_fact(
    spark: SparkSession,
    n_rows: int,
    unique_values: int,
    s: float,
    seed: int = 42,
    attr_lengths: tuple[int, ...] = DEFAULT_ATTR_LENGTHS,
    num_partitions: int | None = None,
    id_lo: int = 0,
    id_hi: int | None = None,
) -> DataFrame:
    """Fact side of G2/G4: k = zipf_inverse_cdf(i/nRows, s, N) —
    deterministic equi-spaced grid (DataGenerator.java:150).

    ``id_lo``/``id_hi`` select a slice of the id grid while keeping
    the GLOBAL ``n_rows`` denominator — the building block of
    :func:`stage_zipf_fact_chunked` (slices union to the full
    table bit-for-bit)."""
    from pyspark.sql.functions import pandas_udf

    if s == 1.0:
        # fail fast on the driver — otherwise the pole guard inside
        # zipf_inverse_cdf raises from a worker mid-job, surfacing as
        # an executor traceback instead of a usable error (the
        # reference's own matrix skips 1.0 and uses 1.01)
        raise ValueError("s=1 is a pole of the approximation; use s=1.01")

    n = float(unique_values)
    nr = float(n_rows)

    @pandas_udf("long")
    def zipf_key(i: pd.Series) -> pd.Series:
        return pd.Series(zipf_inverse_cdf(i.to_numpy() / nr, s, n))

    base = spark.range(id_lo, id_hi if id_hi is not None else n_rows,
                       numPartitions=num_partitions)
    return base.select(
        zipf_key(F.col("id")).alias("k"), *_attr_columns(seed, attr_lengths)
    )


def stage_zipf_fact_chunked(
    spark: SparkSession,
    n_rows: int,
    unique_values: int,
    s: float,
    path: str,
    seed: int = 42,
    attr_lengths: tuple[int, ...] = DEFAULT_ATTR_LENGTHS,
    chunks: int = 8,
    partitions_per_chunk: int | None = None,
) -> None:
    """Stage the G2 Zipf fact to parquet in ``chunks`` INDEPENDENT
    narrow jobs (round-9 verdict directive #2 — the ≥400 M scaleup
    tail).

    The fact key is a pure narrow function of ``id`` (the
    deterministic inverse CDF ``p = i/nRows``, ``DataGenerator.
    java:150``) and the attributes are pure functions of ``id`` too,
    so the id range splits into ``chunks`` slices whose UNION is
    bit-identical to ``generate_zipf_fact(n_rows)`` — each slice keeps
    the GLOBAL ``nRows`` denominator. Each chunk is one
    range→project→write job: zero Exchange, so peak scratch is the
    in-flight parquet writer buffers, not shuffle map outputs. A
    chunk's files land before the next job starts (append mode), so
    a crash loses at most one chunk of work and — unlike one huge
    write job — no two full-data stages ever coexist on
    ``spark.local.dir`` (the exact failure that killed the 400 M
    point on a single node, ROUND9.md: ~2×|data| of coexisting map
    outputs vs ~80 GB free disk). On a real cluster the same
    chunking bounds per-executor scratch while every chunk still
    fans out across all executors."""
    if chunks < 1:
        raise ValueError(f"chunks must be >= 1, got {chunks}")
    step = (n_rows + chunks - 1) // chunks
    for lo in range(0, n_rows, step):
        hi = min(lo + step, n_rows)
        generate_zipf_fact(
            spark, n_rows, unique_values, s, seed, attr_lengths,
            num_partitions=partitions_per_chunk,
            id_lo=lo, id_hi=hi,
        ).write.mode("append").parquet(path)


def generate_dim(
    spark: SparkSession,
    unique_values: int,
    seed: int = 42,
    attr_lengths: tuple[int, ...] = DEFAULT_ATTR_LENGTHS,
    shuffle_order: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dim side of G2: every key 0..N-1 exactly once. The reference
    shuffles the write order (DataGenerator.java:129-135) — relationally
    a no-op; pass shuffle_order=True to reproduce the file layout."""
    base = spark.range(0, unique_values, numPartitions=num_partitions)
    df = base.select(F.col("id").alias("k"), *_attr_columns(seed + 1, attr_lengths))
    if shuffle_order:
        df = df.orderBy(F.rand(seed))
    return df


def generate_zipf_pair(
    spark: SparkSession,
    n_rows: int,
    unique_values: int,
    s: float,
    seed: int = 42,
    double_skew: bool = False,
    attr_lengths: tuple[int, ...] = DEFAULT_ATTR_LENGTHS,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """G2 (dim ⋈ fact) or G4 (double_skew: both Zipf)."""
    fact = generate_zipf_fact(
        spark, n_rows, unique_values, s, seed, attr_lengths, num_partitions
    )
    if double_skew:
        return fact, fact
    dim = generate_dim(spark, unique_values, seed, attr_lengths,
                       num_partitions=num_partitions)
    return dim, fact
