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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import md5_hash32


def hash_bucket(col: Column | str, buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, buckets) from md5 of the column value (+
    optional salt so independent splits of the same data decorrelate).
    md5_hash32 is non-negative, so plain ``%`` is already a pmod.
    A NULL key yields a NULL bucket (every comparison on it is false)
    — partition-style consumers that must place EVERY row coalesce
    the key first (see ``hash_split``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (md5_hash32(F.concat(c.cast("string"), F.lit(salt))) % buckets).cast(
        "int"
    )


def _nullsafe_key_str(col: Column | str) -> Column:
    """Key as string with NULL mapped to a NUL-byte sentinel (no real
    id renders as \\x00), so hash-ordered operators place NULL-keyed
    rows deterministically instead of dropping them (NULL hash) or
    letting them always win (NULLS-FIRST window rank)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit("\x00"))


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
    ``on``. This is a PARTITION (train ∪ holdout == df): a NULL key
    hashes via the NUL sentinel rather than yielding a NULL bucket
    that silently falls out of BOTH sides."""
    b = hash_bucket(_nullsafe_key_str(on), buckets, salt)
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
    Fraction granularity is EXACTLY 1/buckets: thresholds are rounded
    to integers driver-side, so the bucket comparison is pure int —
    a float ``fraction × buckets`` admits an off-by-one bucket
    whenever the double product rounds up (0.33 × 10000 =
    3300.0000000000005 keeps bucket 3300), and engines that parse
    decimal literals exactly (DuckDB DECIMAL) would disagree with
    engines computing in doubles."""
    thresholds = F.create_map(
        *[
            F.lit(x)
            for k, v in fractions.items()
            # floor(x + 0.5) = deterministic half-UP: Python round()
            # is half-to-even, so fraction×buckets landing exactly on
            # .5 (0.45 × 10 = 4.5) would sample 40% instead of 45%
            for x in (k, int(math.floor(float(v) * buckets + 0.5)))
        ]
    )
    thr = F.coalesce(thresholds[F.col(strata_col)], F.lit(0))
    # NUL sentinel: a NULL key samples at its stratum's rate like any
    # other row instead of silently dropping (NULL bucket)
    return df.filter(hash_bucket(_nullsafe_key_str(key_col), buckets, salt) < thr)


def mix_rebalance(
    df: DataFrame,
    target_shares: dict[str, float],
    strata_col: str = "lang",
    text_col: str = "text",
    key_col: str = "doc_id",
    buckets: int = 10_000,
    salt: str = "mix",
) -> DataFrame:
    """Downsample-only rebalancing of the corpus toward target TOKEN
    shares per stratum — the step that turns a data-mix plan
    (``text.data_mix_report``) into an actual training set.

    Let share_s be each stratum's current token share and t_s its
    target. With α = min_s(share_s / t_s), keeping a fraction
    f_s = t_s · α / share_s of each stratum (≤ 1 by construction, = 1
    for the most under-represented stratum) yields exactly the target
    ratios while discarding as little data as possible and never
    upsampling. Strata absent from ``target_shares`` are dropped.

    Membership uses the same md5-bucket primitive as ``hash_split`` —
    seed-free, engine-reproducible, stable under re-runs and
    repartitioning. Plan: one tiny per-stratum token aggregate
    (|strata| rows) broadcast back onto the corpus; the corpus itself
    is scanned once and filtered narrowly — no corpus shuffle at all.
    """
    from .text import token_count

    if not target_shares:
        raise ValueError("target_shares must not be empty")
    total_t = sum(target_shares.values())
    targets = {k: v / total_t for k, v in target_shares.items()}

    base = df.select(
        F.col(key_col), F.col(strata_col).alias("_stratum"),
        token_count(text_col).alias("n_tokens"),
    )
    target_expr = F.create_map(
        *[F.lit(x) for k, v in targets.items() for x in (k, float(v))]
    )
    mix = (
        base.groupBy("_stratum")
        .agg(F.sum("n_tokens").alias("cur"))
        .withColumn("total", F.sum("cur").over(Window.partitionBy()))
        .withColumn("share", F.col("cur") / F.col("total"))
        .withColumn("target", target_expr[F.col("_stratum")])
        .filter(F.col("target").isNotNull())
    )
    alpha = mix.withColumn(
        "alpha", F.min(F.col("share") / F.col("target")).over(Window.partitionBy())
    )
    fracs = alpha.select(
        "_stratum",
        (F.col("target") * F.col("alpha") / F.col("share")).alias("keep_frac"),
    )
    return (
        # bounded: one row per stratum (coarse source labels)
        base.join(F.broadcast(fracs), "_stratum")
        # no floor: keep_frac for the most under-represented stratum is
        # exactly-1 only up to float rounding (t·α/s can evaluate to
        # 0.999…), and floor would turn that into buckets-1 — dropping
        # ~1/buckets of the stratum the docstring promises to keep
        # whole. Comparing against the raw double keeps f_s = 1 exact.
        .filter(
            # NUL sentinel, same as hash_split/shuffle_shards: a NULL
            # doc id samples at its stratum's rate, not silently out
            hash_bucket(_nullsafe_key_str(key_col), buckets, salt)
            < F.col("keep_frac") * buckets
        )
        .select(
            F.col(key_col),
            F.col("_stratum").alias(strata_col),
            "n_tokens",
        )
    )


def temperature_rebalance(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "lang",
    text_col: str = "text",
    key_col: str = "doc_id",
    buckets: int = 10_000,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based downsampling toward token shares ∝ n_s^α —
    the standard multilingual-LM mixing rule (α = 1 keeps the natural
    distribution, α → 0 approaches uniform): high-resource strata are
    thinned, the scarcest stratum is kept whole. Unlike
    ``mix_rebalance`` no explicit target shares are needed — the
    targets derive from the corpus itself.

    Per stratum with n_s tokens the keep fraction is
    f_s = (n_s^α / n_s) / max_t(n_t^α / n_t), so kept tokens are
    ∝ n_s^α and f = 1 EXACTLY for the smallest stratum (x / x is an
    exact 1.0 in IEEE arithmetic — no float-rounding data loss on the
    stratum the rule promises to keep whole). α = 0.5 (the common
    choice) runs on ``sqrt``, which IEEE 754 requires to be correctly
    rounded — the whole fraction pipeline is then engine-reproducible
    bit-for-bit; other α use ``pow`` (documented last-ulp caveat
    across libm implementations).

    Plan shape matches ``mix_rebalance``: one |strata|-row token
    aggregate broadcast back onto the corpus, membership via the
    md5-bucket primitive — corpus scanned once, filtered narrowly,
    no corpus shuffle at all. Rows with a NULL stratum drop, same as
    ``mix_rebalance``'s strata-absent-from-targets rule (an unlabeled
    document has no place in a per-language mix — label first)."""
    from .text import token_count

    base = df.select(
        F.col(key_col), F.col(strata_col).alias("_stratum"),
        token_count(text_col).alias("n_tokens"),
    )
    cur = F.col("cur").cast("double")
    w = F.sqrt(cur) if alpha == 0.5 else F.pow(cur, F.lit(float(alpha)))
    fracs = (
        base.groupBy("_stratum")
        .agg(F.sum("n_tokens").alias("cur"))
        .withColumn("r", w / cur)
        .withColumn(
            "keep_frac",
            F.col("r") / F.max("r").over(Window.partitionBy()),
        )
        .select("_stratum", "keep_frac")
    )
    return (
        # bounded: one row per stratum (coarse source labels, never
        # scales with the corpus)
        base.join(F.broadcast(fracs), "_stratum")
        .filter(
            # NUL sentinel, same as hash_split/shuffle_shards: a NULL
            # doc id is still a document — it samples at its stratum's
            # rate instead of silently falling out of the mix
            hash_bucket(_nullsafe_key_str(key_col), buckets, salt)
            < F.col("keep_frac") * buckets
        )
        .select(
            F.col(key_col),
            F.col("_stratum").alias(strata_col),
            "n_tokens",
        )
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 8,
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global training-order shuffle, materialized as a
    shard assignment: each row gets ``shard_id = h % n_shards`` and a
    1-based ``pos_in_shard`` rank by hash order, where
    h = md5(key ∥ salt). Reading shards round-robin by
    (pos_in_shard, shard_id) replays a uniform global permutation of
    the corpus — the example-order shuffle a training run needs —
    without ever building a global sequence number.

    Seed-free and engine-reproducible (pure function of the key), so
    the epoch order is stable under re-runs, repartitioning, and
    engine swaps; change ``salt`` per epoch for a fresh permutation.

    Scale: one hash Exchange on ``shard_id`` plus a per-shard sort —
    no global single-partition window (the classic
    ``row_number() OVER (ORDER BY ...)`` global-position approach
    serializes the whole corpus through one task). Size ``n_shards``
    to ~corpus_rows / 10M so each shard's sort fits an executor."""
    h = md5_hash32(F.concat(_nullsafe_key_str(key_col), F.lit(salt)))
    w = Window.partitionBy("shard_id").orderBy(F.col("_h"), F.col(key_col))
    return (
        df.withColumn("_h", h)
        .withColumn("shard_id", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def hash_reservoir_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 50,
    salt: str = "rsv",
) -> DataFrame:
    """Deterministic per-group k-sample: rank each group's rows by
    md5(key ∥ salt) and keep the ``k`` smallest — the distributed,
    seed-free analogue of per-group reservoir sampling (uniform over
    the group because the hash order is independent of the data order;
    membership a pure function of the key, so stable under re-runs,
    repartitioning, and engine swaps, where a true reservoir scan is
    order-dependent and single-threaded per group).

    Scale: one hash Exchange on ``group_col``; the window sort spills
    and emits a bounded ``k`` rows per group. ``sample_rank`` (1-based
    hash-order rank) is part of the output so downstream can shrink
    the sample to any k' ≤ k without resampling."""
    h = md5_hash32(F.concat(_nullsafe_key_str(key_col), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def priority_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int = 10,
    salt: str = "pri",
) -> DataFrame:
    """Weight-proportional per-group k-sample via PRIORITY SAMPLING
    (Duffield–Lund–Thorup, JACM 54(6) 2007): each row gets priority
    q = w / u with u ~ Uniform(0, 1]; the k highest-priority rows are
    the sample, and with τ = the (k+1)-th priority the per-row
    estimate ŵ = max(w, τ) makes Σŵ over the sample an unbiased
    estimator of the group's TOTAL weight — so a 10-doc sample per
    language still reports each language's full token budget.

    Deterministic u: u = (md5_32(key ∥ salt) + 1) / 2^32, so
    q = w·2^32 / (h+1) — one division of two exact int64s, which IEEE
    rounds identically in every engine (the repo's exact-ratio idiom;
    no ROUND anywhere). Requires integer weights ≥ 1 (rows with
    w < 1 are dropped); exactness holds while w·2^32 < 2^53, i.e.
    w < 2^21 ≈ 2M — far above any per-document token count.

    Scale: one hash Exchange on ``group_col`` shared by both windows
    (rank, then τ over the rank-bounded k+1 rows); state after the
    rank filter is O(groups × (k+1)). No global sort, no driver
    collect. Reference has no sampling at all (SURVEY §2.8 scale
    extension; nearest analogue is InputSampler.RandomSampler,
    MergeJoin.java:194-196).
    """
    w_int = F.col(weight_col).cast("bigint")
    u_int = (
        md5_hash32(F.concat(_nullsafe_key_str(key_col), F.lit(salt)))
        + F.lit(1)
    )
    pri = (w_int * F.lit(1 << 32)) / u_int
    rank_w = Window.partitionBy(group_col).orderBy(
        F.col("_pri").desc(), F.col(key_col)
    )
    tau_w = Window.partitionBy(group_col)
    return (
        df.filter(w_int >= 1)
        .select(
            F.col(group_col),
            F.col(key_col),
            w_int.alias("weight"),
            pri.alias("_pri"),
        )
        .withColumn("rnk", F.row_number().over(rank_w).cast("bigint"))
        .filter(F.col("rnk") <= k + 1)
        .withColumn(
            "tau",
            F.max(
                F.when(F.col("rnk") == k + 1, F.col("_pri"))
            ).over(tau_w),
        )
        .filter(F.col("rnk") <= k)
        .select(
            group_col,
            key_col,
            "weight",
            "rnk",
            F.col("_pri").alias("priority"),
            F.greatest(
                F.col("weight").cast("double"), F.coalesce("tau", F.lit(0.0))
            ).alias("w_est"),
        )
    )


def kmv_distinct_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group distinct-count estimation via a KMV (k-minimum-values
    / bottom-k) sketch (Bar-Yossef et al. 2002; Beyer et al. SIGMOD
    2007 unbiased estimator): hash every value to [0, 2^32), keep each
    group's k smallest DISTINCT hashes, and estimate
    D̂ = (k−1)·2^32 / h_(k) from the k-th minimum. Groups with fewer
    than k distinct values report their count of distinct 32-bit
    HASHES (``n_exact``) — exact up to hash collisions, which a 32-bit
    space makes rare but not impossible (P ≈ k²/2³³ ≈ 5e-7 at k = 64),
    so a collision silently undercounts by one; the sketch is the
    hash set, not the value set.

    Unlike HLL (``hll_sketch_agg`` — an opaque binary whose oracle can
    only bound relative error), a KMV built on the repo's md5 hash is
    ENGINE-REPRODUCIBLE: the k minima, the k-th minimum, and the
    estimate (exact-int ratio ⇒ IEEE-identical division) replay
    bit-for-bit in any engine, so the driver hash-compares every
    column. The bottom-k set is also trivially mergeable (union, keep
    k smallest) — shard sketches combine without re-scanning, and the
    same property gives set-operation estimates (Jaccard from merged
    sketches) for free.

    Plan: map-side-combinable distinct on (group, hash), then one
    group exchange for the rank window over ≤ distinct-hashes rows;
    post-rank state is O(groups × k).
    """
    h = md5_hash32(F.concat(F.col(value_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy("_h")
    cnt_w = Window.partitionBy(group_col)
    return (
        df.select(F.col(group_col), h.alias("_h"))
        # COUNT DISTINCT semantics: a NULL value has no hash — without
        # the filter it would rank FIRST in the ascending window
        # (consuming a bottom-k slot and skewing the k-th minimum)
        # while DuckDB's NULLS-LAST default ranks it differently
        .where(F.col("_h").isNotNull())
        .distinct()
        .withColumn("_rnk", F.row_number().over(w))
        .withColumn("n_distinct", F.count(F.lit(1)).over(cnt_w))
        .filter(F.col("_rnk") <= k)
        .groupBy(group_col)
        .agg(
            F.max("n_distinct").cast("bigint").alias("n_exact"),
            F.max(F.when(F.col("_rnk") == k, F.col("_h")))
            .cast("bigint")
            .alias("kth_min"),
        )
        .select(
            group_col,
            "n_exact",
            "kth_min",
            F.when(
                F.col("kth_min").isNull(), F.col("n_exact").cast("double")
            )
            .otherwise(
                (F.lit((k - 1) * (1 << 32))) / F.col("kth_min")
            )
            .alias("est_distinct"),
        )
    )


def kmv_sketch_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Each group's bottom-k sketch as a sorted array — the mergeable
    synopsis behind ``kmv_distinct_per_group``, materialized for
    set-operation estimation. Same plan shape: map-side-combinable
    distinct on (group, hash), one group exchange for the rank
    window, O(groups × k) after the rank filter."""
    h = md5_hash32(F.concat(F.col(value_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group_col).orderBy("_h")
    return (
        df.select(F.col(group_col), h.alias("_h"))
        # COUNT DISTINCT semantics: a NULL value has no hash — without
        # the filter it would rank FIRST in the ascending window
        # (consuming a bottom-k slot and skewing the k-th minimum)
        # while DuckDB's NULLS-LAST default ranks it differently
        .where(F.col("_h").isNotNull())
        .distinct()
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("_h")).alias("sketch"))
    )


def kmv_jaccard_matrix(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise Jaccard ESTIMATES between groups' value sets from
    their bottom-k sketches alone (Beyer et al. SIGMOD 2007): for a
    pair, merge the two sketches, keep the k smallest of the union
    (a valid bottom-k sketch OF THE UNION — the mergeability that
    makes KMV shard-safe), and estimate
    Ĵ = |merged_k ∩ A_k ∩ B_k| / |merged_k|. The estimate is a ratio
    of two small exact ints — bit-identical in any engine, so unlike
    an HLL-intersection heuristic the driver hash-compares it.

    Scale: the per-group sketches are O(groups × k); the pair join is
    over the GROUP dimension (broadcast), never the data. Estimating
    cross-source / cross-shard audience overlap from nightly
    per-shard sketches is exactly this query.
    """
    sk = kmv_sketch_per_group(df, group_col, value_col, k, salt)
    a = sk.select(
        F.col(group_col).alias("g_a"), F.col("sketch").alias("sk_a")
    )
    b = sk.select(
        F.col(group_col).alias("g_b"), F.col("sketch").alias("sk_b")
    )
    # bounded: one row per group — the sketch table IS the synopsis
    pairs = a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("sk_a"), F.col("sk_b"))), 1, k
    )
    common = F.size(
        F.array_intersect(F.array_intersect(merged, F.col("sk_a")), "sk_b")
    )
    return pairs.select(
        "g_a",
        "g_b",
        F.size(merged).cast("bigint").alias("union_k"),
        common.cast("bigint").alias("common_k"),
        (common / F.size(merged)).alias("est_jaccard"),
    )


def countmin_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
    a ``depth × width`` grid of counters; each value increments one
    counter per row ``j`` at column ``h_j(v) = md5(j ∥ v ∥ salt) %
    width``. Point-estimate = min over rows — always ≥ the true count,
    over-counting only from collisions (error ≤ ε·N with prob 1−δ for
    width=⌈e/ε⌉, depth=⌈ln 1/δ⌉).

    Like the KMV family (``kmv_distinct_per_group``) and unlike
    ``count_min_sketch``'s opaque binary, an md5-based grid is
    ENGINE-REPRODUCIBLE: every counter replays bit-for-bit in any
    engine that can md5, so a driver oracle hash-compares the whole
    sketch, and shard sketches merge by elementwise ADD (the grid is a
    linear projection of the frequency vector — the property that also
    gives sliding-window and delta sketches for free; proven in
    tests).

    Scale: the explode is ×depth but the groupBy has map-side partial
    aggregation, so the shuffle is ≤ depth·width rows per map task and
    final state is exactly depth·width counters — corpus-size-
    independent. Returns (row_j, col_h, cnt).
    """
    j = F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row_j")
    rows = df.select(j, F.col(value_col).cast("string").alias("_v"))
    col_h = (
        md5_hash32(F.concat(F.col("row_j").cast("string"), F.lit(":"),
                            F.col("_v"), F.lit(salt)))
        % width
    ).alias("col_h")
    return (
        rows.select("row_j", col_h)
        .groupBy("row_j", "col_h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Point-estimates from a ``countmin_sketch`` grid for each probe
    key: re-derive the depth cells a key hashes to, fetch their
    counters, take the min. The sketch is depth·width rows —
    broadcast by construction — so probing is a narrow pass over the
    probe set: no shuffle touches the original corpus again."""
    j = F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row_j")
    cells = probes.select(F.col(key_col), j).withColumn(
        "col_h",
        md5_hash32(F.concat(F.col("row_j").cast("string"), F.lit(":"),
                            F.col(key_col).cast("string"), F.lit(salt)))
        % width,
    )
    # bounded: sketch is exactly depth×width counter rows
    hit = cells.join(F.broadcast(sketch), ["row_j", "col_h"], "left")
    return (
        hit.groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cm_est"))
    )
