#!/usr/bin/env python
"""Benchmark harness — the reference's ``JoinSimulation`` (B1/B2/B3,
``JoinSimulation.java:87-316``) as a Spark driver script.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``. The LAST stdout
line is the compact driver contract (CAPPED: per-family totals, never
per-query — round 5 lost the signal when 97 per-query entries pushed
the line past the driver's ~2 KB tail window)::

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {<family>: sec, ...}, "sf": ..., "n_queries": N,
     "anchor_sec": ..., "zipf_total_sec": ...}

``value`` is the sum of HEADLINE warm medians only; the zipf join
block reports separately as ``zipf_total_sec`` (the three join
medians only — generation + staging is its own detail line item,
never folded in). ``anchor_sec`` is the
median of a fixed CPU-only calibration job timed once per repeat wave
— compare it across environments to separate machine contention from
regression. Per-query numbers, cold-pass timings and the skew/scaleup
sweep go to ``BENCH_DETAIL.json`` (and a preceding ``{"detail": ...}``
stdout line), never onto the contract line.

Per-query timing wraps a full materialization (noop sink — forces every
operator, pays no write cost), the analog of the reference's
``JobUtils.time`` around ``waitForCompletion`` (``JobUtils.java:17-31``)
— but failures raise instead of recording 0 ns (reference bug, SURVEY
§4.3).

Two passes are reported: ``queries_cold`` is the first execution of
each plan in a fresh session (pays parquet footer reads, codegen
compilation, page-cache misses); ``queries`` holds the MEDIAN of
``--repeats`` (default 5) warm runs per query, with the full
min/max/runs spread in ``BENCH_DETAIL.json`` — n=1 warm numbers were
un-adjudicable (round-4 "regressions" measured warm slower than cold
in the same run). The contract ``value`` is the sum of the per-query
medians. Neither pass pre-touches the tables — only a tiny
``spark.range`` query runs first so query 1 isn't charged for JVM
startup, which no per-query number should include.

Also reproduces the reference's experiment matrix (BASELINE.md): the
skew sweep (``data/results_skew.csv``) and a scaleup spot-check at the
skew where the reference's merge join stops completing
(``results_speedup_1.2.csv:13-15``) — ``skew_curve`` maps
rows → skew → strategy → seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def calibration_anchor(spark) -> float:
    """A fixed, query-independent JVM workload (sum of 50M squares —
    whole-stage codegen, no I/O, no shuffle) timed before every repeat
    wave. Its per-wave timings live in BENCH_DETAIL.json so a globally
    contended environment (round 5: the driver's run of identical code
    measured ~30% slower with 2-3x tails) is visible IN the artifact:
    inflated anchors = machine contention, flat anchors + one slow
    query = a real regression."""
    t0 = time.monotonic()
    # xxhash64 keeps it CPU-bound; % 1e6 keeps the ANSI sum in int64
    # (sum(id*id) overflows long at 50M rows and ANSI mode raises)
    spark.range(50_000_000).selectExpr(
        "sum(xxhash64(id) % 1000000) AS s").collect()
    return round(time.monotonic() - t0, 3)


def bench_queries(
    spark, sf_dir: str, names: list[str] | None = None, repeats: int = 1
) -> tuple[dict[str, float], dict[str, dict]]:
    """Time each headline query ``repeats`` times; the first returned
    map carries the per-query MEDIAN (the contract number), the second
    the full spread {median, min, max, runs} plus a ``_anchor`` entry
    (see :func:`calibration_anchor`). Round 4's regressions were
    un-adjudicable at n=1; round 5's back-to-back repeats were
    un-adjudicable under machine contention (the last-registered
    queries inflated 2-3x in the driver's run because a late load
    spike billed all 5 of their runs). So repeats are INTERLEAVED
    round-robin — wave w runs every query once — spreading any
    transient contention across the whole set instead of
    concentrating it on whichever queries run last."""
    import statistics

    from mapreduce_join_comparison_spark import queries_catalog

    picked = names or HEADLINE
    runs_by_name: dict[str, list[float]] = {n: [] for n in picked}
    anchors: list[float] = []
    for _wave in range(repeats):
        anchors.append(calibration_anchor(spark))
        for name in picked:
            fn = queries_catalog.QUERIES[name]
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            runs_by_name[name].append(round(time.monotonic() - t0, 3))
    out: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name, runs in runs_by_name.items():
        med = round(statistics.median(runs), 3)
        out[name] = med
        detail[name] = {
            "median": med, "min": min(runs), "max": max(runs), "runs": runs,
        }
    detail["_anchor"] = {
        "median": round(statistics.median(anchors), 3),
        "min": min(anchors), "max": max(anchors), "runs": anchors,
    }
    return out, detail


def bench_zipf_joins(
    spark, n_rows: int, skew: float,
    prefix: str = "zipf_join_", repeats: int = 5,
) -> tuple[dict[str, float], dict]:
    """The reference's core benchmark: dim ⋈ zipf-fact under each
    strategy (JoinSimulation.java:154-210). Generation + parquet
    staging is timed SEPARATELY from the joins — the reference likewise
    times generation apart from each join (JoinSimulation.java:95,133);
    round 3 conflated them inside one measured span and a generation-
    path change masqueraded as a 2x join regression. Each join runs
    ``repeats`` times; the contract value is the MEDIAN, with
    min/max/all-runs in the returned detail so spread is visible.
    Staged files (unlike df.cache()) don't pin storage memory that the
    hash-join build needs at the 10M-row sweep points."""
    import shutil
    import statistics
    import tempfile

    from mapreduce_join_comparison_spark.generator import generate_zipf_pair
    from mapreduce_join_comparison_spark.operators.joins import equi_join
    from mapreduce_join_comparison_spark.session import (
        LOCAL_SKEW_CONF,
        scoped_conf,
    )

    out: dict[str, float] = {}
    detail: dict = {"repeats": repeats, "join": {}}
    stage = tempfile.mkdtemp(prefix="bench_zipf_")
    try:
        tg = time.monotonic()
        dim, fact = generate_zipf_pair(
            spark, n_rows, max(1, n_rows // 10), s=skew, seed=42
        )
        fact.write.parquet(os.path.join(stage, "fact"))
        dim.write.parquet(os.path.join(stage, "dim"))
        detail["generate_stage_sec"] = round(time.monotonic() - tg, 3)
        if n_rows >= 30_000_000:
            # release the generator's own shuffle files before the
            # joins start filling spark.local.dir (see the per-wave
            # GC note below)
            spark._jvm.System.gc()
            time.sleep(2.0)
        fact = spark.read.parquet(os.path.join(stage, "fact"))
        dim = spark.read.parquet(os.path.join(stage, "dim"))
        # round-8 directive #6: record the Fig-6.11 advisor's pick for
        # THIS cell's actual staged inputs (same 512 MiB budget the
        # forced-broadcast path enforces), so REPORT.md can score the
        # advisor against the measured fastest strategy per cell
        try:
            from mapreduce_join_comparison_spark.operators.joins import (
                advise_strategy,
            )

            pick, reason = advise_strategy(
                fact, dim.selectExpr("k AS dk", "a1 AS d1"), "k", "dk"
            )
            detail["advisor"] = {"pick": pick, "reason": reason}
        except Exception as e:  # noqa: BLE001 — advisory, never fails a bench
            detail["advisor"] = {"pick": None,
                                 "reason": f"ERROR {type(e).__name__}"}
        # AQE skew-split thresholds scaled to local partition sizes so
        # the s>=1.2 cells exercise the same split path a cluster-sized
        # hot key takes against the 256 MB default (session.py)
        strategies = ("repartition", "broadcast", "merge")
        runs_by_strategy: dict[str, list[float]] = {s: [] for s in strategies}
        refused: dict[str, str] = {}
        with scoped_conf(spark, **LOCAL_SKEW_CONF):
            # interleaved round-robin, same rationale as bench_queries:
            # a contention spike hits one run of each strategy, not all
            # ``repeats`` runs of whichever strategy went last
            for _wave in range(repeats):
                for strategy in strategies:
                    if strategy in refused:
                        continue
                    t0 = time.monotonic()
                    try:
                        materialize(
                            equi_join(fact,
                                      dim.selectExpr("k AS dk", "a1 AS d1"),
                                      "k", "dk", "inner", strategy)
                        )
                    except Exception as e:  # noqa: BLE001
                        # a broadcast whose build side crosses the
                        # byte budget refuses EXPLICITLY (joins.py) —
                        # the scaleup sweep records that refusal as a
                        # designed data point (the reference GC-died
                        # at the same wall; speedup_0.5.csv's missing
                        # tail rows), never as a crashed bench
                        refused[strategy] = f"{type(e).__name__}: " \
                            + str(e)[:200]
                        continue
                    runs_by_strategy[strategy].append(
                        round(time.monotonic() - t0, 3))
                    if n_rows >= 100_000_000:
                        # at >=100M a SINGLE run's shuffle is tens of
                        # GB; holding a whole wave (repartition +
                        # merge) before cleanup would exceed local
                        # disk at the 400M point — release after
                        # every run instead (still outside the timed
                        # span)
                        spark._jvm.System.gc()
                        time.sleep(2.0)
                if 30_000_000 <= n_rows < 100_000_000:
                    # very-large cells: each shuffle-join run leaves
                    # ~|fact| of dead shuffle files on spark.local.dir
                    # (ContextCleaner only releases them after the
                    # plan's JVM objects are GC'd). Left alone, the
                    # 200M point accumulates >40 GB/wave and ENOSPCs
                    # the run (observed round 9). Force the GC between
                    # waves — OUTSIDE every timed span, so no join
                    # number is billed for it. (>=100M cells already
                    # GC after EVERY run above — skip the redundant
                    # wave-end duplicate.)
                    spark._jvm.System.gc()
                    time.sleep(2.0)
        for strategy, runs in runs_by_strategy.items():
            if strategy in refused:
                detail["join"][strategy] = {"refused": refused[strategy]}
                continue
            med = round(statistics.median(runs), 3)
            out[f"{prefix}{strategy}"] = med
            detail["join"][strategy] = {
                "median": med, "min": min(runs), "max": max(runs),
                "runs": runs,
            }
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return out, detail


def bench_skew_curve(
    spark,
    skews: list[float],
    rows_list: list[int],
    scaleup_skews: list[float],
    repeats: int = 5,
) -> tuple[dict, dict, dict, dict]:
    """The reference's headline experiment: join time vs Zipf skew per
    strategy (results_skew.csv — flat for repartition/broadcast,
    degrading for merge), plus larger-row spot checks at the skews
    where the reference's merge join degraded then failed. Cell values
    are MEDIANS of ``repeats`` join-only runs; generation+staging cost
    per cell comes back separately. Keys are strings so the JSON
    round-trips."""
    curve: dict[str, dict[str, dict[str, float]]] = {}
    gen: dict[str, dict[str, float]] = {}
    spread: dict[str, dict[str, dict]] = {}
    advisor: dict[str, dict[str, dict]] = {}
    for n_rows in rows_list:
        picked = skews if n_rows == rows_list[0] else scaleup_skews
        per_rows: dict[str, dict[str, float]] = {}
        per_rows_gen: dict[str, float] = {}
        per_rows_spread: dict[str, dict] = {}
        per_rows_advisor: dict[str, dict] = {}
        for s in picked:
            timing, detail = bench_zipf_joins(
                spark, n_rows, s, prefix="", repeats=repeats
            )
            per_rows[str(s)] = timing
            per_rows_gen[str(s)] = detail["generate_stage_sec"]
            per_rows_spread[str(s)] = detail["join"]
            per_rows_advisor[str(s)] = detail.get("advisor", {})
        curve[str(n_rows)] = per_rows
        gen[str(n_rows)] = per_rows_gen
        spread[str(n_rows)] = per_rows_spread
        advisor[str(n_rows)] = per_rows_advisor
    return curve, gen, spread, advisor


def restrict_to_headline(detail: dict) -> dict:
    """Drop non-HEADLINE catalog keys from a run's query maps before
    it merges into the committed BENCH_DETAIL.json. A ``--queries``
    run of an arbitrary catalog key is legitimate exploration, but the
    committed tables are the 102-key headline contract — injecting an
    extra key breaks the README/artifact count check
    (test_report_drift) and silently inflates the sum-of-medians
    total (observed round 9: a prefix-family spot-bench added two
    keys and +12.5 s of phantom 'regression'). Underscore rows
    (_anchor) and the zipf_* line items always pass through."""
    headline = set(HEADLINE)
    out = dict(detail)
    dropped = False
    for qmap in ("queries_cold", "queries_warm", "queries_warm_detail"):
        kept = {
            k: v for k, v in (out.get(qmap) or {}).items()
            if k.startswith(("_", "zipf_")) or k in headline
        }
        dropped = dropped or len(kept) != len(out.get(qmap) or {})
        out[qmap] = kept
    if dropped:
        # re-derive the sum-of-medians totals UNCONDITIONALLY so a
        # dropped phantom key can't survive inside them (restriction
        # may run AFTER merge_details already recomputed totals over
        # the union). When a run measured ONLY dropped keys the maps
        # are now empty and the totals become 0.0 — falsy, so
        # merge_details keeps the committed totals instead of letting
        # the subset run's phase wall overwrite them (round-10 advice:
        # committed 154.9 s was relabeled 2.5 s by a 2-key spot run).
        out["total_warm_sec"] = round(
            sum(v["median"]
                for k, v in out["queries_warm_detail"].items()
                if not k.startswith("_")), 3)
        out["total_cold_sec"] = round(
            sum(out["queries_cold"].values()), 3)
        # if no catalog key survived in ANY query map, this run has
        # nothing to say about the committed tables' repeat count
        # either — None lets merge_details keep the committed repeats
        # (a 3-repeat spot run must not relabel 5-repeat tables)
        if not any(
            k for qmap in ("queries_cold", "queries_warm",
                           "queries_warm_detail")
            for k in out[qmap]
            if not k.startswith(("_", "zipf_"))
        ):
            out["repeats"] = None
    return out


def merge_details(old: dict, new: dict) -> dict:
    """Merge a fresh bench run's detail into the previously-committed
    BENCH_DETAIL.json instead of overwriting it (round-8 verdict,
    What's-wrong #1: the driver's default 3-row-point run silently
    discarded the committed 7-point scaleup curve).

    Semantics per field:
      * ``skew_curve*`` maps merge by UNION of row points, and within
        a row point by union of skews — the newest run's median wins
        per (rows, skew) cell, previously-measured cells survive;
      * the per-query maps (``queries_cold`` / ``queries_warm`` /
        ``queries_warm_detail``) merge per KEY — a sweep-only or
        subset run updates only what it measured (a partial run's
        zipf-only warm map must not wipe the committed 101-query
        table); ``total_warm_sec`` and ``zipf_total_sec`` are then
        RECOMPUTED from the merged maps so the "sum of medians"
        invariant holds over the union;
      * every other field (repeats, total_cold_sec) is replaced by the
        new run when it measured one, kept from the old detail when
        the new run skipped that phase (empty/None).

    Pure function of two dicts — unit-tested in test_report_drift, and
    the drift test fails if a merge ever LOSES a committed row point.
    """
    per_key_maps = ("queries_cold", "queries_warm", "queries_warm_detail")
    out = dict(old)
    for key, val in new.items():
        if key.startswith("skew_curve"):
            merged = {
                rows: dict(per_skew)
                for rows, per_skew in (out.get(key) or {}).items()
            }
            for rows, per_skew in (val or {}).items():
                merged.setdefault(rows, {}).update(per_skew)
            out[key] = merged
        elif key in per_key_maps:
            merged = dict(out.get(key) or {})
            merged.update(val or {})
            out[key] = merged
        elif val or key not in out:
            out[key] = val
    if out.get("queries_warm_detail"):
        out["total_warm_sec"] = round(
            sum(v["median"] for k, v in out["queries_warm_detail"].items()
                if not k.startswith("_")), 3)
    if new.get("queries_cold") and out.get("queries_cold"):
        # a subset run's cold-phase wall covers only the subset; after
        # the per-key merge the honest total is the sum over the
        # MERGED map (slightly under the historical phase wall, which
        # included inter-query overhead — consistently derived beats
        # a total that silently describes a different key set).
        # Truthiness gate, not `is not None`: a --skip-queries run
        # carries an EMPTY cold map and must not touch the committed
        # cold total at all.
        out["total_cold_sec"] = round(
            sum(out["queries_cold"].values()), 3)
    zipf = [v for k, v in (out.get("queries_warm") or {}).items()
            if k.startswith("zipf_join_")]
    if zipf:
        out["zipf_total_sec"] = round(sum(zipf), 3)
    return out


HEADLINE = [
    "join_repartition",
    "join_broadcast",
    "join_merge",
    "join_dup_keys",
    "join_star_multiway",
    "join_asof",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q8_market_share",
    "tpch_q18_large_volume",
    "join_band_large",
    "cdc_merge_upsert",
    "events_funnel",
    "agg_groupby",
    "agg_promo_revenue",
    "window_functions",
    "sort_total_order",
    "top_k",
    "text_features",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "similarity_projected_rerank",
    "dedup_embedding_cosine",
    "events_windowed_agg",
    "events_sessionize",
    "pipeline_training_data",
    "join_triangle_chain",
    "graph_pagerank",
    "cdc_incremental_agg",
    "text_pii_redaction",
    "text_repetition_metrics",
    "embedding_random_projection",
    "dedup_contamination",
    "dedup_incremental_minhash",
    "events_resample_locf",
    "dedup_semdedup_cells",
    "dedup_substring_containment",
    "text_boilerplate_ngrams",
    "text_quality_classifier",
    "cdc_scd2_history",
    "embedding_topic_tag",
    "events_anomaly_zscore",
    "text_bigram_fluency",
    "pipeline_corpus_card",
    "text_inverted_index",
    "dedup_exact_survivor",
    "sample_reservoir_per_group",
    "corpus_shuffle_shards",
    "text_quality_prune",
    "events_resample_interpolate",
    "agg_heavy_hitters",
    "embedding_pq_codes",
    "join_interval_multitier",
    "join_interval_overlap",
    "join_dominance_count",
    "join_theta_iejoin",
    "text_bm25_search",
    "stats_join_cardinality",
    "pipeline_bpe_vocab",
    "pipeline_bpe_encode",
    "sample_priority_weighted",
    "similarity_ivfpq_ann",
    "events_variant_extract",
    "pipeline_quality_audit",
    "events_cohort_retention",
    "agg_countmin_freq",
    "sort_skyline_frontier",
    "join_spatial_grid",
    "join_bloom_prune",
    "agg_basket_affinity",
    "events_markov_transitions",
    "agg_bitmap_distinct",
    "stats_table_checksum",
    "cdc_snapshot_diff",
    "events_sliding_distinct",
    "events_attribution_linear",
    "stats_ab_ztest",
    "events_outlier_fences",
    "join_asof_nearest",
    "stats_benford_audit",
    "similarity_truncation_recall",
    "stats_linear_fit",
    "events_activity_islands",
    "events_time_to_convert",
    "stats_bootstrap_ci",
    "stats_gini_skew",
    "events_disorder_audit",
    "stats_ks_test",
    "agg_group_mode",
    "join_null_safe",
    "agg_weighted_median",
    "set_ops_multiset",
    "dedup_prefix_filter_indexed",
    "similarity_hybrid_rrf",
    "pipeline_reward_normalize",
    "dedup_prefix_filter_delta",
    "embedding_kmeans",
    "stats_drift_psi",
    "sample_temperature",
    "pipeline_preference_pairs",
]


def contract_line(
    total_warm: float,
    warm_medians: dict[str, float],
    sf,
    anchor_sec: float | None,
    zipf_total_sec: float | None,
) -> str:
    """The LAST stdout line the driver tail-captures and parses. Round
    5 lost the hard bench signal (`BENCH_r05.json "parsed": null`)
    because the per-query map hit ~3 KB at 97 headline queries and the
    line no longer fit the driver's ~2 KB tail window. The contract is
    now CAPPED: ``queries`` carries per-FAMILY totals (prefix before
    the first underscore — ~18 families), never per-query numbers;
    those live in the preceding ``{"detail": ...}`` line and
    BENCH_DETAIL.json. test_bench_contract pins the rendered length
    under 1000 bytes for the full headline set."""
    families: dict[str, float] = {}
    for name, sec in warm_medians.items():
        fam = name.split("_", 1)[0]
        families[fam] = families.get(fam, 0.0) + sec
    families = {k: round(v, 2) for k, v in sorted(families.items())}
    line: dict = {
        "metric": "total_wall_sec",
        "value": total_warm,
        "unit": "sec",
        "queries": families,
        "sf": sf,
        "n_queries": len(warm_medians),
    }
    if anchor_sec is not None:
        line["anchor_sec"] = anchor_sec
    if zipf_total_sec is not None:
        line["zipf_total_sec"] = zipf_total_sec
    return json.dumps(line)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--rows", type=int, default=1_000_000,
                    help="generated zipf pair size (reference --rows)")
    ap.add_argument("--zipf-skew", type=float, default=0.8,
                    help="reference --zipf-skew")
    ap.add_argument("--no-generated", action="store_true",
                    help="skip the generated-data join benchmarks")
    ap.add_argument("--no-sweep", action="store_true",
                    help="skip the skew/scaleup sweep (quick local runs)")
    ap.add_argument("--sweep-rows", type=int, nargs="*",
                    default=[1_000_000, 10_000_000, 20_000_000],
                    help="row counts for the skew curve; the first gets "
                         "the full skew set, the rest the scaleup skews "
                         "(20M extends the trend one notch past the "
                         "reference's merge-join failure point)")
    ap.add_argument("--full-grid", action="store_true",
                    help="run the FULL 7-skew set at EVERY --sweep-rows "
                         "count (round-7 directive #7: the committed "
                         "REPORT.md 3x7 grid), not just the first — "
                         "~20 extra generated-join cells; not part of "
                         "the per-round driver bench")
    ap.add_argument("--scaleup-rows", type=int, nargs="*", default=[],
                    help="EXTRA row counts measured at skews 0.5/1.2 "
                         "only, merged into the same curve (round-8 "
                         "directive #3: the reference's 13-point "
                         "scaleup sweeps, data/speedup_0.5.csv — run "
                         "geometric points 1M..100M so REPORT.md's "
                         "scaleup tables resolve the curve shape; the "
                         "broadcast column records its byte-budget "
                         "refusal at the dim size that crosses it)")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--skip-queries", action="store_true",
                    help="skip the headline cold/warm query passes "
                         "entirely (sweep-only runs, e.g. the very-"
                         "large --scaleup-rows measurements); with "
                         "--write-detail the sweep cells MERGE into "
                         "the committed BENCH_DETAIL.json and the "
                         "query tables survive from the previous run")
    ap.add_argument(
        "--repeats", type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")),
        help="warm runs per headline query (median reported)")
    ap.add_argument(
        "--write-detail", action="store_true",
        help="force writing BENCH_DETAIL.json/REPORT.md even for a "
             "partial run (subset --queries / --no-sweep / "
             "--no-generated) — by default partial runs write "
             "BENCH_DETAIL.partial.json and leave the committed "
             "artifacts alone")
    args = ap.parse_args()
    if args.scaleup_rows and args.no_generated:
        ap.error("--scaleup-rows needs the generated-data benchmarks; "
                 "drop --no-generated")

    from mapreduce_join_comparison_spark.session import get_spark

    # 12g driver: the 10M-row sweep's shuffles + hash builds fragment
    # an 8g heap enough that late-phase joins run 4-5x slower from GC
    # pressure (observed; a fresh session at 8g runs them fine)
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.driver.memory":
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _gc_between_phases():
        # ask the JVM to compact between bench phases so one phase's
        # garbage doesn't bill the next phase's timings
        spark._jvm.System.gc()

    # charge no query for JVM/session startup; everything else (parquet
    # footers, page cache, per-plan codegen) is paid by the COLD pass
    spark.range(1000).selectExpr("sum(id)").collect()

    if args.skip_queries:
        queries_cold, total_cold = {}, 0.0
        queries_warm, warm_detail = {}, {}
    else:
        t0 = time.monotonic()
        queries_cold, _cold_detail = bench_queries(
            spark, args.sf_dir, args.queries)
        total_cold = round(time.monotonic() - t0, 3)

        _gc_between_phases()
        # warm phase: n=repeats per query, contract number = median.
        # The contract total is the SUM OF MEDIANS (not the phase wall
        # clock, which would scale with --repeats): comparable across
        # rounds and robust to any single noisy run.
        queries_warm, warm_detail = bench_queries(
            spark, args.sf_dir, args.queries, repeats=max(1, args.repeats)
        )
    zipf_detail: dict = {}
    if not args.no_generated:
        zipf_times, zipf_detail = bench_zipf_joins(
            spark, args.rows, args.zipf_skew
        )
        queries_warm.update(zipf_times)
        # generation+staging reported as its own line item (the
        # reference times generation separately too) — never folded
        # into a join's number
        queries_warm["zipf_generate_stage"] = zipf_detail[
            "generate_stage_sec"
        ]
    # the contract total is the sum of HEADLINE medians only (the
    # round-5 advice: the old sum(queries_warm) silently folded the
    # zipf joins + the generation line item into a number documented
    # as "sum of the per-query medians"); the zipf block gets its own
    # zipf_total_sec on the contract line
    total_warm = round(
        sum(v["median"] for k, v in warm_detail.items()
            if not k.startswith("_")), 3)
    # join medians only: zipf_generate_stage (generation + parquet
    # staging) stays its own line item, per REPORT.md's "not in any
    # join number" contract (round-6 advice)
    zipf_total = (
        round(sum(v for k, v in queries_warm.items()
                  if k.startswith("zipf_join_")), 3)
        if not args.no_generated else None
    )

    skew_curve: dict = {}
    skew_curve_generate: dict = {}
    skew_curve_spread: dict = {}
    skew_curve_advisor: dict = {}
    if not args.no_generated and not args.no_sweep:
        _gc_between_phases()
        # reference matrix: skews 0.1–1.2 (s=1.0 is the inverse-CDF
        # pole — the reference's own sweep uses 1.01 there too), then
        # 10x rows at the skews where the reference degraded (0.5) and
        # failed (1.2)
        full_skews = [0.1, 0.3, 0.5, 0.7, 0.9, 1.01, 1.2]
        (skew_curve, skew_curve_generate, skew_curve_spread,
         skew_curve_advisor) = bench_skew_curve(
            spark,
            skews=full_skews,
            rows_list=args.sweep_rows,
            # --full-grid: every row count gets all 7 skews (the
            # committed REPORT.md 3x7 grid, run manually); per-round
            # driver benches keep the 2-skew scale-up spot checks
            scaleup_skews=full_skews if args.full_grid else [0.5, 1.2],
        )
    # --scaleup-rows: extra geometric row points at the reference's
    # scaleup skews only, merged into the same curve structures.
    # Independent of --no-sweep (round-8 advice: the flag was silently
    # ignored with --no-sweep) so a sweep-only very-large run is just
    # `--skip-queries --no-sweep --scaleup-rows N --write-detail`;
    # --no-generated still excludes it (no generator, nothing to run;
    # validated at parse time).
    extra = [r for r in args.scaleup_rows if str(r) not in skew_curve]
    if extra:
        _gc_between_phases()
        # median of 3 for the extra scaleup points: the large-row
        # cells cost minutes each and the curve SHAPE (flat
        # repartition, broadcast until its budget cliff, merge
        # degradation) is the signal, not 2% precision
        c2, g2, s2, a2 = bench_skew_curve(
            spark, skews=[0.5, 1.2], rows_list=extra,
            scaleup_skews=[0.5, 1.2], repeats=3,
        )
        skew_curve.update(c2)
        skew_curve_generate.update(g2)
        skew_curve_spread.update(s2)
        skew_curve_advisor.update(a2)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # the driver tail-captures stdout and parses the LAST JSON line; in
    # round 2 one fat line (cold pass + skew curve inline) outgrew that
    # window and truncated mid-line ("parsed": null). Keep the final
    # line to the bare contract (metric/value/unit/queries/sf) and park
    # the cold/skew detail in a sidecar file + a preceding line.
    detail = {
        "queries_cold": queries_cold,
        "queries_warm": queries_warm,
        "queries_warm_detail": warm_detail,
        # None when no query phase ran: merge_details keeps the
        # committed value, so a sweep-only --repeats 3 run can't
        # relabel warm tables that were measured at 5 repeats
        "repeats": None if args.skip_queries else max(1, args.repeats),
        "total_cold_sec": total_cold,
        "total_warm_sec": total_warm,
        "zipf_total_sec": zipf_total,
        "skew_curve": skew_curve,
        "skew_curve_generate": skew_curve_generate,
        "skew_curve_spread": skew_curve_spread,
        "skew_curve_advisor": skew_curve_advisor,
        "zipf_headline": zipf_detail,
    }
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # a trimmed run (query subset / skipped phases) must never clobber
    # the committed full-benchmark artifacts (the round-4 trap): it
    # writes a .partial sidecar and leaves BENCH_DETAIL.json/REPORT.md
    # untouched unless --write-detail forces it
    partial = bool(args.queries) or args.no_sweep or args.no_generated \
        or args.skip_queries
    name = "BENCH_DETAIL.partial.json" if partial and not args.write_detail \
        else "BENCH_DETAIL.json"
    detail_path = os.path.join(repo_dir, name)
    try:
        if name == "BENCH_DETAIL.json":
            # the committed query tables hold HEADLINE keys only — a
            # --queries run of a non-headline catalog key (legitimate
            # for exploration) must not inject it into the committed
            # 102-key tables, where it breaks the README/artifact
            # count contract (test_report_drift) and inflates the
            # sum-of-medians total
            detail = restrict_to_headline(detail)
            # MERGE into the committed detail, never overwrite it
            # (round-8 verdict #1): previously-measured skew/scaleup
            # cells survive a coarser re-run — union of row points,
            # newest median wins per cell
            try:
                with open(detail_path) as f:
                    detail = merge_details(json.load(f), detail)
            except (OSError, ValueError):
                pass  # no committed detail yet: write this run as-is
            # restrict the MERGED result too, so pollution already in
            # the committed file self-heals on the next write instead
            # of surviving every merge
            detail = restrict_to_headline(detail)
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
        # re-render REPORT.md from the detail just written so the
        # committed report can never drift from its source (round-3
        # verdict: the two disagreed); test_report_drift pins this
        if name == "BENCH_DETAIL.json":
            from mapreduce_join_comparison_spark.cli import (
                generate_figures,
                render_report,
            )

            render_report(
                csv=[], detail=detail_path,
                out=os.path.join(repo_dir, "REPORT.md"), svg=None,
            )
            # figures/ regenerates in the same lockstep (round-10,
            # reference R-scripts analog — test_report_drift pins it)
            generate_figures(detail_path,
                             os.path.join(repo_dir, "figures"))
    except OSError:
        pass  # read-only checkout: the preceding stdout line still has it
    print(json.dumps({"detail": detail}))
    anchor = warm_detail.get("_anchor", {}).get("median")
    print(contract_line(
        total_warm,
        {k: v["median"] for k, v in warm_detail.items()
         if not k.startswith("_")},
        float(sf) if sf.replace(".", "").isdigit() else args.sf_dir,
        anchor,
        zipf_total,
    ))


if __name__ == "__main__":
    main()
