"""Command-line entry points mirroring the reference's executable
surface, so a user of the reference can run the same workflows here:

  * ``join``     — RepartitionJoin/BroadcastJoin/MergeJoin ``main``s
                   (``RepartitionJoin.java:155-177``,
                   ``BroadcastJoin.java:134-156``,
                   ``MergeJoin.java:270-291``): positional argv
                   ``input1 index1 input2 index2 output`` + a strategy
                   flag; CSV in, ``key TAB left,right`` text out
                   (output format at ``RepartitionJoin.java:61``).
  * ``generate`` — DataGenerator: uniform / Zipf / double-skew pair
                   writer (``DataGenerator.java:102-259``).
  * ``simulate`` — JoinSimulation benchmark loop (B1/B2,
                   ``JoinSimulation.java:87-316``): per step, generate
                   a pair, run the strategies, append one CSV row of
                   timings+counts. Failures raise instead of recording
                   0 ns (reference bug, SURVEY.md §4.3).
  * ``report``   — the reference's R analysis scripts (``data/skew.R``,
                   ``data/speedup.R``, ``data/skew_large.R``) as a
                   markdown-table generator over ``simulate`` CSVs
                   and/or ``bench.py``'s BENCH_DETAIL.json skew curve
                   (no plotting libs in the container; the tables carry
                   the same skew-curve / scaleup comparisons).

Usage:  python -m mapreduce_join_comparison_spark.cli join \
            --strategy repartition t1.csv 0 t2.csv 0 out/
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _spark(app: str, reducers: int | None) -> SparkSession:
    from .session import get_spark

    return get_spark(
        app_name=app,
        shuffle_partitions=reducers,
        manual_join_strategy=True,
    )


def _write_join_output(joined: DataFrame, output: str) -> None:
    """``key TAB left_row,right_row`` part files — byte-compatible with
    the reference's TextOutputFormat sink."""
    joined.select(
        F.concat_ws(
            "\t",
            F.col("k").cast("string"),
            F.concat_ws(",", F.col("left_row"), F.col("right_row")),
        ).alias("value")
    ).write.mode("overwrite").text(output)


def cmd_join(args: argparse.Namespace) -> None:
    from .operators.joins import join_reference_style
    from .sources.io import read_positional_csv

    spark = _spark(f"{args.strategy}-join", args.reducers)
    left = read_positional_csv(spark, args.input1, sep=args.sep)
    right = read_positional_csv(spark, args.input2, sep=args.sep)
    t0 = time.monotonic_ns()
    joined = join_reference_style(
        left, right, args.index1, args.index2, args.strategy
    )
    _write_join_output(joined, args.output)
    elapsed = time.monotonic_ns() - t0
    print(f"{args.strategy} join wrote {args.output} in {elapsed / 1e9:.3f}s")


def _generate_pair(spark, args) -> tuple[DataFrame, DataFrame]:
    from .generator import generate_uniform_pair, generate_zipf_pair

    unique_values = args.unique_values or max(1, int(args.rows * args.unique))
    if args.zipf_skew is None:
        return generate_uniform_pair(
            spark, args.rows, unique_values, seed=args.seed,
        )
    return generate_zipf_pair(
        spark, args.rows, unique_values, s=args.zipf_skew, seed=args.seed,
        double_skew=args.double_skew,
        num_partitions=args.threads,
    )


def cmd_generate(args: argparse.Namespace) -> None:
    spark = _spark("data-generator", None)
    t1, t2 = _generate_pair(spark, args)
    for name, df in (("t1", t1), ("t2", t2)):
        path = os.path.join(args.out, name)
        df.select(
            F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns])
            .alias("value")
        ).write.mode("overwrite").text(path)
        print(f"wrote {path}")


def cmd_simulate(args: argparse.Namespace) -> None:
    from .operators.joins import equi_join

    spark = _spark("join-simulation", args.reducers)
    strategies = ["repartition"]
    if not args.no_broadcast_join:
        strategies.append("broadcast")
    strategies.append("merge")

    fieldnames = ["rows", "unique_values", "skew", "strategy",
                  "rows_left", "rows_right", "rows_out", "seconds"]
    out_f = open(args.out, "a", newline="") if args.out else sys.stdout
    writer = csv.DictWriter(out_f, fieldnames=fieldnames)
    if not args.no_header:
        writer.writeheader()

    rows = args.rows
    for _ in range(args.steps):
        step_args = argparse.Namespace(**{**vars(args), "rows": rows})
        dim, fact = _generate_pair(spark, step_args)
        dim = dim.cache()
        fact = fact.cache()
        n_left, n_right = dim.count(), fact.count()
        for strategy in strategies:
            t0 = time.monotonic()
            n_out = equi_join(
                fact,
                dim.select(*[F.col(c).alias(f"d_{c}") for c in dim.columns]),
                "k", "d_k", "inner", strategy,
            ).count()
            writer.writerow({
                "rows": rows,
                "unique_values": args.unique_values or int(rows * args.unique),
                "skew": args.zipf_skew,
                "strategy": strategy,
                "rows_left": n_left,
                "rows_right": n_right,
                "rows_out": n_out,
                "seconds": round(time.monotonic() - t0, 3),
            })
            out_f.flush()
        dim.unpersist()
        fact.unpersist()
        rows += args.increment
    if args.out:
        out_f.close()


def _report_rows_from_csv(paths: list[str]) -> list[dict]:
    """(rows, skew, strategy, seconds) records from simulate CSVs.
    Header lines are auto-detected so files appended with --no-header
    and files with repeated headers both parse."""
    records = []
    for path in paths:
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                if row.get("seconds") in (None, "seconds"):
                    continue
                records.append({
                    "rows": int(row["rows"]),
                    "skew": float(row["skew"]) if row["skew"] else 0.0,
                    "strategy": row["strategy"],
                    "seconds": float(row["seconds"]),
                })
    return records


def _report_rows_from_detail(path: str) -> list[dict]:
    """Flatten BENCH_DETAIL.json's skew_curve {rows: {skew: {strategy:
    sec}}} into the same record shape as the simulate CSV."""
    import json

    with open(path) as f:
        detail = json.load(f)
    records = []
    for rows, per_rows in (detail.get("skew_curve") or {}).items():
        for skew, timing in per_rows.items():
            for strategy, sec in timing.items():
                records.append({
                    "rows": int(rows),
                    "skew": float(skew),
                    "strategy": strategy,
                    "seconds": float(sec),
                })
    return records


def _spreads_overlap(a: dict | None, b: dict | None) -> bool | None:
    """Whether two per-strategy run spreads ({min, max, ...}) overlap.
    None when either spread is missing (old detail files / refused
    strategies) — the caller then falls back to median comparison."""
    if not a or not b or "min" not in a or "min" not in b:
        return None
    return a["min"] <= b["max"] and b["min"] <= a["max"]


def _advisor_table_from_detail(path: str) -> list[str]:
    """Markdown scorecard of the Fig-6.11 strategy advisor vs the
    measured grid (round-8 directive #6): for every (rows, skew) cell
    of the skew/scaleup sweep, the advisor's pick on that cell's
    actual staged inputs vs the measured fastest strategy, with regret
    = pick_sec / fastest_sec.

    Tie-aware (round-8 verdict #5): a cell only scores as agreement or
    disagreement when the pick's measured [min, max] run spread
    (``skew_curve_spread``) does NOT overlap the best alternative's —
    an overlapping spread is run-to-run variance, printed as "tie" and
    counted separately (the 100 M/0.5 broadcast-vs-repartition cell
    measured 7.0 vs 8.5 s across standalone re-runs). Detail files
    without spreads fall back to plain median comparison."""
    import json

    with open(path) as f:
        detail = json.load(f)
    curve = detail.get("skew_curve") or {}
    advisor = detail.get("skew_curve_advisor") or {}
    spreads = detail.get("skew_curve_spread") or {}
    if not advisor or not any(v for v in advisor.values()):
        return []
    lines = ["", "## Strategy advisor vs measured grid", "",
             "The thesis Fig-6.11 decision tree "
             "(`operators/joins.advise_strategy`) run on each grid "
             "cell's actual staged inputs (512 MiB broadcast budget), "
             "scored against the measured fastest strategy. Regret = "
             "advisor-pick median / fastest median; a cell whose pick "
             "and best alternative have overlapping [min, max] run "
             "spreads is a statistical tie, not an (dis)agreement.", "",
             "| rows | skew | advisor pick | fastest (sec) | "
             "pick (sec) | regret |", "|---|---|---|---|---|---|"]
    n_cells = n_agree = n_tie = 0
    worst = 1.0
    for rows in sorted(curve, key=int):
        for skew in sorted(curve[rows], key=float):
            timing = curve[rows][skew]
            pick = (advisor.get(rows, {}).get(skew) or {}).get("pick")
            if not timing or pick is None:
                continue
            fastest = min(timing, key=timing.get)
            pick_sec = timing.get(pick)
            n_cells += 1
            if pick_sec is None:
                # the pick was never measured (e.g. broadcast refused
                # its byte budget at this size — then the advisor must
                # NOT have picked it; surface the cell regardless)
                lines.append(
                    f"| {int(rows):,} | {skew} | {pick} | "
                    f"{fastest} ({timing[fastest]:.2f}) | not run | — |")
                continue
            # the pick's closest competitor: the fastest OTHER strategy
            # (when the pick IS the fastest, that's the runner-up)
            others = {s: v for s, v in timing.items() if s != pick}
            cell_spread = (spreads.get(rows) or {}).get(skew) or {}
            regret = pick_sec / timing[fastest] if timing[fastest] else 1.0
            tie = False
            if others:
                rival = min(others, key=others.get)
                tie = _spreads_overlap(
                    cell_spread.get(pick), cell_spread.get(rival)
                ) or False
            if tie:
                n_tie += 1
                verdict = "tie"
            else:
                n_agree += pick == fastest
                worst = max(worst, regret)
                verdict = f"{regret:.2f}×"
            lines.append(
                f"| {int(rows):,} | {skew} | {pick} | "
                f"{fastest} ({timing[fastest]:.2f}) | {pick_sec:.2f} | "
                f"{verdict} |")
    if not n_cells:
        return []
    n_scored = n_cells - n_tie
    lines += ["",
              f"Agreement: {n_agree}/{n_scored} decided cells "
              f"({100 * n_agree / max(n_scored, 1):.0f} %), "
              f"{n_tie} tie(s) within run-to-run spread; worst decided "
              f"regret {worst:.2f}×."]
    return lines


def _callouts_from_detail(path: str) -> list[str]:
    """Reference-comparison callouts (round-8 verdict directives #3-4)
    — the two BASELINE.md rows whose claims need an explicit measured
    answer rather than a table the reader must interpolate:

    * the very-large no-broadcast sweep (``data/results 2018-09-22
      23:50:03_large_0,5.csv:2``: repartition 71.8 s, merge 59.6 s at
      200 M rows / skew 0.5 on the 17-node cluster) — rendered once
      the 200 M skew-curve cell exists;
    * the merge-join failure bound (``results_speedup_1.2.csv:13-15``:
      merge t=0 at >=36 M rows / skew 1.2; thesis ch. 6.3-6.4) —
      rendered from the ``merge_survival`` evidence block written by
      tools/merge_survival.py (measured wall + executed-plan
      skew-split marker at the exact failure-bound cell).

    Derived purely from the detail file so test_report_drift's
    re-render stays byte-identical."""
    import json

    with open(path) as f:
        detail = json.load(f)
    curve = detail.get("skew_curve") or {}
    lines: list[str] = []

    very_large = (curve.get("200000000") or {}).get("0.5") or {}
    if "repartition" in very_large or "merge" in very_large:
        lines += ["", "## Very large (reference's no-broadcast sweep)",
                  "",
                  "The one BASELINE.md row previously without a "
                  "measured analog: the reference's 200 M-row / skew "
                  "0.5 cell (`data/results 2018-09-22 23:50:03_large_"
                  "0,5.csv:2`) ran repartition in **71.8 s** and the "
                  "merge stage in **59.6 s** on the 17-node / 3 TB-RAM "
                  "cluster. Same cell, this engine, one local[32] "
                  "node:", ""]
        for strategy in ("repartition", "merge", "broadcast"):
            if strategy in very_large:
                ref = {"repartition": " (reference: 71.8 s)",
                       "merge": " (reference: 59.6 s merge STAGE only"
                                " — see below)"}.get(strategy, "")
                lines.append(f"* {strategy}: "
                             f"**{very_large[strategy]:.1f} s**{ref}")
        if "merge" in very_large:
            # fair-comparison framing (round-10 verdict directive #3):
            # the reference's 59.6 s is its merge STAGE alone — its
            # inputs were already key-extracted and totally sorted by
            # the pipeline's earlier jobs. Our SortMergeJoin number
            # includes the shuffle AND the sort. The reference's own
            # row records the pipeline stages (`t_merge_1_2` 17.7 s
            # key-extract, `t_merge_2_1` 25.6 s + `t_merge_2_2`
            # 32.7 s sorts, `t_merge_3` 59.6 s merge; `t_merge_1_1`
            # missing), so its sort-included total is ≥ 135.6 s.
            lines += [
                "",
                f"The merge rows are not like-for-like: the "
                f"reference's 59.6 s covers its merge STAGE alone — "
                f"inputs pre-sorted by the pipeline's earlier jobs, "
                f"whose same-row stage walls sum to **≥ 135.6 s** "
                f"(17.7 key-extract + 25.6 + 32.7 sort + 59.6 merge; "
                f"first key-extract not recorded). Our "
                f"**{very_large['merge']:.1f} s** includes the "
                f"shuffle and the sort, so against the sort-included "
                f"comparator this engine is "
                f"**{135.6 / very_large['merge']:.2f}× faster**.",
            ]
        presorted = detail.get("merge_presorted") or {}
        if presorted.get("merge"):
            med = presorted["merge"]["median"]
            marker = ("zero Exchange/Sort above the scan in the "
                      "executed plan"
                      if presorted.get("no_exchange_no_sort")
                      else "WARNING: plan shows exchange/sort — not a "
                           "pre-sorted ride")
            lines += [
                "",
                f"Like-for-like with the 59.6 s merge-stage row: "
                f"staged as co-bucketed, per-bucket-sorted tables "
                f"(`sources/io.py` S4 composite scan — the sort paid "
                f"at write time, exactly like the reference's "
                f"pre-sorting jobs), the same "
                f"{presorted.get('rows', 0):,}-row join's merge "
                f"stage runs in **{med:.1f} s** (median of "
                f"{presorted.get('repeats')} runs, min "
                f"{presorted['merge']['min']:.1f} / max "
                f"{presorted['merge']['max']:.1f}; {marker}; "
                f"staging {presorted.get('stage_sec', 0):.0f} s — "
                f"tools/merge_staged.py).",
            ]

    survival = detail.get("merge_survival") or {}
    if survival.get("merge"):
        med = survival["merge"]["median"]
        rows = survival["rows"]
        skew = survival["skew"]
        marker = ("the executed adaptive plan contains the skew-split "
                  "shuffle read (`" + str(survival.get("plan_marker"))
                  + "`)") if survival.get("skew_split_in_plan") else (
                  "NO skew-split marker was captured")
        lines += ["", "## Merge-join survival at the reference's "
                  "failure bound", "",
                  f"The reference's merge join stops completing at "
                  f"skew 1.2 past ~36 M rows and fails consistently at "
                  f"skew 1.1 / 40 M ({survival.get('reference')}; "
                  f"thesis ch. 6.3-6.4) — the hot Zipf key overflows "
                  f"one reducer. The same cell here completes: merge "
                  f"at {rows:,} rows / skew {skew} finished in "
                  f"**{med:.1f} s** (median of "
                  f"{survival.get('repeats')} runs, min "
                  f"{survival['merge']['min']:.1f} / max "
                  f"{survival['merge']['max']:.1f}), and {marker} — "
                  f"AQE split the hot key's partition at runtime "
                  f"instead of dying on it (tools/merge_survival.py; "
                  f"the same plan assertion tests/test_skew_aqe.py "
                  f"pins in CI at 3 M rows)."]
    return lines


# the reference's double-skew experiment walls (ns -> s), for the
# side-by-side columns in _double_skew_table_from_detail:
# data/broadcast_vs_repartition_single_input.csv:2-11
# (= speedup_double_skew_0.5.csv) — rows: (repartition, broadcast,
# merge). tools/double_skew_bench.py imports this as its point list.
DOUBLE_SKEW_REFERENCE_WALLS = {
    3_000_000: (56.6, 36.6, 236.0),
    6_000_000: (91.1, 49.9, 364.9),
    9_000_000: (122.9, 72.6, 532.5),
    12_000_000: (149.9, 99.8, 696.8),
    15_000_000: (176.9, 114.6, 869.2),
    18_000_000: (230.0, 117.0, 1003.3),
    21_000_000: (233.4, 126.2, 1247.4),
    24_000_000: (287.8, 157.7, 1352.9),
    27_000_000: (335.4, 186.3, 1402.3),
    30_000_000: (381.3, 206.5, 1664.5),
}


def _double_skew_table_from_detail(path: str) -> list[str]:
    """Markdown section for the ``double_skew`` evidence block written
    by tools/double_skew_bench.py — the reference's both-inputs-skewed
    experiment (``writeZipfBoth``: the identical Zipf row stream is
    both join inputs, so output is quadratic in hot-key multiplicity).
    Renders one row per measured cell with the reference's walls
    alongside; absent when the detail lacks the block, so small driver
    runs don't fabricate claims."""
    import json

    with open(path) as f:
        detail = json.load(f)
    block = detail.get("double_skew") or {}
    cells = block.get("cells") or {}
    if not cells:
        return []

    def fmt(cell: dict, strategy: str) -> str:
        rec = cell.get(strategy) or {}
        if "median" in rec:
            return f"{rec['median']:.1f}"
        if "refused" in rec:
            return "refused (budget)"
        if "failed" in rec:
            return "failed"
        return ""

    lines = [
        "", "## Double-skew (both inputs skewed — reference's "
        "single-input experiment)", "",
        f"The reference's last experiment without a measured analog "
        f"({block.get('reference')}): the SAME Zipf"
        f"({block.get('skew')}) row stream is written to both join "
        f"inputs, so the join output is quadratic in the hot-key "
        f"multiplicity (Σ cₖ² — the `out rows` column) and its merge "
        f"wall reaches 1664 s at 30 M rows on the 17-node cluster. "
        f"Walls are medians of {block.get('repeats') or '?'} runs "
        f"(sec, noop-sink materialization, staged parquet inputs); "
        f"`broadcast` enforces the production 512 MiB build-side "
        f"budget with the known-row-count schema-width floor "
        f"(Catalyst's parquet estimate alone under-reads these "
        f"dictionary-heavy columns ~25×; a refusal is the designed "
        f"fail-fast — the reference met the same wall as a GC death "
        f"at ~3.8 GB, thesis ch. 6.3); "
        f"`broadcast forced` waives it for parity with the "
        f"reference cluster's ~187 GB-per-node headroom. Note the "
        f"ORDERING inversion vs the reference: on Hadoop MR the "
        f"repartition join pays a full DFS-materialized shuffle, so "
        f"broadcasting the second input won at every size; here the "
        f"in-memory shuffle costs less than building a "
        f"multi-million-entry duplicate-key hash relation, so "
        f"repartition/merge win and broadcast is the one paying for "
        f"the hot keys — same experiment, engine-dependent winner, "
        f"and the absolute walls are 1-2 orders faster per row "
        f"either way.", "",
        "| rows | out rows | repartition | broadcast | broadcast "
        "forced | merge | ref repart | ref bcast | ref merge |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for rows_s in sorted(cells, key=int):
        cell = cells[rows_s]
        ref = DOUBLE_SKEW_REFERENCE_WALLS.get(int(rows_s))
        ref_cols = (f"{ref[0]:.1f} | {ref[1]:.1f} | {ref[2]:.1f}"
                    if ref else " | | ")
        out_rows = cell.get("out_rows")
        out_col = f"{out_rows:,}" if out_rows is not None else ""
        lines.append(
            f"| {int(rows_s):,} | {out_col} | "
            f"{fmt(cell, 'repartition')} | {fmt(cell, 'broadcast')} | "
            f"{fmt(cell, 'broadcast_forced')} | {fmt(cell, 'merge')} | "
            f"{ref_cols} |"
        )
    return lines


def _query_table_from_detail(path: str) -> list[str]:
    """Markdown cold/warm per-query table from BENCH_DETAIL.json —
    the per-query analog of the skew/scaleup pivots (warm column
    present for detail files written after round 3)."""
    import json

    with open(path) as f:
        detail = json.load(f)
    cold = detail.get("queries_cold") or {}
    warm = detail.get("queries_warm") or {}
    spread = detail.get("queries_warm_detail") or {}
    if not cold:
        return []
    if spread:
        rep = detail.get("repeats") or "?"
        lines = ["", f"## Per-query wall time (sec; warm = median of "
                     f"{rep} runs)", "",
                 "| query | cold | warm median | min | max |",
                 "|---|---|---|---|---|"]
    else:
        lines = ["", "## Per-query wall time (sec)", "",
                 "| query | cold | warm |", "|---|---|---|"]
    order = sorted(cold, key=lambda k: -(warm.get(k, cold[k])))
    # warm-only entries (the generated zipf joins + their generation
    # line item) follow the cold-pass rows
    order += sorted((k for k in warm if k not in cold),
                    key=lambda k: -warm[k])
    for k in order:
        c = f"{cold[k]:.3f}" if k in cold else "—"
        w = f"{warm[k]:.3f}" if k in warm else "—"
        if spread:
            st = spread.get(k)
            mn = f"{st['min']:.3f}" if st else "—"
            mx = f"{st['max']:.3f}" if st else "—"
            lines.append(f"| `{k}` | {c} | {w} | {mn} | {mx} |")
        else:
            lines.append(f"| `{k}` | {c} | {w} |")
    lines.append("")
    lines.append(
        f"Totals: cold {detail.get('total_cold_sec', '—')} s, "
        f"warm {detail.get('total_warm_sec', '—')} s"
        + (" (sum of headline medians; zipf joins reported separately)."
           if spread else ".")
    )
    anchor = spread.get("_anchor") if spread else None
    if anchor:
        lines.append(
            "Calibration anchor (fixed CPU-only job, once per repeat "
            f"wave): median {anchor['median']:.3f} s, "
            f"runs {anchor['runs']} — inflated anchors across a whole "
            "run indicate machine contention, not regression."
        )
    zipf = detail.get("zipf_headline") or {}
    if zipf.get("join"):
        lines += ["", "## Generated zipf join (join-only, median of "
                      f"{zipf.get('repeats', '?')} runs)", "",
                  "| strategy | median | min | max |", "|---|---|---|---|"]
        for strat, st in zipf["join"].items():
            lines.append(
                f"| `{strat}` | {st['median']:.3f} | {st['min']:.3f} "
                f"| {st['max']:.3f} |"
            )
        lines.append("")
        lines.append(
            "Generation + parquet staging (not in any join number): "
            f"{zipf.get('generate_stage_sec', '—')} s."
        )
    return lines


def _pivot_markdown(records: list[dict], row_key: str, title: str) -> list[str]:
    """One markdown table: row_key values × strategies, fastest cell
    starred — the textual equivalent of the reference's per-strategy
    ggplot curves."""
    strategies = sorted({r["strategy"] for r in records})
    cells: dict[float, dict[str, float]] = {}
    for r in records:
        cells.setdefault(r[row_key], {})[r["strategy"]] = r["seconds"]
    lines = [f"### {title}", "", "| " + row_key + " | " +
             " | ".join(strategies) + " |",
             "|" + "---|" * (len(strategies) + 1)]
    for key in sorted(cells):
        timing = cells[key]
        best = min(timing.values())
        def fmt(s):
            if s not in timing:
                return ""
            v = timing[s]
            return f"**{v:.3f}**" if v == best else f"{v:.3f}"
        lines.append(f"| {key} | " + " | ".join(fmt(s) for s in strategies) + " |")
    lines.append("")
    return lines


# Fixed strategy→color map (validated 3-slot categorical palette; color
# follows the entity, never its rank, so every chart paints a strategy
# the same hue). Extra strategies take the remaining validated slots in
# first-appearance order — never generated hues.
_SERIES_COLORS = {"repartition": "#2a78d6", "broadcast": "#eb6834",
                  "merge": "#1baf7a"}
_EXTRA_SLOTS = ["#eda100", "#e87ba4", "#008300", "#4a3aa7", "#e34948"]


def _render_line_svg(records: list[dict], row_key: str, title: str) -> str:
    """One static SVG line chart: x = row_key (numeric), y = seconds,
    one 2px line per strategy. Styling follows the repo's chart rules:
    single axis, recessive 1px grid, 8px markers with a 2px surface
    ring, legend + direct end labels in text ink (the aqua slot sits
    below 3:1 on this surface, so labels are the required relief),
    native ``<title>`` tooltips per marker."""
    strategies = sorted({r["strategy"] for r in records})
    colors = dict(_SERIES_COLORS)
    extras = [s for s in strategies if s not in colors]
    for i, s in enumerate(extras):
        colors[s] = _EXTRA_SLOTS[i % len(_EXTRA_SLOTS)]
    xs = sorted({r[row_key] for r in records})
    by_s = {
        s: {r[row_key]: r["seconds"] for r in records if r["strategy"] == s}
        for s in strategies
    }
    w, h, ml, mr, mt, mb = 640, 400, 56, 110, 70, 44
    pw, ph = w - ml - mr, h - mt - mb
    ymax = max(r["seconds"] for r in records) * 1.08 or 1.0
    xmin, xmax = min(xs), max(xs)
    xspan = (xmax - xmin) or 1.0

    def X(v):
        return ml + (v - xmin) / xspan * pw

    def Y(v):
        return mt + ph - v / ymax * ph

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {w} {h}" '
        f'font-family="system-ui, sans-serif">',
        f'<rect width="{w}" height="{h}" fill="#fcfcfb"/>',
        f'<text x="{ml}" y="24" font-size="15" font-weight="600" '
        f'fill="#0b0b0b">{title}</text>',
        f'<text x="{ml}" y="42" font-size="12" fill="#52514e">seconds '
        f'per join vs {row_key}</text>',
    ]
    # recessive grid + y labels
    for i in range(5):
        gv = ymax * i / 4
        gy = Y(gv)
        out.append(
            f'<line x1="{ml}" y1="{gy:.1f}" x2="{ml + pw}" y2="{gy:.1f}" '
            f'stroke="#e7e6e2" stroke-width="1"/>'
        )
        out.append(
            f'<text x="{ml - 8}" y="{gy + 4:.1f}" font-size="11" '
            f'fill="#52514e" text-anchor="end">{gv:.2g}</text>'
        )
    for v in xs:
        out.append(
            f'<text x="{X(v):.1f}" y="{mt + ph + 18}" font-size="11" '
            f'fill="#52514e" text-anchor="middle">{v:g}</text>'
        )
    # legend row (always present: >= 2 series), its own band between
    # the subtitle (y 42) and the plot top so nothing collides
    lx = ml
    for s in strategies:
        out.append(
            f'<rect x="{lx}" y="{mt - 18}" width="10" height="10" rx="2" '
            f'fill="{colors[s]}"/>'
        )
        out.append(
            f'<text x="{lx + 14}" y="{mt - 9}" font-size="11" '
            f'fill="#0b0b0b">{s}</text>'
        )
        lx += 14 + 7 * len(s) + 24
    # series: 2px line, 8px markers with 2px surface ring
    ends = []
    for s in strategies:
        pts = [(X(v), Y(by_s[s][v])) for v in xs if v in by_s[s]]
        if not pts:
            continue
        path = " ".join(
            f"{'M' if i == 0 else 'L'}{x:.1f},{y:.1f}"
            for i, (x, y) in enumerate(pts)
        )
        out.append(
            f'<path d="{path}" fill="none" stroke="{colors[s]}" '
            f'stroke-width="2" stroke-linejoin="round"/>'
        )
        for v in xs:
            if v not in by_s[s]:
                continue
            out.append(
                f'<circle cx="{X(v):.1f}" cy="{Y(by_s[s][v]):.1f}" r="4" '
                f'fill="{colors[s]}" stroke="#fcfcfb" stroke-width="2">'
                f"<title>{s} · {row_key} {v:g} · {by_s[s][v]:.3f}s</title>"
                f"</circle>"
            )
        ends.append([s, pts[-1][0], pts[-1][1]])
    # direct end labels (the contrast-relief requirement for the aqua
    # slot), pushed ≥14px apart where converging lines would collide
    ends.sort(key=lambda e: e[2])
    for i in range(1, len(ends)):
        if ends[i][2] - ends[i - 1][2] < 14:
            ends[i][2] = ends[i - 1][2] + 14
    for s, ex, ey in ends:
        out.append(
            f'<text x="{ex + 10:.1f}" y="{ey + 4:.1f}" font-size="11" '
            f'fill="#0b0b0b">{s}</text>'
        )
    out.append("</svg>")
    return "\n".join(out)


def _double_skew_records(detail: dict) -> list[dict]:
    """Flatten the double_skew block into the SVG renderer's record
    shape (refused/failed strategies simply have no point at that x)."""
    records = []
    for rows_s, cell in ((detail.get("double_skew") or {})
                         .get("cells") or {}).items():
        for strategy in ("repartition", "broadcast", "broadcast_forced",
                         "merge"):
            rec = cell.get(strategy) or {}
            if "median" in rec:
                records.append({
                    "rows": int(rows_s),
                    "strategy": strategy,
                    "seconds": float(rec["median"]),
                })
    return records


def generate_figures(detail_path: str, out_dir: str) -> list[str]:
    """Write the committed figure set from BENCH_DETAIL.json — the
    reference R scripts' analog (skew.R / speedup.R /
    broadcast_vs_repartition_single_input.R), all through the one
    committed SVG renderer so the figures and the ``report --svg``
    output share a chart system:

    * ``skew_<rows>.svg`` — seconds vs skew per multi-skew row point;
    * ``scaleup_<skew>.svg`` — seconds vs rows per multi-point skew;
    * ``double_skew.svg`` — the both-inputs-skewed cells, only once
      tools/double_skew_bench.py has written the block.

    bench.py calls this after every full run (same lockstep contract
    as REPORT.md); tools/plot_bench.py is the standalone CLI. Returns
    the figure names written. Pure function of the detail file —
    test_report_drift pins byte-identical regeneration."""
    import json

    with open(detail_path) as f:
        detail = json.load(f)
    records = _report_rows_from_detail(detail_path)
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []

    def emit(name: str, svg: str) -> None:
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(svg + "\n")
        written.append(name)

    for rows in sorted({r["rows"] for r in records}):
        sub = [r for r in records if r["rows"] == rows]
        if len({r["skew"] for r in sub}) > 1:
            emit(f"skew_{rows}.svg",
                 _render_line_svg(sub, "skew",
                                  f"Skew curve at {rows:,} rows"))
    for skew in sorted({r["skew"] for r in records}):
        sub = [r for r in records if r["skew"] == skew]
        if len({r["rows"] for r in sub}) > 1:
            emit(f"scaleup_{skew}.svg",
                 _render_line_svg(sub, "rows",
                                  f"Scaleup at skew {skew}"))
    ds = _double_skew_records(detail)
    if len({r["rows"] for r in ds}) > 1:
        skew = (detail.get("double_skew") or {}).get("skew")
        emit("double_skew.svg",
             _render_line_svg(
                 ds, "rows",
                 f"Double-skew (both inputs Zipf {skew}) scaleup"))
    return written


def render_report(
    csv: list[str], detail: str | None,
    out: str | None, svg: str | None,
) -> None:
    """Render the markdown benchmark report (reference data/skew.R /
    speedup.R analog). Callable from bench.py so a bench run always
    refreshes REPORT.md in lockstep with BENCH_DETAIL.json."""
    records = _report_rows_from_csv(csv)
    query_table: list[str] = []
    if detail:
        records += _report_rows_from_detail(detail)
        query_table = _callouts_from_detail(detail) \
            + _double_skew_table_from_detail(detail) \
            + _advisor_table_from_detail(detail) \
            + _query_table_from_detail(detail)
    if not records and not query_table:
        raise SystemExit("no simulate records found (see --detail / CSV args)")

    # basenames only: the report must render byte-identically whether
    # invoked from the CLI (relative path) or bench.py (absolute) —
    # test_report_drift diffs a re-render against the committed file
    lines = ["# Join-strategy benchmark report",
             "",
             "Bold = fastest strategy for the row. Sources: "
             + ", ".join(os.path.basename(p)
                         for p in csv + ([detail] if detail else [])),
             ""]
    svgs: list[tuple[str, str]] = []
    # skew curves (reference skew.R): one table per generated size
    for rows in sorted({r["rows"] for r in records}):
        sub = [r for r in records if r["rows"] == rows]
        if len({r["skew"] for r in sub}) > 1:
            title = f"Skew curve at {rows:,} rows"
            lines += _pivot_markdown(sub, "skew", title)
            svgs.append((f"skew_{rows}.svg", _render_line_svg(sub, "skew", title)))
    # scaleup (reference speedup.R): one table per skew level
    for skew in sorted({r["skew"] for r in records}):
        sub = [r for r in records if r["skew"] == skew]
        if len({r["rows"] for r in sub}) > 1:
            title = f"Scaleup at skew {skew}"
            lines += _pivot_markdown(sub, "rows", title)
            svgs.append((f"scaleup_{skew}.svg", _render_line_svg(sub, "rows", title)))
    lines += query_table
    if svg:
        os.makedirs(svg, exist_ok=True)
        for fname, svg_text in svgs:
            with open(os.path.join(svg, fname), "w") as f:
                f.write(svg_text + "\n")
        lines.append(
            f"SVG charts: {', '.join(os.path.join(svg, f) for f, _ in svgs)}"
        )
    text = "\n".join(lines)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")
    else:
        print(text)


def cmd_report(args: argparse.Namespace) -> None:
    render_report(args.csv, args.detail, args.out, args.svg)


def cmd_query(args: argparse.Namespace) -> None:
    from . import queries_catalog as qc

    if args.name == "list" or args.name not in qc.QUERIES:
        for name in sorted(qc.QUERIES):
            oracle = "oracle" if name in qc.ORACLES else "rows-only"
            print(f"{name:32s} {oracle}")
        if args.name != "list":
            sys.exit(f"unknown query {args.name!r} — pick one of the above")
        return
    spark = _spark(f"query:{args.name}", args.reducers)
    df = qc.QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        for row in df.limit(args.limit).collect():
            print(row)


def cmd_sql(args: argparse.Namespace) -> None:
    """Ad-hoc ANSI SQL over the driver tables — the interactive surface
    an analytics engine owes its users beyond the fixed catalog. Every
    table registers as a temp view via the footer-normalizing loader
    (so timestamp physical-type drift can't bite ad-hoc queries
    either), then the statement goes straight to Catalyst."""
    from .sources import load_tables

    spark = _spark("sql", args.reducers)
    load_tables(spark, args.sf_dir)
    df = spark.sql(args.statement)
    if args.explain:
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        for row in df.limit(args.limit).collect():
            print(row)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mapreduce_join_comparison_spark",
                                description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    j = sub.add_parser("join", help="run one join (reference join mains)")
    j.add_argument("input1")
    j.add_argument("index1", type=int)
    j.add_argument("input2")
    j.add_argument("index2", type=int)
    j.add_argument("output")
    j.add_argument("--strategy", default="repartition",
                   choices=("repartition", "broadcast", "merge", "auto"))
    j.add_argument("--reducers", type=int, default=None,
                   help="shuffle partitions (JoinConfig numReducers)")
    j.add_argument("--sep", default=",")
    j.set_defaults(func=cmd_join)

    def add_gen_args(sp):
        sp.add_argument("--rows", type=int, required=True)
        sp.add_argument("--unique", type=float, default=0.1,
                        help="dim size as a fraction of --rows")
        sp.add_argument("--unique-values", type=int, default=None)
        sp.add_argument("--zipf-skew", type=float, default=None,
                        help="Zipf s; omit for uniform keys")
        sp.add_argument("--double-skew", action="store_true")
        sp.add_argument("--threads", type=int, default=None,
                        help="write parallelism (reference nThreads)")
        sp.add_argument("--seed", type=int, default=42)

    g = sub.add_parser("generate", help="write a test pair (DataGenerator)")
    add_gen_args(g)
    g.add_argument("--out", required=True)
    g.set_defaults(func=cmd_generate)

    s = sub.add_parser("simulate", help="benchmark loop (JoinSimulation)")
    add_gen_args(s)
    s.add_argument("--steps", type=int, default=1)
    s.add_argument("--increment", type=int, default=0)
    s.add_argument("--reducers", type=int, default=None)
    s.add_argument("--out", default=None, help="append CSV here (default stdout)")
    s.add_argument("--no-header", action="store_true")
    s.add_argument("--no-broadcast-join", action="store_true")
    s.set_defaults(func=cmd_simulate)

    r = sub.add_parser(
        "report",
        help="markdown skew/scaleup tables from simulate CSVs (data/*.R analog)",
    )
    r.add_argument("csv", nargs="*", help="simulate output CSVs")
    r.add_argument("--detail", default=None,
                   help="BENCH_DETAIL.json to include its skew_curve")
    r.add_argument("--out", default=None, help="write markdown here (default stdout)")
    r.add_argument("--svg", default=None, metavar="DIR",
                   help="also write one SVG line chart per table into DIR "
                        "(the ggsave analog of the reference's R scripts)")
    r.set_defaults(func=cmd_report)

    q = sub.add_parser(
        "query", help="run any catalog query ('query list' to enumerate)"
    )
    q.add_argument("name", help="catalog query name, or 'list'")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20,
                   help="rows to print (ignored with --out)")
    q.add_argument("--out", default=None, help="write result parquet here")
    q.add_argument("--explain", action="store_true",
                   help="print the formatted physical plan first")
    q.add_argument("--reducers", type=int, default=None)
    q.set_defaults(func=cmd_query)

    a = sub.add_parser(
        "sql", help="run ad-hoc SQL over the driver tables (temp views)"
    )
    from .sources.io import TABLES

    a.add_argument("statement", help="ANSI SQL; tables: " + ", ".join(TABLES))
    a.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    a.add_argument("--limit", type=int, default=20,
                   help="rows to print (ignored with --out)")
    a.add_argument("--out", default=None, help="write result parquet here")
    a.add_argument("--explain", action="store_true",
                   help="print the formatted physical plan first")
    a.add_argument("--reducers", type=int, default=None)
    a.set_defaults(func=cmd_sql)
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
