"""Double-skew (both-inputs-skewed) join comparison — the reference's
last experiment without a measured analog (round-9 verdict #1).

The reference's ``simulation`` writes the SAME Zipf(0.5) row stream to
both join inputs (``DataGenerator.writeZipfBoth``,
``DataGenerator.java:240-259``; driven with ``--double-skew``,
``JoinSimulation.java:103-125``) and measures all three strategies at
3 M..30 M rows / 100 reducers:
``data/broadcast_vs_repartition_single_input.csv:2-11`` (identical to
``data/speedup_double_skew_0.5.csv``). Both sides skewed means the
join output is quadratic in the hot-key multiplicity (Σ cₖ²) — the
reference's merge wall blows up to 1664 s at 30 M rows and broadcast
beats repartition at every point (36.6 vs 56.6 s at 3 M, 206.5 vs
381.3 s at 30 M).

This tool measures the same cells on this engine: fact generated once
per point via ``generate_zipf_pair(double_skew=True)`` (the same
identical-streams semantics — both sides ARE the staged fact), staged
to parquet outside every timed span, then per strategy
``repeats`` interleaved runs through the noop sink, exactly the
bench.py methodology. Two broadcast columns:

* ``broadcast`` — under the production 512 MiB byte budget
  (``broadcast_budget_check``). A fact-sized build side crosses the
  budget beyond ~10 M rows and records a REFUSAL — the designed
  fail-fast posture (the reference discovered the same wall by GC
  death at a ~3.8 GB cached table, thesis ch. 6.3);
* ``broadcast_forced`` — budget deliberately waived for reference
  parity (their 17-node / ~187 GB-per-node cluster broadcast the full
  30 M-row input without refusing), so every reference cell gets a
  measured analog. Genuine failures record as ``failed``.

Artifacts are MERGE-ALWAYS (memory/spark-bench-hygiene): every
completed point is merged into BENCH_DETAIL.json's ``double_skew``
block immediately, so a crash can't lose earlier cells, and REPORT.md
re-renders in lockstep (test_report_drift contract).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from mapreduce_join_comparison_spark.generator import (  # noqa: E402
    generate_zipf_pair,
)
from mapreduce_join_comparison_spark.operators.joins import (  # noqa: E402
    advise_strategy,
    broadcast_budget_check,
    equi_join,
)
from mapreduce_join_comparison_spark.session import (  # noqa: E402
    LOCAL_SKEW_CONF,
    get_spark,
    scoped_conf,
)

REFERENCE_CITATION = (
    "data/broadcast_vs_repartition_single_input.csv:2-11 "
    "(= speedup_double_skew_0.5.csv; writeZipfBoth writes the "
    "identical Zipf row stream to both inputs, DataGenerator.java:240)"
)

# the reference CSV's walls live in cli.py next to their renderer
# (single home); the tool reuses them as its default point list
from mapreduce_join_comparison_spark.cli import (  # noqa: E402
    DOUBLE_SKEW_REFERENCE_WALLS as REFERENCE_WALLS,
)

GC_EVERY_RUN_ROWS = 12_000_000  # quadratic output => aggressive hygiene


def measure_point(spark, n_rows: int, skew: float, repeats: int) -> dict:
    from bench import materialize  # repo-root import, same noop sink

    stage = tempfile.mkdtemp(prefix="double_skew_")
    cell: dict = {}
    try:
        tg = time.monotonic()
        fact, _same = generate_zipf_pair(
            spark, n_rows, max(1, n_rows // 10), s=skew, seed=42,
            double_skew=True,
        )
        fact.write.parquet(os.path.join(stage, "fact"))
        cell["generate_stage_sec"] = round(time.monotonic() - tg, 3)
        spark._jvm.System.gc()
        time.sleep(1.0)
        fact = spark.read.parquet(os.path.join(stage, "fact"))
        # both sides are the SAME staged file (writeZipfBoth); the
        # probe side narrows to (k, a1) like every bench join — join
        # WORK (pair multiplication) is identical, carried payload is
        # the bench convention
        probe = fact.selectExpr("k AS dk", "a1 AS d1")

        pick, reason = advise_strategy(fact, probe, "k", "dk")
        cell["advisor"] = {"pick": pick, "reason": reason}
        # one narrow count proves the quadratic output size (evidence
        # for the Σ cₖ² blow-up; NOT part of any timed join wall)
        t0 = time.monotonic()
        cell["out_rows"] = equi_join(
            fact.select("k"), fact.selectExpr("k AS dk"),
            "k", "dk", "inner", "merge",
        ).count()
        cell["out_rows_count_sec"] = round(time.monotonic() - t0, 3)
        spark._jvm.System.gc()
        time.sleep(1.0)

        strategies = ["repartition", "merge", "broadcast",
                      "broadcast_forced"]
        runs: dict[str, list[float]] = {s: [] for s in strategies}
        refused: dict[str, str] = {}
        # production-budget broadcast: check once up front; a refusal
        # is the designed data point, not a crash. rows= engages the
        # schema-width floor (round-10: Catalyst's parquet estimate
        # sits ~25x under the real hash relation for dictionary-heavy
        # columns, so the estimate alone never trips at these sizes)
        # — and when the budget refuses, only broadcast_forced pays
        # for the actual measurement
        try:
            broadcast_budget_check(probe, rows=n_rows)
        except ValueError as e:
            refused["broadcast"] = f"ValueError (row floor): {str(e)[:200]}"

        with scoped_conf(spark, **LOCAL_SKEW_CONF):
            for _wave in range(repeats):
                for strategy in strategies:
                    if strategy in refused:
                        continue
                    phys = ("broadcast" if strategy == "broadcast_forced"
                            else strategy)
                    t0 = time.monotonic()
                    try:
                        materialize(
                            equi_join(fact, probe, "k", "dk", "inner",
                                      phys)
                        )
                    except Exception as e:  # noqa: BLE001
                        refused[strategy] = (
                            f"{type(e).__name__}: {str(e)[:200]}"
                        )
                        continue
                    runs[strategy].append(
                        round(time.monotonic() - t0, 3))
                    if n_rows >= GC_EVERY_RUN_ROWS:
                        spark._jvm.System.gc()
                        time.sleep(1.5)
        for strategy in strategies:
            if strategy in refused:
                key = ("refused" if strategy == "broadcast"
                       else "failed")
                cell[strategy] = {key: refused[strategy]}
            elif runs[strategy]:
                rs = runs[strategy]
                cell[strategy] = {
                    "median": round(statistics.median(rs), 3),
                    "min": min(rs), "max": max(rs), "runs": rs,
                }
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return cell


def merge_cell(detail_path: str, skew: float, repeats: int,
               n_rows: int, cell: dict) -> None:
    """Merge one completed point into the committed detail and
    re-render REPORT.md — crash-safe per-point persistence."""
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, ValueError):
        detail = {}
    block = detail.setdefault("double_skew", {})
    block["skew"] = skew
    block["repeats"] = repeats
    block["unique_frac"] = 0.1
    block["reference"] = REFERENCE_CITATION
    block.setdefault("cells", {})[str(n_rows)] = cell
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    from mapreduce_join_comparison_spark.cli import render_report

    render_report(csv=[], detail=detail_path,
                  out=os.path.join(REPO, "REPORT.md"), svg=None)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--rows-list",
        default=",".join(str(r) for r in sorted(REFERENCE_WALLS)),
        help="comma-separated row counts (default: the reference's "
             "3M..30M by 3M)",
    )
    ap.add_argument("--skew", type=float, default=0.5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--detail",
                    default=os.path.join(REPO, "BENCH_DETAIL.json"))
    args = ap.parse_args()

    rows_list = [int(r) for r in args.rows_list.split(",") if r]
    spark = get_spark("double_skew_bench")
    for n_rows in rows_list:
        t0 = time.monotonic()
        cell = measure_point(spark, n_rows, args.skew, args.repeats)
        cell["point_wall_sec"] = round(time.monotonic() - t0, 3)
        merge_cell(args.detail, args.skew, args.repeats, n_rows, cell)
        print(json.dumps({str(n_rows): cell}), flush=True)
        spark._jvm.System.gc()
        time.sleep(2.0)
    print(f"merged double_skew into {args.detail} and re-rendered "
          f"REPORT.md")


if __name__ == "__main__":
    main()
