"""Merge-join survival evidence at the reference's failure bound
(round-8 verdict directive #4).

The reference's sort-merge join stops completing at skew 1.2 once the
input passes ~36M rows: ``data/results_speedup_1.2.csv:13-15`` records
t=0 rows for merge at 36M/39M/42M while repartition keeps finishing
(thesis figs. 6.3-6.4 — the hot Zipf key overflows one reducer's
merge buffer and the job dies). Our posture is that the same plan
SURVIVES on Spark: AQE's skew-split shuffle read breaks the hot key's
partition into byte-bounded slices at runtime and the sort spills
rather than OOMs.

This tool turns that claim into a measured artifact: it generates the
exact failure-bound cell (40M rows, skew 1.2 — inside the reference's
dead band), runs OUR merge join on it, and records

  * the measured walls (median of ``--repeats`` runs, same
    methodology as bench.py's sweep: staged parquet inputs,
    noop-sink materialization, LOCAL_SKEW_CONF),
  * whether the executed adaptive plan really contains a skew-split
    shuffle-read marker (``skewed`` / ``skew=true`` — the same
    assertion tests/test_skew_aqe.py pins at 3M rows, here captured
    at the reference's actual failure scale),
  * the reference citation it answers,

then MERGES the result into BENCH_DETAIL.json under
``merge_survival`` (bench.merge_details keeps unknown committed keys,
so later driver bench runs can't clobber it) and re-renders REPORT.md
so the callout and the artifact stay in lockstep.

Usage: python tools/merge_survival.py [--rows 40000000] [--skew 1.2]
       [--repeats 3] [--detail BENCH_DETAIL.json]
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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.generator import generate_zipf_pair
from mapreduce_join_comparison_spark.operators.joins import equi_join
from mapreduce_join_comparison_spark.session import (
    LOCAL_SKEW_CONF,
    get_spark,
    scoped_conf,
)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# the reference rows this measurement answers: merge t=0 (failed) at
# 36M/39M/42M rows, skew 1.2, while repartition completed
REFERENCE_CITATION = (
    "data/results_speedup_1.2.csv:13-15 (merge t=0 at 36M/39M/42M rows)"
)


def _executed_plan(df) -> str:
    """Run a payload-touching aggregate over the join and return ITS
    executed adaptive plan (tests/test_skew_aqe.py:41-54 — a bare
    count() lets column pruning shrink the shuffle below any skew
    threshold, voiding the evidence)."""
    probe = df.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("a1")).alias("_la"),
        F.sum(F.length("d1")).alias("_ld"),
    )
    (row,) = probe.collect()
    assert row["n"] > 0
    return probe._jdf.queryExecution().executedPlan().toString()


def measure(spark, n_rows: int, skew: float, repeats: int) -> dict:
    from bench import materialize  # repo-root import, same noop sink

    stage = tempfile.mkdtemp(prefix="merge_survival_")
    out: dict = {
        "rows": n_rows,
        "skew": skew,
        "repeats": repeats,
        "reference": REFERENCE_CITATION,
    }
    try:
        tg = time.monotonic()
        dim, fact = generate_zipf_pair(
            spark, n_rows, max(1, n_rows // 10), s=skew, seed=42
        )
        fact.write.parquet(os.path.join(stage, "fact"))
        dim.write.parquet(os.path.join(stage, "dim"))
        out["generate_stage_sec"] = round(time.monotonic() - tg, 3)
        fact = spark.read.parquet(os.path.join(stage, "fact"))
        dim = spark.read.parquet(os.path.join(stage, "dim"))

        runs: list[float] = []
        with scoped_conf(spark, **LOCAL_SKEW_CONF):
            joined = equi_join(
                fact, dim.selectExpr("k AS dk", "a1 AS d1"),
                "k", "dk", "inner", "merge",
            )
            for _ in range(repeats):
                t0 = time.monotonic()
                materialize(joined)
                runs.append(round(time.monotonic() - t0, 3))
            # evidence pass (separately timed — the probe aggregate is
            # not part of the join wall): does the executed adaptive
            # plan contain the skew-split shuffle read?
            t0 = time.monotonic()
            plan = _executed_plan(joined)
            evidence_sec = round(time.monotonic() - t0, 3)
        out["merge"] = {
            "median": round(statistics.median(runs), 3),
            "min": min(runs), "max": max(runs), "runs": runs,
        }
        out["skew_split_in_plan"] = (
            "skewed" in plan or "skew=true" in plan
        )
        out["evidence_run_sec"] = evidence_sec
        # keep a one-line excerpt of the marker so the artifact is
        # self-certifying without shipping the whole plan
        marker_lines = [
            ln.strip() for ln in plan.splitlines()
            if "skew" in ln.lower()
        ]
        out["plan_marker"] = marker_lines[0][:200] if marker_lines else None
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=40_000_000)
    ap.add_argument("--skew", type=float, default=1.2)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--detail",
                    default=os.path.join(REPO, "BENCH_DETAIL.json"))
    args = ap.parse_args()

    spark = get_spark("merge_survival")
    result = measure(spark, args.rows, args.skew, args.repeats)
    print(json.dumps(result, indent=2))
    if not result["skew_split_in_plan"]:
        sys.exit(
            "executed plan shows NO skew-split marker — the evidence "
            "claim would be false; not writing the artifact"
        )

    if os.path.exists(args.detail):
        with open(args.detail) as f:
            detail = json.load(f)
    else:
        detail = {}
    detail["merge_survival"] = result
    with open(args.detail, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=False)
        f.write("\n")
    # re-render REPORT.md in lockstep (test_report_drift contract)
    from mapreduce_join_comparison_spark.cli import render_report

    render_report(csv=[], detail=args.detail,
                  out=os.path.join(REPO, "REPORT.md"), svg=None)
    print(f"merged merge_survival into {args.detail} and re-rendered "
          f"REPORT.md")


if __name__ == "__main__":
    main()
