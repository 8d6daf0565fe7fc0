"""Scaleup-curve tail past 200 M rows (round-9 verdict directive #2).

The reference's large sweep (``data/results 2018-09-22
23:50:03_large_0,5.csv:2-11``) runs 200 M..2 B rows / skew 0.5 /
no-broadcast on the 17-node cluster; our committed curve stops at
200 M because the 400 M GENERATION died on single-node disk — one
monolithic write job held ~2×|data| of coexisting wide-stage map
outputs against ~80 GB free (ROUND9.md). This tool stages the fact
with ``stage_zipf_fact_chunked`` instead: k independent narrow
range→project→write jobs, zero Exchange, peak scratch O(|data|/k) —
then measures the same interleaved join runs as ``bench_zipf_joins``
(staged parquet inputs, noop sink, LOCAL_SKEW_CONF, median of
``--repeats``) and MERGES the cell into BENCH_DETAIL.json's
``skew_curve*`` maps through ``bench.merge_details`` (union of row
points — committed cells always survive), re-rendering REPORT.md +
figures in lockstep.

Disk hygiene per memory/spark-bench-hygiene: JVM GC after staging and
after EVERY join run (the ≥100 M rule), and the tool checks free disk
before each strategy — a strategy whose projected shuffle footprint
exceeds free space is recorded as a refusal with the reason, never an
ENOSPC crash that loses the artifact.
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
    generate_dim,
    stage_zipf_fact_chunked,
)
from mapreduce_join_comparison_spark.operators.joins import (  # noqa: E402
    advise_strategy,
    equi_join,
)
from mapreduce_join_comparison_spark.session import (  # noqa: E402
    LOCAL_SKEW_CONF,
    get_spark,
    scoped_conf,
)

REFERENCE_CITATION = (
    "data/results 2018-09-22 23:50:03_large_0,5.csv:2-11 "
    "(200M..2B rows, skew 0.5, no-broadcast, 17-node cluster)"
)

# raw row ≈ 8B key + 200B pooled strings; shuffle files are lz4 of
# serialized rows and the 100-string pools recur heavily, so the
# on-disk footprint is well under raw. 75 B/row is a conservative
# projection (≈0.35 of raw) chosen to refuse BEFORE any plausible
# ENOSPC; the tool prints measured scratch so the constant can be
# tightened from real telemetry.
SHUFFLE_BYTES_PER_ROW = 75


def free_bytes(path: str) -> int:
    st = os.statvfs(path)
    return st.f_bavail * st.f_frsize


def measure_tail_point(
    spark, n_rows: int, skew: float, repeats: int, chunks: int,
    strategies: list[str], stage_root: str,
) -> tuple[dict[str, dict], dict]:
    from bench import materialize  # repo-root import, same noop sink

    stage = tempfile.mkdtemp(prefix="scaleup_tail_", dir=stage_root)
    detail: dict = {"repeats": repeats, "join": {},
                    "staging": {"chunks": chunks}}
    out: dict[str, dict] = {}
    try:
        tg = time.monotonic()
        stage_zipf_fact_chunked(
            spark, n_rows, max(1, n_rows // 10), skew,
            os.path.join(stage, "fact"), seed=42, chunks=chunks,
        )
        generate_dim(
            spark, max(1, n_rows // 10), seed=42
        ).write.parquet(os.path.join(stage, "dim"))
        detail["generate_stage_sec"] = round(time.monotonic() - tg, 3)
        spark._jvm.System.gc()
        time.sleep(2.0)
        fact = spark.read.parquet(os.path.join(stage, "fact"))
        dim = spark.read.parquet(os.path.join(stage, "dim"))
        probe = dim.selectExpr("k AS dk", "a1 AS d1")
        try:
            pick, reason = advise_strategy(fact, probe, "k", "dk")
            detail["advisor"] = {"pick": pick, "reason": reason}
        except Exception as e:  # noqa: BLE001 — advisory only
            detail["advisor"] = {"pick": None,
                                 "reason": f"ERROR {type(e).__name__}"}

        runs: dict[str, list[float]] = {s: [] for s in strategies}
        refused: dict[str, str] = {}
        with scoped_conf(spark, **LOCAL_SKEW_CONF):
            for _wave in range(repeats):
                for strategy in strategies:
                    if strategy in refused:
                        continue
                    # shuffling strategies need ~|both sides| of
                    # scratch (merge adds sort spill); refuse BEFORE
                    # the run rather than ENOSPC mid-artifact
                    need = 0
                    if strategy in ("repartition", "merge"):
                        need = int(n_rows * 1.1 * SHUFFLE_BYTES_PER_ROW)
                        if strategy == "merge":
                            need = int(need * 1.8)  # sort spill
                    if need and free_bytes(stage) < need:
                        refused[strategy] = (
                            f"projected scratch {need >> 30} GiB exceeds "
                            f"free {free_bytes(stage) >> 30} GiB — "
                            "single-node disk bound (per-executor on a "
                            "cluster); cell skipped, not crashed"
                        )
                        continue
                    t0 = time.monotonic()
                    try:
                        materialize(
                            equi_join(fact, probe, "k", "dk", "inner",
                                      strategy)
                        )
                    except Exception as e:  # noqa: BLE001
                        refused[strategy] = (
                            f"{type(e).__name__}: {str(e)[:200]}"
                        )
                        continue
                    runs[strategy].append(
                        round(time.monotonic() - t0, 3))
                    spark._jvm.System.gc()
                    time.sleep(2.0)
        for strategy in strategies:
            if strategy in refused:
                detail["join"][strategy] = {"refused": refused[strategy]}
            elif runs[strategy]:
                rs = runs[strategy]
                med = round(statistics.median(rs), 3)
                out[strategy] = med
                detail["join"][strategy] = {
                    "median": med, "min": min(rs), "max": max(rs),
                    "runs": rs,
                }
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        spark._jvm.System.gc()
        time.sleep(2.0)
    return out, detail


def merge_point(detail_path: str, n_rows: int, skew: float,
                timings: dict, detail: dict) -> None:
    """Merge one measured tail cell into the committed detail via the
    bench's own merge semantics (union of row points) and re-render
    REPORT.md + figures."""
    import bench

    rows_s, skew_s = str(n_rows), str(skew)
    fresh = {
        "skew_curve": {rows_s: {skew_s: dict(timings)}},
        "skew_curve_generate": {
            rows_s: {skew_s: detail.get("generate_stage_sec")}},
        "skew_curve_spread": {rows_s: {skew_s: detail.get("join", {})}},
        "skew_curve_advisor": {
            rows_s: {skew_s: detail.get("advisor", {})}},
    }
    try:
        with open(detail_path) as f:
            committed = json.load(f)
    except (OSError, ValueError):
        committed = {}
    merged = bench.merge_details(committed, fresh)
    with open(detail_path, "w") as f:
        json.dump(merged, f, indent=1)
    from mapreduce_join_comparison_spark.cli import (
        generate_figures,
        render_report,
    )

    render_report(csv=[], detail=detail_path,
                  out=os.path.join(REPO, "REPORT.md"), svg=None)
    generate_figures(detail_path, os.path.join(REPO, "figures"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=400_000_000)
    ap.add_argument("--skew", type=float, default=0.5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--strategies",
                    default="repartition,broadcast,merge")
    ap.add_argument("--stage-root", default="/root",
                    help="filesystem with the most free space")
    ap.add_argument("--detail",
                    default=os.path.join(REPO, "BENCH_DETAIL.json"))
    args = ap.parse_args()

    spark = get_spark("scaleup_tail")
    strategies = [s for s in args.strategies.split(",") if s]
    timings, detail = measure_tail_point(
        spark, args.rows, args.skew, args.repeats, args.chunks,
        strategies, args.stage_root,
    )
    print(json.dumps({"rows": args.rows, "skew": args.skew,
                      "reference": REFERENCE_CITATION,
                      "timings": timings, "detail": detail}),
          flush=True)
    merge_point(args.detail, args.rows, args.skew, timings, detail)
    print(f"merged {args.rows} / {args.skew} into {args.detail}; "
          f"REPORT.md + figures re-rendered")


if __name__ == "__main__":
    main()
