"""Pre-sorted bucketed merge-join cell at the very-large point
(round-9 verdict directive #3 — close the merge@200M `weak` cell with
a like-for-like measurement).

The reference's 59.6 s at 200 M rows (``data/results 2018-09-22
23:50:03_large_0,5.csv``, ``t_merge_3``) is its merge STAGE alone:
jobs 1-2 had already key-extracted and totally sorted both inputs
(same row: 17.7 + 25.6 + 32.7 s, first key-extract unrecorded), and
the merge stage zips pre-sorted co-partitioned runs
(``MergeJoin.java:217-251``). Our committed ``merge`` cell is the
whole SortMergeJoin — shuffle AND sort included — so comparing it to
59.6 s understates the engine.

This tool measures the actual like-for-like: both sides staged as
co-bucketed, per-bucket-sorted tables (``sources/io.write_bucketed``
— the S4 composite-scan capability, sort paid at write time exactly
like the reference's sorting jobs; each side repartitioned to one
file per bucket so the scan REPORTS the sort order and Spark elides
both the Exchange and the Sort), then the join stage alone is timed
through the noop sink. The executed plan is captured and the artifact
records whether it is genuinely Exchange-free and Sort-free — a cell
that silently re-sorted would be the old comparison again, so the
plan check gates the artifact the same way merge_survival's
skew-split marker does.

Merges a ``merge_presorted`` block into BENCH_DETAIL.json and
re-renders REPORT.md + figures in lockstep (the very-large callout
prints the cell alongside the fair-comparator framing).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_join_comparison_spark.generator import (  # noqa: E402
    generate_dim,
    stage_zipf_fact_chunked,
)
from mapreduce_join_comparison_spark.session import (  # noqa: E402
    get_spark,
)
from mapreduce_join_comparison_spark.sources.io import (  # noqa: E402
    drop_table_and_stale_dir,
    write_bucketed,
)

REFERENCE_CITATION = (
    "data/results 2018-09-22 23:50:03_large_0,5.csv:2 t_merge_3 "
    "(59.6 s merge stage at 200M; sorts paid by the earlier jobs of "
    "the same row)"
)


def _sort_nodes(plan: str) -> list[str]:
    """Physical-plan lines whose node is a SortExec — 'Sort [...'
    but NOT 'SortMergeJoin [...'."""
    return [
        ln.strip() for ln in plan.splitlines()
        if re.search(r"(?<![A-Za-z])Sort \[", ln)
        and "SortMergeJoin" not in ln
    ]


def measure(spark, n_rows: int, skew: float, repeats: int,
            n_buckets: int, chunks: int, stage_root: str) -> dict:
    from bench import materialize

    stage = tempfile.mkdtemp(prefix="merge_staged_", dir=stage_root)
    out: dict = {
        "rows": n_rows, "skew": skew, "repeats": repeats,
        "n_buckets": n_buckets, "reference": REFERENCE_CITATION,
    }
    fact_t, dim_t = "ms_fact", "ms_dim"
    try:
        # ---- staging job (the analog of the reference's jobs 1-2:
        # key-extract + total sort; NOT part of the merge wall) ----
        tg = time.monotonic()
        raw = os.path.join(stage, "raw_fact")
        stage_zipf_fact_chunked(
            spark, n_rows, max(1, n_rows // 10), skew, raw,
            seed=42, chunks=chunks,
        )
        fact_raw = spark.read.parquet(raw)
        # one file per bucket: repartition on the bucket column so
        # the scan reports the per-bucket sort order and the join
        # elides Exchange AND Sort (multi-file buckets keep only the
        # partitioning, and Spark re-sorts)
        write_bucketed(
            fact_raw.repartition(n_buckets, F.col("k")),
            fact_t, ["k"], n_buckets,
            path=os.path.join(stage, fact_t),
        )
        dim = generate_dim(spark, max(1, n_rows // 10), seed=42)
        write_bucketed(
            dim.selectExpr("k", "a1 AS d1")
            .repartition(n_buckets, F.col("k")),
            dim_t, ["k"], n_buckets,
            path=os.path.join(stage, dim_t),
        )
        out["stage_sec"] = round(time.monotonic() - tg, 3)
        spark._jvm.System.gc()
        time.sleep(2.0)

        fact = spark.table(fact_t)
        probe = spark.table(dim_t)
        joined = fact.hint("merge").join(probe, "k", "inner")

        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.monotonic()
            materialize(joined)
            runs.append(round(time.monotonic() - t0, 3))
            spark._jvm.System.gc()
            time.sleep(2.0)
        out["merge"] = {
            "median": round(statistics.median(runs), 3),
            "min": min(runs), "max": max(runs), "runs": runs,
        }
        # evidence pass: payload-touching aggregate's EXECUTED plan
        # (a bare count would let pruning change the scan shape)
        probe_agg = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("a1")).alias("_la"),
            F.sum(F.length("d1")).alias("_ld"),
        )
        (row,) = probe_agg.collect()
        assert row["n"] > 0
        plan = probe_agg._jdf.queryExecution().executedPlan().toString()
        sorts = _sort_nodes(plan)
        has_exchange = any(
            "Exchange" in ln and "BroadcastExchange" not in ln
            for ln in plan.splitlines()
        )
        out["no_exchange_no_sort"] = not has_exchange and not sorts
        out["plan_marker"] = (
            "SortMergeJoin over bucketed scans; no Exchange, no Sort"
            if out["no_exchange_no_sort"]
            else (sorts + ["EXCHANGE PRESENT"] if has_exchange
                  else sorts)[0][:200]
        )
    finally:
        for t in (fact_t, dim_t):
            try:
                drop_table_and_stale_dir(spark, t)
            except Exception:  # noqa: BLE001 — cleanup only
                pass
        shutil.rmtree(stage, ignore_errors=True)
        spark._jvm.System.gc()
        time.sleep(2.0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=200_000_000)
    ap.add_argument("--skew", type=float, default=0.5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--stage-root", default="/root")
    ap.add_argument("--detail",
                    default=os.path.join(REPO, "BENCH_DETAIL.json"))
    args = ap.parse_args()

    spark = get_spark("merge_staged")
    result = measure(spark, args.rows, args.skew, args.repeats,
                     args.buckets, args.chunks, args.stage_root)
    print(json.dumps(result, indent=2), flush=True)
    if not result.get("no_exchange_no_sort"):
        sys.exit(
            "executed plan still contains an exchange or a sort — the "
            "like-for-like claim would be false; not writing the "
            "artifact"
        )
    try:
        with open(args.detail) as f:
            detail = json.load(f)
    except (OSError, ValueError):
        detail = {}
    detail["merge_presorted"] = result
    with open(args.detail, "w") as f:
        json.dump(detail, f, indent=1)
    from mapreduce_join_comparison_spark.cli import (
        generate_figures,
        render_report,
    )

    render_report(csv=[], detail=args.detail,
                  out=os.path.join(REPO, "REPORT.md"), svg=None)
    generate_figures(args.detail, os.path.join(REPO, "figures"))
    print(f"merged merge_presorted into {args.detail}; REPORT.md + "
          f"figures re-rendered")


if __name__ == "__main__":
    main()
