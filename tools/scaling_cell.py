#!/usr/bin/env python
"""Round-11 parallel-scaling evidence cell (r10 verdict directive #5):
time a few compute-heavy catalog keys at sf1 (tools/gen_sf1.py --full
data) under local[8] vs local[32] and record the ratio — the empirical
counterpart to the plan-based scale story (at sf0.1 every table is
≤11 MB and wall is job-count overhead, so the driver's 8↔32-core
ratios are ≈1 and prove nothing about parallelism).

Usage:
    python tools/gen_sf1.py /tmp/spark_graft_sf1 --full
    SPARK_GRAFT_CPUS=8  python tools/scaling_cell.py
    SPARK_GRAFT_CPUS=32 python tools/scaling_cell.py

Each run appends {cpus, key -> {median,runs}, anchor} to
SCALING_r11.json (merged by cpu count). Same methodology as bench.py:
noop sink, interleaved warm repeats, calibration anchor per wave.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALING_r11.json")

KEYS = os.environ.get(
    "SPARK_GRAFT_SCALE_KEYS",
    "tpch_q1_pricing_summary,dedup_prefix_filter_indexed,"
    "similarity_projected_rerank",
).split(",")


def main() -> None:
    from bench import calibration_anchor, materialize

    from mapreduce_join_comparison_spark import queries_catalog
    from mapreduce_join_comparison_spark.session import get_spark

    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    spark = get_spark(app_name=f"scaling-{CPUS}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    runs: dict[str, list[float]] = {k: [] for k in KEYS}
    anchors: list[float] = []
    for _ in range(repeats):
        anchors.append(calibration_anchor(spark))
        for key in KEYS:
            spark.sparkContext.setJobDescription(f"scaling {key}")
            t0 = time.monotonic()
            materialize(queries_catalog.QUERIES[key](spark, SF_DIR))
            runs[key].append(round(time.monotonic() - t0, 3))

    cell = {
        "cpus": int(CPUS),
        "sf_dir": SF_DIR,
        "anchor": round(statistics.median(anchors), 3),
        "queries": {
            k: {"median": round(statistics.median(v), 3), "runs": v}
            for k, v in runs.items()
        },
    }
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    prev = merged.get(str(cell["cpus"]), {})
    cell["queries"] = {**prev.get("queries", {}), **cell["queries"]}
    merged[str(cell["cpus"])] = cell
    a, b = merged.get("8"), merged.get("32")
    if a and b:
        common = set(a.get("queries", {})) & set(b.get("queries", {}))
        merged["speedup_8_to_32"] = {
            k: round(a["queries"][k]["median"] / b["queries"][k]["median"], 2)
            for k in sorted(common)
        }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(cell))


if __name__ == "__main__":
    main()
