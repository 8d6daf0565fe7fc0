#!/usr/bin/env python
"""Per-query cost breakdown for the headline bench (round 10, guide §1).

For every headline catalog key, separately times

  * ``construct`` — the ``fn(spark, sf_dir)`` call itself: pure
    driver-side plan building PLUS any eager jobs the operator runs at
    construction (statistics probes, index builds, persisted staging);
  * ``execute`` — the noop-sink materialization of the returned
    DataFrame (identical to bench.py's timed span minus construct);

and counts the Spark JOBS each phase submitted (job-group tagged).
High construct share = driver-side/eager-job bound, not scan bound;
high job count at sf0.1 = per-job scheduling overhead dominates, and
the fix is fewer jobs/stages, not faster per-row code.

Usage: python tools/profile_queries.py [key ...]   (default: headline)
Writes /tmp/query_profile.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE, materialize

    from mapreduce_join_comparison_spark import queries_catalog
    from mapreduce_join_comparison_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    # JVM/session warmup (same as bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()

    rows = []
    for name in names:
        fn = queries_catalog.QUERIES[name]
        g_c, g_e = f"prof-c-{name}", f"prof-e-{name}"
        spark.sparkContext.setJobGroup(g_c, name)
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        t1 = time.monotonic()
        spark.sparkContext.setJobGroup(g_e, name)
        materialize(df)
        t2 = time.monotonic()
        spark.sparkContext.setJobGroup("prof-idle", "idle")
        jobs_c = len(tracker.getJobIdsForGroup(g_c))
        jobs_e = len(tracker.getJobIdsForGroup(g_e))
        rows.append({
            "name": name,
            "construct_sec": round(t1 - t0, 3),
            "execute_sec": round(t2 - t1, 3),
            "total_sec": round(t2 - t0, 3),
            "jobs_construct": jobs_c,
            "jobs_execute": jobs_e,
        })
        print(f"{name:40s} c={t1-t0:6.2f}s ({jobs_c:2d} jobs)  "
              f"e={t2-t1:6.2f}s ({jobs_e:2d} jobs)", flush=True)

    rows.sort(key=lambda r: -r["total_sec"])
    with open("/tmp/query_profile.json", "w") as f:
        json.dump(rows, f, indent=1)
    tot = sum(r["total_sec"] for r in rows)
    tot_c = sum(r["construct_sec"] for r in rows)
    tot_j = sum(r["jobs_construct"] + r["jobs_execute"] for r in rows)
    print(f"\nTOTAL {tot:.1f}s  construct {tot_c:.1f}s "
          f"({100 * tot_c / max(tot, 1e-9):.0f}%)  jobs {tot_j}")
    print("top 25 by total:")
    for r in rows[:25]:
        print(f"{r['total_sec']:7.2f}  c={r['construct_sec']:6.2f} "
              f"e={r['execute_sec']:6.2f}  jc={r['jobs_construct']:2d} "
              f"je={r['jobs_execute']:2d}  {r['name']}")


if __name__ == "__main__":
    main()
