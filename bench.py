#!/usr/bin/env python
"""Benchmark harness — the reference's ``JoinSimulation`` (B1/B2/B3,
``JoinSimulation.java:87-316``) as a Spark driver script.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

Per-query timing wraps a full materialization (noop sink — forces every
operator, pays no write cost), the analog of the reference's
``JobUtils.time`` around ``waitForCompletion`` (``JobUtils.java:17-31``)
— but failures raise instead of recording 0 ns (reference bug, SURVEY
§4.3).

Also mirrors the reference's experiment matrix: the three join
strategies over a generated Zipf pair (the actual workload
JoinSimulation benchmarks), plus the scale-extension operators.
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


def bench_queries(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, float]:
    from mapreduce_join_comparison_spark import queries_catalog

    picked = names or HEADLINE
    out: dict[str, float] = {}
    for name in picked:
        fn = queries_catalog.QUERIES[name]
        t0 = time.monotonic()
        materialize(fn(spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def bench_zipf_joins(spark, n_rows: int, skew: float) -> dict[str, float]:
    """The reference's core benchmark: dim ⋈ zipf-fact under each
    strategy (JoinSimulation.java:154-210), data generated on the fly."""
    from mapreduce_join_comparison_spark.generator import generate_zipf_pair
    from mapreduce_join_comparison_spark.operators.joins import equi_join

    out: dict[str, float] = {}
    dim, fact = generate_zipf_pair(
        spark, n_rows, max(1, n_rows // 10), s=skew, seed=42
    )
    dim = dim.cache()
    fact = fact.cache()
    materialize(fact)  # generation cost paid once, like the reference
    materialize(dim)
    for strategy in ("repartition", "broadcast", "merge"):
        t0 = time.monotonic()
        materialize(
            equi_join(fact, dim.selectExpr("k AS dk", "a1 AS d1"), "k", "dk",
                      "inner", strategy)
        )
        out[f"zipf_join_{strategy}"] = round(time.monotonic() - t0, 3)
    dim.unpersist()
    fact.unpersist()
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
    "events_windowed_agg",
    "events_sessionize",
    "pipeline_training_data",
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--rows", type=int, default=1_000_000,
                    help="generated zipf pair size (reference --rows)")
    ap.add_argument("--zipf-skew", type=float, default=0.8,
                    help="reference --zipf-skew")
    ap.add_argument("--no-generated", action="store_true",
                    help="skip the generated-data join sweep")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    from mapreduce_join_comparison_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen AND the OS page cache / parquet footers so
    # query 1 isn't charged for process startup or cold reads that no
    # other query pays (reference analog: JoinSimulation times jobs
    # after data generation already touched the files)
    spark.range(1000).selectExpr("sum(id)").collect()
    from mapreduce_join_comparison_spark.sources.io import TABLES

    for t in TABLES:
        try:
            spark.read.parquet(os.path.join(args.sf_dir, f"{t}.parquet")).count()
        except Exception:
            pass

    t0 = time.monotonic()
    queries = bench_queries(spark, args.sf_dir, args.queries)
    if not args.no_generated:
        queries.update(bench_zipf_joins(spark, args.rows, args.zipf_skew))
    total = round(time.monotonic() - t0, 3)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "total_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else args.sf_dir,
    }))


if __name__ == "__main__":
    main()
