"""Adversarial hot-cluster dedup soak (round-7 verdict directive #4):
run the prefix-filter family and MinHash-LSH on a corpus with ONE
pathological near-duplicate cluster and PIN per-task volume.

The realistic-vocab soak (DEDUP_SOAK.json) proved the AVERAGE case;
this corpus is the worst case the hot-group salt-splits exist for:
``cluster`` independent ~2 %-mutated copies of one document inside
``docs`` total (gen_sf1.gen_documents_adversarial). Every pair within
the cluster exceeds the Jaccard threshold, so

  * the TRUE output is quadratic in the cluster (~c²/2 pairs) — no
    operator can emit fewer rows; the scale question is whether the
    work is DISTRIBUTED;
  * every prefix shingle of a cluster member has a ~c-long posting
    list, and every LSH band bucket holds the whole cluster — the
    single-task cross-product bomb AQE cannot split (it splits shuffle
    partitions, never one grouping key / join key).

Per key this records wall time, output rows, peak intermediate rows
(``plans.metrics.peak_intermediate_rows``), and — the point — PER-TASK
maxima from the app-status store (``plans.metrics.peak_task_metrics``):
max task runtime and max task shuffle-read bytes. With the round-8
salt-splits (``_prefix_candidates`` hot-sid triangle cells,
``minhash_lsh_pairs`` hot-bucket triangle, ``_simhash_candidate_pairs``
since round 7) the per-task maxima stay near cap-sized cells; before
them one task owned the cluster's entire pair space.

A smaller tier (--exact-docs, default 3000 docs / 600 cluster) runs
FULL value parity against the registered naive DuckDB oracles, so the
guard's exactness is proven on the adversarial shape too, not just on
the crafted pytest fixtures.

Results write incrementally to ADVERSARIAL_SOAK.json.

Usage: python tools/adversarial_soak.py [--docs 50000]
       [--cluster 10000] [--keys k1 k2 ...] [--skip-parity] [--resume]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import gen_sf1
from mapreduce_join_comparison_spark import queries_catalog as qc
from mapreduce_join_comparison_spark.plans.metrics import (
    collect_plan_metrics,
    max_stage_id,
    peak_intermediate_rows,
    peak_task_metrics,
)
from mapreduce_join_comparison_spark.session import get_spark

KEYS = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_prefix_filter",
    "dedup_prefix_filter_indexed",
    "dedup_prefix_filter_delta",
]

DELTA_KEYS = {"dedup_prefix_filter_delta"}


def _naive_pairs(key: str, n_docs: int) -> int:
    if key in DELTA_KEYS:
        n_delta = n_docs // 10
        return n_delta * (n_docs - n_delta)
    return n_docs * (n_docs - 1) // 2


def _corpus(n_docs: int, cluster: int) -> str:
    out = f"/tmp/spark_graft_adversarial_{n_docs}_{cluster}"
    marker = os.path.join(out, "documents.parquet")
    if not os.path.exists(marker):
        gen_sf1.generate(out, n_docs=n_docs, n_vecs=1000,
                         adversarial_cluster=cluster)
    return out


def _run_key(spark, key: str, sf_dir: str, n_docs: int) -> dict:
    checkpoint = max_stage_id(spark)
    t0 = time.monotonic()
    df = qc.QUERIES[key](spark, sf_dir)
    construct = time.monotonic() - t0  # eager index builds live here
    stats = collect_plan_metrics(df)
    peak = peak_intermediate_rows(stats)
    naive = _naive_pairs(key, n_docs)
    tasks = peak_task_metrics(spark, since=checkpoint)
    return {
        "n_docs": n_docs,
        "construct_sec": round(construct, 3),
        "exec_sec": stats.wall_seconds,
        "wall_sec": round(construct + stats.wall_seconds, 3),
        "output_rows": stats.output_rows,
        "peak_rows": peak,
        "naive_pairs": naive,
        "prune_ratio": (round(peak / naive, 10)
                        if peak is not None else None),
        "tasks": tasks,
    }


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 9)
    return value


def _parity(spark, key: str, sf_dir: str, con) -> dict:
    t0 = time.monotonic()
    df = qc.QUERIES[key](spark, sf_dir)
    s_rows = sorted(
        tuple(_normalize(r[c]) for c in sorted(df.columns))
        for r in df.collect()
    )
    s_sec = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    res = con.execute(qc.ORACLES[key])
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    o_rows = sorted(
        tuple(_normalize(r[i]) for i in order) for r in res.fetchall()
    )
    o_sec = round(time.monotonic() - t0, 3)
    return {
        "rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "match": s_rows == o_rows,
        "spark_sec": s_sec,
        "oracle_sec": o_sec,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--cluster", type=int, default=10_000)
    ap.add_argument("--exact-docs", type=int, default=3_000)
    ap.add_argument("--exact-cluster", type=int, default=600)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "ADVERSARIAL_SOAK.json"))
    ap.add_argument("--keys", nargs="*", default=None)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    keys = args.keys or KEYS

    record: dict = {
        "corpus": (
            f"gen_sf1 adversarial: {args.docs} docs with ONE "
            f"{args.cluster}-member ~2%-mutated near-duplicate cluster "
            "(realistic 50k-word Zipf background, no other dups)"
        ),
        "runs": {},
        f"parity_{args.exact_docs}": {},
    }
    # ALWAYS merge into the committed artifact (same lesson as
    # bench.py / sf1_soak.py: a --keys subset run must re-record only
    # what it ran, never clobber the rest); --resume additionally
    # SKIPS keys already recorded in this corpus bucket
    if os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                prev = json.load(fh)
            prev.setdefault("runs", {})
            prev.setdefault(f"parity_{args.exact_docs}", {})
            # per-bucket corpus descriptions: the top-level "corpus"
            # must not be rewritten to THIS run's params while other
            # runs-buckets measured under different ones survive the
            # merge (round-9 review) — each bucket records its own.
            # Legacy single-"corpus" files migrate it to every bucket
            # that already exists (they were all written under it).
            legacy = prev.pop("corpus", None)
            prev.setdefault("corpora", {})
            if legacy:
                for bkey in prev["runs"]:
                    prev["corpora"].setdefault(bkey, legacy)
            record = prev
        except (OSError, json.JSONDecodeError):
            pass
    this_desc = record.pop("corpus", None) or (
        f"gen_sf1 adversarial: {args.docs} docs with ONE "
        f"{args.cluster}-member ~2%-mutated near-duplicate cluster "
        "(realistic 50k-word Zipf background, no other dups)"
    )
    record.setdefault("corpora", {})[
        f"{args.docs}_{args.cluster}"] = this_desc

    def flush() -> None:
        with open(args.out, "w") as fh:
            json.dump(record, fh, indent=1)

    spark = get_spark(app_name="adversarial-soak", extra_conf={
        "spark.driver.memory":
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "spark.shuffle.compress": "true",
        "spark.io.compression.codec": "zstd",
        # keep the whole task history readable after each key's run
        "spark.ui.retainedStages": "2000",
        "spark.ui.retainedTasks": "2000000",
    })
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = _corpus(args.docs, args.cluster)
    bucket = record["runs"].setdefault(
        f"{args.docs}_{args.cluster}", {})
    for key in keys:
        if args.resume and key in bucket:
            continue
        try:
            bucket[key] = _run_key(spark, key, sf_dir, args.docs)
            print(f"[{args.docs}/{args.cluster}] {key}: "
                  f"wall {bucket[key]['wall_sec']}s, "
                  f"peak {bucket[key]['peak_rows']} "
                  f"(prune {bucket[key]['prune_ratio']}), "
                  f"out {bucket[key]['output_rows']}, "
                  f"tasks {bucket[key]['tasks']}", flush=True)
        except Exception as e:  # noqa: BLE001
            bucket[key] = {"status": f"ERROR {type(e).__name__}",
                           "err": str(e)[:300]}
            print(f"[{args.docs}] {key}: ERROR {e}", flush=True)
        flush()

    if not args.skip_parity:
        sf_small = _corpus(args.exact_docs, args.exact_cluster)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(sf_small, 'documents.parquet')}'"
        )
        pbucket = record.setdefault(f"parity_{args.exact_docs}", {})
        for key in keys:
            if args.resume and key in pbucket:
                continue
            if key not in qc.ORACLES:
                pbucket[key] = {"status": "no oracle"}
                continue
            try:
                pbucket[key] = _parity(spark, key, sf_small, con)
                print(f"[parity] {key}: {pbucket[key]}", flush=True)
            except Exception as e:  # noqa: BLE001
                pbucket[key] = {"status": f"ERROR {type(e).__name__}",
                                "err": str(e)[:300]}
                print(f"[parity] {key}: ERROR {e}", flush=True)
            flush()

    return 0


if __name__ == "__main__":
    sys.exit(main())
