"""Realistic-vocabulary dedup soak (round-7 directive #1): prove the
dedup family's pruning ON A CORPUS WHERE PRUNING IS POSSIBLE.

The sf1 soak's legacy corpus draws from a 31-word vocabulary, so every
3-word shingle is frequent and the prefix/pigeonhole candidate
generation degenerates toward its worst case — the round-6 verdict
graded the whole family "asserted, not demonstrated" because on that
corpus "prunes well" and "never prunes" are indistinguishable. This
soak runs the five dedup heavyweights on ``gen_sf1.py
--realistic-vocab`` corpora (bounded-Zipf token frequencies over a 50k
vocabulary + boilerplate headers + the same injected duplicate
structure) and records, per key and corpus size:

  * ``peak_rows``   — max numOutputRows over the executed plan's
    non-scan nodes (``plans.metrics.peak_intermediate_rows``: the
    candidate generator is always the widest intermediate — a join in
    the bucket forms, a Generate-explode in the indexed AllPairs
    probe), harvested from SQLMetrics, not re-derived;
  * ``prune_ratio`` — peak_rows / naive pair count (n(n-1)/2, or
    n_delta * n_corpus for the delta probe): ≪ 1 demonstrates no
    stage ever materializes the quadratic pair space;
  * wall times split into ``construct_sec`` (eager index builds) and
    ``exec_sec`` (the probe/query itself), at TWO corpus sizes so the
    scaling exponent is measured, not asserted: a quadratic operator
    shows ~16x time and ~16x candidates at 4x docs; the blocked
    operators must track candidates/output instead.

A third tiny corpus (2 000 docs) gets FULL value parity against the
registered naive DuckDB oracles — the oracles that are quadratic-
infeasible on the legacy corpus are feasible here precisely because
the vocabulary is realistic.

Results append INCREMENTALLY to DEDUP_SOAK.json (the sf1-soak lesson:
a monolithic run that dies late loses everything).

Usage: python tools/dedup_soak.py [--docs 50000] [--out DEDUP_SOAK.json]
       [--keys k1 k2 ...] [--skip-parity] [--skip-scaling]
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
    peak_intermediate_rows,
)
from mapreduce_join_comparison_spark.session import get_spark

KEYS = [
    "dedup_prefix_filter",
    "dedup_prefix_filter_indexed",
    "dedup_prefix_filter_delta",
    "dedup_simhash",
    "dedup_minhash_lsh",
]

# the delta query probes a 10% shard against a 90% index: its naive
# pair space is delta x corpus, not n-choose-2
DELTA_KEYS = {"dedup_prefix_filter_delta"}


def _naive_pairs(key: str, n_docs: int) -> int:
    if key in DELTA_KEYS:
        n_delta = n_docs // 10
        return n_delta * (n_docs - n_delta)
    return n_docs * (n_docs - 1) // 2


def _corpus(n_docs: int) -> str:
    out = f"/tmp/spark_graft_realvocab_{n_docs}"
    marker = os.path.join(out, "documents.parquet")
    if not os.path.exists(marker):
        gen_sf1.generate(out, n_docs=n_docs, n_vecs=1000,
                         realistic_vocab=True)
    return out


def _run_key(spark, key: str, sf_dir: str, n_docs: int) -> dict:
    t0 = time.monotonic()
    df = qc.QUERIES[key](spark, sf_dir)
    construct = time.monotonic() - t0  # eager index builds live here
    stats = collect_plan_metrics(df)
    peak = peak_intermediate_rows(stats)
    naive = _naive_pairs(key, n_docs)
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
    }


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 9)
    return value


def _parity(spark, key: str, sf_dir: str, con) -> dict:
    """Full sorted-value compare vs the registered DuckDB oracle —
    the same normalization discipline as tools/sf1_soak.py."""
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
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "DEDUP_SOAK.json"))
    ap.add_argument("--keys", nargs="*", default=None)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    keys = args.keys or KEYS

    record: dict = {
        "corpus": "gen_sf1 --realistic-vocab (50k-word bounded Zipf "
                  "s=1.07, boilerplate headers, dup injection as sf1)",
        "sizes": {}, "parity_2000": {},
    }
    # ALWAYS merge into the committed artifact (same lesson as
    # bench.py / sf1_soak / adversarial_soak: a --keys subset run
    # re-records only what it ran); --resume additionally SKIPS keys
    # already recorded per size bucket
    if os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                prev = json.load(fh)
            prev.setdefault("sizes", {})
            prev.setdefault("parity_2000", {})
            record = prev
        except (OSError, json.JSONDecodeError):
            pass

    def flush() -> None:
        with open(args.out, "w") as fh:
            json.dump(record, fh, indent=1)

    spark = get_spark(app_name="dedup-soak", extra_conf={
        "spark.driver.memory":
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    })
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [args.docs] if args.skip_scaling else [args.docs // 4,
                                                   args.docs]
    for n in sizes:
        sf_dir = _corpus(n)
        bucket = record["sizes"].setdefault(str(n), {})
        for key in keys:
            if args.resume and key in bucket:
                continue
            try:
                bucket[key] = _run_key(spark, key, sf_dir, n)
                print(f"[{n}] {key}: wall {bucket[key]['wall_sec']}s, "
                      f"peak {bucket[key]['peak_rows']} "
                      f"(prune {bucket[key]['prune_ratio']}), "
                      f"out {bucket[key]['output_rows']}", flush=True)
            except Exception as e:  # noqa: BLE001
                bucket[key] = {"status": f"ERROR {type(e).__name__}",
                               "err": str(e)[:300]}
                print(f"[{n}] {key}: ERROR {e}", flush=True)
            flush()

    if not args.skip_parity:
        sf_small = _corpus(2000)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(sf_small, 'documents.parquet')}'"
        )
        for key in keys:
            if args.resume and key in record["parity_2000"]:
                continue
            if key not in qc.ORACLES:
                record["parity_2000"][key] = {"status": "no oracle"}
                continue
            try:
                record["parity_2000"][key] = _parity(
                    spark, key, sf_small, con)
                print(f"[parity] {key}: "
                      f"{record['parity_2000'][key]}", flush=True)
            except Exception as e:  # noqa: BLE001
                record["parity_2000"][key] = {
                    "status": f"ERROR {type(e).__name__}",
                    "err": str(e)[:300]}
                print(f"[parity] {key}: ERROR {e}", flush=True)
            flush()

    # scaling verdict: time & candidate growth at 4x docs
    if not args.skip_scaling and len(sizes) == 2:
        lo, hi = str(sizes[0]), str(sizes[1])
        growth = {}
        for key in keys:
            a, b = record["sizes"].get(lo, {}).get(key), \
                record["sizes"].get(hi, {}).get(key)
            if a and b and "wall_sec" in a and "wall_sec" in b:
                growth[key] = {
                    "docs_x": round(sizes[1] / sizes[0], 2),
                    "wall_x": round(b["wall_sec"] / max(a["wall_sec"],
                                                        1e-9), 2),
                    "peak_x": (
                        round(b["peak_rows"] /
                              max(a["peak_rows"], 1), 2)
                        if a.get("peak_rows") else None),
                    "output_x": (
                        round(b["output_rows"] /
                              max(a["output_rows"], 1), 2)
                        if a.get("output_rows") else None),
                }
        record["scaling"] = growth
        flush()
        print(json.dumps(growth, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
