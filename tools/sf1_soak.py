"""Full-catalog sf1 soak (round-6 directive #5): run EVERY registered
query at the tiled sf1 dir (tools/gen_sf1.py --full) and hash-compare
against its DuckDB oracle, writing the per-key record INCREMENTALLY to
SF1_SOAK.json after every key — a first attempt ran the whole catalog
through tools/parity_check.py and lost 90 minutes when one quadratic
oracle outlived the budget with the artifact still unwritten.

A few oracles are deliberately SKIPPED at sf1 (the query still runs on
Spark and records rows + seconds): they are NAIVE-PLAN equivalence
proofs whose cost is quadratic in data size by design — the proof is
the point at sf0.001/0.01/0.1 (where the driver and the local parity
suite run them green) and re-grinding them at 10x data only burns
hours in DuckDB without testing anything new about THIS engine. Each
exception documents its reason in the artifact.

Usage: python tools/sf1_soak.py [--dir /tmp/spark_graft_sf1]
       [--out SF1_SOAK.json] [--keys k1 k2 ...] [--resume]
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb

from mapreduce_join_comparison_spark import queries_catalog as qc
from mapreduce_join_comparison_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# pair-scale outputs (~18M rows at sf1; ~90M for the IEJoin pair set —
# its urgent-order slice tiles 10x and pairs grow quadratically):
# collect() for a value compare blows spark.driver.maxResultSize, so
# these compare COUNT(*) engine-side (full value-hash parity holds at
# the three driver scales)
LARGE_OUTPUT = {"join_interval_multitier", "join_interval_overlap",
                "join_theta_iejoin", "join_theta_iejoin_quantile"}

# key -> reason the DuckDB oracle is skipped AT SF1 ONLY (the Spark
# query still runs; tri-scale oracle parity at sf0.001/0.01/0.1 is the
# equivalence evidence, re-checked every round by the driver)
ORACLE_EXCEPTIONS = {
    "join_dominance_count": (
        "oracle grinds the full IEJoin pair set (~225M pairs at sf0.1, "
        "~100x that at sf1); the Spark side never materializes it — "
        "that asymmetry is the operator's whole point"
    ),
    "dedup_prefix_filter": (
        "oracle is the NAIVE every-shared-shingle self-join (the "
        "losslessness proof); quadratic in per-shingle docfreq, "
        "infeasible at 50k docs over the 31-word synthetic vocabulary"
    ),
    "dedup_prefix_filter_indexed": (
        "same naive-plan oracle as dedup_prefix_filter"
    ),
    "dedup_prefix_filter_delta": (
        "oracle is the naive delta x corpus shared-shingle join — "
        "the same quadratic shape as dedup_prefix_filter's"
    ),
    "dedup_ngram_jaccard": (
        "oracle replays the same every-shared-shingle join the "
        "operator runs; at 50k docs / 31-word vocab both sides grind "
        "~1e9 candidate pairs — the blocked operators "
        "(dedup_prefix_filter, dedup_minhash_lsh) are the scale path "
        "and ARE soaked here"
    ),
}


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return round(value, 6)
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ", timespec="microseconds")
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(normalize(v) for v in value)
    return value


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", default="/tmp/spark_graft_sf1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "SF1_SOAK.json"))
    ap.add_argument("--keys", nargs="*", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip keys already recorded in --out")
    args = ap.parse_args()

    # 12g driver: bench.py's lesson — a long-lived session collecting
    # hundreds of results fragments an 8g heap enough that late
    # auto-broadcast builds fail spuriously
    spark = get_spark(app_name="sf1-soak", extra_conf={
        "spark.driver.memory":
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    })
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        f = os.path.join(args.dir, f"{t}.parquet")
        if os.path.exists(f):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{f}'")

    # ALWAYS merge into the committed artifact (the bench.py lesson,
    # round-8 verdict #1, re-learned here in round 9: a --keys subset
    # run clobbered the 201-key record down to 4 entries): previously
    # recorded keys survive, re-run keys take the newest result, and
    # the totals are recomputed over the union. --resume additionally
    # SKIPS keys already recorded.
    record: dict[str, dict] = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                record = json.load(fh).get("queries", {})
        except (OSError, json.JSONDecodeError):
            record = {}

    def flush() -> None:
        done = [k for k, v in record.items()
                if v.get("status") in ("OK", "OK_spark_only",
                                       "OK_rows_only")]
        with open(args.out, "w") as fh:
            json.dump({
                "sf_dir": args.dir,
                "n_green": len(done),
                "n_total": len(record),
                "oracle_exceptions": ORACLE_EXCEPTIONS,
                "queries": record,
            }, fh, indent=1)

    keys = args.keys or list(qc.QUERIES)
    for key in keys:
        if args.resume and key in record:
            continue
        entry: dict = {}
        record[key] = entry
        large = key in LARGE_OUTPUT
        try:
            t0 = time.monotonic()
            df = qc.QUERIES[key](spark, args.dir)
            cols = sorted(df.columns)
            if large:
                entry["rows"] = df.count()
                rows = []
            else:
                rows = df.collect()
                entry["rows"] = len(rows)
            entry["spark_sec"] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001
            entry["status"] = f"ERROR {type(e).__name__}"
            entry["err"] = str(e)[:300]
            print(f"{key}: ERROR {type(e).__name__}", flush=True)
            flush()
            continue
        if key in ORACLE_EXCEPTIONS or key not in qc.ORACLES:
            entry["status"] = "OK_spark_only"
            entry["oracle"] = "skipped: " + ORACLE_EXCEPTIONS.get(
                key, "no oracle registered")
            print(f"{key}: OK_spark_only ({entry['rows']} rows, "
                  f"{entry['spark_sec']}s)", flush=True)
            flush()
            continue
        if large:
            try:
                t0 = time.monotonic()
                n_oracle = con.execute(
                    f"SELECT COUNT(*) FROM ({qc.ORACLES[key]})"
                ).fetchone()[0]
                entry["oracle_sec"] = round(time.monotonic() - t0, 3)
            except Exception as e:  # noqa: BLE001
                entry["status"] = f"ORACLE_ERROR {type(e).__name__}"
                entry["err"] = str(e)[:300]
                print(f"{key}: ORACLE_ERROR {type(e).__name__}", flush=True)
                flush()
                continue
            entry["oracle_rows"] = n_oracle
            entry["status"] = (
                "OK_rows_only" if n_oracle == entry["rows"] else "ROWS"
            )
            entry["oracle"] = (
                "count-compare only at sf1 (pair-scale output; value-hash "
                "parity holds at sf0.001/0.01/0.1)"
            )
            print(f"{key}: {entry['status']} ({entry['rows']} rows, "
                  f"spark {entry['spark_sec']}s, "
                  f"oracle {entry['oracle_sec']}s)", flush=True)
            flush()
            continue
        try:
            t0 = time.monotonic()
            res = con.execute(qc.ORACLES[key])
            names = [d[0] for d in res.description]
            order = sorted(range(len(names)), key=lambda i: names[i])
            o_cols = [names[i] for i in order]
            o_rows = sorted(
                (tuple(normalize(r[i]) for i in order)
                 for r in res.fetchall()),
                key=repr,
            )
            entry["oracle_sec"] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001
            entry["status"] = f"ORACLE_ERROR {type(e).__name__}"
            entry["err"] = str(e)[:300]
            print(f"{key}: ORACLE_ERROR {type(e).__name__}", flush=True)
            flush()
            continue
        s_rows = sorted(
            (tuple(normalize(r[c]) for c in cols) for r in rows),
            key=repr,
        )
        if cols != o_cols:
            entry["status"] = "SCHEMA"
        elif len(s_rows) != len(o_rows):
            entry["status"] = "ROWS"
            entry["oracle_rows"] = len(o_rows)
        elif s_rows != o_rows:
            entry["status"] = "VALUES"
        else:
            entry["status"] = "OK"
        print(f"{key}: {entry['status']} ({entry['rows']} rows, "
              f"spark {entry['spark_sec']}s, "
              f"oracle {entry.get('oracle_sec', '-')}s)", flush=True)
        flush()
    bad = [k for k, v in record.items()
           if v.get("status") not in ("OK", "OK_spark_only",
                                      "OK_rows_only")]
    print(f"\n{len(record) - len(bad)}/{len(record)} green"
          + (f"; failing: {bad}" if bad else ""), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
