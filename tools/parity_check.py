"""Run the local oracle-parity check for a subset of catalog queries
(or all of them) without the pytest harness — fast iteration loop for
new registrations: `python tools/parity_check.py key1 key2 ...`."""

from __future__ import annotations

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

SF_DIR = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


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
    keys = sys.argv[1:] or list(qc.ORACLES)
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # replica of the DRIVER's session: no repo configs applied —
        # every query must survive default AQE/partitions/timezone
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("parity-vanilla")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        # partial soak dirs (e.g. tools/gen_sf1.py's documents +
        # embeddings) carry only the tables their query family reads —
        # skip absent files instead of failing every view bind
        if not os.path.exists(f"{SF_DIR}/{t}.parquet"):
            print(f"note: {t}.parquet absent in {SF_DIR}, view skipped")
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    failed = []
    record: dict[str, dict] = {}
    for key in keys:
        if key not in qc.ORACLES:
            print(f"{key}: no oracle (rows-only query), skipping")
            continue
        try:
            t0 = time.monotonic()
            df = qc.QUERIES[key](spark, SF_DIR)
            cols = sorted(df.columns)
            s_rows = sorted(
                (tuple(normalize(r[c]) for c in cols) for r in df.collect()),
                key=repr,
            )
            spark_sec = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            res = con.execute(qc.ORACLES[key])
            names = [d[0] for d in res.description]
            order = sorted(range(len(names)), key=lambda i: names[i])
            o_cols = [names[i] for i in order]
            o_rows = sorted(
                (tuple(normalize(row[i]) for i in order) for row in res.fetchall()),
                key=repr,
            )
            oracle_sec = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001
            failed.append(key)
            record[key] = {"status": f"ERROR {type(e).__name__}"}
            print(f"{key}: ERROR {type(e).__name__}: {e}")
            continue
        record[key] = {
            "status": "OK", "rows": len(s_rows),
            "spark_sec": spark_sec, "oracle_sec": oracle_sec,
        }
        if cols != o_cols:
            failed.append(key)
            record[key]["status"] = "SCHEMA"
            print(f"{key}: SCHEMA mismatch spark={cols} oracle={o_cols}")
        elif len(s_rows) != len(o_rows):
            failed.append(key)
            record[key]["status"] = "ROWS"
            print(f"{key}: ROWS mismatch spark={len(s_rows)} oracle={len(o_rows)}")
        elif s_rows != o_rows:
            failed.append(key)
            record[key]["status"] = "VALUES"
            diff = next(
                (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b),
                None,
            )
            print(f"{key}: VALUES mismatch at sorted row {diff}:")
            print(f"  spark:  {s_rows[diff]}")
            print(f"  oracle: {o_rows[diff]}")
        else:
            print(f"{key}: OK ({len(s_rows)} rows, "
                  f"spark {spark_sec}s, oracle {oracle_sec}s)")
    print(f"\n{len(keys) - len(failed)}/{len(keys)} green")
    out_json = os.environ.get("SPARK_GRAFT_PARITY_JSON")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_green": len(keys) - len(failed),
                       "n_total": len(keys), "queries": record}, f, indent=1)
        print(f"wrote {out_json}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
