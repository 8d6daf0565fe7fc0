#!/usr/bin/env python
"""Dump ``explain('formatted')`` for catalog queries to files — the
round-10 optimization evidence trail (plans/r10/<key>_{before,after}.txt).

Usage:
    python tools/dump_plan.py --suffix before <key> [<key> ...]
    python tools/dump_plan.py --suffix after --out plans/r10 <key> ...

Each file holds the formatted physical plan of the query as built
against $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench scale).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r10"))
    args = ap.parse_args()

    from mapreduce_join_comparison_spark import queries_catalog
    from mapreduce_join_comparison_spark.session import get_spark

    spark = get_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for key in args.keys:
        df = queries_catalog.QUERIES[key](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{key}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
