"""REPORT.md must be re-derivable byte-for-byte from the committed
BENCH_DETAIL.json — round 3 shipped a report disagreeing with the
detail file it cited as its source (stale numbers from an earlier
run). bench.py now re-renders the report after every detail write;
this test catches any path that updates one without the other."""

from __future__ import annotations

import os

import pytest

from mapreduce_join_comparison_spark.cli import render_report

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")
REPORT = os.path.join(REPO, "REPORT.md")


def test_report_matches_detail(tmp_path):
    if not (os.path.exists(DETAIL) and os.path.exists(REPORT)):
        pytest.skip("no committed bench artifacts")
    out = tmp_path / "report.md"
    render_report(csv=[], detail=DETAIL, out=str(out), svg=None)
    rendered = out.read_text()
    committed = open(REPORT).read()
    assert rendered == committed, (
        "REPORT.md is stale vs BENCH_DETAIL.json — regenerate with "
        "`python -m mapreduce_join_comparison_spark.cli report "
        "--detail BENCH_DETAIL.json --out REPORT.md` (or just re-run "
        "bench.py, which renders both)"
    )


def test_readme_headline_count_matches_bench():
    """Round-5 verdict: README cited a bench headline count that
    disagreed with the committed artifact. The README's 'N-query
    headline suite' sentence must track both bench.HEADLINE and the
    committed BENCH_DETAIL.json."""
    import json
    import re
    import sys

    sys.path.insert(0, REPO)
    import bench

    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"the (\d+)-query headline suite", readme)
    assert m, "README no longer cites the headline suite size"
    cited = int(m.group(1))
    assert cited == len(bench.HEADLINE), (
        f"README cites {cited} headline queries; bench.HEADLINE has "
        f"{len(bench.HEADLINE)} — update the README bench section"
    )
    if os.path.exists(DETAIL):
        with open(DETAIL) as f:
            detail = json.load(f)
        artifact = [k for k in detail.get("queries_warm_detail", {})
                    if not k.startswith("_")]
        assert len(artifact) == cited, (
            f"committed BENCH_DETAIL.json has {len(artifact)} headline "
            f"keys; README cites {cited}"
        )
