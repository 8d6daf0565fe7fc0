"""The driver tail-captures bench.py's stdout and parses the LAST JSON
line. Round 5 lost that hard signal (BENCH_r05.json ``"parsed": null``)
when the per-query map hit ~3 KB at 97 headline queries and outgrew
the driver's ~2 KB tail window. The contract line is now CAPPED at
per-family totals; this test pins the rendered length for the FULL
headline set so catalog growth can never silently outgrow the window
again."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import bench  # noqa: E402


def _full_warm_medians() -> dict[str, float]:
    # worst-case realistic values: 3 decimal places, tens of seconds
    return {name: 12.345 for name in bench.HEADLINE}


def test_contract_line_fits_tail_window():
    line = bench.contract_line(
        total_warm=1234.567,
        warm_medians=_full_warm_medians(),
        sf=0.1,
        anchor_sec=0.123,
        zipf_total_sec=98.765,
    )
    assert len(line) < 1000, (
        f"contract line is {len(line)} bytes — the driver's tail "
        "window is ~2 KB and round 5 proved a fat line goes dark; "
        "keep it to per-family totals"
    )
    assert "\n" not in line


def test_contract_line_schema():
    line = bench.contract_line(
        total_warm=10.5,
        warm_medians={"join_repartition": 1.0, "join_broadcast": 2.0,
                      "agg_groupby": 3.0, "tpch_q1_pricing_summary": 4.5},
        sf=0.1,
        anchor_sec=0.2,
        zipf_total_sec=None,
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "total_wall_sec"
    assert parsed["value"] == 10.5
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 4
    assert parsed["anchor_sec"] == 0.2
    # family totals: join = 1+2, agg = 3, tpch = 4.5
    assert parsed["queries"] == {"agg": 3.0, "join": 3.0, "tpch": 4.5}
    assert "zipf_total_sec" not in parsed


def test_contract_families_cover_headline():
    # the family map must stay SMALL (that's the whole point): catalog
    # growth adds queries, not families, so a new family name is a
    # deliberate decision, caught here
    fams = {name.split("_", 1)[0] for name in bench.HEADLINE}
    assert len(fams) <= 24, sorted(fams)
