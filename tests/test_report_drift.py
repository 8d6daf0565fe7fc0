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


def test_merge_details_semantics():
    """bench.merge_details (round-8 verdict #1): union of row points,
    union of skews per row, newest median per cell; non-curve fields
    replaced only when the new run measured them."""
    import sys

    sys.path.insert(0, REPO)
    from bench import merge_details

    old = {
        "skew_curve": {
            "1000000": {"0.5": {"merge": 1.0}, "1.2": {"merge": 2.0}},
            "100000000": {"0.5": {"merge": 40.0}},
        },
        "skew_curve_spread": {"100000000": {"0.5": {"merge": {"min": 39}}}},
        "queries_warm": {"q1": 1.5},
        "total_warm_sec": 1.5,
        "zipf_total_sec": 3.0,
    }
    new = {
        "skew_curve": {
            "1000000": {"0.5": {"merge": 0.9}},  # re-measured cell
            "10000000": {"0.5": {"merge": 5.0}},  # new row point
        },
        "skew_curve_spread": {},
        "queries_warm": {},  # --skip-queries run
        "total_warm_sec": 0.0,
        "zipf_total_sec": None,
    }
    m = merge_details(old, new)
    # union of row points — the committed 100M point SURVIVES
    assert set(m["skew_curve"]) == {"1000000", "10000000", "100000000"}
    # union of skews within a row point
    assert set(m["skew_curve"]["1000000"]) == {"0.5", "1.2"}
    # newest median wins per cell
    assert m["skew_curve"]["1000000"]["0.5"] == {"merge": 0.9}
    assert m["skew_curve"]["1000000"]["1.2"] == {"merge": 2.0}
    # sibling curve maps keep committed cells when the new run is empty
    assert m["skew_curve_spread"]["100000000"]["0.5"]["merge"]["min"] == 39
    # skipped phases keep the committed values
    assert m["queries_warm"] == {"q1": 1.5}
    assert m["total_warm_sec"] == 1.5
    assert m["zipf_total_sec"] == 3.0
    # inputs untouched (pure function)
    assert old["skew_curve"]["1000000"]["0.5"] == {"merge": 1.0}


def test_regeneration_cannot_lose_committed_curve_points():
    """The round-8 failure mode, pinned RED: the driver's default
    3-row-point bench re-run must MERGE into — never replace — the
    committed multi-point scaleup curve. Simulates that exact re-run
    shape against the real committed artifact and fails if any
    committed (rows, skew) cell disappears."""
    import json
    import sys

    sys.path.insert(0, REPO)
    from bench import merge_details

    if not os.path.exists(DETAIL):
        pytest.skip("no committed bench artifacts")
    with open(DETAIL) as f:
        committed = json.load(f)
    coarse = {
        "skew_curve": {
            "1000000": {"0.5": {"merge": 0.1}},
            "10000000": {"0.5": {"merge": 1.0}},
            "20000000": {"0.5": {"merge": 2.0}},
        },
        "queries_warm": {"q1": 0.5},
    }
    merged = merge_details(committed, coarse)
    for rows, per_skew in (committed.get("skew_curve") or {}).items():
        assert rows in merged["skew_curve"], (
            f"regeneration lost committed row point {rows}"
        )
        lost = set(per_skew) - set(merged["skew_curve"][rows])
        assert not lost, (
            f"regeneration lost committed skew cells {lost} at {rows} rows"
        )
    # and the committed curve itself still resolves the scaleup shape
    assert len(committed.get("skew_curve") or {}) >= 7, (
        "committed BENCH_DETAIL.json lost its multi-point scaleup curve"
    )


def test_advisor_scorecard_tie_awareness(tmp_path):
    """Round-8 verdict #5: a cell whose advisor pick and best
    alternative have OVERLAPPING [min, max] run spreads must print
    "tie" and stay out of the agreement denominator; disjoint spreads
    score normally. Crafted three-cell detail: distinct-agree,
    overlapping-tie, distinct-disagree."""
    import json

    from mapreduce_join_comparison_spark.cli import (
        _advisor_table_from_detail,
        _spreads_overlap,
    )

    assert _spreads_overlap({"min": 7.0, "max": 8.8},
                            {"min": 8.5, "max": 9.0}) is True
    assert _spreads_overlap({"min": 1.0, "max": 2.0},
                            {"min": 2.1, "max": 3.0}) is False
    assert _spreads_overlap(None, {"min": 1, "max": 2}) is None

    detail = {
        "skew_curve": {
            "1000": {"0.5": {"repartition": 2.0, "broadcast": 1.0}},
            "2000": {"0.5": {"repartition": 8.5, "broadcast": 7.0}},
            "3000": {"0.5": {"repartition": 2.0, "broadcast": 1.0}},
        },
        "skew_curve_advisor": {
            "1000": {"0.5": {"pick": "broadcast", "reason": "small dim"}},
            "2000": {"0.5": {"pick": "repartition", "reason": "skew"}},
            "3000": {"0.5": {"pick": "repartition", "reason": "skew"}},
        },
        "skew_curve_spread": {
            # distinct: broadcast clearly fastest, pick agrees
            "1000": {"0.5": {"repartition": {"min": 1.9, "max": 2.1},
                             "broadcast": {"min": 0.9, "max": 1.1}}},
            # overlapping: the known 100M/0.5-style variance cell
            "2000": {"0.5": {"repartition": {"min": 7.2, "max": 9.0},
                             "broadcast": {"min": 6.8, "max": 8.0}}},
            # distinct: pick is clearly SLOWER — a real disagreement
            "3000": {"0.5": {"repartition": {"min": 1.9, "max": 2.1},
                             "broadcast": {"min": 0.9, "max": 1.1}}},
        },
    }
    p = tmp_path / "detail.json"
    p.write_text(json.dumps(detail))
    lines = "\n".join(_advisor_table_from_detail(str(p)))
    assert "| tie |" in lines, lines
    # 1 agree + 1 disagree = 2 decided cells, 1 tie
    assert "Agreement: 1/2 decided cells (50 %), 1 tie(s)" in lines, lines
    # the disagreement's regret (2.0/1.0) is the worst decided regret
    assert "worst decided regret 2.00×" in lines, lines


def test_restrict_to_headline_guards_committed_tables():
    """A --queries spot-bench of a NON-headline catalog key must not
    inject that key into the committed headline tables (round 9: two
    prefix-family keys slipped in and broke the 102-key contract)."""
    import sys

    sys.path.insert(0, REPO)
    from bench import HEADLINE, restrict_to_headline

    some_headline = HEADLINE[0]
    detail = {
        "queries_cold": {some_headline: 1.0, "dedup_ngram_jaccard": 2.0},
        "queries_warm": {some_headline: 0.9, "zipf_join_merge": 0.5},
        "queries_warm_detail": {
            some_headline: {"median": 0.9},
            "_anchor": {"median": 0.1},
            "not_a_headline_key": {"median": 9.9},
        },
        "skew_curve": {"1": {"0.5": {"merge": 1.0}}},
    }
    out = restrict_to_headline(detail)
    assert "dedup_ngram_jaccard" not in out["queries_cold"]
    assert "not_a_headline_key" not in out["queries_warm_detail"]
    assert out["queries_warm"] == {some_headline: 0.9,
                                   "zipf_join_merge": 0.5}
    assert "_anchor" in out["queries_warm_detail"]
    # non-query fields untouched, input not mutated
    assert out["skew_curve"] == detail["skew_curve"]
    assert "not_a_headline_key" in detail["queries_warm_detail"]


def test_restrict_to_headline_all_dropped_run(tmp_path):
    """Round-10 advice (medium): a --queries run that measured ONLY
    non-headline keys must not carry its subset-wall totals or repeat
    count into the merge — after restriction the totals must be the
    (falsy) sum over the now-empty maps and repeats must be None, so
    merge_details keeps the committed 154.9 s / 5-repeat labels
    instead of relabeling them 2.5 s / 3."""
    import sys

    sys.path.insert(0, REPO)
    from bench import merge_details, restrict_to_headline

    subset = {
        "queries_cold": {"dedup_ngram_jaccard": 1.2,
                         "dedup_prefix_filter": 1.3},
        "queries_warm": {"dedup_ngram_jaccard": 1.0},
        "queries_warm_detail": {
            "dedup_ngram_jaccard": {"median": 1.0},
            "_anchor": {"median": 0.15},
        },
        "repeats": 3,
        "total_cold_sec": 2.5,
        "total_warm_sec": 1.0,
    }
    out = restrict_to_headline(subset)
    assert out["queries_cold"] == {}
    assert out["total_cold_sec"] == 0.0
    assert out["total_warm_sec"] == 0.0
    assert out["repeats"] is None

    committed = {
        "queries_cold": {"join_repartition": 154.9},
        "queries_warm": {"join_repartition": 100.0},
        "queries_warm_detail": {"join_repartition": {"median": 100.0}},
        "repeats": 5,
        "total_cold_sec": 154.9,
        "total_warm_sec": 100.0,
    }
    merged = merge_details(committed, out)
    assert merged["total_cold_sec"] == 154.9
    assert merged["total_warm_sec"] == 100.0
    assert merged["repeats"] == 5
    # a headline key measured alongside still merges normally
    partial = dict(subset)
    partial["queries_warm_detail"] = {
        "join_repartition": {"median": 90.0},
        "dedup_ngram_jaccard": {"median": 1.0},
    }
    out2 = restrict_to_headline(partial)
    assert out2["repeats"] == 3  # run DID measure a headline key
    merged2 = merge_details(committed, out2)
    assert merged2["queries_warm_detail"]["join_repartition"][
        "median"] == 90.0


def test_reference_callouts_render_from_detail(tmp_path):
    """Round-8 verdict #3/#4: the very-large (200M/0.5) cell and the
    merge_survival evidence block must render as explicit REPORT.md
    callouts citing the reference CSV rows — and stay absent when the
    detail lacks the cells (so small driver runs don't fabricate
    claims)."""
    import json

    from mapreduce_join_comparison_spark.cli import _callouts_from_detail

    bare = tmp_path / "bare.json"
    bare.write_text(json.dumps({
        "skew_curve": {"1000000": {"0.5": {"merge": 1.0}}},
    }))
    assert _callouts_from_detail(str(bare)) == []

    full = tmp_path / "full.json"
    full.write_text(json.dumps({
        "skew_curve": {
            "200000000": {"0.5": {"repartition": 25.0, "merge": 90.0}},
        },
        "merge_survival": {
            "rows": 40000000, "skew": 1.2, "repeats": 3,
            "reference": "data/results_speedup_1.2.csv:13-15",
            "merge": {"median": 8.0, "min": 7.5, "max": 9.0},
            "skew_split_in_plan": True,
            "plan_marker": "AQEShuffleRead coalesced skewed",
        },
    }))
    text = "\n".join(_callouts_from_detail(str(full)))
    assert "71.8 s" in text and "59.6 s" in text
    assert "repartition: **25.0 s**" in text
    assert "merge: **90.0 s**" in text
    assert "results_speedup_1.2.csv:13-15" in text
    assert "40,000,000 rows / skew 1.2" in text
    assert "**8.0 s**" in text
    assert "skew-split shuffle read" in text

    # survival evidence WITHOUT the marker must say so, not claim it
    no_marker = json.loads(full.read_text())
    no_marker["merge_survival"]["skew_split_in_plan"] = False
    nm = tmp_path / "nomarker.json"
    nm.write_text(json.dumps(no_marker))
    text = "\n".join(_callouts_from_detail(str(nm)))
    assert "NO skew-split marker" in text

    # round-10 directive #3: the very-large merge row must carry the
    # fair-comparator framing (the reference's 59.6 s is merge-stage
    # only; its sort-included pipeline stages sum to >= 135.6 s)
    text = "\n".join(_callouts_from_detail(str(full)))
    assert "135.6" in text and "merge STAGE" in text
    assert f"{135.6 / 90.0:.2f}× faster" in text

    # and the presorted like-for-like cell renders once measured,
    # honest about its plan marker
    with_ps = json.loads(full.read_text())
    with_ps["merge_presorted"] = {
        "rows": 200000000, "skew": 0.5, "repeats": 3, "n_buckets": 32,
        "stage_sec": 400.0,
        "merge": {"median": 55.0, "min": 54.0, "max": 58.0},
        "no_exchange_no_sort": True,
    }
    ps = tmp_path / "presorted.json"
    ps.write_text(json.dumps(with_ps))
    text = "\n".join(_callouts_from_detail(str(ps)))
    assert "**55.0 s**" in text
    assert "zero Exchange/Sort" in text
    with_ps["merge_presorted"]["no_exchange_no_sort"] = False
    ps.write_text(json.dumps(with_ps))
    text = "\n".join(_callouts_from_detail(str(ps)))
    assert "WARNING: plan shows exchange/sort" in text


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


def test_double_skew_table_renders_from_detail(tmp_path):
    """Round-10 verdict directive #1: the double_skew evidence block
    (tools/double_skew_bench.py) must render as a REPORT.md table with
    the reference walls alongside, budget refusals spelled out — and
    stay absent when the detail lacks the block."""
    import json

    from mapreduce_join_comparison_spark.cli import (
        _double_skew_table_from_detail,
    )

    bare = tmp_path / "bare.json"
    bare.write_text(json.dumps({"skew_curve": {}}))
    assert _double_skew_table_from_detail(str(bare)) == []

    full = tmp_path / "full.json"
    full.write_text(json.dumps({
        "double_skew": {
            "skew": 0.5, "repeats": 3, "unique_frac": 0.1,
            "reference": "data/broadcast_vs_repartition_single_input"
                         ".csv:2-11",
            "cells": {
                "3000000": {
                    "out_rows": 99000000,
                    "repartition": {"median": 9.5, "min": 9.0,
                                    "max": 10.0},
                    "broadcast": {"median": 4.2, "min": 4.0,
                                  "max": 4.4},
                    "broadcast_forced": {"median": 4.3, "min": 4.1,
                                         "max": 4.5},
                    "merge": {"median": 12.0, "min": 11.0,
                              "max": 13.0},
                },
                "30000000": {
                    "out_rows": 1160000000,
                    "repartition": {"median": 80.0, "min": 79.0,
                                    "max": 81.0},
                    "broadcast": {"refused": "ValueError: over budget"},
                    "broadcast_forced": {"median": 60.0, "min": 59.0,
                                         "max": 61.0},
                    "merge": {"median": 130.0, "min": 129.0,
                              "max": 131.0},
                },
            },
        },
    }))
    text = "\n".join(_double_skew_table_from_detail(str(full)))
    # both measured rows, sorted numerically, with reference columns
    assert "| 3,000,000 | 99,000,000 | 9.5 | 4.2 | 4.3 | 12.0 | " \
           "56.6 | 36.6 | 236.0 |" in text
    assert "| 30,000,000 | 1,160,000,000 | 80.0 | refused (budget) " \
           "| 60.0 | 130.0 | 381.3 | 206.5 | 1664.5 |" in text
    assert "512 MiB" in text and "medians of 3 runs" in text


def test_figures_match_detail(tmp_path):
    """figures/ must regenerate byte-identically from the committed
    BENCH_DETAIL.json (the REPORT.md lockstep contract, extended to
    the round-10 figure set — bench.py regenerates both after every
    full run; tools/plot_bench.py is the standalone path)."""
    import filecmp

    from mapreduce_join_comparison_spark.cli import generate_figures

    fig_dir = os.path.join(REPO, "figures")
    if not (os.path.exists(DETAIL) and os.path.isdir(fig_dir)):
        pytest.skip("no committed figure artifacts")
    out = tmp_path / "figures"
    written = generate_figures(DETAIL, str(out))
    committed = sorted(
        f for f in os.listdir(fig_dir) if f.endswith(".svg")
    )
    assert sorted(written) == committed, (
        "figure set drifted — regenerate with `python "
        "tools/plot_bench.py`"
    )
    stale = [
        f for f in written
        if not filecmp.cmp(os.path.join(fig_dir, f), str(out / f),
                           shallow=False)
    ]
    assert not stale, (
        f"stale figures {stale} — regenerate with `python "
        f"tools/plot_bench.py`"
    )


def test_double_skew_figure_records():
    """The double-skew figure flattener must skip refused/failed
    strategies (no fabricated points) and carry measured medians."""
    from mapreduce_join_comparison_spark.cli import _double_skew_records

    detail = {"double_skew": {"skew": 0.5, "cells": {
        "3000000": {
            "repartition": {"median": 9.5},
            "broadcast": {"refused": "over budget"},
            "broadcast_forced": {"median": 4.3},
        },
    }}}
    recs = _double_skew_records(detail)
    assert {(r["strategy"], r["seconds"]) for r in recs} == {
        ("repartition", 9.5), ("broadcast_forced", 4.3),
    }
    assert all(r["rows"] == 3000000 for r in recs)
