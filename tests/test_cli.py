"""CLI parity with the reference's executable surface (join mains,
DataGenerator, JoinSimulation) — run in-process against the golden
fixture pair.
"""

from __future__ import annotations

import csv
import glob
import os

from mapreduce_join_comparison_spark.cli import main

from conftest import SF_SMOKE
from test_reference_fixtures import T1, T2, oracle_join


def _write_csv(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")


def _read_part_lines(output_dir):
    lines = []
    for p in glob.glob(os.path.join(output_dir, "part-*")):
        with open(p) as f:
            lines.extend(line.rstrip("\n") for line in f if line.strip())
    return sorted(lines)


def test_cli_join_matches_oracle(spark, tmp_path):
    t1, t2 = str(tmp_path / "t1.csv"), str(tmp_path / "t2.csv")
    out = str(tmp_path / "out")
    _write_csv(t1, T1)
    _write_csv(t2, T2)
    main(["join", "--strategy", "repartition", t1, "0", t2, "0", out])
    lines = _read_part_lines(out)
    expect = sorted(
        f"{k}\t{k},{a},{k},{b}" for k, a, b in oracle_join(T1, T2)
    )
    assert lines == expect


def test_cli_generate_and_simulate(spark, tmp_path):
    gen_dir = str(tmp_path / "gen")
    main(["generate", "--rows", "500", "--unique-values", "50",
          "--zipf-skew", "0.8", "--out", gen_dir])
    t1_lines = _read_part_lines(os.path.join(gen_dir, "t1"))
    t2_lines = _read_part_lines(os.path.join(gen_dir, "t2"))
    assert len(t1_lines) == 50      # dim: every key once
    assert len(t2_lines) == 500     # fact
    assert all(len(line.split(",")) == 4 for line in t2_lines)

    results = str(tmp_path / "results.csv")
    main(["simulate", "--rows", "400", "--unique-values", "40",
          "--zipf-skew", "0.8", "--steps", "2", "--increment", "100",
          "--out", results])
    with open(results) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2 * 3  # 2 steps x 3 strategies
    by_step = {}
    for r in rows:
        by_step.setdefault(r["rows"], set()).add(int(r["rows_out"]))
    # all three strategies produce the identical output count per step
    assert all(len(counts) == 1 for counts in by_step.values())
    assert {r["rows"] for r in rows} == {"400", "500"}

    # report (reference data/*.R analog): scaleup table over the two
    # steps, fastest strategy bolded, all three strategies columned
    report = str(tmp_path / "report.md")
    main(["report", results, "--out", report])
    with open(report) as f:
        md = f.read()
    assert "Scaleup at skew 0.8" in md
    assert "| rows | broadcast | merge | repartition |" in md
    assert "| 400 |" in md and "| 500 |" in md
    assert "**" in md  # a fastest cell is highlighted


def test_cli_report_from_bench_detail(tmp_path, capsys):
    import json

    detail = str(tmp_path / "BENCH_DETAIL.json")
    with open(detail, "w") as f:
        json.dump({"skew_curve": {
            "1000000": {
                "0.5": {"repartition": 2.0, "broadcast": 1.0, "merge": 3.0},
                "1.2": {"repartition": 2.5, "broadcast": 1.1, "merge": 9.0},
            }
        }}, f)
    main(["report", "--detail", detail])
    md = capsys.readouterr().out
    assert "Skew curve at 1,000,000 rows" in md
    assert "**1.000**" in md and "9.000" in md

    # --svg: one line chart per table (ggsave analog), entity-stable
    # colors, legend + markers present
    svg_dir = str(tmp_path / "charts")
    main(["report", "--detail", detail, "--svg", svg_dir, "--out",
          str(tmp_path / "r.md")])
    svg = open(os.path.join(svg_dir, "skew_1000000.svg")).read()
    assert svg.startswith("<svg ")
    assert svg.count("<path ") == 3            # one line per strategy
    assert '"#2a78d6"' in svg and '"#eb6834"' in svg  # fixed slot colors
    assert "<title>broadcast" in svg           # native tooltips
    assert svg.count(">merge</text>") == 2     # legend + direct end label


def test_cli_query_run_and_list(spark, tmp_path, capsys):
    main(["query", "list"])
    listed = capsys.readouterr().out
    assert "join_repartition" in listed and "oracle" in listed
    out = str(tmp_path / "q_out")
    main(["query", "agg_groupby", "--sf-dir", SF_SMOKE, "--out", out,
          "--explain"])
    printed = capsys.readouterr().out
    assert "Physical Plan" in printed
    assert spark.read.parquet(out).count() > 0


def test_cli_sql_adhoc(spark, capsys):
    main(["sql",
          "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
          "GROUP BY o_orderstatus ORDER BY o_orderstatus",
          "--sf-dir", SF_SMOKE])
    printed = capsys.readouterr().out
    assert "o_orderstatus=" in printed and "n=" in printed


def test_cli_sql_joins_documents_and_events(spark, capsys):
    # ad-hoc SQL sees every driver table as a view, including the
    # LLM-pipeline tables, through the footer-normalizing loader
    main(["sql",
          "SELECT (SELECT COUNT(*) FROM documents) AS docs, "
          "(SELECT COUNT(*) FROM events) AS evts, "
          "(SELECT COUNT(*) FROM embeddings) AS embs",
          "--sf-dir", SF_SMOKE])
    printed = capsys.readouterr().out
    assert "docs=" in printed and "evts=" in printed and "embs=" in printed
