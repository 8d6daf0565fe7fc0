"""Registry-order guards: the driver verifies queries in registration
order under a cap (50/round so far), so the priority list must stay
consistent with the registry AND with the accumulated CORRECTNESS
results — a typo'd or forgotten key would silently push an unverified
query out of the checked window, and a stale list (pinned to an old
round's file) would waste the window re-proving greens."""

from __future__ import annotations

import glob
import json
import os

from mapreduce_join_comparison_spark import queries_catalog as qc

REPO = os.path.join(os.path.dirname(__file__), "..")


def _green_union() -> set[str]:
    """Union of green keys across EVERY CORRECTNESS_r*.json so far
    (coverage accumulates across rounds; newest file alone only holds
    one 50-query window)."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            results = json.load(f)
        for key, v in results.items():
            if v.get("err"):
                continue
            hm = v.get("hash_match")
            if hm is True or (hm is None and v.get("rows_match")):
                green.add(key)
    return green


def test_priority_keys_registered_and_unique():
    pri = qc._DRIVER_PRIORITY
    assert len(pri) == len(set(pri)), "duplicate priority keys"
    missing = [k for k in pri if k not in qc.QUERIES]
    assert not missing, f"priority keys not registered: {missing}"


def test_unverified_queries_lead_the_registry():
    """Every query without a green verdict in ANY round must appear in
    the priority block (and therefore ahead of the already-green rows).
    Reads all CORRECTNESS_r*.json, so a new round's file re-derives the
    obligation automatically."""
    green = _green_union()
    assert green, "no CORRECTNESS_r*.json greens found — wrong repo root?"
    pri = set(qc._DRIVER_PRIORITY)
    stragglers = [k for k in qc.QUERIES if k not in green and k not in pri]
    assert not stragglers, f"unverified queries missing from priority: {stragglers}"
    # and the registry actually leads with them
    leading = list(qc.QUERIES)[: len(pri)]
    assert all(k in pri for k in leading)


def test_every_query_has_oracle():
    assert set(qc.ORACLES) == set(qc.QUERIES)


def test_pipeline_first_import_keeps_priority_order():
    """Importing the self-registering `pipeline` module FIRST drives the
    catalog body through a circular import: its own `from . import
    pipeline` then returns the partially-initialized module, and the
    pipeline queries register AFTER _reorder_for_driver(). register()
    must re-apply the ordering for those late arrivals — otherwise the
    pipeline queries silently fall out of the driver's check window."""
    import subprocess
    import sys

    code = (
        "import mapreduce_join_comparison_spark.pipeline\n"
        "from mapreduce_join_comparison_spark import queries_catalog as qc\n"
        "pri = set(qc._DRIVER_PRIORITY)\n"
        "leading = list(qc.QUERIES)[:len(pri)]\n"
        "missing = pri - set(leading)\n"
        "assert not missing, f'displaced: {missing}'\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_priority_block_fits_the_driver_window():
    """The driver verifies ~50 queries per round in registration order;
    a priority list longer than the window would silently push its own
    tail out of this round's check — the exact failure mode the list
    exists to prevent."""
    assert len(qc._DRIVER_PRIORITY) <= 50, (
        f"{len(qc._DRIVER_PRIORITY)} priority keys exceed the driver's "
        "50-query window; trim re-check entries or split across rounds"
    )
