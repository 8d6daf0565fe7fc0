"""Registry-order guards: the driver verifies queries in registration
order under a cap (round 1 stopped at 50), so the priority list must
stay consistent with the registry — a typo'd or forgotten key would
silently push an unverified query out of the checked window."""

from __future__ import annotations

import json
import os

from mapreduce_join_comparison_spark import queries_catalog as qc


def test_priority_keys_registered_and_unique():
    pri = qc._DRIVER_PRIORITY
    assert len(pri) == len(set(pri)), "duplicate priority keys"
    missing = [k for k in pri if k not in qc.QUERIES]
    assert not missing, f"priority keys not registered: {missing}"


def test_unverified_queries_lead_the_registry():
    """Every query without a green round-1 verdict must appear in the
    priority block (and therefore ahead of the already-green rows)."""
    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r01.json")
    with open(path) as f:
        r1 = json.load(f)
    green = {k for k, v in r1.items() if v.get("hash_match")}
    pri = set(qc._DRIVER_PRIORITY)
    stragglers = [k for k in qc.QUERIES if k not in green and k not in pri]
    assert not stragglers, f"unverified queries missing from priority: {stragglers}"
    # and the registry actually leads with them
    leading = list(qc.QUERIES)[: len(pri)]
    assert all(k in pri for k in leading)


def test_every_query_has_oracle():
    assert set(qc.ORACLES) == set(qc.QUERIES)
