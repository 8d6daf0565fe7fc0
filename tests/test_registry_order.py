"""Registry-order guards: the driver verifies queries in registration
order under a cap (~50/round), so the ordering decides which queries
earn a fresh hard CORRECTNESS row. Since round 4 the order is DERIVED
from source fingerprints (plans/fingerprint.py + FINGERPRINTS.json):
never-green first, then changed-since-last-green (oldest green round
first), then unchanged greens in green-age rotation. These tests pin
that mechanism — a broken manifest or a fingerprinting regression
would silently waste the driver window re-proving fresh greens while
stale ones rot."""

from __future__ import annotations

import glob
import json
import os

from mapreduce_join_comparison_spark import queries_catalog as qc
from mapreduce_join_comparison_spark.plans import fingerprint as fp

REPO = os.path.join(os.path.dirname(__file__), "..")


def _green_rounds() -> dict[str, list[int]]:
    """Per-key sorted list of green rounds across EVERY
    CORRECTNESS_r*.json so far (coverage accumulates across rounds;
    newest file alone only holds one 50-query window)."""
    import re

    rounds: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        n = int(m.group(1)) if m else -1
        with open(path) as f:
            results = json.load(f)
        for key, v in results.items():
            if v.get("err"):
                continue
            hm = v.get("hash_match")
            if hm is True or (hm is None and v.get("rows_match")):
                rounds.setdefault(key, []).append(n)
    return {k: sorted(v) for k, v in rounds.items()}


def _green_union() -> set[str]:
    return set(_green_rounds())


def _classify():
    """(never, stale_direct, stale_trans, fresh) key lists re-derived
    from first principles — manifest + live full AND narrow
    fingerprints — for cross-checking the catalog's import-time
    ordering."""
    manifest = fp.load_manifest()
    current = fp.compute_fingerprints(qc.QUERIES, qc.ORACLES)
    narrow = fp.compute_fingerprints(qc.QUERIES, qc.ORACLES, narrow=True)
    never, stale_direct, stale_trans, fresh = [], [], [], []
    for k in qc.QUERIES:
        rec = manifest.get(k)
        if rec is None:
            never.append(k)
        elif rec.get("fp") != current.get(k):
            nfp = rec.get("nfp")
            if nfp is None or nfp != narrow.get(k):
                stale_direct.append(k)
            else:
                stale_trans.append(k)
        else:
            fresh.append(k)
    return manifest, never, stale_direct, stale_trans, fresh


def test_priority_keys_registered_and_unique():
    pri = qc._DRIVER_PRIORITY
    assert pri, "priority derivation fell back to [] — manifest broken?"
    assert len(pri) == len(set(pri)), "duplicate priority keys"
    missing = [k for k in pri if k not in qc.QUERIES]
    assert not missing, f"priority keys not registered: {missing}"
    assert set(pri) == set(qc.QUERIES), "priority must cover the registry"


def test_manifest_covers_all_greens():
    """Every ever-green key must carry a manifest fingerprint —
    otherwise it would re-enter the never-checked block and crowd the
    window. Exception (the round-boundary case that broke r4): the
    driver drops CORRECTNESS_r0N.json AFTER the builder's final commit,
    so keys whose ONLY green rows come from rounds newer than the
    manifest's newest absorbed round are "pending refresh", not a
    failure — but anything green at-or-before the manifest horizon with
    no fingerprint is a real gap. (Run tools/update_fingerprints.py at
    round start, after each new CORRECTNESS_r*.json lands.)"""
    manifest = fp.load_manifest()
    greens = _green_rounds()
    assert greens, "no CORRECTNESS_r*.json greens found — wrong repo root?"
    manifest_max = max(
        (rec.get("round", -1) for rec in manifest.values()), default=-1
    )
    missing = [k for k in greens if k in qc.QUERIES and k not in manifest]
    pending = [k for k in missing if min(greens[k]) > manifest_max]
    hard = sorted(set(missing) - set(pending))
    assert not hard, (
        f"green keys without manifest fingerprints {hard} — "
        "run tools/update_fingerprints.py"
    )
    # pending-refresh keys must be exactly the post-manifest new-key
    # set, not an arbitrary leak
    for k in pending:
        assert all(r > manifest_max for r in greens[k]), (
            f"{k} has a pre-horizon green row but no fingerprint"
        )


def test_registry_order_matches_staleness_policy():
    """The live registry ordering must be exactly: never-green block,
    then stale-gated FRONTLOAD pins, then direct-stale (ascending
    last-green round), then transitive-only-stale (same sort), then
    fresh greens (ascending last-green round) — tie-broken by original
    registration order. Re-derived here independently of
    derive_priority()'s own sort for a genuine cross-check."""
    manifest, never, stale_direct, stale_trans, fresh = _classify()
    order = list(qc.QUERIES)
    stale = set(stale_direct) | set(stale_trans)
    # pins expire mechanically PER KEY once THAT key has a green from
    # FRONTLOAD_ROUND or later (round-9 review: an any-key gate let a
    # partial driver window expire unproven pins). Round 10: a pin may
    # also target a FRESH key whose last green is simply old (verdict
    # directive #6) — mirror both gates
    pinned = [
        k for k in fp.FRONTLOAD
        if k in qc.QUERIES and k not in set(never)
        and manifest.get(k, {}).get("round", 0) < fp.FRONTLOAD_ROUND
    ]
    pinset = set(pinned)
    n_never, n_pin = len(never), len(pinned)
    n_stale_rest = len(stale - pinset)
    assert set(order[:n_never]) == set(never), (
        f"never-green keys must lead: {order[:n_never]} vs {never}"
    )
    assert order[n_never:n_never + n_pin] == pinned, (
        "FRONTLOAD pins must lead the checked block in pin order"
    )
    assert set(order[n_never + n_pin:n_never + n_pin + n_stale_rest]) \
        == stale - pinset, "unpinned stale keys must precede fresh greens"
    # after the pins: direct-stale precede transitive-stale
    tail = order[n_never + n_pin:n_never + n_pin + n_stale_rest]
    n_dir = len([k for k in stale_direct if k not in pinset])
    assert set(tail[:n_dir]) == {k for k in stale_direct if k not in pinset}
    # within each age-sorted block, last-green rounds never decrease
    for block in (
        tail[:n_dir],
        tail[n_dir:],
        order[n_never + n_pin + n_stale_rest:],
    ):
        rounds = [manifest[k]["round"] for k in block]
        assert rounds == sorted(rounds), f"non-monotone rounds: {block}"


def test_frontload_pin_expiry_is_per_key(monkeypatch):
    """Crafted-manifest pin of the expiry semantics, independent of
    the production classification path (round-9 review: the previous
    test mirrored derive_priority's own gate verbatim, so a wrong gate
    could never fail it). Three facts must hold:
      * a stale pinned key whose last green predates FRONTLOAD_ROUND
        leads the stale block;
      * an UNRELATED key's round-(FRONTLOAD_ROUND) green does NOT
        expire other pins (the partial-window failure mode);
      * a pinned key re-proven green at FRONTLOAD_ROUND sorts
        normally once stale again (its own pin has expired)."""
    queries = {"q_pin_old": 1, "q_pin_proven": 1, "q_other": 1,
               "q_fresh": 1}
    manifest = {
        # stale (fp moved), last green round 6 -> pin holds
        "q_pin_old": {"fp": "OLD", "nfp": "OLD", "round": 6},
        # stale again AFTER being re-proven at FRONTLOAD_ROUND ->
        # its pin has expired; sorts by age with the rest
        "q_pin_proven": {"fp": "OLD", "nfp": "OLD",
                         "round": fp.FRONTLOAD_ROUND},
        # unrelated key green at FRONTLOAD_ROUND — must not expire
        # q_pin_old's pin
        "q_other": {"fp": "OLD", "nfp": "OLD",
                    "round": fp.FRONTLOAD_ROUND},
        "q_fresh": {"fp": "CUR", "nfp": "CUR", "round": 5},
    }
    current = {k: "CUR" for k in queries}
    monkeypatch.setattr(fp, "load_manifest", lambda: manifest)
    monkeypatch.setattr(
        fp, "compute_fingerprints",
        lambda q, o, narrow=False: dict(current),
    )
    monkeypatch.setattr(
        fp, "FRONTLOAD", ("q_pin_old", "q_pin_proven"), raising=True
    )
    order = fp.derive_priority(queries, {})
    assert order[0] == "q_pin_old", order
    # the expired pin sorts by last-green age among the stale rest:
    # q_other (round FRONTLOAD_ROUND) ties q_pin_proven; q_pin_old
    # already led, q_fresh (unchanged fp) is last
    assert order[-1] == "q_fresh", order
    assert set(order[1:3]) == {"q_pin_proven", "q_other"}, order
    # round 10: a pin on a FRESH key with an old last green fronts it
    # too (generator_uniform's fingerprint hadn't moved since r2, so
    # the old stale-only gate could never re-window it) — and the
    # same per-key round expiry still applies to fresh pins
    monkeypatch.setattr(
        fp, "FRONTLOAD", ("q_fresh", "q_pin_old"), raising=True
    )
    order = fp.derive_priority(queries, {})
    assert order[:2] == ["q_fresh", "q_pin_old"], order
    manifest["q_fresh"]["round"] = fp.FRONTLOAD_ROUND
    order = fp.derive_priority(queries, {})
    assert order[0] == "q_pin_old" and order[-1] == "q_fresh", order


def test_unverified_queries_lead_the_registry():
    """A query with no green verdict in ANY round must outrank every
    green one (it is exactly what the driver window exists to check)."""
    green = _green_union()
    order = list(qc.QUERIES)
    unverified = [k for k in order if k not in green]
    if not unverified:
        return  # all ever-green — nothing to lead with
    worst_unverified = max(order.index(k) for k in unverified)
    assert worst_unverified < len(unverified) + 5, (
        "an unverified query sits deep in the registry: "
        f"{[k for k in unverified if order.index(k) >= len(unverified) + 5]}"
    )


def test_fingerprint_sensitivity():
    """The fingerprint must move when the oracle text moves, and be
    deterministic across recomputation (cold cache)."""
    a = fp.compute_fingerprints(qc.QUERIES, qc.ORACLES)
    fp.clear_cache()
    b = fp.compute_fingerprints(qc.QUERIES, qc.ORACLES)
    assert a == b, "fingerprints are not deterministic"
    mutated = dict(qc.ORACLES)
    key = "join_repartition"
    mutated[key] = mutated[key] + " -- changed"
    c = fp.compute_fingerprints(qc.QUERIES, mutated)
    assert c[key] != a[key], "oracle edit did not change the fingerprint"
    assert c["tpch_q1_pricing_summary"] == a["tpch_q1_pricing_summary"]


def test_fingerprint_tracks_operator_modules():
    """Each query's fingerprint must include the package modules its
    function imports, transitively — an edit to operators/joins.py has
    to mark every join query stale. Checked via the dependency closure
    rather than by mutating files on disk."""
    import mapreduce_join_comparison_spark as pkg

    fn = qc.QUERIES["join_repartition"]
    import sys

    mod = sys.modules[fn.__module__]
    pkg_dir = os.path.dirname(pkg.__file__)
    info = fp._module_info(mod.__file__)
    top = fn.__qualname__.split(".")[0]
    seg = info.segments[top]
    helpers = [info.segments[n] for n in sorted(fp._segment_names(seg))
               if n != top and n in info.segments]
    import ast

    tree = ast.parse("\n".join([seg] + helpers))
    direct = fp._resolve_imports(
        tree, fn.__module__.rsplit(".", 1)[0], pkg.__name__
    )
    closure = fp._closure(direct, pkg.__name__, pkg_dir)
    names = set(closure)
    assert any(n.endswith("operators.joins") for n in names), names
    assert any(n.endswith("sources.io") for n in names), (
        f"_load -> sources closure missing: {names}"
    )


def test_every_query_has_oracle():
    assert set(qc.ORACLES) == set(qc.QUERIES)


def test_pipeline_first_import_keeps_priority_order():
    """Importing the self-registering `pipeline` module FIRST drives the
    catalog body through a circular import: the pipeline queries
    register AFTER _reorder_for_driver(). register() must re-apply the
    derived ordering for those late arrivals — otherwise the pipeline
    queries silently fall to the registry tail regardless of
    staleness."""
    import subprocess
    import sys

    code = (
        "import mapreduce_join_comparison_spark.pipeline\n"
        "from mapreduce_join_comparison_spark import queries_catalog as qc\n"
        "order = list(qc.QUERIES)\n"
        "pri = qc._DRIVER_PRIORITY\n"
        "assert order == [k for k in pri if k in qc.QUERIES], (\n"
        "    'registry order diverged from derived priority')\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True
    )
    assert res.returncode == 0, res.stderr[-2000:]


def test_bench_headline_names_all_registered():
    """Every bench.py HEADLINE name must be a registered catalog query —
    a rename that misses the headline list would otherwise only
    surface as a KeyError in the driver's per-round bench run."""
    import bench

    from mapreduce_join_comparison_spark import queries_catalog as qc

    missing = [n for n in bench.HEADLINE if n not in qc.QUERIES]
    assert not missing, f"HEADLINE names not in catalog: {missing}"
    # and the list stays duplicate-free (duplicates skew the total)
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
