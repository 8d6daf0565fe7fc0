"""Rebuild ``FINGERPRINTS.json`` from the accumulated driver
CORRECTNESS_r*.json history.

For every query key: its latest driver-GREEN round N, and the
fingerprint its source had AT THE COMMIT THE DRIVER GRADED that round
(= the commit that added CORRECTNESS_rN.json — the driver commits the
result files onto the exact tree it graded). Old-commit fingerprints
come from detached git worktrees, each fingerprinted by
``tools/fp_dump.py`` in a subprocess that imports the worktree's own
package.

Run this at the START of each round, before any code edits, whenever a
new CORRECTNESS file has landed — the derived driver priority
(queries_catalog._DRIVER_PRIORITY) then leads with queries whose
source changed since their recorded green. Idempotent; safe to re-run.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
MANIFEST = os.path.join(REPO, "FINGERPRINTS.json")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True,
        capture_output=True, text=True,
    ).stdout.strip()


def _green_keys(path: str) -> set[str]:
    with open(path) as f:
        results = json.load(f)
    green = set()
    for key, v in results.items():
        if v.get("err"):
            continue
        hm = v.get("hash_match")
        if hm is True or (hm is None and v.get("rows_match")):
            green.add(key)
    return green


def _parse_fp_dump(out: str) -> tuple[dict[str, str], dict[str, str]]:
    """fp_dump output -> (full, narrow). Accepts both the current
    {"fp": {...}, "nfp": {...}} shape and the pre-narrow flat
    {key: fp} shape (empty narrow)."""
    data = json.loads(out)
    if set(data) <= {"fp", "nfp"}:
        return data.get("fp", {}), data.get("nfp", {})
    return data, {}


def _fingerprint_tree(commit: str) -> tuple[dict[str, str], dict[str, str]]:
    with tempfile.TemporaryDirectory(prefix="fp_wt_") as tmp:
        wt = os.path.join(tmp, "tree")
        _git("worktree", "add", "--detach", wt, commit)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "fp_dump.py"),
                 "--root", wt],
                check=True, capture_output=True, text=True, cwd=tmp,
            ).stdout
            return _parse_fp_dump(out)
        finally:
            _git("worktree", "remove", "--force", wt)


def main() -> None:
    rounds: dict[int, str] = {}  # round -> correctness path
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds[int(m.group(1))] = path

    last_green: dict[str, int] = {}
    for n in sorted(rounds):
        for key in _green_keys(rounds[n]):
            last_green[key] = n

    manifest: dict[str, dict] = {}
    for n in sorted(rounds):
        keys = [k for k, r in last_green.items() if r == n]
        if not keys:
            continue
        rel = os.path.basename(rounds[n])
        adds = _git(
            "log", "--diff-filter=A", "--format=%H", "--", rel
        ).splitlines()
        if adds:
            commit = adds[-1]
            print(f"round {n}: {len(keys)} keys at {commit[:9]}",
                  file=sys.stderr)
            fps, nfps = _fingerprint_tree(commit)
        else:
            # The driver dropped CORRECTNESS_rN.json after the final commit
            # and it is still untracked (ADVICE r4): the graded tree is the
            # current HEAD, so fingerprint the working tree directly.
            print(f"round {n}: {len(keys)} keys — {rel} not yet committed; "
                  "fingerprinting the current tree", file=sys.stderr)
            out = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "fp_dump.py"), "--root", REPO],
                check=True, capture_output=True, text=True,
            ).stdout
            fps, nfps = _parse_fp_dump(out)
        for k in keys:
            if k in fps:
                manifest[k] = {"fp": fps[k], "round": n}
                if k in nfps:
                    manifest[k]["nfp"] = nfps[k]
            else:
                print(f"  ! {k} green in r{n} but absent from that tree",
                      file=sys.stderr)

    with open(MANIFEST, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}: {len(manifest)} keys", file=sys.stderr)


if __name__ == "__main__":
    main()
