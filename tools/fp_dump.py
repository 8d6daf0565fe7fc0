"""Print {query_key: fingerprint} for the repo tree at ``--root`` as
one JSON object on stdout.

Imports the PACKAGE FROM THE TARGET TREE (so running this against a
git worktree of an old commit fingerprints that round's code), but
loads the fingerprint library from THIS repo by file path — old trees
predate the library. No Spark session is created; importing the
catalog only builds the registry dicts.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".", help="repo tree to fingerprint")
    args = ap.parse_args()
    root = os.path.abspath(args.root)

    here = os.path.dirname(os.path.abspath(__file__))
    lib = os.path.join(
        os.path.dirname(here),
        "mapreduce_join_comparison_spark", "plans", "fingerprint.py",
    )
    spec = importlib.util.spec_from_file_location("_fp_lib", lib)
    fplib = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fplib)

    sys.path.insert(0, root)
    from mapreduce_join_comparison_spark import queries_catalog as qc

    # guard against accidentally importing some OTHER tree's package
    got = os.path.abspath(os.path.join(os.path.dirname(qc.__file__), ".."))
    assert got == root, f"imported {got}, wanted {root}"

    full = fplib.compute_fingerprints(qc.QUERIES, qc.ORACLES)
    try:
        narrow = fplib.compute_fingerprints(
            qc.QUERIES, qc.ORACLES, narrow=True
        )
    except TypeError:  # fplib from a tree predating narrow fingerprints
        narrow = {}
    json.dump(
        {"fp": full, "nfp": narrow},
        sys.stdout, indent=0, sort_keys=True,
    )


if __name__ == "__main__":
    main()
