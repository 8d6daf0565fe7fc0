"""Testdata schema-drift tripwire. The driver regenerates
/root/testdata between rounds and has already changed physical types
once (events.ts: parquet TIMESTAMP(NANOS) in round 2 → naive
TIMESTAMP(MICROS) in round 3). The loaders in sources/io.py inspect
footers and normalize every variant they know about — but a type class
they've never seen would surface as obscure mid-catalog failures. This
test diffs every table's parquet schema against the committed snapshot
so a driver-side change fails HERE first, with a message saying exactly
what moved.

On intentional drift: confirm the footer-inspecting loaders handle the
new type, then regenerate the snapshot (see the command in the failure
message)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

SNAPSHOT = os.path.join(os.path.dirname(__file__), "testdata_schema_snapshot.json")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SF_DIRS = [d for d in ("sf0.001", "sf0.01", "sf0.1")
           if os.path.isdir(os.path.join(TESTDATA, d))]


@pytest.fixture(scope="module")
def snapshot() -> dict:
    with open(SNAPSHOT) as f:
        return json.load(f)


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("table", TABLES)
def test_table_schema_matches_snapshot(snapshot, sf, table):
    path = os.path.join(TESTDATA, sf, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    actual = {f.name: str(f.type) for f in pq.read_schema(path)}
    expected = snapshot[table]
    if actual != expected:
        added = sorted(set(actual) - set(expected))
        dropped = sorted(set(expected) - set(actual))
        retyped = sorted(
            f"{k}: {expected[k]} -> {actual[k]}"
            for k in set(actual) & set(expected)
            if actual[k] != expected[k]
        )
        pytest.fail(
            f"driver testdata schema drift in {sf}/{table}.parquet — "
            f"added={added} dropped={dropped} retyped={retyped}. "
            f"Verify sources/io.py loaders handle the new types, then "
            f"refresh the snapshot: python -c \"import pyarrow.parquet as pq,"
            f" json; print(json.dumps({{t: {{f.name: str(f.type) for f in "
            f"pq.read_schema('/root/testdata/sf0.01/'+t+'.parquet')}} for t in "
            f"'{' '.join(TABLES)}'.split()}}, indent=1, sort_keys=True))\" "
            f"> tests/testdata_schema_snapshot.json"
        )
