"""Multimodal binary-column plumbing: metadata extraction stays
JVM-side; decode/frame-sample run through real mapInPandas Arrow
batches with deterministic stubs (no media libs in this container).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mapreduce_join_comparison_spark.operators.multimodal import (
    _stub_dims,
    blob_metadata,
    decode_image_features,
    sample_frames,
    sniff_format,
    text_as_blobs,
)


@pytest.fixture(scope="module")
def blobs(spark, tables):
    return text_as_blobs(tables["documents"]).cache()


def test_sniff_format_magic_bytes(spark):
    samples = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"x", "png"),
        (2, bytes.fromhex("FFD8FFE0") + b"x", "jpeg"),
        (3, bytes.fromhex("474946383961") + b"x", "gif"),
        (4, b"RIFF1234WAVE", "riff"),
        (5, bytes.fromhex("1A45DFA3") + b"x", "mkv/webm"),
        (6, b"plain text bytes", "unknown"),
        (7, b"", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b, _ in samples], ["id", "blob"]
    ).withColumn("fmt", sniff_format("blob"))
    got = {r["id"]: r["fmt"] for r in df.collect()}
    assert got == {i: fmt for i, _, fmt in samples}


def test_blob_metadata_hashes_and_lengths(spark, blobs):
    rows = blob_metadata(blobs).select("doc_id", "blob", "meta").limit(20).collect()
    assert rows
    for r in rows:
        b = bytes(r["blob"])
        assert r["meta"]["byte_len"] == len(b)
        expect = hashlib.md5(b.hex().upper().encode()).hexdigest()
        assert r["meta"]["content_md5"] == expect
        assert r["meta"]["format"] in ("png", "jpeg", "unknown")


def test_decode_stub_is_deterministic_and_complete(spark, blobs):
    feats = decode_image_features(blobs)
    assert feats.count() == blobs.count()
    sample = feats.limit(10).collect()
    raw = {r["doc_id"]: bytes(r["blob"]) for r in blobs.limit(100).collect()}
    checked = 0
    for r in sample:
        if r["doc_id"] not in raw:
            continue
        w, h, c = _stub_dims(raw[r["doc_id"]])
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["decoder"] == "stub"
        checked += 1
    assert checked > 0
    # dims bounded as documented
    bad = feats.filter(
        (F.col("width") < 16) | (F.col("width") >= 16 + 2048)
        | (F.col("channels") < 1) | (F.col("channels") > 4)
    )
    assert bad.count() == 0


def test_frame_sample_fanout(spark, blobs):
    n_docs = blobs.count()
    frames = sample_frames(blobs, n_frames=4)
    assert frames.count() == n_docs * 4
    per_doc = frames.groupBy("doc_id").count().filter("count != 4")
    assert per_doc.count() == 0
    one = frames.filter("doc_id = 0 AND frame_idx = 2").collect()
    blob0 = bytes(
        blobs.filter("doc_id = 0").select("blob").collect()[0]["blob"]
    )
    expect = hashlib.md5((blob0.hex().upper() + "2").encode()).hexdigest()
    assert one[0]["frame_md5"] == expect
