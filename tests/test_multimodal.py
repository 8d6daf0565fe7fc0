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


# --- real container-header decode tier (round 4) -------------------------

def _make_png(w: int, h: int, color_type: int = 2) -> bytes:
    """A fully valid (CRC'd, zlib'd) minimal PNG built with stdlib."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * (w * channels) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _make_gif(w: int, h: int) -> bytes:
    import struct

    return (b"GIF89a" + struct.pack("<HH", w, h)
            + b"\xf0\x00\x00"          # flags, bg, aspect
            + b"\x00\x00\x00\xff\xff\xff"  # 2-entry palette
            + b"\x3b")                  # trailer


def _make_jpeg(w: int, h: int, channels: int = 3) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" + b"\x00" * 7
    comp = b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    sof_payload = struct.pack(">BHHB", 8, h, w, channels) + comp
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_decode_real_images(spark):
    """Real PNG/GIF/JPEG bytes decode their TRUE dimensions through the
    stdlib header tier (decoder='header'), with or without PIL — PIL,
    when present, reports identical dims under decoder='pil'."""
    rows = [
        (1, _make_png(3, 2, color_type=2)),        # 3x2 RGB
        (2, _make_png(640, 480, color_type=6)),    # RGBA
        (3, _make_gif(17, 9)),
        (4, _make_jpeg(33, 21, channels=3)),
        (5, b"\x89PNG\r\n\x1a\n" + b"not a real chunk"),  # corrupt
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    out = {r["doc_id"]: r for r in decode_image_features(df).collect()}
    # GIF expects 1 channel: palette-indexed band count, matching what
    # PIL's getbands() reports for mode 'P' (the channels value must
    # not flip when PIL is installed — ADVICE r4)
    expect = {1: (3, 2, 3), 2: (640, 480, 4), 3: (17, 9, 1),
              4: (33, 21, 3)}
    for doc_id, (w, h, c) in expect.items():
        r = out[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c), r
        assert r["decoder"] in ("header", "pil"), r
    # corrupt header falls through to the deterministic stub
    r = out[5]
    assert r["decoder"] == "stub"
    assert (r["width"], r["height"], r["channels"]) == _stub_dims(rows[4][1])


def test_header_parser_rejects_catalog_fixtures():
    """The catalog's synthetic blobs (magic prefix + text payload) must
    NEVER header-parse — the driver oracle replays stub semantics."""
    from mapreduce_join_comparison_spark.operators.multimodal import (
        _parse_dims_header,
    )

    png_fixture = b"\x89PNG\r\n\x1a\n" + "The quick brown fox".encode()
    jpeg_fixture = b"\xff\xd8\xff\xe0" + "Lorem ipsum dolor".encode()
    assert _parse_dims_header(png_fixture, "png") is None
    assert _parse_dims_header(jpeg_fixture, "jpeg") is None
    assert _parse_dims_header(b"", "png") is None
    assert _parse_dims_header(b"GIF89a\x00\x00\x00\x00", "gif") is None


def test_pil_tier_when_available(spark):
    """When PIL IS importable the pil tier takes precedence and agrees
    with the header parse; skipped (not failed) in lib-less containers
    so the suite passes both with and without PIL."""
    pytest.importorskip("PIL")
    df = spark.createDataFrame(
        [(1, _make_png(5, 7, color_type=2))], "doc_id bigint, blob binary"
    )
    (r,) = decode_image_features(df).collect()
    assert r["decoder"] == "pil"
    assert (r["width"], r["height"], r["channels"]) == (5, 7, 3)


# --- real MP4 container-header tier (round 5) ----------------------------

def _box(tag: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _make_mp4(duration_ms: int, w: int, h: int, timescale: int = 1000,
              version: int = 0) -> bytes:
    """Minimal valid ISO-BMFF: ftyp + moov(mvhd + trak(tkhd))."""
    import struct

    dur = duration_ms * timescale // 1000
    if version == 0:
        mvhd = (b"\x00\x00\x00\x00"              # version 0 + flags
                + struct.pack(">II", 0, 0)        # ctime, mtime
                + struct.pack(">II", timescale, dur)
                + b"\x00" * 80)
    else:
        mvhd = (b"\x01\x00\x00\x00"
                + struct.pack(">QQ", 0, 0)
                + struct.pack(">I", timescale) + struct.pack(">Q", dur)
                + b"\x00" * 80)
    # tkhd v0: ver+flags, ctime, mtime, track id, reserved, duration,
    # 8 reserved, layer/group/volume/reserved, 36-byte matrix, then
    # width/height as 16.16 fixed point
    tkhd = (b"\x00\x00\x00\x07"
            + struct.pack(">IIII I", 0, 0, 1, 0, dur)
            + b"\x00" * 16 + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16))
    moov = _box(b"moov", _box(b"mvhd", mvhd)
                + _box(b"trak", _box(b"tkhd", tkhd)))
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_mp4_header_parse_real_bytes():
    from mapreduce_join_comparison_spark.operators.multimodal import (
        _parse_mp4_header,
    )

    assert _parse_mp4_header(_make_mp4(8000, 640, 360)) == (8000, 640, 360)
    # version-1 mvhd (64-bit duration) and a non-1000 timescale
    assert _parse_mp4_header(
        _make_mp4(12_345, 1920, 1080, timescale=90_000, version=1)
    ) == (12_345, 1920, 1080)
    # structural anomalies must all reject, not mis-parse
    assert _parse_mp4_header(b"") is None
    assert _parse_mp4_header(b"\x00\x00\x00\x08ftypnomoov") is None
    good = _make_mp4(5000, 64, 48)
    assert _parse_mp4_header(good[:20]) is None          # truncated
    assert _parse_mp4_header(b"The quick brown fox jumps over") is None


def test_frame_sample_mp4_tier_and_stub_fallback(spark):
    import hashlib as _hl

    mp4 = _make_mp4(8000, 640, 360)
    rows = [(1, mp4), (2, b"plain text, not a container")]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    out = sample_frames(df, n_frames=4).collect()
    by_key = {(r["doc_id"], r["frame_idx"]): r for r in out}
    assert len(by_key) == 8
    # mp4 tier: real midpoint timestamps (2i+1)*8000/8 = 1000,3000,...
    for i, expect_ts in enumerate([1000, 3000, 5000, 7000]):
        r = by_key[(1, i)]
        assert r["decoder"] == "mp4_header"
        assert r["frame_ts_ms"] == expect_ts
        assert (r["video_width"], r["video_height"]) == (640, 360)
        assert r["frame_md5"] == _hl.md5(
            (mp4.hex().upper() + str(i)).encode()
        ).hexdigest()
    # stub tier: NULL timestamp/dims, digest contract unchanged
    r = by_key[(2, 0)]
    assert r["decoder"] == "stub"
    assert r["frame_ts_ms"] is None and r["video_width"] is None


# ------------------------------------------------------------------ audio tier


def _make_wav(rate=8000, channels=1, bits=16, n_frames=100) -> bytes:
    """A real WAV via the stdlib wave module — independent of our
    writer, so parser and writer cannot share a bug."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        w.writeframes(bytes(n_frames * channels * (bits // 8)))
    return buf.getvalue()


def _make_flac(rate=44100, channels=2, bits=16, total=12345) -> bytes:
    """Minimal FLAC: magic + one last-flag STREAMINFO block with the
    bit-packed rate/channels/bits/total-samples word."""
    packed = (
        (rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total
    )
    info = bytes(10) + packed.to_bytes(8, "big") + bytes(16)
    assert len(info) == 34
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + info


def test_parse_wav_real_bytes():
    from mapreduce_join_comparison_spark.operators.multimodal import (
        _parse_wav_header,
    )

    got = _parse_wav_header(_make_wav(rate=16000, channels=2, bits=16,
                                      n_frames=321))
    assert got == (16000, 2, 16, 321 * 4)
    # non-PCM and truncated data chunks are rejected, not mis-parsed
    wav = bytearray(_make_wav())
    wav[20] = 3  # fmt tag -> IEEE float
    assert _parse_wav_header(bytes(wav)) is None
    assert _parse_wav_header(_make_wav()[:40]) is None
    assert _parse_wav_header(b"RIFFxxxxAVI LIST") is None


def test_parse_flac_real_bytes():
    from mapreduce_join_comparison_spark.operators.multimodal import (
        _parse_flac_header,
    )

    assert _parse_flac_header(
        _make_flac(rate=44100, channels=2, bits=16, total=12345)
    ) == (44100, 2, 16, 12345)
    assert _parse_flac_header(b"fLaCxxxx") is None


def test_wrap_wav_roundtrips_through_parser(spark):
    """The JVM-side WAV writer and the Python-side parser agree on
    every field — and stdlib wave can open our container too."""
    import io
    import wave

    from mapreduce_join_comparison_spark.operators.multimodal import (
        extract_audio_features,
        wrap_wav,
    )

    df = spark.createDataFrame(
        [(1, "hello audio"), (2, "x" * 1001)], "doc_id bigint, text string"
    ).select(
        "doc_id",
        wrap_wav(F.encode("text", "UTF-8"), 2, 16000, 16).alias("blob"),
    )
    rows = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["decoder"] == "wav_header"
    assert rows[1]["sample_rate"] == 16000
    assert rows[1]["channels"] == 2
    assert rows[1]["n_frames"] == len("hello audio") // 4
    assert rows[2]["n_frames"] == 1001 // 4
    assert rows[2]["duration_ms"] == (1001 // 4) * 1000 // 16000
    # cross-check with the stdlib reader
    raw = bytes(
        df.filter("doc_id = 2").collect()[0]["blob"]
    )
    with wave.open(io.BytesIO(raw), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 2
        assert w.getnframes() == 1001 // 4


def test_audio_stub_fallback(spark):
    from mapreduce_join_comparison_spark.operators.multimodal import (
        extract_audio_features,
    )

    df = spark.createDataFrame(
        [(1, b"not audio at all"), (2, _make_flac(total=7, rate=8000))],
        "doc_id bigint, blob binary",
    )
    rows = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert rows[1]["decoder"] == "stub"
    assert rows[1]["sample_rate"] is None
    assert rows[2]["decoder"] == "flac_header"
    assert rows[2]["n_frames"] == 7
