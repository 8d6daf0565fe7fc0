"""Multimodal (image/audio/video) column handling for training-data
pipelines (scale extension — absent in the reference, SURVEY.md §2.9).

Convention: media travel as opaque ``binary`` columns next to typed
metadata (byte length, content hash, sniffed container format). All
metadata extraction is JVM-side (length / md5 / magic-byte prefix match
in whole-stage codegen) so a 100 TB blob scan never crosses into
Python. Decode / feature-extraction runs through ``mapInPandas`` with
Arrow batches — the real distribution plumbing (schema, batch shape,
partition mapping) is implemented and tested. Decoder tiers: PIL when
importable (full decode), a pure-stdlib CONTAINER-HEADER parser for
real PNG/GIF/JPEG dimensions (works in this lib-less container), and
a clearly-marked deterministic hash-derived stub for anything neither
tier can read (including the catalog's synthetic fixtures, keeping
oracles replayable). Full pixel/sample decode beyond headers still
needs PIL/ffmpeg.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes (hex, uppercase) → container format
MAGIC_PREFIXES: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "png"),
    ("FFD8FF", "jpeg"),
    ("474946383761", "gif"),
    ("474946383961", "gif"),
    ("52494646", "riff"),  # wav/avi/webp share the RIFF envelope
    ("494433", "mp3"),
    ("FFFB", "mp3"),
    ("664C6143", "flac"),
    ("1A45DFA3", "mkv/webm"),
]

# MP4 is NOT a fixed prefix: the leading 4 bytes are the (variable)
# ftyp box SIZE — the signature is bytes 5..8 == 'ftyp', exactly what
# _parse_mp4_header checks, so the sniff and the parser agree on every
# box size (a fixed-size prefix list missed 0x14/0x1C/0x24 ftyp boxes)
_MP4_FTYP_HEX = "66747970"


def sniff_format(blob: Column | str) -> Column:
    """Container format from magic bytes — a JVM-side CASE over the hex
    prefix, no UDF."""
    c = F.col(blob) if isinstance(blob, str) else blob
    prefix = F.upper(F.hex(F.substring(c, 1, 16)))
    out = F.when(
        F.upper(F.hex(F.substring(c, 5, 4))) == _MP4_FTYP_HEX, F.lit("mp4")
    ).otherwise(F.lit("unknown"))
    for magic, fmt in reversed(MAGIC_PREFIXES):
        out = F.when(prefix.startswith(magic), F.lit(fmt)).otherwise(out)
    return out


def hex_md5(blob: Column | str) -> Column:
    """Content hash convention: md5 over the UPPERCASE-HEX rendering of
    the bytes (not the raw bytes) — every engine can hex a blob and md5
    a string, so fingerprints are portable across engines that cannot
    hash blobs directly."""
    c = F.col(blob) if isinstance(blob, str) else blob
    return F.md5(F.hex(c))


def blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Attach the typed-metadata struct every multimodal table carries:
    byte length, content hash (hex-md5 convention), sniffed format."""
    return df.withColumn(
        "meta",
        F.struct(
            F.length(F.col(blob_col)).cast("bigint").alias("byte_len"),
            hex_md5(blob_col).alias("content_md5"),
            sniff_format(blob_col).alias("format"),
        ),
    )


def text_as_blobs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic blob fixture: the documents table's text encoded as
    binary, with a PNG/JPEG magic header prepended on a doc_id rotation
    so format sniffing has variety. Purely synthetic — the container
    ships no media files — but byte-exact reproducible in any engine
    (the oracle replays it in SQL)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    blob = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.unhex(F.lit("89504E470D0A1A0A")), payload))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.unhex(F.lit("FFD8FFE0")), payload))
        .otherwise(payload)
    )
    return df.withColumn("blob", blob)


# ---------------------------------------------------------------------------
# Decode stage: mapInPandas with Arrow batches. Schema and partitioning
# are real; pixel decode is stubbed (see module docstring).
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("decoder", T.StringType()),
])


def _stub_dims(b: bytes) -> tuple[int, int, int]:
    """Deterministic fake dimensions from the content hash (hex-md5
    convention, see ``hex_md5``) — stands in for a real decode; stable
    across engines/runs."""
    import hashlib

    digest_hex = hashlib.md5(b.hex().upper().encode()).hexdigest()
    h = int(digest_hex[:8], 16)
    return 16 + h % 2048, 16 + (h >> 11) % 2048, 1 + (h >> 22) % 4


# PNG color type -> channel count (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_dims_header(b: bytes, fmt: str) -> tuple[int, int, int] | None:
    """REAL dimension extraction from container headers, pure stdlib —
    PNG IHDR, GIF logical screen descriptor, JPEG SOF scan. Strictly
    validated: any structural anomaly returns None (caller falls back
    to PIL-or-stub), so synthetic magic-prefix-plus-text fixtures never
    mis-parse. This is the middle decoder tier: full pixel decode needs
    PIL/ffmpeg, but width/height/channels — the features this schema
    exposes — are honestly decodable from bytes alone."""
    import struct

    try:
        if fmt == "png":
            # 8-byte signature | 4-byte length (must be 13) | 'IHDR' |
            # width | height | bit depth | color type ...
            if len(b) < 26 or b[8:12] != b"\x00\x00\x00\x0d" \
                    or b[12:16] != b"IHDR":
                return None
            w, h = struct.unpack(">II", b[16:24])
            color_type = b[25]
            if not (0 < w < 1 << 24 and 0 < h < 1 << 24):
                return None
            channels = _PNG_CHANNELS.get(color_type)
            return (w, h, channels) if channels else None
        if fmt == "gif":
            if len(b) < 11:
                return None
            w, h = struct.unpack("<HH", b[6:10])
            # palette-indexed: report the PALETTE band count (1), the
            # same value PIL's getbands() gives for mode 'P' — the
            # channels contract must not depend on which decoder tier
            # happened to run (ADVICE r4)
            return (w, h, 1) if w and h else None
        if fmt == "jpeg":
            # walk marker segments to a start-of-frame (SOF0..SOF15,
            # minus DHT/JPG/DAC which share the range but aren't SOFs)
            i = 2
            while i + 9 <= len(b):
                if b[i] != 0xFF:
                    return None
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
                if seg_len < 2:
                    return None
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                             0xCC):
                    # need bytes through b[i+9] (component count), so
                    # require i+10 <= len — an explicit guard, not the
                    # accidental except-Exception one (ADVICE r4)
                    if i + 10 > len(b):
                        return None
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    channels = b[i + 9]
                    return (w, h, channels) if w and h else None
                i += 2 + seg_len
            return None
    except Exception:
        return None
    return None


def decode_image_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Image decode / feature extraction over Arrow batches.

    Three decoder tiers, best available per blob:
      1. ``pil`` — full decode via PIL when importable;
      2. ``header`` — REAL width/height/channels parsed from PNG IHDR /
         GIF screen descriptor / JPEG SOF with stdlib only (strictly
         validated, so malformed bytes fall through);
      3. ``stub`` — deterministic fake dims from md5 (the catalog's
         synthetic magic-prefix fixtures land here by design, keeping
         the driver oracle engine-replayable).
    The mapInPandas contract — iterator of pandas batches in, iterator
    out, one Python worker per partition — is the exact shape any
    further decoder plugs into.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401
            import io as _io

            have_pil = True
        except Exception:
            have_pil = False

        for pdf in batches:
            # a NULL blob/id has nothing to decode: drop the row (the
            # JVM metadata path yields NULL meta for it) instead of
            # crashing the worker on bytes(None)/len(None)
            pdf = pdf[pdf[blob_col].notna() & pdf[id_col].notna()]
            if pdf.empty:
                continue
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "byte_len": pdf[blob_col].map(len).astype("int64"),
            }
            fmts, widths, heights, chans, decoders = [], [], [], [], []
            for raw in pdf[blob_col]:
                b = bytes(raw)
                fmt = "unknown"
                for magic, name in MAGIC_PREFIXES:
                    if b[: len(magic) // 2].hex().upper().startswith(magic):
                        fmt = name
                        break
                if fmt == "unknown" and b[4:8] == b"ftyp":
                    fmt = "mp4"  # size-agnostic, like sniff_format
                decoded = None
                if have_pil and fmt in ("png", "jpeg", "gif"):
                    try:  # pragma: no cover - PIL absent here
                        img = Image.open(_io.BytesIO(b))
                        decoded = (*img.size, len(img.getbands()))
                        decoders.append("pil")
                    except Exception:
                        decoded = None
                if decoded is None and fmt in ("png", "jpeg", "gif"):
                    decoded = _parse_dims_header(b, fmt)
                    if decoded is not None:
                        decoders.append("header")
                if decoded is None:
                    decoded = _stub_dims(b)
                    decoders.append("stub")
                w, h, c = decoded
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                chans.append(c)
            out["format"] = fmts
            out["width"] = pd.array(widths, dtype="int32")
            out["height"] = pd.array(heights, dtype="int32")
            out["channels"] = pd.array(chans, dtype="int32")
            out["decoder"] = decoders
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        decode, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_md5", T.StringType()),
    T.StructField("frame_ts_ms", T.LongType()),
    T.StructField("video_width", T.IntegerType()),
    T.StructField("video_height", T.IntegerType()),
    T.StructField("decoder", T.StringType()),
])


def _parse_mp4_header(b: bytes) -> tuple[int, int, int] | None:
    """REAL MP4/ISO-BMFF container metadata from box headers, pure
    stdlib — the video twin of ``_parse_dims_header`` (ADVICE r4 /
    round-5 directive): returns (duration_ms, width, height) parsed
    from ``moov/mvhd`` (timescale + duration, version 0 and 1) and the
    first ``trak/tkhd`` with non-zero 16.16 fixed-point dimensions.
    Strictly validated box walking (64-bit largesize and size-0
    "to end of file" handled; any structural anomaly returns None) so
    the catalog's synthetic text blobs can never mis-parse — the
    driver oracle keeps replaying stub semantics."""
    import struct

    def boxes(start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack(">I", b[i:i + 4])
            btype = b[i + 4:i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    return
                (size,) = struct.unpack(">Q", b[i + 8:i + 16])
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr or i + size > end:
                return
            yield btype, i + hdr, i + size
            i += size

    try:
        if len(b) < 16 or b[4:8] != b"ftyp":
            return None
        moov = next(
            ((s, e) for t, s, e in boxes(0, len(b)) if t == b"moov"), None
        )
        if moov is None:
            return None
        dur_ms = None
        width = height = 0
        for t, s, e in boxes(*moov):
            if t == b"mvhd":
                ver = b[s]
                if ver == 0 and e - s >= 20:
                    (timescale,) = struct.unpack(">I", b[s + 12:s + 16])
                    (dur,) = struct.unpack(">I", b[s + 16:s + 20])
                elif ver == 1 and e - s >= 32:
                    (timescale,) = struct.unpack(">I", b[s + 20:s + 24])
                    (dur,) = struct.unpack(">Q", b[s + 24:s + 32])
                else:
                    return None
                if not timescale:
                    return None
                dur_ms = dur * 1000 // timescale
            elif t == b"trak" and not width:
                for t2, s2, e2 in boxes(s, e):
                    # width/height are the trailing 8 bytes of tkhd
                    # (16.16 fixed point, after the transform matrix)
                    if t2 == b"tkhd" and e2 - s2 >= 52:
                        w16, h16 = struct.unpack(">II", b[e2 - 8:e2])
                        if w16 and h16:
                            width, height = w16 >> 16, h16 >> 16
        return None if dur_ms is None else (dur_ms, width, height)
    except Exception:
        return None


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling: emit ``n_frames`` evenly-spaced frames per
    blob. One input row fans out to N output rows through the same
    Arrow-batch path a real demuxer would use.

    Two tiers per blob:
      * ``mp4_header`` — REAL container metadata via ``_parse_mp4_header``
        (stdlib box walk): each frame carries its true midpoint sample
        timestamp ``(2i+1)·duration_ms / 2n`` (exact integer arithmetic)
        plus the track's pixel dimensions. Pixel extraction itself still
        needs a codec lib; the digest remains the deterministic stub.
      * ``stub`` — anything that is not a parseable MP4 (including the
        catalog's synthetic text blobs, by design): NULL timestamp/dims.
    Frame digest in both tiers: md5(hex(blob) || i), deterministic
    (hex-md5 convention, see ``hex_md5``).
    """

    def sample(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf[blob_col].notna() & pdf[id_col].notna()]
            if pdf.empty:
                continue
            ids, idxs, digests = [], [], []
            ts_ms, widths, heights, decoders = [], [], [], []
            for doc_id, raw in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(raw)
                hex_form = b.hex().upper()
                # hash the (dominant) blob hex ONCE, fork the digest
                # state per frame: md5(hex || i) byte-identical, but
                # one pass over the blob instead of n_frames passes
                base_md5 = hashlib.md5(hex_form.encode())
                parsed = _parse_mp4_header(b)
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    d = base_md5.copy()
                    d.update(str(i).encode())
                    digests.append(d.hexdigest())
                    if parsed is not None:
                        dur_ms, w, h = parsed
                        ts_ms.append((2 * i + 1) * dur_ms // (2 * n_frames))
                        widths.append(w or None)
                        heights.append(h or None)
                        decoders.append("mp4_header")
                    else:
                        ts_ms.append(None)
                        widths.append(None)
                        heights.append(None)
                        decoders.append("stub")
            yield pd.DataFrame({
                "doc_id": pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame_md5": digests,
                "frame_ts_ms": pd.array(ts_ms, dtype="Int64"),
                "video_width": pd.array(widths, dtype="Int32"),
                "video_height": pd.array(heights, dtype="Int32"),
                "decoder": decoders,
            })

    return df.select(id_col, blob_col).mapInPandas(
        sample, schema=FRAME_SAMPLE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio tier: WAV / FLAC header parsing over REAL bytes, pure stdlib —
# the audio twin of _parse_dims_header (images) and _parse_mp4_header
# (video). Pixel-level sample decode still needs an audio lib; the
# header features below are what a corpus-curation pass actually
# filters on (rate / channels / duration).
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("decoder", T.StringType()),
])


def _le_uint32_bytes(n: Column) -> Column:
    """Little-endian uint32 rendering of an int column as 4 binary
    bytes, JVM-side (byte-swapped unhex of the zero-padded hex)."""
    h = F.lpad(F.hex(n.cast("bigint")), 8, "0")
    return F.unhex(
        F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        )
    )


def _le_uint16_hex(v: int) -> str:
    return bytes([v & 0xFF, (v >> 8) & 0xFF]).hex().upper()


def _le_uint32_hex(v: int) -> str:
    return v.to_bytes(4, "little").hex().upper()


def wrap_wav(
    payload: Column, channels: int, sample_rate: int, bits: int
) -> Column:
    """A REAL, spec-valid PCM WAV container around arbitrary payload
    bytes, built entirely JVM-side (literal fmt chunk + two computed
    little-endian size fields — no UDF): RIFF(size) WAVE fmt(16,PCM)
    data(size) payload. Used to turn the documents table into
    byte-exact audio fixtures whose header features an oracle can
    re-derive arithmetically from the payload length."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt_chunk = (
        "666D7420"                      # 'fmt '
        + _le_uint32_hex(16)            # PCM fmt chunk length
        + _le_uint16_hex(1)             # audio_format = 1 (PCM)
        + _le_uint16_hex(channels)
        + _le_uint32_hex(sample_rate)
        + _le_uint32_hex(byte_rate)
        + _le_uint16_hex(block_align)
        + _le_uint16_hex(bits)
    )
    dlen = F.length(payload)
    return F.concat(
        F.unhex(F.lit("52494646")),                   # 'RIFF'
        _le_uint32_bytes(dlen + F.lit(36)),           # riff size
        F.unhex(F.lit("57415645")),                   # 'WAVE'
        F.unhex(F.lit(fmt_chunk)),
        F.unhex(F.lit("64617461")),                   # 'data'
        _le_uint32_bytes(dlen),
        payload,
    )


def _parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """REAL PCM WAV metadata from the RIFF chunk walk: returns
    (sample_rate, channels, bits_per_sample, data_len). Strictly
    validated (PCM format tag only, declared chunk sizes must fit the
    buffer) so non-WAV RIFF envelopes (avi/webp) and truncated blobs
    fall back rather than mis-parse."""
    import struct

    try:
        if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        rate = chans = bits = None
        data_len = None
        i = 12
        while i + 8 <= len(b):
            ctype = b[i:i + 4]
            (csize,) = struct.unpack("<I", b[i + 4:i + 8])
            if ctype == b"fmt " and csize >= 16 and i + 8 + 16 <= len(b):
                fmt_tag, chans, rate, _brate, _balign, bits = struct.unpack(
                    "<HHIIHH", b[i + 8:i + 24]
                )
                if fmt_tag != 1:
                    return None
            elif ctype == b"data":
                if i + 8 + csize > len(b):
                    return None
                data_len = csize
            # chunks are word-aligned: odd sizes carry a pad byte
            i += 8 + csize + (csize & 1)
        if None in (rate, chans, bits, data_len) or not rate or not chans \
                or bits not in (8, 16, 24, 32):
            return None
        return rate, chans, bits, data_len
    except Exception:
        return None


def _parse_flac_header(b: bytes) -> tuple[int, int, int, int] | None:
    """REAL FLAC STREAMINFO metadata (bit-packed fields of the first
    mandatory metadata block): returns (sample_rate, channels,
    bits_per_sample, total_samples)."""
    try:
        if len(b) < 4 + 4 + 34 or b[:4] != b"fLaC":
            return None
        # first metadata block header: 1 bit last-flag, 7 bits type,
        # 24 bits length — STREAMINFO is type 0 with length 34
        if (b[4] & 0x7F) != 0 or int.from_bytes(b[5:8], "big") != 34:
            return None
        s = b[8:42]
        packed = int.from_bytes(s[10:18], "big")  # rate/chan/bits/samples
        rate = packed >> 44
        chans = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        total = packed & ((1 << 36) - 1)
        if not rate:
            return None
        return rate, chans, bits, total
    except Exception:
        return None


def extract_audio_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Audio feature extraction through the Arrow-batch ``mapInPandas``
    path. Tiers per blob: ``wav_header`` / ``flac_header`` (REAL bytes,
    stdlib parsers above) else ``stub`` (NULL features). duration_ms =
    n_frames·1000 // rate, exact int arithmetic so an oracle that
    knows the payload length reproduces it bit-for-bit."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pdf = pdf[pdf[blob_col].notna() & pdf[id_col].notna()]
            if pdf.empty:
                continue  # NULL blob/id: nothing to parse (see image tier)
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for doc_id, raw in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(raw)
                wav = _parse_wav_header(b)
                flac = _parse_flac_header(b) if wav is None else None
                out["doc_id"].append(int(doc_id))
                out["byte_len"].append(len(b))
                if wav is not None:
                    rate, chans, bits, data_len = wav
                    frames = data_len // (chans * bits // 8)
                    out["format"].append("riff")
                    out["decoder"].append("wav_header")
                elif flac is not None:
                    rate, chans, bits, frames = flac
                    out["format"].append("flac")
                    out["decoder"].append("flac_header")
                else:
                    for c in ("sample_rate", "channels", "bits_per_sample",
                              "n_frames", "duration_ms"):
                        out[c].append(None)
                    out["format"].append("unknown")
                    out["decoder"].append("stub")
                    continue
                out["sample_rate"].append(rate)
                out["channels"].append(chans)
                out["bits_per_sample"].append(bits)
                out["n_frames"].append(frames)
                out["duration_ms"].append(frames * 1000 // rate)
            yield pd.DataFrame({
                "doc_id": pd.array(out["doc_id"], dtype="int64"),
                "byte_len": pd.array(out["byte_len"], dtype="int64"),
                "format": out["format"],
                "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                "channels": pd.array(out["channels"], dtype="Int32"),
                "bits_per_sample": pd.array(
                    out["bits_per_sample"], dtype="Int32"
                ),
                "n_frames": pd.array(out["n_frames"], dtype="Int64"),
                "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                "decoder": out["decoder"],
            })

    return df.select(id_col, blob_col).mapInPandas(
        extract, schema=AUDIO_FEATURES_SCHEMA
    )
