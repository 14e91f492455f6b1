"""Multimodal (image/audio/video) column plumbing (SURVEY M6).

Media travels as opaque ``binary`` columns with a typed metadata struct.
The schema, partitioning, Arrow batch shape, and ``mapInPandas`` UDF
signatures are real and tested, and — since round 2 — so is the decode
step for container formats whose headers are parseable in pure Python:

* PNG  — IHDR chunk (width/height at fixed offsets after the signature)
* JPEG — marker scan to the first SOF frame header
* GIF  — logical screen descriptor (87a/89a)
* WAV  — RIFF/fmt chunk (sample rate / channels -> duration)
* MP4  — ISO-BMFF box walk: moov/mvhd (timescale+duration, v0 and v1)
  and moov/trak/tkhd (16.16 fixed-point width/height)

Pixel-level decode of other formats still needs a codec library (absent
in this container); those bytes either raise (default) or fall back to
the declared metadata when ``allow_fake=True`` — the clearly-marked stub
path.

Scale notes: media rows are large and skew-prone — the helpers keep
binary payloads OUT of shuffles (feature extraction happens map-side via
``mapInPandas`` before any exchange; metadata-only columns shuffle).
``spark.sql.files.maxPartitionBytes`` and Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) are the knobs that
bound executor memory per batch.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from hudi_spark_plus_spark.localdf import local_frame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("content", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_digest", StringType()),
        StructField("feature_hash", LongType()),
    ]
)

try:  # full-codec gate — absent in this container by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


# -- pure-Python container codecs (no third-party deps) ---------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC): frame headers carrying dims
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 8-bit grayscale PNG with deterministic pixels."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None per scanline
        raw.extend(((x * 31 + y * 17 + seed) & 0xFF) for x in range(width))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_jpeg_shell(width: int, height: int) -> bytes:
    """Header-only JPEG: SOI + SOF0 (1 component) + EOI — enough for any
    dimension-sniffing reader; no entropy-coded data."""
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + sof0 + b"\xff\xd9"


def encode_gif_shell(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


def decode_png_gray(b: bytes):
    """REAL pixel decode of an 8-bit grayscale non-interlaced PNG:
    chunk walk -> concatenated IDAT -> zlib inflate -> per-scanline
    unfilter (all five PNG filter types: None/Sub/Up/Average/Paeth).
    Returns an (h, w) uint8 numpy array, or None when the bytes are not
    a decodable grayscale PNG. Pure stdlib + numpy — the one raster
    format this container stack can decode END-TO-END without external
    codec libraries (everything else stops at header metadata)."""
    import numpy as np

    if len(b) < 8 or b[:8] != _PNG_SIG:
        return None
    pos, w = 8, None
    idat = []
    h = bit_depth = color_type = interlace = None
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if not idat or w is None or (bit_depth, color_type, interlace) != (8, 0, 0):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w + 1
    if len(raw) < h * stride:
        return None
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        f = raw[y * stride]
        line = np.frombuffer(raw, np.uint8, w, y * stride + 1)
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-1]  (bpp=1)
            cur = np.cumsum(line, dtype=np.uint64).astype(np.uint8)
        elif f == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256 per spec
        elif f == 3:  # Average — sequential in x
            cur = np.empty(w, dtype=np.uint8)
            left = 0
            for x in range(w):
                left = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
                cur[x] = left
        elif f == 4:  # Paeth — sequential in x
            cur = np.empty(w, dtype=np.uint8)
            left = 0
            for x in range(w):
                up = int(prev[x])
                ul = int(prev[x - 1]) if x else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                left = (int(line[x]) + pred) & 0xFF
                cur[x] = left
        else:
            return None
        out[y] = cur
        prev = cur
    return out


def parse_image_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from PNG/JPEG/GIF container headers; None when the
    bytes are not a recognized image container."""
    if len(b) >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h)
            if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seglen
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h)
    return None


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def encode_mp4_shell(width: int, height: int, duration_ms: int) -> bytes:
    """Minimal valid ISO-BMFF (MP4) box tree: ftyp + moov(mvhd +
    trak(tkhd)), no sample data. mvhd timescale is 1000 so its duration
    is in milliseconds; tkhd width/height are 16.16 fixed point per the
    spec."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">IIII", 0, 0, 1000, duration_ms)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + _UNITY_MATRIX
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07"  # version 0 + flags (enabled|in movie|preview)
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime mtime track_ID reserved
        + struct.pack(">I", duration_ms)
        + b"\x00" * 8  # reserved
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer altgroup volume reserved
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    return ftyp + _box(b"moov", mvhd + _box(b"trak", tkhd))


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, box_end) for ISO-BMFF boxes in
    b[start:end], handling 64-bit largesize and size-0 (to-end) boxes."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", b[i : i + 4])
        typ = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", b[i + 8 : i + 16])
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield typ, i + hdr, i + size
        i += size


def parse_mp4_meta(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, duration_ms) from an ISO-BMFF moov tree (mvhd
    v0/v1 for duration, first trak's tkhd v0/v1 for dimensions), or
    None when the bytes are not an MP4."""
    if len(b) < 12 or b[4:8] not in (b"ftyp", b"styp", b"moov"):
        return None
    dur_ms = w = h = None
    for typ, s, e in _walk_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _walk_boxes(b, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                if b[s2] == 1 and e2 - s2 >= 32:  # v1: 64-bit times
                    (ts,) = struct.unpack(">I", b[s2 + 20 : s2 + 24])
                    (dur,) = struct.unpack(">Q", b[s2 + 24 : s2 + 32])
                else:
                    ts, dur = struct.unpack(">II", b[s2 + 12 : s2 + 20])
                if ts:
                    dur_ms = int(dur * 1000 // ts)
            elif t2 == b"trak" and w is None:
                for t3, s3, e3 in _walk_boxes(b, s2, e2):
                    if t3 == b"tkhd":
                        if b[s3] == 1 and e3 - s3 >= 96:  # v1 layout
                            off = s3 + 88
                        elif e3 - s3 >= 84:
                            off = s3 + 76
                        else:
                            continue
                        wf, hf = struct.unpack(">II", b[off : off + 8])
                        w, h = wf >> 16, hf >> 16
    if w is None or dur_ms is None:
        return None
    return int(w), int(h), dur_ms


def encode_wav(rate: int, duration_ms: int, seed: int = 0) -> bytes:
    """Minimal valid 8-bit mono PCM RIFF/WAVE with deterministic
    samples."""
    frames = rate * duration_ms // 1000
    data = bytes(((i * 7 + seed) & 0xFF) for i in range(frames))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav_meta(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, duration_ms) from a RIFF/WAVE header, or None."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    rate = None
    block_align = None
    data_len = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= len(b):
            rate, = struct.unpack("<I", b[i + 12 : i + 16])
            block_align, = struct.unpack("<H", b[i + 20 : i + 22])
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)
    if rate and block_align and data_len is not None:
        frames = data_len // block_align
        return int(rate), int(frames * 1000 // rate)
    return None


# -- fixtures ----------------------------------------------------------------


def media_width(i: int) -> int:
    return 16 + i % 48


def media_height(i: int) -> int:
    return 16 + i % 32


def media_kind(i: int) -> str:
    if i % 5 == 0:
        return "jpeg"
    if i % 7 == 3:
        return "gif"
    if i % 11 == 5:
        return "mp4"
    if i % 13 == 7:
        return "wav"
    return "png"


def media_duration_ms(i: int) -> int | None:
    k = media_kind(i)
    if k == "mp4":
        return 1000 + (i % 60) * 250
    if k == "wav":
        return 500 + (i % 20) * 125
    return None


def media_sample_rate(i: int) -> int | None:
    # multiples of 1000 so frames*1000/rate round-trips duration exactly
    return (4000 + (i % 4) * 2000) if media_kind(i) == "wav" else None


_KIND_BY_FMT = {"mp4": "video", "wav": "audio"}


def encode_media_bytes(i: int) -> bytes:
    kind = media_kind(i)
    w, h = media_width(i), media_height(i)
    if kind == "jpeg":
        return encode_jpeg_shell(w, h)
    if kind == "gif":
        return encode_gif_shell(w, h)
    if kind == "mp4":
        return encode_mp4_shell(w, h, media_duration_ms(i))
    if kind == "wav":
        return encode_wav(media_sample_rate(i), media_duration_ms(i), seed=i)
    return encode_png(w, h, seed=i)


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table with REAL container bytes
    (PNG/JPEG/GIF mix keyed by media_id). Coalesced to a few partitions —
    a tiny fixture otherwise fans out one Python worker per core for
    mapInPandas, paying ~seconds of pure startup (real media tables size
    partitions by bytes instead)."""
    rows = []
    for i in range(n):
        k = media_kind(i)
        rows.append(
            (
                i,
                _KIND_BY_FMT.get(k, "image"),
                f"{_KIND_BY_FMT.get(k, 'image')}/{k}",
                bytearray(encode_media_bytes(i)),
                media_width(i),
                media_height(i),
                media_duration_ms(i),
            )
        )
    return local_frame(spark, rows, MEDIA_SCHEMA).coalesce(max(1, n // 16))


def encode_media_from_documents(docs: DataFrame) -> DataFrame:
    """Distributed media-fixture derivation: one media row per document
    id, container bytes encoded map-side in Arrow batches (the write-side
    twin of ``decode_image_features`` — exercises the same mapInPandas
    plumbing in the encode direction)."""

    def enc(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            kinds = [media_kind(i) for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": [_KIND_BY_FMT.get(k, "image") for k in kinds],
                    "mime": [
                        f"{_KIND_BY_FMT.get(k, 'image')}/{k}" for k in kinds
                    ],
                    "content": [encode_media_bytes(i) for i in ids],
                    "meta_width": pd.Series(
                        [media_width(i) for i in ids], dtype="int32"
                    ),
                    "meta_height": pd.Series(
                        [media_height(i) for i in ids], dtype="int32"
                    ),
                    "meta_duration_ms": pd.Series(
                        [media_duration_ms(i) for i in ids], dtype="Int32"
                    ),
                }
            )

    return docs.select("doc_id").mapInPandas(enc, MEDIA_SCHEMA)


# -- decode ------------------------------------------------------------------


def decode_image_features(
    df: DataFrame, allow_fake: bool = False
) -> DataFrame:
    """Per-image feature extraction via ``mapInPandas`` (Arrow batches).

    Width/height come from a REAL header parse (PNG IHDR / JPEG SOF /
    GIF screen descriptor — pure Python, no codec deps). Bytes that are
    not a recognized container either raise (default) or fall back to
    the declared metadata when ``allow_fake=True`` — the stub path,
    clearly marked (a full pixel decode would need PIL, absent here)."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            widths: list = []
            heights: list = []
            digests = []
            for content, mw, mh in zip(
                pdf["content"], pdf["meta_width"], pdf["meta_height"]
            ):
                raw = bytes(content)
                digests.append(hashlib.md5(raw).hexdigest())
                dims = parse_image_dims(raw)
                if dims is None:
                    mp4 = parse_mp4_meta(raw)
                    if mp4 is not None:
                        dims = mp4[:2]
                if dims is not None:
                    widths.append(dims[0])
                    heights.append(dims[1])
                elif allow_fake:
                    widths.append(mw)
                    heights.append(mh)
                else:
                    raise NotImplementedError(
                        "unrecognized media container (not PNG/JPEG/GIF/"
                        "MP4) and pixel codecs are unavailable; pass "
                        "allow_fake=True to fall back to declared metadata"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_digest": digests,
                    "feature_hash": [int(d[:15], 16) for d in digests],
                }
            )

    cols = ["media_id", "content", "meta_width", "meta_height"]
    return df.select(*cols).mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_digest", StringType()),
    ]
)


def decode_audio_features(
    df: DataFrame, allow_fake: bool = False
) -> DataFrame:
    """Per-audio feature extraction via ``mapInPandas``: sample rate and
    duration from a REAL RIFF/WAVE header parse. Non-WAV audio bytes
    raise (codec libraries absent here) unless ``allow_fake=True`` falls
    back to declared metadata — the marked stub path."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rates: list = []
            durs: list = []
            digests = []
            for content, md in zip(pdf["content"], pdf["meta_duration_ms"]):
                raw = bytes(content)
                digests.append(hashlib.md5(raw).hexdigest())
                meta = parse_wav_meta(raw)
                if meta is not None:
                    rates.append(meta[0])
                    durs.append(meta[1])
                elif allow_fake:
                    rates.append(0)
                    # declared duration is nullable Int32 (pd.NA for
                    # unknown containers); int32 Series construction
                    # raises on NA — coalesce to 0 so the designated
                    # fallback path degrades instead of crashing
                    durs.append(0 if pd.isna(md) else int(md))
                else:
                    raise NotImplementedError(
                        "unrecognized audio container (not RIFF/WAVE) and "
                        "audio codecs are unavailable; pass allow_fake="
                        "True to fall back to declared metadata"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "duration_ms": pd.Series(durs, dtype="int32"),
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_digest": digests,
                }
            )

    cols = ["media_id", "content", "meta_duration_ms"]
    return df.select(*cols).mapInPandas(extract, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (sequence + explode — JVM-side); actual frame decode is the stubbed
    step above. Demonstrates the fan-out shape without the codec."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta_duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )


PIXEL_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ]
)


def decode_pixel_features(df: DataFrame) -> DataFrame:
    """END-TO-END pixel statistics for decodable rasters (8-bit
    grayscale PNG — the format ``decode_png_gray`` fully inflates and
    unfilters): integer pixel sum/min/max per image, Arrow-batched via
    ``mapInPandas``. Rows whose bytes aren't a decodable PNG are
    dropped (callers filter by mime first; the container-metadata
    operators cover them). Integer outputs keep the oracle surface
    float-free."""

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = decode_png_gray(bytes(content))
                if px is None:
                    continue
                rows.append(
                    (
                        int(mid),
                        px.shape[1],
                        px.shape[0],
                        px.size,
                        int(px.sum(dtype=np.int64)),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "n_px", "px_sum", "px_min", "px_max",
                ],
            ).astype(
                {
                    "media_id": "int64", "width": "int32", "height": "int32",
                    "n_px": "int64", "px_sum": "int64",
                    "px_min": "int32", "px_max": "int32",
                }
            )

    return df.select("media_id", "content").mapInPandas(
        extract, PIXEL_FEATURES_SCHEMA
    )
