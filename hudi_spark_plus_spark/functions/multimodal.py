"""Multimodal (image/audio/video) column plumbing (SURVEY M6).

Media travels as opaque ``binary`` columns with a typed metadata struct.
The schema, partitioning, Arrow batch shape, and ``mapInPandas`` UDF
signatures are real and tested, and — since round 2 — so is the decode
step for container formats whose headers are parseable in pure Python:

* PNG  — IHDR chunk (width/height at fixed offsets after the signature)
* JPEG — marker scan to the first SOF frame header
* GIF  — logical screen descriptor (87a/89a)
* WAV  — RIFF/fmt chunk (sample rate / channels -> duration)

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
    return "png"


def encode_media_bytes(i: int) -> bytes:
    kind = media_kind(i)
    w, h = media_width(i), media_height(i)
    if kind == "jpeg":
        return encode_jpeg_shell(w, h)
    if kind == "gif":
        return encode_gif_shell(w, h)
    return encode_png(w, h, seed=i)


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table with REAL container bytes
    (PNG/JPEG/GIF mix keyed by media_id). Coalesced to a few partitions —
    a tiny fixture otherwise fans out one Python worker per core for
    mapInPandas, paying ~seconds of pure startup (real media tables size
    partitions by bytes instead)."""
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                "image",
                f"image/{media_kind(i)}",
                bytearray(encode_media_bytes(i)),
                media_width(i),
                media_height(i),
                None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(max(1, n // 16))


def encode_media_from_documents(docs: DataFrame) -> DataFrame:
    """Distributed media-fixture derivation: one media row per document
    id, container bytes encoded map-side in Arrow batches (the write-side
    twin of ``decode_image_features`` — exercises the same mapInPandas
    plumbing in the encode direction)."""

    def enc(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = [int(i) for i in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": ["image"] * len(ids),
                    "mime": [f"image/{media_kind(i)}" for i in ids],
                    "content": [encode_media_bytes(i) for i in ids],
                    "meta_width": pd.Series(
                        [media_width(i) for i in ids], dtype="int32"
                    ),
                    "meta_height": pd.Series(
                        [media_height(i) for i in ids], dtype="int32"
                    ),
                    "meta_duration_ms": pd.Series(
                        [None] * len(ids), dtype="Int32"
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
                if dims is not None:
                    widths.append(dims[0])
                    heights.append(dims[1])
                elif allow_fake:
                    widths.append(mw)
                    heights.append(mh)
                else:
                    raise NotImplementedError(
                        "unrecognized media container (not PNG/JPEG/GIF) "
                        "and pixel codecs are unavailable; pass "
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
