"""Multimodal (image/audio/video) column plumbing (SURVEY M6).

Media travels as opaque ``binary`` columns with a typed metadata struct —
the schema, partitioning, Arrow batch shape, and ``mapInPandas`` UDF
signatures are real and tested; the actual codec step is STUBBED (this
container ships no image/audio libraries): ``decode_image`` raises
``NotImplementedError`` unless ``allow_fake=True``, in which case a
clearly-marked deterministic fake (keyed on the content digest) stands in
so the distributed plumbing is exercisable end-to-end.

Scale notes: media rows are large and skew-prone — the helpers keep
binary payloads OUT of shuffles (feature extraction happens map-side via
``mapInPandas`` before any exchange; metadata-only columns shuffle).
``spark.sql.files.maxPartitionBytes`` and Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) are the knobs that
bound executor memory per batch.
"""

from __future__ import annotations

import hashlib
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

try:  # real decoder gate — absent in this container by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (test fixture: fake bytes).
    Coalesced to a few partitions — a tiny fixture otherwise fans out one
    Python worker per core for mapInPandas, paying ~seconds of pure
    startup (real media tables size partitions by bytes instead)."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        rows.append(
            (i, "image", "image/png", bytearray(content), 64 + i % 32,
             48 + i % 16, None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(max(1, n // 16))


def decode_image_features(
    df: DataFrame, allow_fake: bool = False
) -> DataFrame:
    """Per-image feature extraction via ``mapInPandas`` (Arrow batches).

    With a real codec installed this would decode and measure; without
    one it either raises (default) or produces a deterministic fake
    derived from the content digest — STUB, clearly marked.
    """
    if not _HAS_PIL and not allow_fake:
        raise NotImplementedError(
            "image decoding requires PIL (not installed); pass "
            "allow_fake=True for the deterministic stub"
        )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            digests = [
                hashlib.md5(bytes(b)).hexdigest() for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # stub: metadata passthrough stands in for decode
                    "width": pdf["meta_width"],
                    "height": pdf["meta_height"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_digest": digests,
                    "feature_hash": [
                        int(d[:15], 16) for d in digests
                    ],
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
