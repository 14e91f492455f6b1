"""Event-time windowing extensions (SURVEY §2.5 last row).

The reference has NO watermarks or event-time windows — late data is
handled solely by LWW merge. These are declared engine additions: the
same window transforms work on a batch DataFrame and on a streaming one
(with ``with_watermark``), which is how Structured Streaming is meant to
be used.

``events.ts`` arrives as epoch-nanos BIGINT or TIMESTAMP_NTZ depending on
the testdata generation (see loaders.event_time); helpers normalize to
TIMESTAMP before windowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_spark_plus_spark.sources.loaders import event_time

TS_NS = "ts"


def to_event_time(df: DataFrame, ns_col: str = TS_NS, out: str = "event_time") -> DataFrame:
    """Source ts column (any supported layout) -> TIMESTAMP (UTC)."""
    return df.withColumn(out, event_time(df, ns_col))


def with_watermark(df: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return to_event_time(df).withWatermark("event_time", delay)


def tumbling_agg(df: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window: count + sum(value) per event_type."""
    return (
        to_event_time(df)
        .groupBy(F.window("event_time", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sv"))
        .select(
            F.col("w.start").cast("string").alias("ws"),
            "event_type",
            "cnt",
            "sv",
        )
    )


def sliding_agg(df: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        to_event_time(df)
        .groupBy(F.window("event_time", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").cast("string").alias("ws"), "event_type", "cnt")
    )


def session_agg(df: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Session window per user: activity bursts separated by >= gap.
    Bounds surfaced as epoch-microsecond BIGINTs (``session_window.end``
    is last-event + gap), so the DuckDB gaps-and-islands oracle can match
    exactly at microsecond precision."""
    return (
        to_event_time(df)
        .groupBy(F.session_window("event_time", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_micros(F.col("w.start")).alias("ws"),
            F.unix_micros(F.col("w.end")).alias("we"),
            "user_id",
            "cnt",
        )
    )
