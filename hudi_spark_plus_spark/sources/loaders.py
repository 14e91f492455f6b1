"""Parquet source loaders for the driver testdata star schema.

Reference parity: the reference reads Parquet base files through a vendored
pull iterator (ParquetReaderIterator.java:39-67); Spark-native equivalent is
the built-in vectorized parquet scan (predicate pushdown + column pruning
come free from Catalyst — verified via .explain PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hudi_spark_plus_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. ``events.ts`` arrives as epoch-nanos BIGINT
    (see session.py nanosAsLong note)."""
    configure_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
