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
    """Load one testdata table. ``events.ts`` arrives either as epoch-nanos
    BIGINT (TIMESTAMP(NANOS) parquet + session.py nanosAsLong) or as
    TIMESTAMP_NTZ (TIMESTAMP(MICROS) parquet) depending on how the driver
    generated the data — use :func:`epoch_us` / :func:`event_time` instead
    of assuming one layout."""
    configure_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame) -> DataFrame:
    """Round-robin the input UP to the session's default parallelism
    before CPU-heavy per-row expansion (n-gram explode, signature
    folds). Scan parallelism is bounded by input splits; the fixture
    tables are ONE parquet file (one row group), so without this every
    map stage of a heavy operator runs on a single core. Strictly
    widen-only: a production corpus already in >= parallelism splits
    passes through untouched (no shuffle) — this never coalesces or
    reshuffles already-distributed data. The partition probe is lazy
    metadata (input split count), not a job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # JVM-side partition probe: df.rdd would wrap the plan in a Python
    # deserializer RDD just to read metadata; _jdf.rdd() asks the
    # existing JVM plan directly (still lazy, no job)
    if df._jdf.rdd().getNumPartitions() >= target:
        return df
    return df.repartition(target)


def epoch_us(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds BIGINT column for a timestamp-ish source column,
    robust to the three layouts testdata has shipped with: epoch-nanos
    BIGINT, TIMESTAMP_NTZ (micros), or plain TIMESTAMP. The session runs
    UTC (session.py) so the NTZ->TIMESTAMP cast is timezone-free and the
    result matches DuckDB's ``epoch_us`` exactly.

    CONTRACT: a BIGINT column is assumed to hold epoch-NANOS (the only
    integer layout the testdata generator has ever produced — it comes
    from ``nanosAsLong`` reads). Dtype alone cannot distinguish nanos
    from micros, so never call this on a column that already holds
    epoch-micros longs (e.g. a prior ``epoch_us`` output): it would be
    divided by 1000 again, silently shifting everything to ~1970."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes)[col]
    if dtype == "bigint":  # epoch-nanos; integer div keeps it exact
        return F.expr(f"{col} div 1000")
    if dtype == "timestamp_ntz":
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.unix_micros(F.col(col))


def event_time(df: DataFrame, col: str = "ts"):
    """TIMESTAMP column (for windowing) from any of the source layouts
    handled by :func:`epoch_us`."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes)[col]
    if dtype == "bigint":
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if dtype == "timestamp_ntz":
        return F.col(col).cast("timestamp")
    return F.col(col)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
