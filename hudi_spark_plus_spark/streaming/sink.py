"""Streaming CDC sink (SURVEY §2.5, N1/N2/N3, H5).

The reference registers a custom V1 streaming sink (``binlog-hudi``,
BinlogHoodieDataSource.scala:24-33 + BinlogHoodieSink.scala:18-21) whose
``addBatch`` needs an RDD round-trip to un-stream the DataFrame
(scala:65-81). In PySpark none of that machinery is needed:
``foreachBatch`` already delivers a plain batch DataFrame per micro-batch
(N3 is obsolete by construction), and exactly-once comes from Spark's
checkpointed batch ids + the commit log's per-(table, batch_id)
idempotence (H5): after a crash the replayed batch is a no-op.

API mirrors the documented reference call shape (README.md:47-67):

    query = start_binlog_sync(
        stream_df, options,
        checkpoint_location="/tmp/ckpt",
        trigger={"processingTime": "10 seconds"},   # reference default
    )

For 1:1 parity with the reference's ``format("binlog-hudi")`` string,
``streaming/datasource.py`` registers the short name as a Python
DataSource spool sink (decoupled stage + drain); this foreachBatch
helper remains the preferred zero-copy path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from hudi_spark_plus_spark.operators.sync import sync_batch


def start_binlog_sync(
    stream_df: DataFrame,
    options: dict[str, str],
    checkpoint_location: str | None = None,
    trigger: dict | None = None,
    query_name: str = "binlog_sync",
) -> StreamingQuery:
    """``writeStream.foreachBatch`` wrapper around the per-batch sync
    command — one call per micro-batch, N tables kept in sync."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sync_batch(batch_df.sparkSession, batch_df, options, batch_id)

    writer = (
        stream_df.writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(_process)
    )
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def envelope_file_stream(spark, path: str, max_files_per_trigger: int | None = None):
    """Envelope source for tests/replays: a directory of JSON-lines files,
    one envelope per line, surfaced as the single ``value`` string column
    (the same shape the reference's upstream mysql-binlog source emits)."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path)
