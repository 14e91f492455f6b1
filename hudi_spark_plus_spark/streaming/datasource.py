"""``writeStream.format("binlog-hudi")`` registration parity (N1).

The reference registers its sink as a DataSource short name so the
documented call shape is ``df.writeStream.format("binlog-hudi")...``
(BinlogHoodieDataSource.scala:35 + META-INF services registration). The
PySpark-native equivalent of its ``addBatch`` (a driver-side callback
that receives each micro-batch as a DataFrame and runs Spark jobs on
it) is ``foreachBatch`` — that is ``start_binlog_sync`` in ``sink.py``
and remains the preferred, zero-copy path.

PySpark 4's Python Data Source API *can* register the format string,
but its ``DataSourceStreamWriter.commit`` hook runs in a sandboxed
Python worker with NO SparkSession (verified empirically), so the merge
cannot run there. This module therefore implements the format as a
two-phase SPOOL sink — the shape a decoupled ingest deployment uses
anyway:

* executors stage each partition's envelope lines to
  ``<spool>/pending/`` in ``write()`` (data never funnels through one
  process);
* ``commit()`` atomically publishes ``<spool>/ready/batch-<id>.json``
  naming exactly the files of the committed attempt (a replayed
  attempt re-publishes; orphaned pending files from failed attempts
  are ignored by construction);
* a driver-side ``drain_binlog_spool(spark, options, spool)`` call (or
  loop) reads each ready batch with a normal distributed ``text`` scan
  and runs the same ``sync_batch`` as the foreachBatch path. Replays
  are no-ops: the spool batch id feeds the commit log's per-(table,
  batch) idempotence (H5).

The spool directory must be on a filesystem all executors and the
drainer can reach (POSIX/NFS here; an object-store deployment would
swap the ``open()`` calls for its client).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

SPOOL_DIR_OPT = "engine.spool.dir"


class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class _SpoolStreamWriter(DataSourceStreamWriter):
    """Executor-side stage + sandbox-side atomic publish."""

    def __init__(self, options):
        # dict-style access: options is a case-insensitive map supplied
        # by .options(...) on the writer
        spool = options.get(SPOOL_DIR_OPT)
        if not spool:
            raise ValueError(
                f"binlog-hudi sink requires .option('{SPOOL_DIR_OPT}', ...)"
            )
        self.spool = spool

    def write(self, iterator):
        pending = os.path.join(self.spool, "pending")
        os.makedirs(pending, exist_ok=True)
        path = os.path.join(pending, f"{uuid.uuid4().hex}.txt")
        n = 0
        with open(path, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(row[0] if row[0] is not None else "")
                f.write("\n")
                n += 1
        if n == 0:
            os.unlink(path)
            return _StagedFile("", 0)
        return _StagedFile(path, n)

    def commit(self, messages, batchId):
        files = [m.path for m in messages if m is not None and m.rows > 0]
        ready = os.path.join(self.spool, "ready")
        os.makedirs(ready, exist_ok=True)
        tmp = os.path.join(ready, f".batch-{batchId}.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"batch_id": batchId, "files": files}, f)
        os.replace(tmp, os.path.join(ready, f"batch-{batchId}.json"))

    def abort(self, messages, batchId):
        for m in messages or []:
            if m is not None and m.path:
                try:
                    os.unlink(m.path)
                except OSError:
                    pass


class BinlogHudiDataSource(DataSource):
    """Python DataSource carrying the reference's short name."""

    @classmethod
    def name(cls):
        return "binlog-hudi"

    def streamWriter(self, schema, overwrite):
        if len(schema.fields) != 1:
            raise ValueError(
                "binlog-hudi expects a single string envelope column "
                f"(got {len(schema.fields)} columns); select the raw "
                "envelope value before writing"
            )
        return _SpoolStreamWriter(self.options)


def register(spark) -> None:
    """Make ``format('binlog-hudi')`` resolvable in this session."""
    spark.dataSource.register(BinlogHudiDataSource)


def drain_binlog_spool(spark, options: dict[str, str], spool: str) -> int:
    """Run the lake merge for every published spool batch, in batch-id
    order; returns the number of batches drained. Safe to call
    repeatedly and after crashes: each batch re-runs through
    ``sync_batch`` whose per-(table, batch) commit-log idempotence makes
    replays no-ops. Drained markers are moved to ``<spool>/done/`` and
    their staged files deleted."""
    from hudi_spark_plus_spark.operators.sync import sync_batch

    ready = os.path.join(spool, "ready")
    if not os.path.isdir(ready):
        return 0
    # numeric batch order, NOT lexicographic ('batch-10' < 'batch-2'
    # lexicographically): replay order decides last-write-wins ties
    markers = sorted(
        (f for f in os.listdir(ready)
         if f.startswith("batch-") and f.endswith(".json")),
        key=lambda m: int(m[len("batch-"):-len(".json")]),
    )
    done = os.path.join(spool, "done")
    os.makedirs(done, exist_ok=True)
    drained = 0
    for marker in markers:
        with open(os.path.join(ready, marker), encoding="utf-8") as f:
            meta = json.load(f)
        files = [p for p in meta["files"] if os.path.exists(p)]
        if files:
            env = spark.read.text(files)
            sync_batch(spark, env, options, batch_id=f"spool-{meta['batch_id']}")
        os.replace(os.path.join(ready, marker), os.path.join(done, marker))
        for p in files:
            try:
                os.unlink(p)
            except OSError:
                pass
        drained += 1
    return drained
