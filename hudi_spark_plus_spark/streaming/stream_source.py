"""``spark.readStream.format("lake-table")`` — streaming read of a
lake table's commit timeline (the Hudi incremental-streaming-read /
Delta ``readStream`` analogue), via PySpark 4's Python Data Source API.

Semantics: an APPEND LOG of record versions. Each micro-batch emits
exactly the rows whose ``_commit_ver`` falls in the batch's
(startOffset, endOffset] version range, read from the files live at
the end version — the same per-version change stream ``incremental``
(H7) computes, but as a genuine Structured Streaming source whose
offsets Spark checkpoints (exactly-once across restarts with no
engine-side bookkeeping). Deletes surface as tombstone records
(``_deleted = true``). When several versions land in one micro-batch,
each record surfaces once at its final in-range state (record-level
granularity, same contract as ``incremental``); a consumer that needs
strict per-commit granularity caps the trigger or reads with
``maxVersionsPerBatch``. Downstream LWW is by (_ts, _commit_ver) —
or feed ``foreachBatch`` into another ``LakeTable.merge``, which
applies exactly that rule.

Execution model: offset discovery and partition planning run on the
DRIVER (plain filesystem reads of the commit log — no Spark jobs);
``read()`` runs in Python workers, one ``InputPartition`` per changed
data file, scanning with pyarrow and filtering to the version range —
rows never funnel through the driver. Executors must reach the table
path (POSIX/NFS here; an object-store deployment swaps in a pyarrow
filesystem). Column mapping is honored: files store PHYSICAL names,
the stream yields the table's logical schema.

Operational constraint (the same one Hudi documents for its cleaner
vs incremental readers): vacuum must not reclaim versions the stream
has not processed — size ``keep_last`` to consumer lag, or savepoint
the stream's floor.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

START_VERSION_OPT = "engine.stream.start.version"
MAX_VERSIONS_OPT = "engine.stream.max.versions.per.batch"

_COMMIT_VER = "_commit_ver"
_ARROW_TYPES = {
    "string": "string",
    "long": "int64",
    "bigint": "int64",
    "integer": "int32",
    "int": "int32",
    "short": "int16",
    "double": "float64",
    "float": "float32",
    "boolean": "bool",
    "date": "date32",
    "binary": "binary",
}


def _active_fields(schema_json: str) -> list[tuple[str, str, str]]:
    """[(logical name, physical name, spark simple type)] for active
    (non-dropped) fields — same column-mapping rules as
    ``LakeTable.schema`` / ``_physical_of``, parsed without a session."""
    full = StructType.fromJson(json.loads(schema_json))
    out = []
    for f in full.fields:
        meta = f.metadata or {}
        if meta.get("dropped"):
            continue
        out.append(
            (f.name, meta.get("physical", f.name), f.dataType.simpleString())
        )
    return out


class _FileSlice(InputPartition):
    def __init__(self, path: str, begin: int, end: int):
        self.path = path
        self.begin = begin
        self.end = end


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError(
                "lake-table source requires .option('path', <table dir>) "
                "or .load(<table dir>)"
            )
        from hudi_spark_plus_spark.table.commit_log import CommitLog

        self.table_path = path
        self.log = CommitLog(path)
        self.start_version = int(options.get(START_VERSION_OPT, 0))
        mv = options.get(MAX_VERSIONS_OPT)
        self.max_versions = int(mv) if mv else None
        latest = self.log.latest()
        if latest is None or not latest.schema_json:
            raise ValueError(
                f"lake table at {path} has no commits; create it before "
                "streaming from it"
            )
        self.fields = _active_fields(latest.schema_json)

    # -- offsets (driver-side) ----------------------------------------------

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        self.log.invalidate()  # other writers publish out-of-band
        vs = self.log.versions()
        tip = vs[-1] if vs else self.start_version
        return {"version": max(tip, self.start_version)}

    def partitions(self, start: dict, end: dict):
        b, e = int(start["version"]), int(end["version"])
        if self.max_versions is not None:
            e = min(e, b + self.max_versions)
        if e <= b:
            return []
        live = {f.path for f in self.log.live_files(e)}
        changed = self.log.changed_files(b, e)
        return [
            _FileSlice(os.path.join(self.table_path, f.path), b, e)
            for f in changed
            if f.path in live
        ]

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint holds the offset; nothing engine-side

    # -- data (worker-side) -------------------------------------------------

    def read(self, partition: _FileSlice):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(partition.path)
        ver = (
            pc.fill_null(t[_COMMIT_VER], 0)
            if _COMMIT_VER in t.column_names
            else pa.array([0] * t.num_rows, pa.int64())
        )
        mask = pc.and_(
            pc.greater(ver, partition.begin), pc.less_equal(ver, partition.end)
        )
        t = t.filter(mask)
        cols, names = [], []
        for logical, physical, simple in self.fields:
            if physical in t.column_names:
                cols.append(t[physical])
            else:  # file predates the column: nulls of the declared type
                at = _ARROW_TYPES.get(simple)
                if at is None:
                    raise ValueError(
                        f"lake-table stream cannot back-fill column "
                        f"{logical!r} of type {simple!r} for pre-evolution "
                        f"file {partition.path}"
                    )
                cols.append(pa.nulls(t.num_rows, pa.type_for_alias(at)))
            names.append(logical)
        yield from pa.table(cols, names=names).to_batches()


class LakeTableDataSource(DataSource):
    """Streaming-read side of the lake table (the write side is the
    foreachBatch sink / binlog-hudi spool in sink.py / datasource.py)."""

    @classmethod
    def name(cls):
        return "lake-table"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "lake-table source requires .option('path', <table dir>)"
            )
        from hudi_spark_plus_spark.table.commit_log import CommitLog

        latest = CommitLog(path).latest()
        if latest is None or not latest.schema_json:
            raise ValueError(f"lake table at {path} has no commits")
        full = StructType.fromJson(json.loads(latest.schema_json))
        return StructType(
            [
                f.__class__(f.name, f.dataType, True)
                for f in full.fields
                if not (f.metadata or {}).get("dropped")
            ]
        )

    def streamReader(self, schema):
        return LakeStreamReader(self.options)


def register(spark) -> None:
    """Make ``format('lake-table')`` resolvable in this session."""
    spark.dataSource.register(LakeTableDataSource)
