"""Record-level audit trail: every state one key ever held, across the
retained timeline.

``record_history(lake, key)`` answers the compliance/debugging question
a snapshot cannot — "what did THIS record look like at every point, who
deleted it, when did it come back" — without N per-version scans. The
insight making it cheap: data files are immutable and rows carry their
``_commit_ver``/``_ts`` stamps forever (COW rewrites CARRY old rows
forward with stale stamps — the same property the shallow-clone
version-space continuity relies on), so the full history of a key is
simply the DISTINCT set of its rows across every file the retained
timeline references. One pruned read, no per-version loop:

* candidate files are deduped BY PATH across all versions (a file
  carried through 50 commits is read once), then pruned by the key's
  bucket (xxhash64 parity with the write path), per-file min/max key
  range, and the per-file key Bloom — the same pruning stack as the
  live point lookup, applied to the whole timeline's file set;
* files are read under the schema of the version that INTRODUCED them
  (``_schema_at`` — an explicit column retype changes physical types
  at its commit, so one latest-schema read across a retype boundary
  would crash the vectorized reader), then aligned to the LATEST
  active schema by casting shared columns and nulling since-added
  ones;
* duplicate carried rows collapse with one DISTINCT (a logical state
  is identified by its stamps + payload; two different states of a key
  can never share a ``_commit_ver``, because one commit produces at
  most one state per key).

Each returned row is one historical state: ``_commit_ver`` (the commit
that produced it), ``_ts`` (the record's event/precombine time),
``_deleted`` (tombstone states included — a delete IS part of the
history), plus the payload columns at the latest logical schema,
ordered by ``_commit_ver``. States whose producing version was
vacuumed away are gone (vacuum bounds what the table remembers —
same contract as time travel); states carried INTO retained files
survive even when their producing commit was dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hudi_spark_plus_spark.table.bloom import KeyBloom, hash_key
from hudi_spark_plus_spark.table.bootstrap import BOOTSTRAP_KIND
from hudi_spark_plus_spark.table.keygen import KEY_COL, TS_COL, bucket_expr
from hudi_spark_plus_spark.table.lake_table import (
    COMMIT_VER_COL,
    DELETED_COL,
    LakeTable,
)


def record_history(lake: LakeTable, key: str) -> DataFrame:
    """Every distinct state ``key`` held across the retained timeline,
    ordered by ``_commit_ver`` (see module docstring)."""
    key = str(key)
    versions = lake.log.versions()
    if not versions:
        raise ValueError(f"lake table at {lake.path} has no commits")
    # bucket via the same JVM xxhash64 the write path uses (one 1-row job)
    b = (
        lake.spark.range(1)
        .select(bucket_expr(F.lit(key), lake.buckets).alias("b"))
        .first()["b"]
    )
    h = hash_key(key)
    files: dict[str, object] = {}
    intro: dict[str, int] = {}
    for v in versions:
        for f in lake.log.read(v).files:
            if f.path not in files:
                files[f.path] = f
                intro[f.path] = v

    def might_hold(f) -> bool:
        if f.kind == BOOTSTRAP_KIND:
            # bootstrap rows are unrouted (bucket unknown): min/max and
            # bloom still prune
            pass
        elif f.bucket != b:
            return False
        if f.min_key is not None and key < f.min_key:
            return False
        if f.max_key is not None and key > f.max_key:
            return False
        if f.bloom:
            return KeyBloom.from_b64(f.bloom).might_contain_hashed(h)
        return True

    cands = [f for f in files.values() if might_hold(f)]
    latest = lake.schema()
    if not cands:
        base = lake.spark.createDataFrame([], latest)
        return base.select(*_out_cols(latest))
    # schema-era grouping: read each file under the schema of the
    # version that introduced it (retype safety), align to latest
    by_era: dict[int, list] = {}
    for f in cands:
        by_era.setdefault(intro[f.path], []).append(f)
    latest_types = {f.name: f.dataType for f in latest.fields}
    out: DataFrame | None = None
    for v, fs in by_era.items():
        era_schema = lake._schema_at(v)
        df = lake._read_files(fs, schema=era_schema).where(
            F.col(KEY_COL) == key
        )
        aligned = df.select(
            *[
                F.col(c).cast(latest_types[c]).alias(c)
                for c in df.columns
                if c in latest_types
            ]
        )
        for name, dt in latest_types.items():
            if name not in aligned.columns:
                aligned = aligned.withColumn(name, F.lit(None).cast(dt))
        aligned = aligned.select(*latest_types.keys())
        out = aligned if out is None else out.unionByName(aligned)
    return (
        out.select(*_out_cols(latest))
        .distinct()
        .orderBy(F.coalesce(F.col(COMMIT_VER_COL), F.lit(0)), TS_COL)
    )


def _out_cols(schema) -> list:
    meta_first = [COMMIT_VER_COL, TS_COL, DELETED_COL]
    payload = [
        f.name
        for f in schema.fields
        if f.name not in meta_first and f.name != KEY_COL
    ]
    cols = []
    names = {f.name for f in schema.fields}
    for m in meta_first:
        if m in names:
            cols.append(F.col(m))
        elif m == DELETED_COL:
            cols.append(F.lit(False).alias(DELETED_COL))
        else:
            cols.append(F.lit(None).cast("long").alias(m))
    return cols + [F.col(c) for c in payload]
