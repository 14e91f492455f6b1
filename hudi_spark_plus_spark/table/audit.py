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

``record_histories(lake, keys)`` is the BATCH shape (VERDICT r11
directive 7 — the compliance export: "history of these 10k deleted
users"): the per-key bucket/range/Bloom prunes are UNIONED into one
candidate file set, read once, and attributed by one semi-join —
never a per-key loop re-reading overlapping files. The driver-side
key collect is capped at ``SCAN_KEYS_MAX`` (the H8 stance): past the
cap this is no longer a point-ish lookup, so pruning degrades to
bucket granularity (only the distinct bucket ids — bounded by the
table's bucket count — reach the driver) and attribution stays a
distributed semi-join.

Each returned row is one historical state: ``_commit_ver`` (the commit
that produced it), ``_ts`` (the record's event/precombine time),
``_deleted`` (tombstone states included — a delete IS part of the
history), plus the payload columns at the latest logical schema,
ordered by ``_commit_ver`` (batch shape: by ``_key`` first). States
whose producing version was vacuumed away are gone (vacuum bounds what
the table remembers — same contract as time travel); states carried
INTO retained files survive even when their producing commit was
dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hudi_spark_plus_spark.localdf import local_frame
from hudi_spark_plus_spark.table.bloom import KeyBloom, hash_key
from hudi_spark_plus_spark.table.bootstrap import BOOTSTRAP_KIND
from hudi_spark_plus_spark.table.keygen import KEY_COL, TS_COL, bucket_expr
from hudi_spark_plus_spark.table.lake_table import (
    COMMIT_VER_COL,
    DELETED_COL,
    LakeTable,
)


def _timeline_files(lake: LakeTable):
    """Every file any retained version references, deduped by path,
    with the version that INTRODUCED it (for schema-era reads)."""
    files: dict[str, object] = {}
    intro: dict[str, int] = {}
    for v in lake.log.versions():
        for f in lake.log.read(v).files:
            if f.path not in files:
                files[f.path] = f
                intro[f.path] = v
    return files, intro


def _candidate_timeline_files(lake: LakeTable, keys, buckets_only=None):
    """(candidate FileEntries, {path: intro version}) for a key SET —
    the union of the per-key bucket/min-max/Bloom prunes, computed in
    one pass over the deduped timeline file population. ``keys`` is a
    driver-side list (capped by the caller); ``buckets_only`` switches
    to bucket-granular pruning for the over-cap degrade."""
    files, intro = _timeline_files(lake)
    if buckets_only is not None:
        cands = [
            f
            for f in files.values()
            if f.bucket in buckets_only or f.kind == BOOTSTRAP_KIND
        ]
        return cands, intro
    keys = [str(k) for k in keys]
    if not keys:
        return [], intro
    if len(keys) == 1:
        bucket_rows = [
            (
                keys[0],
                lake.spark.range(1)
                .select(bucket_expr(F.lit(keys[0]), lake.buckets).alias("b"))
                .first()["b"],
            )
        ]
    else:
        # one bounded job computes every key's bucket with the same JVM
        # xxhash64 the write path uses
        bucket_rows = [
            (r["k"], r["b"])
            for r in local_frame(
                lake.spark, [(k,) for k in keys], "k string"
            )
            .select("k", bucket_expr(F.col("k"), lake.buckets).alias("b"))
            .collect()
        ]
    by_bucket: dict[int, list[tuple[str, int]]] = {}
    all_kh: list[tuple[str, int]] = []
    for k, b in bucket_rows:
        kh = (k, hash_key(k))
        by_bucket.setdefault(b, []).append(kh)
        all_kh.append(kh)

    def might_hold(f) -> bool:
        # bootstrap rows are unrouted (bucket unknown): every key
        # probes; min/max and bloom still prune
        kh = all_kh if f.kind == BOOTSTRAP_KIND else by_bucket.get(f.bucket)
        if not kh:
            return False
        in_range = [
            h
            for k, h in kh
            if (f.min_key is None or k >= f.min_key)
            and (f.max_key is None or k <= f.max_key)
        ]
        if not in_range:
            return False
        if f.bloom:
            return KeyBloom.from_b64(f.bloom).might_contain_any(in_range)
        return True

    return [f for f in files.values() if might_hold(f)], intro


def _read_eras_aligned(lake: LakeTable, cands, intro) -> DataFrame | None:
    """Read candidate files grouped by introducing version (retype
    safety), aligned to the LATEST logical schema. None when there is
    nothing to read."""
    if not cands:
        return None
    latest = lake.schema()
    latest_types = {f.name: f.dataType for f in latest.fields}
    by_era: dict[int, list] = {}
    for f in cands:
        by_era.setdefault(intro[f.path], []).append(f)
    out: DataFrame | None = None
    for v, fs in by_era.items():
        df = lake._read_files(fs, schema=lake._schema_at(v))
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
    return out


def _out_cols(schema, with_key: bool = False) -> list:
    meta_first = ([KEY_COL] if with_key else []) + [
        COMMIT_VER_COL,
        TS_COL,
        DELETED_COL,
    ]
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


def record_history(lake: LakeTable, key: str) -> DataFrame:
    """Every distinct state ``key`` held across the retained timeline,
    ordered by ``_commit_ver`` (see module docstring)."""
    key = str(key)
    if not lake.log.versions():
        raise ValueError(f"lake table at {lake.path} has no commits")
    cands, intro = _candidate_timeline_files(lake, [key])
    latest = lake.schema()
    out = _read_eras_aligned(lake, cands, intro)
    if out is None:
        base = lake.spark.createDataFrame([], latest)
        return base.select(*_out_cols(latest))
    return (
        out.where(F.col(KEY_COL) == key)
        .select(*_out_cols(latest))
        .distinct()
        .orderBy(F.coalesce(F.col(COMMIT_VER_COL), F.lit(0)), TS_COL)
    )


def record_histories(lake: LakeTable, keys) -> DataFrame:
    """Batch ``record_history``: one pruned read + one semi-join for a
    SET of keys (see module docstring). ``keys`` is a DataFrame whose
    first column is the key (any castable type) or an iterable of
    keys. Output adds ``_key`` ahead of the single-key shape's columns,
    ordered by (``_key``, ``_commit_ver``)."""
    if not lake.log.versions():
        raise ValueError(f"lake table at {lake.path} has no commits")
    if not isinstance(keys, DataFrame):
        keys = local_frame(
            lake.spark, [(str(k),) for k in keys], f"{KEY_COL} string"
        )
    first = keys.columns[0]
    key_set = (
        keys.select(F.col(first).cast("string").alias(KEY_COL))
        .where(F.col(KEY_COL).isNotNull())
        .distinct()
    )
    cap = lake.SCAN_KEYS_MAX
    rows = key_set.limit(cap + 1).collect()
    if len(rows) > cap:
        # no longer a point-ish lookup: bucket-granular pruning (the
        # distinct bucket id set is bounded by the table's bucket
        # count), distributed semi-join attribution
        buckets = {
            r[0]
            for r in key_set.select(
                bucket_expr(F.col(KEY_COL), lake.buckets).alias("b")
            )
            .distinct()
            .collect()
        }
        cands, intro = _candidate_timeline_files(
            lake, [], buckets_only=buckets
        )
    else:
        cands, intro = _candidate_timeline_files(
            lake, [r[0] for r in rows]
        )
    latest = lake.schema()
    out = _read_eras_aligned(lake, cands, intro)
    if out is None:
        base = lake.spark.createDataFrame([], latest)
        return base.select(*_out_cols(latest, with_key=True))
    return (
        out.join(key_set, KEY_COL, "left_semi")
        .select(*_out_cols(latest, with_key=True))
        .distinct()
        .orderBy(
            KEY_COL, F.coalesce(F.col(COMMIT_VER_COL), F.lit(0)), TS_COL
        )
    )
