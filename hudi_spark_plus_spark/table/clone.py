"""Zero-copy shallow clone of a lake table (the Delta SHALLOW CLONE /
Hudi-style metadata-copy analogue).

``clone_table`` registers the SOURCE's live files (at a chosen version)
as the first commit of a NEW table — no data is read, copied, or moved;
the clone's first commit is pure manifest arithmetic. Writes to the
clone are copy-on-write against the clone's own root: a merge rewrites
hit files into the clone's data dir and simply drops the source-file
references from the clone's live set, so the source is never mutated
and the clone's ``vacuum`` (which only walks the clone's own data dir)
can never reclaim a source file. At 100 TB this is the dev/test/branch
workflow: a full-fidelity writable copy of a production table in
milliseconds, paying storage only for the delta.

Version-space continuity (the subtle invariant): rows carry a
``_commit_ver`` stamp from the SOURCE's timeline, and a COW rewrite on
the clone carries old rows forward with their stale stamps. If the
clone's timeline restarted at version 1, ``incremental(1)`` after the
first clone-local commit would mis-report every carried row stamped
``> 1`` as changed. The clone therefore CONTINUES the source's version
space: its first commit is ``cloned_version + 1``, so every carried
stamp is ``<= cloned_version < clone_base`` and record-level
incremental/CDC reads on the clone stay exact from the clone point
forward. Time travel below the clone base raises (no such commits) —
use the source for pre-clone history.

Source-vacuum hazard (same as Delta shallow clones): the source does
not know about clones, so a source ``vacuum`` may reclaim files a clone
still references. ``pin_source=True`` (default) creates a savepoint on
the source at the cloned version — vacuum retains savepoint-pinned
versions — named ``clone_<basename>``; release it with
``delete_savepoint`` when the clone is dropped.
"""

from __future__ import annotations

import os
from dataclasses import replace

from pyspark.sql import SparkSession

from hudi_spark_plus_spark.table.lake_table import LakeTable


def clone_table(
    spark: SparkSession,
    src: LakeTable,
    dst_path: str,
    version: int | None = None,
    pin_source: bool = True,
) -> LakeTable:
    """Shallow-clone ``src`` (at ``version``, default latest) into a new
    table at ``dst_path``. Returns the clone. Metadata-only: no data
    I/O, no Spark job."""
    base_commit = src.log.read(version) if version is not None else src.log.latest()
    if base_commit is None:
        raise ValueError(f"cannot clone empty table at {src.path}")
    if os.path.exists(os.path.join(dst_path, "_commits")) or (
        LakeTable(spark, dst_path, buckets=src.buckets).exists()
    ):
        raise ValueError(f"clone target {dst_path} already has a table")
    entries = [
        replace(f, path=src.log.abs_path(f.path))
        for f in src.log.live_files(version)
    ]
    if pin_source:
        name = f"clone_{os.path.basename(dst_path.rstrip('/'))}"
        if name not in src.savepoints():
            src.savepoint(name, version=base_commit.version)
    dst = LakeTable(
        spark,
        dst_path,
        buckets=src.buckets,
        partition_fields=src.partition_fields or None,
        global_index=src.global_index or None,
    )
    dst.log.commit(
        "clone",
        entries,
        schema_json=base_commit.schema_json,
        buckets=src.buckets,
        partition_fields=src.partition_fields or None,
        global_index=src.global_index or None,
        bootstrap_spec=src._bootstrap_spec(),
        # continue the source's version space (see module docstring)
        version_base=base_commit.version + 1,
    )
    return dst
