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
versions. The pin name is UNIQUE PER CLONE
(``clone_<basename>-v<version>-<token>``): two clones sharing a
destination basename, or a re-clone after a drop, can never silently
share (and then yank) one pin (ADVICE r10 #1). The clone records its
pin in ``_clone_pin.json`` at its own root; ``drop_clone`` reads it,
releases the source savepoint, and removes the clone — the lifecycle
helper that keeps a forgotten pin from blocking source vacuum forever.
``clone_pins(src)`` lists a source's live clone pins for auditing.

Exactly-once across the clone boundary: the clone's first commit
carries the source's already-applied batch-id set
(``carried_batch_ids``), so replaying an ingest pipeline against the
clone no-ops on batches the source already absorbed — ``has_batch`` is
truthful on both sides of the clone point (ADVICE r10 #5). The carry
obeys the SAME vacuum horizon as native batch ids (vacuum's
exactly-once CAUTION): ``has_batch`` only remembers retained versions,
on the source and the clone alike — the difference is that the clone's
memory of pre-clone batches lives entirely in its FIRST commit, so a
clone vacuum that drops the clone-base version forgets all of them at
once (the source forgets the same ids gradually as their commits age
out). Keep the clone's ``keep_last`` at least as deep as the ingest
pipeline's replay horizon, exactly as you would on the source.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import replace

from pyspark.sql import SparkSession

from hudi_spark_plus_spark.table.lake_table import LakeTable

PIN_FILE = "_clone_pin.json"
PIN_PREFIX = "clone_"


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
    pin_name = None
    if pin_source:
        # unique per clone: a shared name would let drop_clone of one
        # clone (or a re-clone over a stale name) yank another's pin
        pin_name = (
            f"{PIN_PREFIX}{os.path.basename(dst_path.rstrip('/'))}"
            f"-v{base_commit.version}-{uuid.uuid4().hex[:8]}"
        )
        src.savepoint(pin_name, version=base_commit.version)
        # pin record BEFORE the clone commit: a crash between the two
        # leaves a pin drop_clone can still find and release (the
        # reverse order leaked an unrecorded pin that blocked source
        # vacuum until manual clone_pins() archaeology). Published
        # atomically (ADVICE r11 #3): a plain open/write could expose
        # partial JSON to a concurrent drop_clone, which would silently
        # skip the release; O_EXCL-style create also makes the SECOND
        # clone racing the same dst_path lose HERE — before it could
        # clobber the record of the first clone's pin.
        os.makedirs(dst_path, exist_ok=True)
        from hudi_spark_plus_spark.functions.signature_store import (
            _atomic_pin,
        )

        if not _atomic_pin(
            os.path.join(dst_path, PIN_FILE),
            json.dumps(
                {
                    "source_path": os.path.abspath(src.path),
                    "savepoint": pin_name,
                    "version": base_commit.version,
                }
            ),
        ):
            src.delete_savepoint(pin_name)
            raise ValueError(
                f"clone target {dst_path} already has a clone pin "
                "record (a concurrent or crashed clone owns it); use a "
                "new path or drop_clone the existing one"
            )
    # batch ids the source already applied up to the clone point: replays
    # of those batches against the clone must be no-ops (H5 across the
    # clone boundary). Bounded by the source's retained timeline length.
    carried = sorted(
        {
            b
            for v in src.log.versions()
            if v <= base_commit.version
            and (b := src.log.read(v).batch_id) is not None
        }
        | {
            cb
            for v in src.log.versions()
            if v <= base_commit.version
            for cb in (src.log.read(v).carried_batch_ids or ())
        }
    )
    dst = LakeTable(
        spark,
        dst_path,
        buckets=src.buckets,
        partition_fields=src.partition_fields or None,
        global_index=src.global_index or None,
    )
    try:
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
            carried_batch_ids=carried or None,
        )
    except BaseException:
        # failed clone (e.g. a concurrent clone won the same target):
        # release the pin instead of leaking it against source vacuum.
        # Unlink the pin record only after verifying it is OURS — an
        # unconditional unlink would let a losing attempt delete the
        # record of the winner's pin, leaking that savepoint against
        # source vacuum until manual clone_pins() cleanup (ADVICE r11
        # #3; the savepoint itself is name-unique, always safe).
        if pin_name is not None:
            src.delete_savepoint(pin_name)
            pin_path = os.path.join(dst_path, PIN_FILE)
            try:
                with open(pin_path) as fh:
                    if json.load(fh).get("savepoint") == pin_name:
                        os.unlink(pin_path)
            except (OSError, ValueError):
                pass
        raise
    return dst


def clone_pins(src: LakeTable) -> dict[str, int]:
    """{savepoint name: pinned version} for every live clone pin on
    ``src`` — audit surface for pins whose clone was dropped without
    ``drop_clone`` (each blocks vacuum of its pinned version until
    released with ``delete_savepoint``)."""
    return {
        n: v for n, v in src.savepoints().items() if n.startswith(PIN_PREFIX)
    }


def drop_clone(clone: LakeTable) -> bool:
    """Drop a shallow clone: release its source savepoint pin (read from
    the clone's ``_clone_pin.json``; the source may then vacuum the
    previously-pinned files) and remove the clone's directory. Returns
    whether a pin was found and released. Safe on unpinned clones
    (``pin_source=False``) and on clones whose pin was already deleted."""
    released = False
    pin_file = os.path.join(clone.path, PIN_FILE)
    try:
        with open(pin_file) as fh:
            pin = json.load(fh)
        src = LakeTable(clone.spark, pin["source_path"])
        released = src.delete_savepoint(pin["savepoint"])
    except (OSError, ValueError, KeyError):
        pass  # unpinned clone, or pin record unreadable: nothing to release
    shutil.rmtree(clone.path, ignore_errors=True)
    return released
