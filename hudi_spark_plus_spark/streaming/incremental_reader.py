"""Pull-based streaming read of a lake table (the streaming-read face
of H7's incremental query — the analogue of Hudi's incremental
streaming source the reference gets via its Hudi dependency).

``IncrementalReader`` turns the commit timeline into a micro-batch
stream: each ``poll()`` returns the records changed since the last
ACKNOWLEDGED version (record-level, tombstones included) plus the
version watermark to acknowledge; ``commit(version)`` durably advances
the checkpoint. Separating poll from commit gives at-least-once
processing — a consumer that crashes after poll but before commit
re-reads the same batch, and the checkpoint write is atomic
(tmp + rename), so a torn write can never corrupt the cursor.

Scale: a poll's planning cost is the segment-path diff
(O(changed buckets)); the read cost is the changed files only (COW) or
the affected buckets (MOR — see DESIGN.md). The checkpoint is one tiny
JSON file per consumer, so fan-out consumers are independent cursors
over the same immutable timeline.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame

from hudi_spark_plus_spark.table.lake_table import LakeTable


class IncrementalReader:
    def __init__(self, lake: LakeTable, checkpoint_path: str):
        self.lake = lake
        self.checkpoint_path = checkpoint_path

    def last_acknowledged(self) -> int:
        """The newest version this consumer has committed (0 = start of
        the timeline: the first poll returns the full current state as
        changes)."""
        try:
            with open(self.checkpoint_path) as fh:
                return int(json.load(fh)["version"])
        except FileNotFoundError:
            return 0  # no checkpoint yet: start of the timeline
        except (ValueError, KeyError):
            return 0  # malformed/torn content: restart from the beginning
        # any other OSError (EACCES, transient I/O) propagates — silently
        # resetting the cursor would replay the whole table as one batch

    def poll(self) -> tuple[DataFrame, int] | None:
        """(changes DataFrame, version-to-acknowledge) for everything
        committed after the checkpoint, or None when caught up. The
        DataFrame is the record-level incremental view: one row per
        changed record at its final in-range state, deletes as
        tombstone rows (``_deleted = true``)."""
        last = self.last_acknowledged()
        latest = self.lake.log.latest()
        if latest is None or latest.version <= last:
            return None
        return self.lake.incremental(last, latest.version), latest.version

    def commit(self, version: int) -> None:
        """Durably acknowledge every change up to ``version``
        (atomic tmp + rename — readable cursor at all times)."""
        d = os.path.dirname(self.checkpoint_path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump({"version": int(version)}, fh)
        os.replace(tmp, self.checkpoint_path)
