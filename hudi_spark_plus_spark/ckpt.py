"""Releasing local-checkpoint storage — the part DataFrame.unpersist
silently does not do.

``Dataset.localCheckpoint`` materializes the query's INTERNAL RDD and
persists it directly (``RDD.localCheckpoint`` → MEMORY_AND_DISK); the
returned frame's plan is a ``LogicalRDD`` wrapping that RDD, and the
query is never registered in the cache manager. ``DataFrame.unpersist``
is a cache-manager call, so on a checkpointed frame it is a silent
NO-OP: the blocks linger until the ContextCleaner happens to GC the
plan object — unbounded executor-storage pressure in a long-lived
driver (streaming matview refreshes, per-batch near-dup state, any
iterative loop that checkpoints per round).

The real handle is the LogicalRDD's wrapped RDD, reachable through the
analyzed plan. ``release_local_checkpoint`` unpersists THAT — verified
against ``sc.getPersistentRDDs`` (test_ckpt.py): df.unpersist leaves
the entry, this removes it.
"""

from __future__ import annotations


def release_local_checkpoint(df, blocking: bool = False) -> bool:
    """Release the storage behind an ``df.localCheckpoint(...)`` frame.

    Returns True when a persisted plan-RDD was found and unpersisted;
    False for any frame that is not a local checkpoint (safe no-op —
    callers may pass arbitrary frames). After release the frame must
    not be read again: a lazy checkpoint would recompute, an eager one
    has no lineage left to recompute FROM. Spark logs one WARN per
    release ("was locally checkpointed ... cannot be recomputed after
    unpersisting") — that irreversibility is exactly the point; the
    caller is declaring the frame dead.
    """
    try:
        jrdd = df._jdf.queryExecution().logical().rdd()
        jrdd.unpersist(blocking)
        return True
    except Exception:
        return False


def release_all(frames, blocking: bool = False) -> int:
    """``release_local_checkpoint`` over an iterable; returns how many
    released. The standard cleanup for a refresh/batch that tracked
    its checkpoints in a list."""
    n = 0
    for f in frames:
        if release_local_checkpoint(f, blocking=blocking):
            n += 1
    return n
