"""Pluggable commit finalizer (DESIGN.md "Object-store commit
atomicity"): the publish race must be an explicit CommitConflict through
EVERY finalizer, and lost races must reclaim their segments and retry
to the same final state."""

import threading

import pytest

from hudi_spark_plus_spark.table.commit_log import (
    CommitConflict,
    CommitLog,
    ConditionalPutFinalizer,
    ExclusiveCreateFinalizer,
    FileEntry,
    HardLinkFinalizer,
)
from hudi_spark_plus_spark.table.lake_table import LakeTable


@pytest.mark.parametrize(
    "finalizer", [HardLinkFinalizer(), ExclusiveCreateFinalizer()]
)
def test_same_version_race_loses_explicitly(tmp_path, finalizer):
    a = CommitLog(str(tmp_path), finalizer=finalizer)
    b = CommitLog(str(tmp_path), finalizer=finalizer)
    a.commit("insert", [FileEntry("data/a.parquet", 0, 1)])
    with pytest.raises(CommitConflict):
        b.commit(
            "insert",
            [FileEntry("data/b.parquet", 0, 1)],
            expected_version=1,
        )
    # the winner's manifest is INTACT (a rename-based publish would
    # have replaced it — the silent-wrong-answer mode this exists for)
    assert [f.path for f in a.live_files()] == ["data/a.parquet"]


def test_lost_race_reclaims_new_segments_only(tmp_path):
    fin = ExclusiveCreateFinalizer()
    a = CommitLog(str(tmp_path), finalizer=fin)
    b = CommitLog(str(tmp_path), finalizer=fin)
    a.commit("insert", [FileEntry("data/a.parquet", 0, 1)])
    b.invalidate()
    seg_count = len(list((tmp_path / "_commits" / "segments").iterdir()))
    with pytest.raises(CommitConflict):
        # b recomputed against the OLD timeline: same version target
        b_latest = 1
        b.commit(
            "insert",
            [FileEntry("data/b.parquet", 1, 1)],
            expected_version=b_latest,
        )
    after = len(list((tmp_path / "_commits" / "segments").iterdir()))
    assert after == seg_count  # the loser's fresh segment was reclaimed


def test_unbound_conditional_put_is_loud(tmp_path):
    """A store with no conditional-write binding must refuse to publish
    (enforced single-writer assumption), never silently fall back."""
    log = CommitLog(str(tmp_path), finalizer=ConditionalPutFinalizer())
    with pytest.raises(NotImplementedError, match="conditional-write"):
        log.commit("insert", [FileEntry("data/a.parquet", 0, 1)])
    assert log.versions() == []


def test_two_writer_merge_race_through_conditional_put(spark, tmp_path):
    """The q-lake-concurrent scenario through the object-store publish
    path: two threads merge disjoint batches concurrently with the
    ExclusiveCreateFinalizer (same observable semantics as a cloud
    conditional PUT); the loser's bounded retry recomputes and both
    batches land."""
    path = str(tmp_path / "t")

    def mk(rows):
        return spark.createDataFrame(
            rows, "_key string, _ts long, _op string, val string"
        )

    seed = LakeTable(
        spark, path, buckets=2, finalizer=ExclusiveCreateFinalizer()
    )
    seed.merge(mk([("s", 1, "upsert", "seed")]), "b0")
    barrier = threading.Barrier(2)
    errs = []

    def writer(i):
        try:
            t = LakeTable(spark, path, finalizer=ExclusiveCreateFinalizer())
            barrier.wait()
            t.merge(mk([(f"k{i}", 2, "upsert", f"v{i}")]), f"b{i + 1}")
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    final = LakeTable(spark, path)
    got = {r["_key"]: r["val"] for r in final.snapshot().collect()}
    assert got == {"s": "seed", "k0": "v0", "k1": "v1"}
    assert final.log.latest().version == 3
