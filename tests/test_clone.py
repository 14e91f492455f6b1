"""Shallow clone (table/clone.py): zero-copy branch of a lake table.

The invariants worth their own file: the clone's first commit is pure
metadata (zero Spark jobs), writes to the clone are copy-on-write
against the clone's own root (source bytes never change, clone vacuum
never reclaims them), and the clone CONTINUES the source's version
space so record-level incremental reads stay exact across carried
``_commit_ver`` stamps — the trap a version-1 restart would spring.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from hudi_spark_plus_spark.table.clone import clone_table
from hudi_spark_plus_spark.table.lake_table import LakeTable

pytestmark = pytest.mark.slow  # full-tier suite (see pytest.ini)


def mkbatch(spark, rows):
    """rows: (key, ts, op, val)"""
    return spark.createDataFrame(
        rows, "_key string, _ts long, _op string, val string"
    )


def snap(t):
    return {r["_key"]: (r["_ts"], r["val"]) for r in t.snapshot().collect()}


@pytest.fixture()
def src(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "src"), buckets=2)
    t.merge(
        mkbatch(spark, [(f"k{i}", 1, "upsert", f"v{i}") for i in range(6)]),
        "b1",
    )
    t.merge(
        mkbatch(spark, [("k1", 2, "upsert", "v1b"), ("k2", 2, "delete", "")]),
        "b2",
    )
    return t


def _src_files(src):
    return sorted(
        glob.glob(os.path.join(src.path, "**", "*.parquet"), recursive=True)
    )


class TestCloneBasics:
    def test_clone_is_metadata_only_and_equal(self, spark, tmp_path, src):
        before = {f: os.path.getmtime(f) for f in _src_files(src)}
        tracker = spark.sparkContext.statusTracker()
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        c = clone_table(spark, src, str(tmp_path / "dst"))
        assert set(tracker.getJobIdsForGroup(None) or []) == jobs0, (
            "clone launched a Spark job"
        )
        assert snap(c) == snap(src)
        # no data under the clone's root, source bytes untouched
        assert glob.glob(os.path.join(c.path, "data", "**", "*.parquet"),
                         recursive=True) == []
        assert {f: os.path.getmtime(f) for f in _src_files(src)} == before

    def test_clone_of_old_version(self, spark, tmp_path, src):
        c = clone_table(spark, src, str(tmp_path / "dst"), version=1)
        assert len(snap(c)) == 6  # pre-delete state
        assert "k2" in snap(c)

    def test_clone_refuses_existing_target(self, spark, tmp_path, src):
        clone_table(spark, src, str(tmp_path / "dst"))
        with pytest.raises(ValueError, match="already has a table"):
            clone_table(spark, src, str(tmp_path / "dst"))

    def test_clone_pins_source_version_against_vacuum(
        self, spark, tmp_path, src
    ):
        clone_table(spark, src, str(tmp_path / "dst"), version=1)
        pins = src.savepoints()
        assert len(pins) == 1
        (name, ver), = pins.items()
        assert name.startswith("clone_dst-v1-") and ver == 1
        c2 = clone_table(
            spark, src, str(tmp_path / "dst2"), pin_source=False
        )
        assert len(src.savepoints()) == 1  # unpinned clone adds no pin
        assert snap(c2) == snap(src)

    def test_same_basename_clones_get_distinct_pins(self, spark, tmp_path, src):
        from hudi_spark_plus_spark.table.clone import clone_pins, drop_clone

        c1 = clone_table(spark, src, str(tmp_path / "a" / "dst"))
        c2 = clone_table(spark, src, str(tmp_path / "b" / "dst"))
        pins = clone_pins(src)
        assert len(pins) == 2  # ADVICE r10 #1: no silent pin sharing
        # dropping one clone must not yank the other's pin
        assert drop_clone(c1) is True
        assert len(clone_pins(src)) == 1
        assert snap(c2) == snap(src)


class TestClonePinAtomicity:
    def test_crashed_pin_record_blocks_reclone_and_releases_own_pin(
        self, spark, tmp_path, src
    ):
        """ADVICE r11 #3: the pin record is published atomically — a
        target already holding one (a crashed or concurrent clone)
        makes a new clone lose BEFORE it can clobber that record; the
        loser releases its OWN savepoint and the record is untouched."""
        import json

        dst = str(tmp_path / "dst")
        os.makedirs(dst)
        ghost = {
            "source_path": os.path.abspath(src.path),
            "savepoint": "clone_ghost-v1-deadbeef",
            "version": 1,
        }
        with open(os.path.join(dst, "_clone_pin.json"), "w") as fh:
            json.dump(ghost, fh)
        with pytest.raises(ValueError, match="clone pin record"):
            clone_table(spark, src, dst)
        assert src.savepoints() == {}  # loser's savepoint released
        with open(os.path.join(dst, "_clone_pin.json")) as fh:
            assert json.load(fh) == ghost  # winner's record untouched

    def test_commit_failure_releases_own_pin_only_if_record_is_ours(
        self, spark, tmp_path, src, monkeypatch
    ):
        """Commit-failure cleanup: the savepoint is always released
        (name-unique), and the pin record is unlinked only after
        verifying it names OUR savepoint."""
        from hudi_spark_plus_spark.table import commit_log

        def boom(self, *a, **k):
            raise RuntimeError("injected publish failure")

        monkeypatch.setattr(commit_log.CommitLog, "commit", boom)
        dst = str(tmp_path / "dst")
        with pytest.raises(RuntimeError, match="injected"):
            clone_table(spark, src, dst)
        assert src.savepoints() == {}
        assert not os.path.exists(os.path.join(dst, "_clone_pin.json"))


class TestCloneDivergence:
    def test_writes_diverge_and_source_is_never_touched(
        self, spark, tmp_path, src
    ):
        before = _src_files(src)
        src_state = snap(src)
        c = clone_table(spark, src, str(tmp_path / "dst"))
        c.merge(
            mkbatch(spark, [("k3", 9, "upsert", "CLONED"),
                            ("k9", 9, "upsert", "NEW")]),
            "c1",
        )
        assert snap(src) == src_state
        assert _src_files(src) == before  # not even a new file
        got = snap(c)
        assert got["k3"] == (9, "CLONED") and got["k9"] == (9, "NEW")
        # rewritten bucket landed under the CLONE's root
        assert glob.glob(os.path.join(c.path, "data", "**", "*.parquet"),
                         recursive=True)

    def test_clone_vacuum_never_reclaims_source_files(
        self, spark, tmp_path, src
    ):
        from hudi_spark_plus_spark.table.maintenance import compact, vacuum

        c = clone_table(spark, src, str(tmp_path / "dst"))
        c.merge(mkbatch(spark, [("k0", 9, "upsert", "x")]), "c1")
        compact(c)  # clone now fully self-contained
        state = snap(c)
        vacuum(c, keep_last=1, grace_seconds=0)
        assert _src_files(src), "source data deleted by clone vacuum"
        assert snap(src)  # source still reads
        assert snap(c) == state

    def test_mor_deltas_clone_and_resolve(self, spark, tmp_path):
        t = LakeTable(spark, str(tmp_path / "m"), buckets=2)
        t.merge(mkbatch(spark, [("a", 1, "upsert", "x"),
                                ("b", 1, "upsert", "y")]), "b1")
        t.merge(mkbatch(spark, [("a", 2, "upsert", "x2")]), "b2",
                mode="mor")
        c = clone_table(spark, t, str(tmp_path / "mc"))
        assert snap(c) == {"a": (2, "x2"), "b": (1, "y")}


class TestCloneVersionSpace:
    def test_version_space_continues_and_incremental_is_exact(
        self, spark, tmp_path, src
    ):
        """THE stamp trap: a clone-local merge rewrites a bucket and
        carries source-stamped rows (_commit_ver 1/2) forward. Because
        the clone's base version is 3 (source latest 2 + 1), an
        incremental read from the clone base must return ONLY the
        clone-local change — a version-1 restart would mis-report every
        carried row."""
        c = clone_table(spark, src, str(tmp_path / "dst"))
        base = c.log.latest().version
        assert base == 3  # source latest (2) + 1
        c.merge(mkbatch(spark, [("k3", 9, "upsert", "CHANGED")]), "c1")
        inc = c.incremental(base).collect()
        assert {(r["_key"], r["val"]) for r in inc} == {("k3", "CHANGED")}

    def test_initial_load_and_time_travel_bounds(self, spark, tmp_path, src):
        c = clone_table(spark, src, str(tmp_path / "dst"))
        # incremental from 0 = full initial load (every carried row)
        assert len(c.incremental(0).where(~F.col("_deleted")).collect()) == 5
        assert len(snap(c.__class__(c.spark, c.path, buckets=2))) == 5
        # time travel below the clone base has no commits to read
        with pytest.raises(Exception):
            c.snapshot(version=1).collect()

    def test_clone_cdc_feed_from_base(self, spark, tmp_path, src):
        c = clone_table(spark, src, str(tmp_path / "dst"))
        base = c.log.latest().version
        c.merge(mkbatch(spark, [("k4", 9, "delete", "")]), "c1")
        cdc = c.incremental_cdc(base).collect()
        assert [(r["_key"], r["_change_op"]) for r in cdc] == [("k4", "d")]


class TestCloneLifecycle:
    def test_drop_clone_releases_pin_and_vacuum_reclaims(
        self, spark, tmp_path, src
    ):
        """VERDICT r10 directive 5: the pin a clone holds on its source
        must be releasable by tooling — after drop_clone, a source
        vacuum reclaims the files only the pin was protecting."""
        from hudi_spark_plus_spark.table.clone import clone_pins, drop_clone
        from hudi_spark_plus_spark.table.maintenance import vacuum

        c = clone_table(spark, src, str(tmp_path / "dst"), version=1)
        assert clone_pins(src)  # pin live
        # source evolves past the clone point
        src.merge(mkbatch(spark, [("k0", 3, "upsert", "v0c")]), "b3")
        vacuum(src, keep_last=1, grace_seconds=0)
        assert 1 in src.log.versions()  # pin held version 1 alive
        pre = set(_src_files(src))
        assert drop_clone(c) is True
        assert not clone_pins(src)
        assert not os.path.exists(c.path)
        vacuum(src, keep_last=1, grace_seconds=0)
        assert 1 not in src.log.versions()  # pinned version now reclaimed
        assert set(_src_files(src)) < pre  # files actually deleted
        assert snap(src)["k0"] == (3, "v0c")  # source still reads

    def test_drop_clone_without_pin_is_safe(self, spark, tmp_path, src):
        from hudi_spark_plus_spark.table.clone import drop_clone

        c = clone_table(spark, src, str(tmp_path / "dst"), pin_source=False)
        assert drop_clone(c) is False
        assert not os.path.exists(c.path)
        assert snap(src)  # source untouched


class TestCloneExactlyOnce:
    def test_source_batches_no_op_on_clone(self, spark, tmp_path, src):
        """ADVICE r10 #5: batches the SOURCE already absorbed (b1/b2)
        must be no-ops when an ingest pipeline is replayed against the
        clone — the clone's first commit carries the source's batch-id
        set, so has_batch stays truthful across the clone boundary."""
        c = clone_table(spark, src, str(tmp_path / "dst"))
        assert c.log.has_batch("b1") and c.log.has_batch("b2")
        state = snap(c)
        ver = c.log.latest().version
        # replay b2 with DIFFERENT (wrong) content: must be skipped
        c.merge(mkbatch(spark, [("k1", 9, "upsert", "REPLAY")]), "b2")
        assert snap(c) == state
        assert c.log.latest().version == ver
        # a genuinely new batch still applies
        c.merge(mkbatch(spark, [("k1", 9, "upsert", "NEW")]), "b9")
        assert snap(c)["k1"] == (9, "NEW")

    def test_carried_ids_survive_reload_and_nested_clone(
        self, spark, tmp_path, src
    ):
        c = clone_table(spark, src, str(tmp_path / "dst"))
        # a FRESH CommitLog instance (cold cache) must see carried ids
        reloaded = LakeTable(spark, c.path, buckets=2)
        assert reloaded.log.has_batch("b1")
        # clone-of-clone: carried ids propagate transitively
        c.merge(mkbatch(spark, [("k5", 9, "upsert", "z")]), "c1")
        cc = clone_table(spark, c, str(tmp_path / "dst2"))
        assert cc.log.has_batch("b1") and cc.log.has_batch("b2")
        assert cc.log.has_batch("c1")
