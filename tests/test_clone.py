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
        assert src.savepoints() == {"clone_dst": 1}
        c2 = clone_table(
            spark, src, str(tmp_path / "dst2"), pin_source=False
        )
        assert "clone_dst2" not in src.savepoints()
        assert snap(c2) == snap(src)


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
