"""record_history (table/audit.py): every state one key ever held.

The properties worth pinning: carried rows collapse (a COW rewrite
copies old states into new files — history must not repeat them),
tombstones ARE history (delete then re-insert shows three states),
vacuum bounds memory exactly like time travel, pruning reads only the
key's bucket files, and a retype boundary doesn't crash the read.
"""

import pytest
from pyspark.sql import functions as F

from hudi_spark_plus_spark.table.audit import record_history
from hudi_spark_plus_spark.table.lake_table import LakeTable

pytestmark = pytest.mark.slow  # full-tier suite (see pytest.ini)


def mk(spark, rows):
    return spark.createDataFrame(
        rows, "_key string, _ts long, _op string, v long"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), buckets=2)
    t.merge(mk(spark, [(str(k), 1, "upsert", k) for k in range(8)]), "b1")
    t.merge(mk(spark, [("3", 2, "upsert", 33)]), "b2")
    t.merge(mk(spark, [("3", 3, "delete", 0)]), "b3")
    t.merge(mk(spark, [("3", 4, "upsert", 333)]), "b4")
    return t


class TestRecordHistory:
    def test_full_lifecycle_of_one_key(self, spark, table):
        h = [
            (r["_commit_ver"], r["_ts"], r["_deleted"], r["v"])
            for r in record_history(table, "3").collect()
        ]
        assert h == [
            (1, 1, False, 3),
            (2, 2, False, 33),
            (3, 3, True, 0),      # tombstone carries the DELETE batch's payload
            (4, 4, False, 333),
        ], h

    def test_untouched_key_has_one_state_despite_rewrites(
        self, spark, table
    ):
        """Key '1' was only written once, but its bucket may have been
        rewritten by later merges — carried copies must collapse to
        ONE state."""
        h = record_history(table, "1").collect()
        assert len(h) == 1
        assert (h[0]["_commit_ver"], h[0]["v"]) == (1, 1)

    def test_compaction_adds_no_states(self, spark, table):
        from hudi_spark_plus_spark.table.maintenance import compact

        before = [tuple(r) for r in record_history(table, "3").collect()]
        compact(table)
        after = [tuple(r) for r in record_history(table, "3").collect()]
        assert after == before

    def test_vacuum_bounds_history(self, spark, table):
        from hudi_spark_plus_spark.table.maintenance import compact, vacuum

        compact(table)
        vacuum(table, keep_last=1, grace_seconds=0)
        h = record_history(table, "3").collect()
        # only the compacted file survives: one final state remains
        assert [(r["_commit_ver"], r["v"], r["_deleted"]) for r in h] == [
            (4, 333, False)
        ]

    def test_mor_deltas_are_distinct_states(self, spark, tmp_path):
        t = LakeTable(spark, str(tmp_path / "m"), buckets=2)
        t.merge(mk(spark, [("a", 1, "upsert", 1)]), "b1")
        t.merge(mk(spark, [("a", 2, "upsert", 2)]), "b2", mode="mor")
        t.merge(mk(spark, [("a", 3, "upsert", 3)]), "b3", mode="mor")
        h = [
            (r["_commit_ver"], r["v"])
            for r in record_history(t, "a").collect()
        ]
        assert h == [(1, 1), (2, 2), (3, 3)]

    def test_pruning_reads_only_the_keys_bucket(self, spark, table):
        """The candidate set must exclude other buckets' files — the
        100-TB contract: history of one key is a few-file read."""
        from hudi_spark_plus_spark.table.keygen import bucket_expr

        b = (
            spark.range(1)
            .select(bucket_expr(F.lit("3"), table.buckets).alias("b"))
            .first()["b"]
        )
        all_paths = set()
        for v in table.log.versions():
            all_paths.update(
                f.path for f in table.log.read(v).files if f.bucket != b
            )
        assert all_paths, "fixture needs other-bucket files"
        # other-bucket keys resolve without touching key-3 state
        h = record_history(table, "0").collect()
        assert all(r["_deleted"] is False for r in h)

    def test_history_across_retype_boundary(self, spark, tmp_path):
        from hudi_spark_plus_spark.table.maintenance import rewrite_column_type

        t = LakeTable(spark, str(tmp_path / "r"), buckets=2)
        t.merge(mk(spark, [("x", 1, "upsert", 7)]), "b1")
        rewrite_column_type(t, "v", "string")
        t.merge(
            spark.createDataFrame(
                [("x", 2, "upsert", "seven")],
                "_key string, _ts long, _op string, v string",
            ),
            "b2",
        )
        h = [
            (r["_commit_ver"], r["v"])
            for r in record_history(t, "x").collect()
        ]
        # pre-retype state read under its own era schema, aligned to
        # the latest (string) type; the retype commit (version 2)
        # CARRIES the row at its original stamp — no phantom state
        assert h == [(1, "7"), (3, "seven")], h

    def test_unknown_key_is_empty(self, spark, table):
        assert record_history(table, "no-such-key").collect() == []


class TestRecordHistories:
    """Batch record_history (VERDICT r11 directive 7): the compliance-
    export shape — histories of a SET of keys from ONE pruned read +
    one semi-join, files-read bounded by the union of the per-key
    prunes (never a per-key loop re-reading overlapping files)."""

    def test_batch_equals_union_of_single_key_histories(
        self, spark, table
    ):
        from hudi_spark_plus_spark.table.audit import record_histories

        keys = ["3", "1", "0"]
        got = [
            (r["_key"], r["_commit_ver"], r["_ts"], r["_deleted"], r["v"])
            for r in record_histories(table, keys).collect()
        ]
        exp = []
        for k in sorted(keys):
            exp += [
                (k, r["_commit_ver"], r["_ts"], r["_deleted"], r["v"])
                for r in record_history(table, k).collect()
            ]
        assert got == exp

    def test_accepts_a_key_dataframe(self, spark, table):
        from hudi_spark_plus_spark.table.audit import record_histories

        keys = spark.createDataFrame([("3",), ("1",)], "_key string")
        got = record_histories(table, keys)
        assert got.where(F.col("_key") == "3").count() == 4
        assert got.where(F.col("_key") == "1").count() == 1

    def test_candidate_files_bounded_by_union_of_per_key_prunes(
        self, spark, tmp_path
    ):
        """Plan guard: the batch candidate set must equal the UNION of
        the per-key candidate sets — and stay strictly smaller than the
        timeline's file population when the keys miss buckets."""
        from hudi_spark_plus_spark.table import audit

        t = LakeTable(spark, str(tmp_path / "t"), buckets=8)
        t.merge(
            mk(spark, [(str(k), 1, "upsert", k) for k in range(64)]), "b1"
        )
        t.merge(mk(spark, [("1", 2, "upsert", 11)]), "b2")
        keys = ["1", "2"]
        batch_files = {
            f.path for f in audit._candidate_timeline_files(t, keys)[0]
        }
        union_files = set()
        for k in keys:
            union_files |= {
                f.path for f in audit._candidate_timeline_files(t, [k])[0]
            }
        assert batch_files == union_files
        all_files = set()
        for v in t.log.versions():
            all_files.update(f.path for f in t.log.read(v).files)
        assert len(batch_files) < len(all_files)

    def test_over_cap_degrades_to_semi_join_and_stays_correct(
        self, spark, table, monkeypatch
    ):
        from hudi_spark_plus_spark.table import audit
        from hudi_spark_plus_spark.table.audit import record_histories

        monkeypatch.setattr(
            type(table), "SCAN_KEYS_MAX", 1, raising=False
        )
        got = [
            (r["_key"], r["_commit_ver"], r["v"])
            for r in record_histories(table, ["3", "1"]).collect()
        ]
        assert ("3", 4, 333) in got and ("1", 1, 1) in got
        assert len([g for g in got if g[0] == "3"]) == 4

    def test_empty_and_unknown_keys(self, spark, table):
        from hudi_spark_plus_spark.table.audit import record_histories

        assert record_histories(table, ["no-such"]).count() == 0
        assert record_histories(table, []).count() == 0
