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
