"""Lake-table roundtrip check query (H1/H2/H6 under oracle control).

Unlike q-cdc-3 (which exercises the envelope pipeline), this drives the
``LakeTable`` API directly: two deterministic merge batches derived from
``customer`` — inserts, then a mix of updates and deletes — and returns
the final snapshot. The DuckDB oracle replays the same semantics in pure
SQL, so the merge/tombstone/snapshot path itself is hash-checked.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from hudi_spark_plus_spark.sources.loaders import load_table
from hudi_spark_plus_spark.table.lake_table import LakeTable

SUBSET = 100  # c_custkey bound — keys in the lake table


def _roundtrip(spark, sf_dir, mode: str):
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") < SUBSET
    )
    batch1 = c.select(
        F.col("c_custkey").cast("string").alias("_key"),
        F.lit(1).cast("long").alias("_ts"),
        F.lit("upsert").alias("_op"),
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 4).alias("acctbal"),
    )
    batch2 = c.where((F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0)).select(
        F.col("c_custkey").cast("string").alias("_key"),
        F.lit(2).cast("long").alias("_ts"),
        F.when(F.col("c_custkey") % 7 == 0, "delete")
        .otherwise("upsert")
        .alias("_op"),
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
    )
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(batch1, "b1", mode=mode)
        lake.merge(batch2, "b2", mode=mode)
        snap = (
            lake.snapshot()
            .select("c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal"))
            .orderBy("c_custkey")
        )
        rows = snap.collect()
        if mode == "mor":
            # also check the folded state: compaction must not change
            # the logical table
            from hudi_spark_plus_spark.table.maintenance import compact

            compact(lake)
            folded = (
                lake.snapshot()
                .select(
                    "c_custkey", "c_name",
                    F.round("acctbal", 4).alias("acctbal"),
                )
                .orderBy("c_custkey")
            )
            assert [tuple(r) for r in folded.collect()] == [
                tuple(r) for r in rows
            ], "MOR compaction changed the logical table"
        return spark.createDataFrame(rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_roundtrip(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "cow")


def q_lake_mor(spark, sf_dir):
    """Same deterministic roundtrip through the MERGE-ON-READ path:
    batch 2 lands as delta files, the snapshot resolves latest-per-key at
    read time, and a compaction is asserted in-engine to preserve the
    logical table. The DuckDB oracle is identical to the COW variant —
    both modes must converge to the same answer."""
    return _roundtrip(spark, sf_dir, "mor")


LAKE_QUERIES = {
    "q-lake-roundtrip": q_lake_roundtrip,
    "q-lake-mor": q_lake_mor,
}

_ROUNDTRIP_ORACLE = f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey % 7 <> 0
        ORDER BY c_custkey
    """

LAKE_ORACLES = {
    "q-lake-roundtrip": _ROUNDTRIP_ORACLE,
    "q-lake-mor": _ROUNDTRIP_ORACLE,
}
