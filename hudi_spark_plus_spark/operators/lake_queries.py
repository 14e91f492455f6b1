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

from hudi_spark_plus_spark.localdf import local_frame

from hudi_spark_plus_spark.sources.loaders import load_table
from hudi_spark_plus_spark.table.lake_table import LakeTable

SUBSET = 100  # c_custkey bound — keys in the lake table


def _build_lake(spark, sf_dir, work: str, mode: str) -> LakeTable:
    """The shared deterministic two-batch fixture: batch 1 inserts every
    customer < SUBSET at _ts=1; batch 2 (at _ts=2) updates multiples of
    3 (+1000 acctbal) and deletes multiples of 7."""
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
    lake = LakeTable(spark, work, buckets=4)
    lake.merge(batch1, "b1", mode=mode)
    lake.merge(batch2, "b2", mode=mode)
    return lake


def _roundtrip(spark, sf_dir, mode: str):
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        lake = _build_lake(spark, sf_dir, work, mode)
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
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_roundtrip(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "cow")


def q_lake_point_lookup(spark, sf_dir):
    """Bloom-probed point lookup (K1/H8 read path) under oracle control:
    ``scan_for_keys`` prunes files by bucket + min/max + manifest bloom,
    then the requested keys are filtered from the surviving slice. Keys
    = custkeys divisible by 11; deleted keys (multiples of 7) must NOT
    surface."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        lake = _build_lake(spark, sf_dir, work, "cow")
        keys = local_frame(spark, 
            [(str(k),) for k in range(0, SUBSET, 11)], "_key string"
        )
        out = (
            lake.scan_for_keys(keys)
            .join(F.broadcast(keys), "_key", "semi")
            .where(~F.col("_deleted"))
            .select(
                "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _incremental(spark, sf_dir, mode: str):
    """Record-level incremental read (H7) under oracle control: rows
    changed after version 1 = exactly batch 2's winners, deletes
    surfacing as tombstones with the batch's payload."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        lake = _build_lake(spark, sf_dir, work, mode)
        out = (
            lake.incremental(1)
            .select(
                "c_custkey",
                F.col("_deleted").cast("int").alias("deleted"),
                F.round("acctbal", 4).alias("acctbal"),
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_time_travel(spark, sf_dir):
    """Time travel (H6) under oracle control: ``snapshot(version=1)``
    after batch 2 has committed must reproduce batch 1's full state —
    updates not applied, deleted keys still present."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        lake = _build_lake(spark, sf_dir, work, "cow")
        out = (
            lake.snapshot(version=1)
            .select(
                "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_incremental(spark, sf_dir):
    return _incremental(spark, sf_dir, "cow")


def q_lake_incremental_mor(spark, sf_dir):
    """Same incremental contract through MERGE-ON-READ deltas: the
    read-time LWW resolution must yield the identical change set."""
    return _incremental(spark, sf_dir, "mor")


def q_lake_mor(spark, sf_dir):
    """Same deterministic roundtrip through the MERGE-ON-READ path:
    batch 2 lands as delta files, the snapshot resolves latest-per-key at
    read time, and a compaction is asserted in-engine to preserve the
    logical table. The DuckDB oracle is identical to the COW variant —
    both modes must converge to the same answer."""
    return _roundtrip(spark, sf_dir, "mor")


def q_lake_evolve(spark, sf_dir):
    """Column-mapping schema evolution end-to-end (beyond the
    reference's Hudi-delegated additive-only evolution): build the
    two-batch table, RENAME acctbal -> balance (metadata-only — no file
    rewrite), DROP c_name, then merge a third batch addressed by the new
    name that also RE-ADDS a column named c_name. The re-added column
    gets a fresh physical name, so rows untouched by batch 3 must show
    c_name NULL — any resurrection of the dropped bytes diverges the
    hash."""
    work = tempfile.mkdtemp(prefix="hsp_lakeev_")
    try:
        lake = _build_lake(spark, sf_dir, work, "cow")
        lake.rename_column("acctbal", "balance")
        lake.drop_column("c_name")
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        batch3 = c.where(F.col("c_custkey") % 5 == 0).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(3).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            F.round(F.col("c_acctbal") + 5000.0, 4).alias("balance"),
            F.upper("c_name").alias("c_name"),
        )
        lake.merge(batch3, "b3")
        snap = (
            lake.snapshot()
            .select(
                "c_custkey",
                F.round("balance", 4).alias("balance"),
                "c_name",
            )
            .orderBy("c_custkey")
        )
        rows = snap.collect()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_derived(spark, sf_dir):
    """Incremental materialized-aggregate maintenance end-to-end: a
    source lake table ingests two CDC batches (inserts, then updates +
    deletes); after EACH batch a derived table is refreshed via the
    IncrementalReader + partial recompute of affected groups only. The
    final derived snapshot must hash-equal the oracle's full-recompute
    group aggregate over the settled source state — missed groups,
    stale aggregates, or tombstone leaks all diverge the hash. Sums are
    exact integer micros (no float accumulation-order surface)."""
    work = tempfile.mkdtemp(prefix="hsp_lakedrv_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        batch1 = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            (F.col("c_custkey") % 10).alias("grp"),
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        batch2 = c.where(
            (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 7 == 0, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            (F.col("c_custkey") % 10).alias("grp"),
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
        )
        src = LakeTable(spark, f"{work}/src", buckets=4)
        dst = LakeTable(spark, f"{work}/dst", buckets=2)
        ckpt = f"{work}/ckpt.json"

        def agg_fn(slice_df):
            return slice_df.groupBy("grp").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(
                    F.expr("CAST(rint(acctbal * 1000000) AS BIGINT)")
                ).alias("bal_micros"),
            )

        from hudi_spark_plus_spark.operators.derived import (
            refresh_grouped_aggregate,
        )

        src.merge(batch1, "b1")
        refresh_grouped_aggregate(src, dst, ckpt, "grp", agg_fn)
        src.merge(batch2, "b2")
        refresh_grouped_aggregate(src, dst, ckpt, "grp", agg_fn)
        snap = (
            dst.snapshot()
            .select("grp", "cnt", "bal_micros")
            .orderBy("grp")
        )
        rows = snap.collect()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_rollback(spark, sf_dir):
    """Savepoint/restore under oracle control: ingest batch 1, apply a
    CORRUPTING batch (doubles every balance at _ts=2), roll the table
    back to the pre-corruption version (new commit, zero rewrite), then
    apply the legitimate batch 2. The final state must equal the
    history where the corruption never happened — and because the
    rollback rewinds LWW state, batch 2's _ts=2 rows must win over the
    rolled-back _ts=2 corruption they never see."""
    work = tempfile.mkdtemp(prefix="hsp_lakerb_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        lake = LakeTable(spark, work, buckets=4)
        batch1 = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        lake.merge(batch1, "b1")
        good_version = lake.log.latest().version
        corrupt = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") * 2, 4).alias("acctbal"),
        )
        lake.merge(corrupt, "bad")
        lake.rollback(good_version)
        batch2 = c.where(
            (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 7 == 0, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
        )
        lake.merge(batch2, "b2")
        snap = (
            lake.snapshot()
            .select(
                "c_custkey",
                "c_name",
                F.round("acctbal", 4).alias("acctbal"),
            )
            .orderBy("c_custkey")
        )
        rows = snap.collect()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_zorder(spark, sf_dir):
    """Z-order clustering (K3; reference kernel BitUtil.java:122-157)
    under oracle control. Two checks in one:

    1. ``zorder_cluster_table`` rewrites the two-batch lake table
       clustered on (c_custkey, acctbal); the returned snapshot must
       hash-equal the UNCHANGED roundtrip oracle — layout rewrites are
       logically invisible.
    2. In-engine layout assertion via ``zorder_write`` on an orders
       slice: under a selective two-sided predicate, the Z-ordered
       layout must concentrate matches in strictly fewer files than the
       unsorted layout (the min/max-tightening payoff that lets
       file/row-group stats skip data on BOTH dimensions)."""
    import os

    from hudi_spark_plus_spark.table.zorder import (
        zorder_cluster_table,
        zorder_write,
    )

    work = tempfile.mkdtemp(prefix="hsp_lakez_")
    try:
        lake = _build_lake(spark, sf_dir, work + "/t", "cow")
        files_before = {f.path for f in lake.log.live_files()}
        zorder_cluster_table(lake, "c_custkey", "acctbal")
        files_after = {f.path for f in lake.log.live_files()}
        assert files_after and files_after.isdisjoint(files_before), (
            "cluster commit must publish a full rewrite"
        )
        snap = (
            lake.snapshot()
            .select(
                "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
            )
            .orderBy("c_custkey")
        )
        rows = snap.collect()

        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        n_files = 16
        plain_dir, z_dir = os.path.join(work, "plain"), os.path.join(work, "z")
        o.repartition(n_files).write.mode("overwrite").parquet(plain_dir)
        zorder_write(o, z_dir, "o_custkey", "o_totalprice", n_files=n_files)
        pred = (
            (F.col("o_custkey") < 100) & (F.col("o_totalprice") < 50000)
        )

        def files_hit(path):
            return (
                spark.read.parquet(path)
                .where(pred)
                .select(F.input_file_name())
                .distinct()
                .count()
            )

        hit_plain, hit_z = files_hit(plain_dir), files_hit(z_dir)
        assert hit_z < hit_plain, (
            f"z-order must concentrate the 2-sided predicate: {hit_z} vs "
            f"{hit_plain} files"
        )
        # same logical data either way
        n_match = spark.read.parquet(z_dir).where(pred).count()
        assert n_match == o.where(pred).count()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_compact(spark, sf_dir):
    """Compaction + vacuum under oracle control: batch 1 lands as FIVE
    separate commits (small files accumulate, as sustained micro-batch
    ingest produces), batch 2 applies updates+deletes, then
    ``compact()`` folds each bucket to one file and ``vacuum()`` drops
    every superseded file and old commit JSON. The post-maintenance
    snapshot must hash-equal the never-compacted oracle, file counts
    must actually shrink, and an incremental read from version 0 must
    still work across the vacuumed horizon (r3 ADVICE regression)."""
    from hudi_spark_plus_spark.table.maintenance import compact, vacuum

    work = tempfile.mkdtemp(prefix="hsp_lakec_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        lake = LakeTable(spark, work + "/t", buckets=4)
        for i in range(5):  # batch 1 split into 5 commits
            part = c.where(F.col("c_custkey") % 5 == i).select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(1).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_name",
                F.round("c_acctbal", 4).alias("acctbal"),
            )
            lake.merge(part, f"b1-{i}")
        batch2 = c.where(
            (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 7 == 0, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
        )
        lake.merge(batch2, "b2", mode="mor")  # deltas on top of small files
        stats = compact(lake)
        assert stats["files_after"] < stats["files_before"], stats
        assert stats["files_after"] <= lake.buckets, stats
        vstats = vacuum(lake, keep_last=1)
        assert vstats["files_removed"] > 0, vstats
        # incremental across the vacuumed horizon: full current state
        inc = lake.incremental(0)
        assert inc.where(~F.col("_deleted")).count() > 0
        snap = (
            lake.snapshot()
            .select(
                "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
            )
            .orderBy("c_custkey")
        )
        rows = snap.collect()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_mor_ro(spark, sf_dir):
    """Hudi's read-optimized vs real-time MOR view split, both pinned in
    one query: pre-compaction the RO view (base files only, zero merge
    cost) must equal the BATCH-1 state (delta updates invisible — the
    staleness RO trades for read speed, asserted in-engine against time
    travel), and post-compaction RO must CONVERGE to the real-time view
    — the returned snapshot, hash-checked against the roundtrip
    oracle."""
    from hudi_spark_plus_spark.table.maintenance import compact

    work = tempfile.mkdtemp(prefix="hsp_lakero_")
    try:
        lake = _build_lake(spark, sf_dir, work, "mor")

        def rows_of(df):
            return sorted(
                (r["c_custkey"], r["c_name"], r["acctbal"])
                for r in df.select(
                    "c_custkey", "c_name",
                    F.round("acctbal", 4).alias("acctbal"),
                ).collect()
            )

        # RO before compaction: batch-2 deltas invisible == v1 state
        assert rows_of(lake.snapshot(read_optimized=True)) == rows_of(
            lake.snapshot(version=1)
        ), "pre-compaction RO view must equal the base-file (v1) state"
        compact(lake)
        ro = lake.snapshot(read_optimized=True)
        assert rows_of(ro) == rows_of(lake.snapshot()), (
            "post-compaction RO and RT views must converge"
        )
        snap = ro.select(
            "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
        ).orderBy("c_custkey")
        rows = snap.collect()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_history(spark, sf_dir):
    """Timeline metadata surface (DESCRIBE HISTORY analogue): version,
    operation, batch id, and row counts of every commit of the
    two-batch build — deterministic, so even the metadata table is
    hash-checked (wall-clock columns excluded)."""
    work = tempfile.mkdtemp(prefix="hsp_lakeh_")
    try:
        lake = _build_lake(spark, sf_dir, work, "cow")
        h = (
            lake.history()
            .select("version", "operation", "batch_id", "n_rows")
            .orderBy("version")
        )
        rows = h.collect()
        return local_frame(spark, rows, h.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_colstats(spark, sf_dir):
    """Manifest column-statistics file skipping (Hudi metadata-table
    col_stats analogue): after z-order clustering the two-batch table on
    (c_custkey, acctbal) into per-bucket Z slices, a selective
    ``scan_range`` on c_custkey must read strictly fewer files than the
    table holds (in-engine assert on the manifest pruning) and still
    return exactly the oracle's filtered state."""
    from hudi_spark_plus_spark.table.zorder import zorder_cluster_table

    work = tempfile.mkdtemp(prefix="hsp_lakecs_")
    try:
        lake = _build_lake(spark, sf_dir, work, "cow")
        zorder_cluster_table(lake, "c_custkey", "acctbal")
        kept, all_files = lake.files_in_range("c_custkey", 10, 30)
        assert len(all_files) > 4 and len(kept) < len(all_files), (
            f"col_stats must prune files: kept {len(kept)} of "
            f"{len(all_files)}"
        )
        snap = (
            lake.scan_range("c_custkey", 10, 30)
            .select(
                "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
            )
            .orderBy("c_custkey")
        )
        rows = snap.collect()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_concurrent(spark, sf_dir):
    """Two-writer commit-conflict arbitration under oracle control: two
    threads interleave merges of DISJOINT key halves (each split into 3
    commits) against one table; the bounded conflict retry must land
    every batch regardless of race order, and the final snapshot is
    order-independent by construction — so it hash-checks against the
    single deterministic oracle."""
    import threading

    work = tempfile.mkdtemp(prefix="hsp_lakecc_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        LakeTable(spark, work + "/t", buckets=4).merge(
            c.where(F.col("c_custkey") == 1).select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(99).cast("long").alias("_ts"),  # seed outlives both writers
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_name",
                F.round("c_acctbal", 4).alias("acctbal"),
            ),
            "seed",
        )
        errs: list = []
        barrier = threading.Barrier(2)

        def writer(half):
            try:
                t = LakeTable(spark, work + "/t", buckets=4)
                mine = c.where((F.col("c_custkey") % 2 == half)
                               & (F.col("c_custkey") > 1))
                barrier.wait()
                for i in range(3):
                    batch = mine.where(F.col("c_custkey") % 3 == i).select(
                        F.col("c_custkey").cast("string").alias("_key"),
                        F.lit(half + 1).cast("long").alias("_ts"),
                        F.lit("upsert").alias("_op"),
                        "c_custkey",
                        "c_name",
                        F.round(
                            F.col("c_acctbal") + (half + 1) * 100.0, 4
                        ).alias("acctbal"),
                    )
                    t.merge(batch, f"h{half}-{i}")
            except Exception as e:  # noqa: BLE001 — surfaced below
                errs.append(e)

        threads = [
            threading.Thread(target=writer, args=(h,)) for h in (0, 1)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        lake = LakeTable(spark, work + "/t", buckets=4)
        assert lake.log.latest().version == 7  # seed + 2x3, all landed
        snap = (
            lake.snapshot()
            .select(
                "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
            )
            .orderBy("c_custkey")
        )
        rows = snap.collect()
        return local_frame(spark, rows, snap.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_partitioned(spark, sf_dir):
    """Partition-path table (H4 — the partition half of Hudi's Simple/
    ComplexKeyGenerator, README.md:59,65 / BinlogSyncHoodieCommand.scala:
    99-102) under oracle control. Same two-batch customer fixture as the
    roundtrip, but the table is partitioned by a derived date string
    ``d`` (custkey % 3 → 2024-01-01..03). Checks, in one query:

    1. the writers actually produce ``_part=<d>/_bucket=<b>/`` dirs and
       the manifest records each file's partition value;
    2. ``partition_values()`` lists exactly the three dates;
    3. a partition-pruned ``snapshot(partitions=[...])`` reads ONLY that
       partition's files (structural file-count assertion) and returns
       exactly its rows;
    4. reopening the table with no constructor args picks the persisted
       ``partition_fields`` up;
    5. the returned range-pruned snapshot (2024-01-01..02) hash-matches
       the oracle's row-filtered recompute."""
    import glob as _glob
    import os as _os

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        d_col = F.concat(
            F.lit("2024-01-0"), ((F.col("c_custkey") % 3) + 1).cast("string")
        ).alias("d")
        batch1 = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
            d_col,
        )
        batch2 = c.where(
            (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 7 == 0, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
            d_col,
        )
        lake = LakeTable(spark, work, buckets=4, partition_fields=["d"])
        lake.merge(batch1, "b1")
        lake.merge(batch2, "b2")

        # 1. physical layout + manifest partition values
        part_dirs = _glob.glob(_os.path.join(work, "data", "*", "_part=*"))
        assert part_dirs, "partitioned writer produced no _part= dirs"
        live = lake.log.live_files()
        assert live and all(f.partition is not None for f in live), (
            "manifest entries missing partition values"
        )
        # 2. SHOW PARTITIONS
        expected = ["2024-01-01", "2024-01-02", "2024-01-03"]
        assert lake.partition_values() == expected, lake.partition_values()
        # 3. structural pruning: one partition's files only, exact rows
        kept = lake._prune_partitions(live, partitions=["2024-01-02"])
        assert kept and len(kept) < len(live)
        assert all(f.partition == "2024-01-02" for f in kept)
        one = lake.snapshot(partitions=["2024-01-02"])
        assert one.where(F.col("c_custkey") % 3 != 1).count() == 0
        # 4. reopen with NO args: persisted partition_fields win
        reopened = LakeTable(spark, work)
        assert reopened.partition_fields == ["d"]
        # 5. the oracle-checked result: an inclusive partition RANGE
        out = (
            reopened.snapshot(
                partition_range=("2024-01-01", "2024-01-02")
            )
            .select(
                "c_custkey", "c_name",
                F.round("acctbal", 4).alias("acctbal"), "d",
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_overwrite(spark, sf_dir):
    """Replacecommit write surface (Hudi insert_overwrite /
    delete_partition — the ``hoodie.datasource.write.operation`` values
    the reference's Hudi tables accept beyond the sync's upsert/delete)
    under oracle control. Timeline on a d-partitioned customer table
    (d = 2024-01-0(1 + custkey%3)):

    v1  merge: every customer < SUBSET at _ts=1;
    v2  insert_overwrite: partition 2024-01-02 (custkey%3==1) replaced
        with ONLY its even custkeys at acctbal+500;
    v3  delete_partition 2024-01-03 (custkey%3==2), metadata-only.

    Structural assertions: untouched partition 2024-01-01 carries its
    exact manifest entries through both replaces (zero data I/O), the
    delete writes no data files, and v1 time travel still sees all
    three partitions. The returned final snapshot is hash-checked."""
    import glob as _glob
    import os as _os

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        d_col = F.concat(
            F.lit("2024-01-0"), ((F.col("c_custkey") % 3) + 1).cast("string")
        ).alias("d")
        batch1 = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
            d_col,
        )
        ow = c.where(
            (F.col("c_custkey") % 3 == 1) & (F.col("c_custkey") % 2 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 500.0, 4).alias("acctbal"),
            d_col,
        )
        lake = LakeTable(spark, work, buckets=4, partition_fields=["d"])
        lake.merge(batch1, "b1")
        keep = {
            f.path for f in lake.log.live_files()
            if f.partition == "2024-01-01"
        }
        n_parquet = len(_glob.glob(
            _os.path.join(work, "data", "*", "_part=*", "_bucket=*",
                          "*.parquet")
        ))
        lake.insert_overwrite(ow, "ow")
        lake.delete_partitions(["2024-01-03"], "dp")
        # untouched partition: exact manifest carry-over, no rewrite
        assert {
            f.path for f in lake.log.live_files()
            if f.partition == "2024-01-01"
        } == keep
        # the delete was metadata-only (overwrite added files; none since)
        n_after = len(_glob.glob(
            _os.path.join(work, "data", "*", "_part=*", "_bucket=*",
                          "*.parquet")
        ))
        assert n_after > n_parquet
        ops = {r["version"]: r["operation"] for r in lake.history().collect()}
        assert ops[2] == "insert_overwrite" and ops[3] == "delete_partition"
        assert lake.partition_values() == ["2024-01-01", "2024-01-02"]
        # v1 time travel still sees all three partitions
        assert len(lake.partition_values(version=1)) == 3
        out = (
            lake.snapshot()
            .select(
                "c_custkey", "c_name",
                F.round("acctbal", 4).alias("acctbal"), "d",
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_timepart(spark, sf_dir):
    """Time-partitioned lake table from an event-time column — the
    ``col:epochmicros`` partition spec (Hudi TimestampBasedKeyGenerator /
    CustomKeyGenerator ``field:type`` analogue, H4/H10 surface): the
    canonical 100-TB CDC layout, where a "last N days" query prunes at
    the directory level before any file or stats check. Loads ``events``
    (ts normalized by loaders.epoch_us, layout-robust; the
    ``event_id % 47`` sample spans the full time range at EVERY scale
    factor — a low-id prefix collapses to one day at sf0.1), partitions
    by UTC day derived from epoch-micros, and snapshots the LAST TWO
    days via partition_range. Structural assertion: the pruned read plans
    strictly fewer files than the table holds. Hash-checked against a
    DuckDB replay of the same day derivation + last-2-days filter."""
    from hudi_spark_plus_spark.sources.loaders import epoch_us

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        ev = load_table(spark, sf_dir, "events").where(
            F.col("event_id") % 47 == 0
        )
        batch = ev.select(
            F.col("event_id").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "event_id",
            "user_id",
            "event_type",
            epoch_us(ev, "ts").alias("ts_us"),
        )
        lake = LakeTable(
            spark, work, buckets=4,
            partition_fields=["ts_us:epochmicros"],
        )
        lake.merge(batch, "b1")
        days = lake.partition_values()
        assert len(days) >= 2, days
        live = lake.log.live_files()
        kept = lake._prune_partitions(live, partition_range=(days[-2], None))
        assert kept and len(kept) < len(live)
        out = (
            lake.snapshot(partition_range=(days[-2], None))
            .select("event_id", "user_id", "event_type", "ts_us")
            .orderBy("event_id")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_global_index(spark, sf_dir):
    """Global-index merge semantics (Hudi GLOBAL_BLOOM/GLOBAL_SIMPLE,
    ``hoodie.index.type``) under oracle control: record identity is the
    key ALONE on a partitioned table, so an upsert whose partition value
    changed RELOCATES the record. Fixture: customers partitioned by
    derived segment s = custkey % 3; batch 2 (at _ts=2) MOVES multiples
    of 5 to segment 'moved' with acctbal+1000 — half COW, half MOR (both
    write paths must relocate identically). Structural assertions: no
    moved key survives in its old partition even under a pruned read of
    that partition alone (the MOR relocation tombstone invariant), and
    the non-moved state is untouched."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        seg = (F.col("c_custkey") % 3).cast("string").alias("s")
        batch1 = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
            seg,
        )
        movers = c.where(F.col("c_custkey") % 5 == 0).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
            F.lit("moved").alias("s"),
        )
        lake = LakeTable(
            spark, work, buckets=4, partition_fields=["s"],
            global_index=True,
        )
        lake.merge(batch1, "b1")
        # same relocation through BOTH write paths
        lake.merge(movers.where(F.col("c_custkey") % 2 == 0), "b2")
        lake.merge(
            movers.where(F.col("c_custkey") % 2 != 0), "b3", mode="mor"
        )
        # pruned read of each old partition: no moved key resurrects
        for p in ("0", "1", "2"):
            stale = (
                lake.snapshot(partitions=[p])
                .where(F.col("c_custkey") % 5 == 0)
                .count()
            )
            assert stale == 0, (p, stale)
        out = (
            lake.snapshot()
            .select(
                "c_custkey", "c_name",
                F.round("acctbal", 4).alias("acctbal"), "s",
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_savepoint(spark, sf_dir):
    """Savepoint/restore service (Hudi savepoint — the version pin that
    cleaning honors) under oracle control. Timeline: b1 inserts every
    customer < SUBSET; savepoint 'rel'; b2 updates multiples of 3 and
    deletes multiples of 7; vacuum keep_last=1 with zero grace — which
    WOULD have dropped v1 were it not pinned. Assertions: v1 stays
    readable post-vacuum (commit + segments + data files all retained),
    then restore('rel') rewinds state. The returned final snapshot is
    the pristine b1 state, hash-checked."""
    from hudi_spark_plus_spark.table.maintenance import vacuum

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
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
        batch2 = c.where(
            (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 7 == 0, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
        )
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(batch1, "b1")
        v = lake.savepoint("rel")
        lake.merge(batch2, "b2")
        st = vacuum(lake, keep_last=1, grace_seconds=0)
        assert st["versions_dropped"] == 0  # v1 pinned, v2 latest
        assert lake.log.versions() == [1, 2]
        assert lake.snapshot(version=v).count() > 0  # pinned data readable
        lake.restore("rel")
        out = (
            lake.snapshot()
            .select(
                "c_custkey", "c_name",
                F.round("acctbal", 4).alias("acctbal"),
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_cdc_feed(spark, sf_dir):
    """CDC-format incremental read (Hudi 0.13's
    ``hoodie.datasource.query.incremental.format=cdc`` analogue) under
    oracle control: after the standard b1/b2 customer timeline PLUS a
    b2 insert wave (custkey in [SUBSET, SUBSET+20)), the feed over
    (1, 2] must classify every change — 'u' for updated multiples of 3,
    'd' for deleted multiples of 7 (tombstone payload = the deleting
    batch's row), 'i' for the new keys — with before-image acctbal for
    u/d and NULL before-images for i."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
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
        changes = load_table(spark, sf_dir, "customer").where(
            (
                (F.col("c_custkey") < SUBSET)
                & ((F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0))
            )
            | (
                (F.col("c_custkey") >= SUBSET)
                & (F.col("c_custkey") < SUBSET + 20)
            )
        )
        batch2 = changes.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(
                (F.col("c_custkey") < SUBSET) & (F.col("c_custkey") % 7 == 0),
                "delete",
            )
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
        )
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(batch1, "b1")
        lake.merge(batch2, "b2")
        out = (
            lake.incremental_cdc(1)
            .select(
                "_change_op", "_change_ver", "c_custkey",
                F.round("acctbal", 4).alias("acctbal"),
                F.round("_before_acctbal", 4).alias("before_acctbal"),
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_stream_sink(spark, sf_dir):
    """``df.writeStream.format("lake-table")`` — streaming writes
    through the Data Source sink (sources/lake_writer.py
    LakeTableStreamWriter) under oracle control: a two-file parquet
    stream drains with availableNow + maxFilesPerTrigger=1, each
    micro-batch landing as its own exactly-once insert commit
    (batch id ``stream-<batchId>``); the table then reads back through
    the format-level snapshot. The per-batch commit structure is
    asserted engine-side (file order is not deterministic, so the
    oracled output is the order-free final state)."""
    from hudi_spark_plus_spark.sources import lake_reader

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        src, table, ck = work + "/src", work + "/t", work + "/ck"
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        sel = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        sel.where(F.col("c_custkey") % 2 == 0).repartition(1).write.parquet(
            src
        )
        sel.where(F.col("c_custkey") % 2 == 1).repartition(1).write.mode(
            "append"
        ).parquet(src)
        lake_reader.register(spark)
        q = (
            spark.readStream.schema(sel.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.format("lake-table")
            .option("path", table)
            .option("engine.write.buckets", "4")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        lake = LakeTable(spark, table)
        vs = lake.log.versions()
        ids = [lake.log.read(v).batch_id for v in vs]
        assert len(vs) == 2 and len(set(ids)) == 2 and all(
            i and i.startswith("stream-") for i in ids
        ), (vs, ids)
        out = (
            spark.read.format("lake-table")
            .option("path", table)
            .load()
            .select(
                "c_custkey", "c_name",
                F.round("acctbal", 4).alias("acctbal"),
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_cdc_source(spark, sf_dir):
    """The format-read twin of q-lake-cdc-feed: the SAME b1/b2 customer
    timeline consumed through ``spark.read.format("lake-table")`` with
    ``engine.read.type=cdc`` (the Hudi
    ``hoodie.datasource.query.incremental.format=cdc`` read-option
    surface, SURVEY §2.3 H13) instead of the Python
    ``LakeTable.incremental_cdc`` API — downstream consumers use the
    format path (reference README.md:21-27). Every change over (1, 2]
    must classify identically: 'u' with before-image acctbal for
    updated multiples of 3, 'd' with the deleting batch's payload for
    multiples of 7, 'i' with NULL before-images for the insert wave."""
    from hudi_spark_plus_spark.sources import lake_reader

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
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
        changes = load_table(spark, sf_dir, "customer").where(
            (
                (F.col("c_custkey") < SUBSET)
                & ((F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0))
            )
            | (
                (F.col("c_custkey") >= SUBSET)
                & (F.col("c_custkey") < SUBSET + 20)
            )
        )
        batch2 = changes.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(
                (F.col("c_custkey") < SUBSET) & (F.col("c_custkey") % 7 == 0),
                "delete",
            )
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
        )
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(batch1, "b1")
        lake.merge(batch2, "b2")
        lake_reader.register(spark)
        out = (
            spark.read.format("lake-table")
            .option("path", lake.path)
            .option("engine.read.type", "cdc")
            .option("engine.read.begin", "1")
            .load()
            .select(
                "_change_op", "_change_ver", "c_custkey",
                F.round("acctbal", 4).alias("acctbal"),
                F.round("_before_acctbal", 4).alias("before_acctbal"),
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_format_write(spark, sf_dir):
    """``df.write.format("lake-table").mode("append").save(path)`` —
    the batch Data Source WRITE path (sources/lake_writer.py; the
    reference's entry point 2, BinlogHoodieDataSource.scala:19-22)
    under oracle control. Two format-level appends build a partitioned
    table from scratch (executor-side bucketing via the JVM-exact
    Python xxhash64, partition-path rendering, manifest stats), the
    second append REPLAYED with the same batch id to prove H5
    idempotence holds through this surface; a third format write is a
    MERGE-ON-READ UPSERT (``engine.write.operation=upsert`` — delta
    appends + ``_op='delete'`` tombstones, the reference entry point's
    actual Append semantics) updating multiples of 3 and deleting
    multiples of 7; then the table is read back through the
    format-level snapshot read, whose per-group resolution must apply
    last-write-wins over the format-written deltas."""
    from hudi_spark_plus_spark.sources import lake_reader

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        path = work + "/t"
        c = load_table(spark, sf_dir, "customer")
        d_col = F.concat(
            F.lit("2024-01-0"), ((F.col("c_custkey") % 3) + 1).cast("string")
        ).alias("d")
        batch1 = c.where(F.col("c_custkey") < SUBSET).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
            d_col,
        )
        batch2 = c.where(
            (F.col("c_custkey") >= SUBSET)
            & (F.col("c_custkey") < SUBSET + 20)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
            d_col,
        )
        lake_reader.register(spark)
        (
            batch1.write.format("lake-table")
            .option("engine.write.buckets", "4")
            .option("engine.write.partition.fields", "d")
            .mode("append").save(path)
        )
        for _ in range(2):  # replay: same batch id commits exactly once
            (
                batch2.write.format("lake-table")
                .option("engine.write.batch.id", "wave-2")
                .mode("append").save(path)
            )
        batch3 = c.where(
            (F.col("c_custkey") < SUBSET)
            & ((F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0))
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(3).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 7 == 0, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 77.0, 4).alias("acctbal"),
            d_col,
        )
        (
            batch3.write.format("lake-table")
            .option("engine.write.operation", "upsert")
            .mode("append").save(path)
        )
        out = (
            spark.read.format("lake-table")
            .option("path", path)
            .load()
            .select(
                "c_custkey", "c_name",
                F.round("acctbal", 4).alias("acctbal"),
                "d",
                F.col("_commit_ver").alias("ver"),
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_batch_source(spark, sf_dir):
    """``spark.read.format("lake-table")`` — the batch Python Data
    Source (sources/lake_reader.py; downstream consumers read the
    reference's tables through exactly this surface, README.md:21-27)
    under oracle control. Fixture: the d-partitioned two-batch customer
    table (custkey % 3 → 2024-01-01..03; batch 2 updates multiples of 3
    by +1000 and deletes multiples of 7). One query checks, for the
    d=2024-01-02 slice:

    1. a format-level SNAPSHOT read with a plain ``df.filter`` on the
       partition field — pushed filters must plan ONLY that partition's
       files (asserted structurally against the reader's planner);
    2. a format-level INCREMENTAL read (begin=1) of the same slice —
       batch 2's deletes surface as tombstones with the deleting
       batch's payload."""
    from pyspark.sql.datasource import EqualTo

    from hudi_spark_plus_spark.sources import lake_reader

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        d_col = F.concat(
            F.lit("2024-01-0"), ((F.col("c_custkey") % 3) + 1).cast("string")
        ).alias("d")
        batch1 = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
            d_col,
        )
        batch2 = c.where(
            (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 7 == 0, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
            d_col,
        )
        lake = LakeTable(spark, work + "/t", buckets=4, partition_fields=["d"])
        lake.merge(batch1, "b1")
        lake.merge(batch2, "b2")

        # structural pruning proof: the pushed partition filter plans
        # exactly (and only) the d=2024-01-02 files
        pruned = lake_reader.LakeBatchReader({"path": lake.path})
        list(pruned.pushFilters([EqualTo(("d",), "2024-01-02")]))
        planned = {p for s in pruned.partitions() for p in s.paths}
        want = {
            f.path
            for f in lake.log.live_files()
            if f.partition == "2024-01-02"
        }
        assert planned == want and planned, (
            f"pushed partition filter planned {planned} != {want}"
        )
        # col_stats data skipping: a payload-column range beyond every
        # file's recorded max must plan NOTHING; the complementary
        # full-range probe must not false-prune a single file
        from pyspark.sql.datasource import GreaterThanOrEqual

        skipped = lake_reader.LakeBatchReader({"path": lake.path})
        list(skipped.pushFilters(
            [GreaterThanOrEqual(("c_custkey",), SUBSET * 1000)]
        ))
        assert list(skipped.partitions()) == [], (
            "col_stats skipping must drop every file for an "
            "out-of-range payload probe"
        )
        full = lake_reader.LakeBatchReader({"path": lake.path})
        list(full.pushFilters([GreaterThanOrEqual(("c_custkey",), 0)]))
        assert {p for s in full.partitions() for p in s.paths} == {
            f.path for f in lake.log.live_files()
        }, "an always-true payload probe must not prune"

        lake_reader.register(spark)
        snap = (
            spark.read.format("lake-table")
            .option("path", lake.path)
            .load()
            .where(F.col("d") == "2024-01-02")
            .select(
                F.lit("snap").alias("mode"),
                "c_custkey",
                "c_name",
                F.round("acctbal", 4).alias("acctbal"),
                F.lit(0).alias("deleted"),
            )
        )
        incr = (
            spark.read.format("lake-table")
            .option("path", lake.path)
            .option("engine.read.type", "incremental")
            .option("engine.read.begin", "1")
            .load()
            .where(F.col("d") == "2024-01-02")
            .select(
                F.lit("incr").alias("mode"),
                "c_custkey",
                "c_name",
                F.round("acctbal", 4).alias("acctbal"),
                F.col("_deleted").cast("int").alias("deleted"),
            )
        )
        out = snap.unionByName(incr).orderBy("mode", "c_custkey")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_merge_into(spark, sf_dir):
    """MERGE INTO (Spark SQL surface) under oracle control: seed
    customers < SUBSET at ts=1; MERGE a source of customers
    [SUBSET/2, SUBSET*1.5) at ts=2 with +500 balances — matched rows
    update, unmatched insert; then MERGE a delete-only source (every
    10th key, ts=3, unmatched dropped). Membership probes ride
    scan_for_keys (Bloom-pruned), actions ride the LWW merge."""
    half, top = SUBSET // 2, SUBSET + SUBSET // 2
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        seed = c.where(F.col("c_custkey") < SUBSET).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(seed, "b1")
        src = c.where(
            (F.col("c_custkey") >= half) & (F.col("c_custkey") < top)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") + 500.0, 4).alias("acctbal"),
        )
        lake.merge_into(src, "update", "insert", "b2")
        dels = c.where(
            (F.col("c_custkey") < top) & (F.col("c_custkey") % 10 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(3).cast("long").alias("_ts"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        lake.merge_into(dels, "delete", None, "b3")
        out = (
            lake.snapshot()
            .select(
                "c_custkey", "c_name", F.round("acctbal", 4).alias("acctbal")
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_dml(spark, sf_dir):
    """Predicate DML (Spark SQL DELETE/UPDATE parity on the lake
    table) under oracle control: insert every customer < SUBSET, then
    ``update_where(custkey % 3 == 0, acctbal += 1000)`` and
    ``delete_where(custkey % 7 == 0)`` — both composed onto the LWW
    merge, so tombstones carry the matched rows' payload (a %21 key is
    updated THEN deleted, and its tombstone shows the updated balance).
    Returns the final snapshot plus the record-level incremental read
    of both DML commits."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
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
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(batch1, "b1")
        lake.update_where(
            F.col("c_custkey") % 3 == 0,
            {"acctbal": F.round(F.col("acctbal") + 1000.0, 4)},
            "b2",
        )
        lake.delete_where(F.col("c_custkey") % 7 == 0, "b3")
        snap = lake.snapshot().select(
            F.lit("snap").alias("mode"),
            "c_custkey",
            "c_name",
            F.round("acctbal", 4).alias("acctbal"),
            F.lit(0).alias("deleted"),
        )
        incr = lake.incremental(1).select(
            F.lit("incr").alias("mode"),
            "c_custkey",
            "c_name",
            F.round("acctbal", 4).alias("acctbal"),
            F.col("_deleted").cast("int").alias("deleted"),
        )
        out = snap.unionByName(incr).orderBy("mode", "c_custkey")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_bootstrap(spark, sf_dir):
    """Metadata-only bootstrap (table/bootstrap.py, the Hudi
    METADATA_ONLY bootstrap analogue) under oracle control: existing
    plain parquet (3 fixed-range files of ``customer``) is registered
    without rewriting — asserted: zero files under the table's data dir
    — then one COW merge updates/deletes keys < 34 only, converting
    exactly the one Bloom-hit source file while the other two are
    carried as bootstrap entries untouched (asserted). The returned
    frame is the snapshot (synthesized ``_key`` included — the
    null-safe string cast the oracle replays with CAST) plus the
    record-level incremental read of the merge."""
    import glob as _glob
    import os as _os

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        src = _os.path.join(work, "src")
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        payload = c.select(
            "c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal")
        )
        # three fixed-range files: deterministic per-file key sets so
        # the Bloom-carry assertion is stable across scale factors
        for lo, hi in ((0, 34), (34, 67), (67, SUBSET)):
            (
                payload.where(
                    (F.col("c_custkey") >= lo) & (F.col("c_custkey") < hi)
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
        lake = LakeTable(spark, _os.path.join(work, "t"), buckets=4)
        lake.bootstrap(src, key_fields=["c_custkey"])
        assert not _glob.glob(
            _os.path.join(work, "t", "data", "**", "*.parquet"),
            recursive=True,
        ), "metadata-only bootstrap wrote data files"
        batch = (
            c.where(
                (F.col("c_custkey") < 34)
                & ((F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 7 == 0))
            )
            .select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(1).cast("long").alias("_ts"),
                F.when(F.col("c_custkey") % 7 == 0, "delete")
                .otherwise("upsert")
                .alias("_op"),
                "c_custkey",
                "c_name",
                F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
            )
        )
        lake.merge(batch, "b1")
        from hudi_spark_plus_spark.table.bootstrap import BOOTSTRAP_KIND

        kinds = [f.kind for f in lake.log.live_files()]
        assert kinds.count(BOOTSTRAP_KIND) == 2, (
            f"progressive conversion must Bloom-carry the two source "
            f"files the batch cannot touch: {kinds}"
        )
        snap = lake.snapshot().select(
            F.lit("snap").alias("mode"),
            "c_custkey",
            F.col("_key").alias("key"),
            "c_name",
            F.round("acctbal", 4).alias("acctbal"),
            F.lit(0).alias("deleted"),
        )
        incr = lake.incremental(1).select(
            F.lit("incr").alias("mode"),
            "c_custkey",
            F.col("_key").alias("key"),
            "c_name",
            F.round("acctbal", 4).alias("acctbal"),
            F.col("_deleted").cast("int").alias("deleted"),
        )
        out = snap.unionByName(incr).orderBy("mode", "c_custkey")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


SIDX_PROBE_KEYS = [5, 17, 42, 77]
SIDX_LATE_KEY = 107  # SUBSET + 7: lands after the index build
SIDX_MOVED_KEY = 3


def _tpch_name(k: int) -> str:
    return f"Customer#{k:09d}"


def q_lake_secondary_index(spark, sf_dir):
    """Secondary index (table/lake_table.py create_secondary_index —
    the Hudi 1.0 secondary-index / async-indexer analogue) under oracle
    control: seed customers < SUBSET, index c_name (a column the table
    is neither keyed nor clustered by), then exercise all three
    contract legs — (p1) indexed equality probes prune to Bloom-hit
    files (structurally asserted: a probe must keep FEWER than all
    files); (p2) a batch committed AFTER the build is found — since r9
    in-commit maintenance indexes it in the merge itself (before r9
    this leg exercised conservative scanning of an unindexed file; the
    crash-window stale path is unit-tested via a suppressed-maintenance
    monkeypatch instead); (p3) after refresh + a MOR delta renaming one
    customer, the OLD
    name returns nothing (bucket-granular resolution, no superseded
    row) and the NEW name finds exactly the renamed row."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        seed = c.where(F.col("c_custkey") < SUBSET).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            "c_mktsegment",
        )
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(seed, "b1")
        lake.create_secondary_index("c_name")
        late = c.where(
            (F.col("c_custkey") >= SUBSET)
            & (F.col("c_custkey") < SUBSET + 20)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            "c_mktsegment",
        )
        lake.merge(late, "b2")
        p2_names = [_tpch_name(SIDX_LATE_KEY)]
        p2 = lake.scan_for_values("c_name", p2_names)
        lake.refresh_secondary_index("c_name")
        moved = seed.where(F.col("c_custkey") == SIDX_MOVED_KEY).select(
            "_key",
            F.lit(3).cast("long").alias("_ts"),
            "_op",
            "c_custkey",
            F.lit(f"RENAMED#{SIDX_MOVED_KEY}").alias("c_name"),
            "c_mktsegment",
        )
        lake.merge(moved, "b3", mode="mor")
        p1_names = [_tpch_name(k) for k in SIDX_PROBE_KEYS]
        kept, live = lake.files_for_values("c_name", p1_names)
        if not kept or len(kept) >= len(live):
            raise AssertionError(
                f"secondary index failed to prune: kept {len(kept)} of "
                f"{len(live)} files for a {len(p1_names)}-name probe"
            )
        p1 = lake.scan_for_values("c_name", p1_names)
        p3 = lake.scan_for_values(
            "c_name",
            [_tpch_name(SIDX_MOVED_KEY), f"RENAMED#{SIDX_MOVED_KEY}"],
        )
        out = (
            p1.select(F.lit("p1").alias("mode"), "c_custkey", "c_name",
                      "c_mktsegment")
            .unionByName(
                p2.select(F.lit("p2").alias("mode"), "c_custkey",
                          "c_name", "c_mktsegment")
            )
            .unionByName(
                p3.select(F.lit("p3").alias("mode"), "c_custkey",
                          "c_name", "c_mktsegment")
            )
            .orderBy("mode", "c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_partial_update(spark, sf_dir):
    """Partial-update upsert (table/lake_table.py merge_partial — the
    Hudi PartialUpdateAvroPayload surface) under oracle control: seed
    customers < SUBSET at ts=1; partial batch 1 (ts=2, keys %4==0)
    carries ONLY acctbal (+100) with c_name NULL — names must survive;
    partial batch 2 (ts=3, keys %6==0 plus inserts [SUBSET,SUBSET+10))
    carries ONLY c_name ('VIP#k', acctbal column absent) — balances as
    left by batch 1 must survive, inserted keys land with NULL
    balances. A %12 key crosses both batches, proving the updates
    compose column-wise."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        seed = c.where(F.col("c_custkey") < SUBSET).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        lake = LakeTable(spark, work, buckets=4)
        lake.merge(seed, "b1")
        p1 = c.where(
            (F.col("c_custkey") < SUBSET) & (F.col("c_custkey") % 4 == 0)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            "c_custkey",
            F.lit(None).cast("string").alias("c_name"),
            F.round(F.col("c_acctbal") + 100.0, 4).alias("acctbal"),
        )
        lake.merge_partial(p1, "b2")
        p2 = c.where(
            (
                (F.col("c_custkey") < SUBSET)
                & (F.col("c_custkey") % 6 == 0)
            )
            | (
                (F.col("c_custkey") >= SUBSET)
                & (F.col("c_custkey") < SUBSET + 10)
            )
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(3).cast("long").alias("_ts"),
            "c_custkey",
            F.concat(
                F.lit("VIP#"), F.col("c_custkey").cast("string")
            ).alias("c_name"),
        )
        lake.merge_partial(p2, "b3")
        out = (
            lake.snapshot()
            .select(
                "c_custkey",
                "c_name",
                F.round("acctbal", 4).alias("acctbal"),
            )
            .orderBy("c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


FNIDX_ORDER_BOUND = 2000


def q_lake_functional_index(spark, sf_dir):
    """Functional index (table/lake_table.py create_functional_index —
    the Hudi 1.0 expression-index analogue) under oracle control:
    orders with o_orderkey < BOUND land in THREE time-ordered insert
    batches (pre-1997 / 1997-98 / 1999), so files correlate with order
    date — the layout the expression index exists for. Index
    `substring(od, 1, 7)` (order month, a DERIVED value raw col_stats
    can't see), then: (p1) a 1999 month-range probe must prune files
    (structurally asserted) and return exactly the 1999 orders; (p2) a
    fourth batch (2000+) inserted AFTER the build is unindexed and
    conservatively scanned — found by a stale index."""
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderkey") < FNIDX_ORDER_BOUND
        )
        base = o.select(
            F.col("o_orderkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
            F.round("o_totalprice", 4).alias("price"),
        )
        lake = LakeTable(spark, work, buckets=4)
        yr = F.substring("od", 1, 4)
        lake.insert(base.where(yr < "1997"), "b1")
        lake.insert(base.where((yr >= "1997") & (yr <= "1998")), "b2")
        lake.insert(base.where(yr == "1999"), "b3")
        lake.create_functional_index("month", "substring(od, 1, 7)")
        lake.insert(base.where(yr >= "2000"), "b4")
        kept, live = lake.files_for_expr_range(
            "month", "1999-01", "1999-12"
        )
        # b4's unindexed files are conservatively kept; the three
        # INDEXED batches must still prune (b1/b2 files out)
        if not kept or len(kept) >= len(live):
            raise AssertionError(
                f"functional index failed to prune: kept {len(kept)} "
                f"of {len(live)} files for a one-year month range"
            )
        p1 = lake.scan_expr_range("month", "1999-01", "1999-12")
        p2 = lake.scan_expr_range("month", "2000-01", "2001-12")
        out = (
            p1.select(F.lit("p1").alias("mode"), "o_orderkey", "od",
                      "price")
            .unionByName(
                p2.select(F.lit("p2").alias("mode"), "o_orderkey", "od",
                          "price")
            )
            .orderBy("mode", "o_orderkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview(spark, sf_dir):
    """Incrementally-maintained aggregate view (table/matview.py
    AggregateView — the CDC-consumer pattern the reference's sink
    exists to feed, packaged as incremental view maintenance) under
    oracle control: source = customers < SUBSET keyed by custkey,
    view = count + sum(c_nationkey) per market segment. Seed,
    refresh; then one churn slice — %5 keys MOVE to segment 'MOVED'
    (cross-group update), %9 keys delete, [SUBSET, SUBSET+15) insert
    as 'NEW' — refresh again. The result must equal a from-scratch
    GROUP BY of the final state, while each refresh only read the CDC
    slice and Bloom-probed the touched groups."""
    from hudi_spark_plus_spark.table.matview import AggregateView

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        seed = c.where(F.col("c_custkey") < SUBSET).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_mktsegment",
            "c_nationkey",
        )
        src = LakeTable(spark, work + "/src", buckets=4)
        src.merge(seed, "b1")
        mv = AggregateView(
            spark, work + "/mv", src, ["c_mktsegment"], ["c_nationkey"]
        )
        mv.refresh()
        churn = c.where(
            (
                (F.col("c_custkey") < SUBSET)
                & (
                    (F.col("c_custkey") % 9 == 0)
                    | (F.col("c_custkey") % 5 == 0)
                )
            )
            | (
                (F.col("c_custkey") >= SUBSET)
                & (F.col("c_custkey") < SUBSET + 15)
            )
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(
                (F.col("c_custkey") % 9 == 0)
                & (F.col("c_custkey") < SUBSET),
                "delete",
            )
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            F.when(F.col("c_custkey") >= SUBSET, "NEW")
            .when(F.col("c_custkey") % 5 == 0, "MOVED")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            "c_nationkey",
        )
        src.merge(churn, "b2")
        st = mv.refresh()
        if st["groups_touched"] == 0:
            raise AssertionError("matview refresh saw no CDC deltas")
        out = (
            mv.df()
            .select(
                "c_mktsegment",
                "cnt",
                F.col("sum_c_nationkey").alias("sum_nk"),
            )
            .orderBy("c_mktsegment")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview_join(spark, sf_dir):
    """Fact×dim incrementally-maintained JOIN matview (table/matview.py
    JoinView — VERDICT r12 directive 3) under oracle control: fact =
    orders-derived rows keyed by o_orderkey (fk ``o_custkey``, integral
    measure ``o_units = o_orderkey % 97``), dim = customers < SUBSET
    (c_custkey, c_mktsegment); view = count + sum(o_units) per segment.
    Seed both sides, refresh; then churn BOTH sides before ONE refresh
    — fact: %3==2 keys insert, seeded %7==0 delete, surviving %11==3
    re-point their fk to (o_custkey+7) % SUBSET (some re-attribute to
    other customers, some leave/enter the dim range); dim: %5==0
    customers move to 'MOVED', %9==0 delete (their orders leave the
    join). The single refresh must apply the dim step against the
    fact snapshot PINNED at the fact watermark and the fact step
    against dim@latest (the telescoping identity) — any other pairing
    double- or under-counts. Result must equal a from-scratch GROUP BY
    over final-fact JOIN final-dim."""
    from hudi_spark_plus_spark.table.matview import JoinView

    o_sub = SUBSET * 4
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        ok = F.col("o_orderkey")
        base = o.where(ok < o_sub).select(
            ok.cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "o_orderkey",
            "o_custkey",
            (ok % 97).cast("long").alias("o_units"),
        )
        fact = LakeTable(spark, work + "/fact", buckets=4)
        fact.merge(base.where(ok % 3 != 2), "f1")
        dim = LakeTable(spark, work + "/dim", buckets=2)
        dim.merge(
            c.where(F.col("c_custkey") < SUBSET).select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(1).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_mktsegment",
            ),
            "d1",
        )
        mv = JoinView(
            spark, work + "/mv", fact, dim,
            "o_custkey", "c_custkey", ["c_mktsegment"], ["o_units"],
        )
        mv.refresh()
        fact.merge(
            base.where(
                (ok % 3 == 2) | (ok % 7 == 0) | (ok % 11 == 3)
            ).select(
                "_key",
                F.lit(2).cast("long").alias("_ts"),
                F.when((ok % 3 != 2) & (ok % 7 == 0), "delete")
                .otherwise("upsert")
                .alias("_op"),
                "o_orderkey",
                F.when(
                    (ok % 3 != 2) & (ok % 7 != 0) & (ok % 11 == 3),
                    (F.col("o_custkey") + 7) % SUBSET,
                )
                .otherwise(F.col("o_custkey"))
                .alias("o_custkey"),
                "o_units",
            ),
            "f2",
        )
        ck = F.col("c_custkey")
        dim.merge(
            c.where(
                (ck < SUBSET) & ((ck % 5 == 0) | (ck % 9 == 0))
            ).select(
                ck.cast("string").alias("_key"),
                F.lit(2).cast("long").alias("_ts"),
                F.when(ck % 9 == 0, "delete")
                .otherwise("upsert")
                .alias("_op"),
                "c_custkey",
                F.lit("MOVED").alias("c_mktsegment"),
            ),
            "d2",
        )
        st = mv.refresh()
        if st["groups_touched"] == 0:
            raise AssertionError("join matview refresh saw no deltas")
        out = mv.df().orderBy("c_mktsegment")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview_join_minmax(spark, sf_dir):
    """JoinView MIN/MAX measures under oracle control — the
    semi-algebraic half of the join-matview aggregate family: same
    fact/dim construction and two-sided churn as q-lake-matview-join
    (fact keyed by o_orderkey, fk ``o_custkey``; deletes, fk
    re-pointing, dim segment moves and deletes), with an extra
    integral measure ``o_pri = (o_orderkey*13) % 251`` maintained as
    min/max next to sum(o_units). The churn guarantees BOTH
    maintenance paths run in the second refresh — STRUCTURALLY, at
    every scale factor (the organic delete/move churn is
    data-dependent: at sf0.1 almost no seeded fact row references a
    dim custkey < SUBSET, so it alone cannot be relied on to dirty a
    group): the inserted fact rows (%3==2) point at ten synthetic dim
    customers (key 1_000_000+i, segment 'NEW') that no pre-existing
    row, delete, or re-point can reach — a pure-gain group pinning
    the least/greatest FOLD path — while twenty synthetic seed rows
    on five 'SYN' dim customers (key 2_000_000+j) lose every i%4==0
    row in the churn batch — a guaranteed-leave group pinning the
    RECOMPUTE path. ``groups_touched > groups_recomputed > 0`` is
    asserted. Result must equal a from-scratch GROUP BY over
    final-fact JOIN final-dim."""
    from hudi_spark_plus_spark.table.matview import JoinView

    o_sub = SUBSET * 4
    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        ok = F.col("o_orderkey")
        base = o.where(ok < o_sub).select(
            ok.cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "o_orderkey",
            "o_custkey",
            (ok % 97).cast("long").alias("o_units"),
            ((ok * 13) % 251).cast("long").alias("o_pri"),
        )
        # synthetic SYN block: 20 seed rows over 5 dim customers in a
        # key range (2_000_000+) nothing organic can touch — the churn
        # deletes every i%4==0 row, so SYN is a guaranteed-leave group
        # at ANY scale factor
        syn_fact = spark.range(20).select(
            F.concat(F.lit("x"), F.col("id")).alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            (F.lit(2_000_000) + F.col("id")).alias("o_orderkey"),
            (F.lit(2_000_000) + F.col("id") % 5).alias("o_custkey"),
            F.col("id").cast("long").alias("o_units"),
            ((F.col("id") * 17) % 251).cast("long").alias("o_pri"),
        )
        fact = LakeTable(spark, work + "/fact", buckets=4)
        fact.merge(
            base.where(ok % 3 != 2).unionByName(syn_fact), "f1"
        )
        dim = LakeTable(spark, work + "/dim", buckets=2)
        dim.merge(
            c.where(F.col("c_custkey") < SUBSET).select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(1).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_mktsegment",
            ).unionByName(
                spark.range(5).select(
                    (F.lit(2_000_000) + F.col("id"))
                    .cast("string").alias("_key"),
                    F.lit(1).cast("long").alias("_ts"),
                    F.lit("upsert").alias("_op"),
                    (F.lit(2_000_000) + F.col("id")).alias("c_custkey"),
                    F.lit("SYN").alias("c_mktsegment"),
                )
            ),
            "d1",
        )
        mv = JoinView(
            spark, work + "/mv", fact, dim,
            "o_custkey", "c_custkey", ["c_mktsegment"], ["o_units"],
            minmax_cols=["o_pri"],
        )
        st = mv.refresh()
        if st["groups_recomputed"] != 0:
            raise AssertionError(
                "seed refresh is insert-only: nothing may recompute"
            )
        fact.merge(
            base.where(
                (ok % 3 == 2) | (ok % 7 == 0) | (ok % 11 == 3)
            ).select(
                "_key",
                F.lit(2).cast("long").alias("_ts"),
                F.when((ok % 3 != 2) & (ok % 7 == 0), "delete")
                .otherwise("upsert")
                .alias("_op"),
                "o_orderkey",
                # inserts land on the synthetic NEW customers — a key
                # range no pre-existing row, delete, or re-point can
                # reach, so 'NEW' is a structurally pure-gain group
                F.when(
                    ok % 3 == 2,
                    F.lit(1_000_000) + (F.col("o_custkey") % 10),
                )
                .when(
                    (ok % 3 != 2) & (ok % 7 != 0) & (ok % 11 == 3),
                    (F.col("o_custkey") + 7) % SUBSET,
                )
                .otherwise(F.col("o_custkey"))
                .alias("o_custkey"),
                "o_units",
                "o_pri",
            ).unionByName(
                # SYN leaves: delete every i%4==0 synthetic row
                spark.range(20).where(F.col("id") % 4 == 0).select(
                    F.concat(F.lit("x"), F.col("id")).alias("_key"),
                    F.lit(2).cast("long").alias("_ts"),
                    F.lit("delete").alias("_op"),
                    (F.lit(2_000_000) + F.col("id")).alias("o_orderkey"),
                    (F.lit(2_000_000) + F.col("id") % 5)
                    .alias("o_custkey"),
                    F.col("id").cast("long").alias("o_units"),
                    ((F.col("id") * 17) % 251).cast("long").alias("o_pri"),
                )
            ),
            "f2",
        )
        ck = F.col("c_custkey")
        dim.merge(
            c.where(
                (ck < SUBSET) & ((ck % 5 == 0) | (ck % 9 == 0))
            ).select(
                ck.cast("string").alias("_key"),
                F.lit(2).cast("long").alias("_ts"),
                F.when(ck % 9 == 0, "delete")
                .otherwise("upsert")
                .alias("_op"),
                "c_custkey",
                F.lit("MOVED").alias("c_mktsegment"),
            ).unionByName(
                spark.range(10).select(
                    (F.lit(1_000_000) + F.col("id"))
                    .cast("string").alias("_key"),
                    F.lit(2).cast("long").alias("_ts"),
                    F.lit("upsert").alias("_op"),
                    (F.lit(1_000_000) + F.col("id")).alias("c_custkey"),
                    F.lit("NEW").alias("c_mktsegment"),
                )
            ),
            "d2",
        )
        st = mv.refresh()
        if not (st["groups_touched"] > st["groups_recomputed"] > 0):
            raise AssertionError(
                "churn refresh must exercise BOTH min/max paths — a "
                "pure-gain group on the fold path and dirty groups on "
                f"the recompute path (stats: {st})"
            )
        out = mv.df().orderBy("c_mktsegment")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview_pctl(spark, sf_dir):
    """Per-group approx-percentile matview (table/matview.py PctlView
    — VERDICT r12 directive 7): deterministic mergeable quantile
    sketches (table/pctl_sketch.py) built executor-side, maintained by
    the NdvView hybrid (insert-only groups sketch-MERGE, updated/
    deleted groups recompute from the pinned file-pruned snapshot).
    Same churn as q-lake-matview — %5 keys MOVE segment, %9 delete,
    [SUBSET, SUBSET+15) insert as 'NEW' — value = (c_custkey*37) % 101
    for spread. At fixture scale every group is under the sketch
    capacity, so the sketches are LOSSLESS and the view must equal
    DuckDB's exact discrete quantile bit-for-bit (the error-bound
    machinery past capacity is unit-tested, q16 doctrine)."""
    from hudi_spark_plus_spark.table.matview import PctlView

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        ck = F.col("c_custkey")
        v = ((ck * 37) % 101).cast("long").alias("v")
        src = LakeTable(spark, work + "/src", buckets=4)
        src.merge(
            c.where(ck < SUBSET).select(
                ck.cast("string").alias("_key"),
                F.lit(1).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_mktsegment",
                v,
            ),
            "b1",
        )
        mv = PctlView(
            spark, work + "/mv", src, ["c_mktsegment"], ["v"],
            quantiles=(0.5, 0.9),
        )
        mv.refresh()
        churn = c.where(
            (
                (ck < SUBSET)
                & ((ck % 9 == 0) | (ck % 5 == 0))
            )
            | ((ck >= SUBSET) & (ck < SUBSET + 15))
        ).select(
            ck.cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when((ck % 9 == 0) & (ck < SUBSET), "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            F.when(ck >= SUBSET, "NEW")
            .when(ck % 5 == 0, "MOVED")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            v,
        )
        src.merge(churn, "b2")
        st = mv.refresh()
        if st["groups_union"] + st["groups_recomputed"] == 0:
            raise AssertionError("pctl matview refresh saw no deltas")
        out = mv.df().orderBy("c_mktsegment")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_record_history(spark, sf_dir):
    """Record-level audit trail (table/audit.py record_history): every
    state a key EVER held across the retained timeline — updates,
    tombstones, re-inserts — from ONE pruned read of the key's bucket
    files (immutable files + carried ``_commit_ver`` stamps make
    history a DISTINCT, not N per-version scans). Fixture: customers
    < SUBSET seeded (v1), %10==1 keys updated +100 (v2), %20==1 keys
    deleted with NULL payload (v3); the histories of key 1 (three
    states incl. tombstone), key 11 (two states), and key 2 (one
    state, untouched — carried copies must collapse) are unioned.
    DuckDB replays each state from first principles."""
    from hudi_spark_plus_spark.table.audit import record_history

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        key = F.col("c_custkey")
        seed = c.where(key < SUBSET).select(
            key.cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            F.round("c_acctbal", 4).alias("bal"),
        )
        lake = LakeTable(spark, f"{work}/t", buckets=4)
        lake.merge(seed, "b1")
        lake.merge(
            c.where((key < SUBSET) & (key % 10 == 1)).select(
                key.cast("string").alias("_key"),
                F.lit(2).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                F.round(F.col("c_acctbal") + 100.0, 4).alias("bal"),
            ),
            "b2",
        )
        lake.merge(
            c.where((key < SUBSET) & (key % 20 == 1)).select(
                key.cast("string").alias("_key"),
                F.lit(3).cast("long").alias("_ts"),
                F.lit("delete").alias("_op"),
                "c_custkey",
                F.lit(None).cast("double").alias("bal"),
            ),
            "b3",
        )
        parts = []
        for k in (1, 11, 2):
            parts.append(
                record_history(lake, str(k)).select(
                    F.lit(k).cast("long").alias("key"),
                    F.col("_commit_ver").alias("ver"),
                    F.col("_ts").alias("ts"),
                    F.col("_deleted").alias("deleted"),
                    "bal",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.orderBy("key", "ver")
        rows = out.collect()
        if len(rows) != 6:  # 3 + 2 + 1 by construction
            raise AssertionError(f"expected 6 history states, got {len(rows)}")
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview_avg(spark, sf_dir):
    """AVG maintained incrementally (table/matview.py AggregateView
    avg_cols — algebraic over the same ± machinery: integer sum plus
    NON-NULL count per measure, one double division read-side; SQL AVG
    ignores NULLs, so dividing by the row count would be wrong the
    moment a NULL lands). Source = customers < SUBSET with
    c_acctbal pre-scaled to integer cents and NULLed for %7==3 keys
    (the nn != cnt trap) and for every 'NEW' insert (an all-NULL group:
    avg must be NULL while cnt counts the rows). Same churn shape as
    q-lake-matview: %5 keys MOVE segments, %9 keys delete,
    [SUBSET, SUBSET+15) insert as 'NEW'. The refreshed view must equal
    a from-scratch AVG GROUP BY replayed by DuckDB."""
    from hudi_spark_plus_spark.table.matview import AggregateView

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        key = F.col("c_custkey")

        def bal(is_new):
            cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
            cond = (key % 7 == 3) | F.lit(is_new)
            return F.when(~cond, cents).alias("bal")

        seed = c.where(key < SUBSET).select(
            key.cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_mktsegment",
            bal(False),
        )
        src = LakeTable(spark, work + "/src", buckets=4)
        src.merge(seed, "b1")
        mv = AggregateView(
            spark, work + "/mv", src, ["c_mktsegment"], avg_cols=["bal"]
        )
        mv.refresh()
        churn = c.where(
            ((key < SUBSET) & ((key % 9 == 0) | (key % 5 == 0)))
            | ((key >= SUBSET) & (key < SUBSET + 15))
        ).select(
            key.cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when((key % 9 == 0) & (key < SUBSET), "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            F.when(key >= SUBSET, "NEW")
            .when(key % 5 == 0, "MOVED")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            F.when(
                (key >= SUBSET) | (key % 7 == 3),
                F.lit(None).cast("long"),
            )
            .otherwise(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
            .alias("bal"),
        )
        src.merge(churn, "b2")
        st = mv.refresh()
        if st["groups_touched"] == 0:
            raise AssertionError("avg matview refresh saw no CDC deltas")
        out = (
            mv.df()
            .select(
                "c_mktsegment",
                "cnt",
                F.round(F.col("avg_bal"), 4).alias("avg_bal"),
            )
            .orderBy("c_mktsegment")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview_ndv(spark, sf_dir):
    """Approx COUNT(DISTINCT) materialized view (table/matview.py
    NdvView — per-group HLL sketches composed with the matview
    watermark protocol, VERDICT r11 directive 6). Hybrid maintenance,
    both paths exercised under oracle control: seed refresh + an
    INSERT-ONLY batch refresh ride the sketch-UNION path (asserted: no
    source recompute), then a move/delete churn forces the partial
    RECOMPUTE path (HLL cannot subtract — affected groups rebuild from
    the file-pruned snapshot). q16 doctrine for the oracle: the hashed
    output carries the EXACT distinct (replayable by DuckDB) — view
    cnt per group + exact countDistinct from the source snapshot —
    while the view's HLL estimates are asserted within 5% in-fixture
    (at nationkey cardinality the DataSketches list-mode estimate is
    exact, so this pins equality in practice)."""
    from hudi_spark_plus_spark.table.matview import NdvView

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        key = F.col("c_custkey")
        seed = c.where(key < SUBSET).select(
            key.cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_mktsegment",
            "c_nationkey",
        )
        src = LakeTable(spark, work + "/src", buckets=4)
        src.merge(seed, "b1")
        mv = NdvView(
            spark, work + "/mv", src, ["c_mktsegment"], ["c_nationkey"]
        )
        st = mv.refresh()
        if st["groups_recomputed"] != 0 or st["groups_union"] == 0:
            raise AssertionError(f"seed refresh took the wrong path: {st}")
        inserts = c.where((key >= SUBSET) & (key < SUBSET + 15)).select(
            key.cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            F.lit("NEW").alias("c_mktsegment"),
            "c_nationkey",
        )
        src.merge(inserts, "b2")
        st = mv.refresh()
        if st["groups_recomputed"] != 0 or st["groups_union"] == 0:
            raise AssertionError(
                f"insert-only refresh must union, not recompute: {st}"
            )
        churn = c.where(
            (key < SUBSET) & ((key % 9 == 0) | (key % 5 == 0))
        ).select(
            key.cast("string").alias("_key"),
            F.lit(3).cast("long").alias("_ts"),
            F.when(key % 9 == 0, "delete").otherwise("upsert").alias("_op"),
            "c_custkey",
            F.when(key % 5 == 0, "MOVED")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            "c_nationkey",
        )
        src.merge(churn, "b3")
        st = mv.refresh()
        if st["groups_recomputed"] == 0 or st["groups_union"] != 0:
            raise AssertionError(
                f"u/d churn refresh must recompute, not union: {st}"
            )
        exact = (
            src.snapshot()
            .groupBy("c_mktsegment")
            .agg(
                F.countDistinct("c_nationkey")
                .cast("long")
                .alias("nd_nationkey")
            )
        )
        got = {
            r["c_mktsegment"]: (r["cnt"], r["approx_distinct_c_nationkey"])
            for r in mv.df().collect()
        }
        out = (
            exact.alias("e")
            .join(mv.df().alias("v"), "c_mktsegment")
            .select(
                "c_mktsegment",
                F.col("v.cnt").alias("cnt"),
                F.col("e.nd_nationkey").alias("nd_nationkey"),
            )
            .orderBy("c_mktsegment")
        )
        rows = out.collect()
        if len(rows) != len(got):
            raise AssertionError("view and exact disagree on live groups")
        for r in rows:
            est = got[r["c_mktsegment"]][1]
            if abs(est - r["nd_nationkey"]) > max(
                1, 0.05 * r["nd_nationkey"]
            ):
                raise AssertionError(
                    f"estimate off by >5%: {r['c_mktsegment']} "
                    f"est={est} exact={r['nd_nationkey']}"
                )
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_record_history_batch(spark, sf_dir):
    """Batch audit trail (table/audit.py record_histories — VERDICT
    r11 directive 7, the compliance-export shape): the histories of a
    key SET from ONE pruned read + one semi-join — the per-key
    bucket/range/Bloom prunes union into one candidate file set, never
    a per-key loop re-reading overlapping files (files-read ⊆ union of
    per-key prunes is plan-guarded in tests/test_audit.py). Same
    churn construction as q-lake-record-history — seed, +100 update
    for %10==1 keys, delete for %20==1 keys — then ONE call returns
    keys 1 (three states incl. tombstone), 11 (two states), 2 (one
    state; carried copies collapse), and a missing key contributes no
    rows. DuckDB replays every state from first principles."""
    from hudi_spark_plus_spark.table.audit import record_histories

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        key = F.col("c_custkey")
        seed = c.where(key < SUBSET).select(
            key.cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            F.round("c_acctbal", 4).alias("bal"),
        )
        lake = LakeTable(spark, f"{work}/t", buckets=4)
        lake.merge(seed, "b1")
        lake.merge(
            c.where((key < SUBSET) & (key % 10 == 1)).select(
                key.cast("string").alias("_key"),
                F.lit(2).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                F.round(F.col("c_acctbal") + 100.0, 4).alias("bal"),
            ),
            "b2",
        )
        lake.merge(
            c.where((key < SUBSET) & (key % 20 == 1)).select(
                key.cast("string").alias("_key"),
                F.lit(3).cast("long").alias("_ts"),
                F.lit("delete").alias("_op"),
                "c_custkey",
                F.lit(None).cast("double").alias("bal"),
            ),
            "b3",
        )
        out = (
            record_histories(lake, ["1", "11", "2", "999999999"])
            .select(
                F.col("_key").cast("long").alias("key"),
                F.col("_commit_ver").alias("ver"),
                F.col("_ts").alias("ts"),
                F.col("_deleted").alias("deleted"),
                "bal",
            )
            .orderBy("key", "ver")
        )
        rows = out.collect()
        if len(rows) != 6:  # 3 + 2 + 1 + 0 by construction
            raise AssertionError(f"expected 6 history states, got {len(rows)}")
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview_minmax(spark, sf_dir):
    """MIN/MAX materialized view (table/matview.py MinMaxView — the
    NON-self-inverting aggregate shape, maintained by partial
    recompute of affected groups instead of delta addition): source =
    customers < SUBSET keyed by custkey, view = count + min/max of
    c_nationkey and c_name (a string measure exercises lexical
    min/max) per market segment. Seed, refresh; churn — %5 keys MOVE
    to 'MOVED', %9 keys DELETE (removing several segments' current
    minima, the case delta math cannot handle), [SUBSET, SUBSET+15)
    insert as 'NEW' — refresh again. Upserts and emptied-group
    tombstones ride ONE commit. Result must equal a from-scratch
    GROUP BY of the final state."""
    from hudi_spark_plus_spark.table.matview import MinMaxView

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer")
        seed = c.where(F.col("c_custkey") < SUBSET).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            "c_mktsegment",
            "c_nationkey",
            "c_name",
        )
        src = LakeTable(spark, work + "/src", buckets=4)
        src.merge(seed, "b1")
        mv = MinMaxView(
            spark, work + "/mv", src, ["c_mktsegment"],
            ["c_nationkey", "c_name"],
        )
        mv.refresh()
        churn = c.where(
            (
                (F.col("c_custkey") < SUBSET)
                & (
                    (F.col("c_custkey") % 9 == 0)
                    | (F.col("c_custkey") % 5 == 0)
                )
            )
            | (
                (F.col("c_custkey") >= SUBSET)
                & (F.col("c_custkey") < SUBSET + 15)
            )
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(
                (F.col("c_custkey") % 9 == 0)
                & (F.col("c_custkey") < SUBSET),
                "delete",
            )
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            F.when(F.col("c_custkey") >= SUBSET, "NEW")
            .when(F.col("c_custkey") % 5 == 0, "MOVED")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            "c_nationkey",
            "c_name",
        )
        src.merge(churn, "b2")
        st = mv.refresh()
        if st["groups_touched"] == 0:
            raise AssertionError("minmax refresh saw no CDC deltas")
        out = (
            mv.df()
            .select(
                "c_mktsegment",
                "cnt",
                F.col("min_c_nationkey").alias("min_nk"),
                F.col("max_c_nationkey").alias("max_nk"),
                F.col("min_c_name").alias("min_name"),
                F.col("max_c_name").alias("max_name"),
            )
            .orderBy("c_mktsegment")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_matview_pruned(spark, sf_dir):
    """Index-routed FILE pruning for the partial-recompute matview
    (VERDICT r9 #1, lake_table.snapshot_pruned_to_groups): source =
    customer < SUBSET partitioned BY the group column (c_mktsegment),
    MinMaxView of c_nationkey per segment. Churn touches ONLY the
    BUILDING segment (custkey %7 rows get nationkey+30), so the second
    refresh's recompute must read ONLY that partition's files — the
    fixture RAISES unless the pruning decision kept fewer files than
    live (structural partition elimination, no index needed). Result
    must equal a from-scratch GROUP BY of the final state (oracled)."""
    from hudi_spark_plus_spark.table.matview import MinMaxView

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )

        def batch(df, ts):
            return df.select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(ts).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_mktsegment",
                F.col("c_nationkey").cast("long").alias("nk"),
            )

        src = LakeTable(
            spark, work + "/src", buckets=3,
            partition_fields=["c_mktsegment"],
        )
        src.merge(batch(c, 1), "b1")
        mv = MinMaxView(
            spark, work + "/mv", src, ["c_mktsegment"], ["nk"]
        )
        mv.refresh()
        churn = batch(
            c.where(
                (F.col("c_mktsegment") == "BUILDING")
                & (F.col("c_custkey") % 7 == 0)
            ),
            2,
        ).withColumn("nk", F.col("nk") + F.lit(30))
        src.merge(churn, "b2")
        mv.refresh()
        p = mv.last_prune
        if not (
            p.get("prune_col") == "c_mktsegment"
            and p.get("files_kept") is not None
            and p["files_kept"] < p["files_live"]
        ):
            raise AssertionError(
                f"recompute did not file-prune to the churned "
                f"partition: {p}"
            )
        out = mv.df().select(
            "c_mktsegment", "cnt",
            F.col("min_nk").cast("long").alias("min_nk"),
            F.col("max_nk").cast("long").alias("max_nk"),
        ).orderBy("c_mktsegment")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_retype(spark, sf_dir):
    """Explicit non-widening type change (VERDICT r9 stretch 8,
    maintenance.rewrite_column_type): in-band int→string stays REJECTED
    (known-limit 2); the maintenance command rewrites every live file
    in one 'retype' commit. Seed customers < SUBSET with nk=int
    nationkey; retype nk to string; post-retype churn upserts %6 keys
    with a string-shaped value ('N<nk+1>'). The fixture also asserts
    time travel to the pre-retype version still reads int (version-
    scoped read schemas). Result = final snapshot, oracled as a replay
    CAST in DuckDB."""
    from hudi_spark_plus_spark.table.maintenance import rewrite_column_type

    work = tempfile.mkdtemp(prefix="hsp_lakeq_")
    try:
        c = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        seed = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            F.col("c_nationkey").cast("int").alias("nk"),
        )
        src = LakeTable(spark, work + "/src", buckets=3)
        src.merge(seed, "b1")
        st = rewrite_column_type(src, "nk", "string")
        if (st["from"], st["to"]) != ("int", "string"):
            raise AssertionError(f"unexpected retype record: {st}")
        old = src.snapshot(version=1)
        if dict(old.dtypes)["nk"] != "int":
            raise AssertionError(
                "pre-retype version must read with its own (int) schema"
            )
        churn = c.where(F.col("c_custkey") % 6 == 0).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            F.concat(
                F.lit("N"), (F.col("c_nationkey") + 1).cast("string")
            ).alias("nk"),
        )
        src.merge(churn, "b2")
        out = src.snapshot().select("c_custkey", "nk").orderBy("c_custkey")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_ndv(spark, sf_dir):
    """Approximate NDV from per-file HLL sketches (table/ndv.py — the
    fourth metadata aggregate beside exact stats_count/stats_minmax).
    200 customers in 8 buckets, then a NARROW churn (%50==17 deleted)
    so most buckets stay tombstone-free: those files answer from their
    stored sketch (asserted), while the rewritten tombstone-holding
    files are scanned (HLL cannot subtract a deleted value — a trusted
    stale sketch would still count the deleted c_name). ESTIMATES are
    asserted within 5%% in-fixture (q16's approx-agg doctrine: sketches
    differ across engines by design, so the hash-checked payload is the
    EXACT distinct counts, replayed by DuckDB as COUNT(DISTINCT))."""
    from hudi_spark_plus_spark.table import ndv as _ndv

    bound = 200
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") < bound
    )
    work = tempfile.mkdtemp(prefix="hsp_ndvq_")
    try:
        lake = LakeTable(spark, f"{work}/t", buckets=8)
        lake.merge(
            c.select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(1).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_name",
            ),
            "b1",
        )
        _ndv.create_ndv_sketch(lake, "c_name")
        lake.merge(
            c.where(F.col("c_custkey") % 50 == 17).select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(2).cast("long").alias("_ts"),
                F.lit("delete").alias("_op"),
                "c_custkey",
                "c_name",
            ),
            "b2",
        )
        got = _ndv.approx_ndv(lake, "c_name")
        snap = lake.snapshot()
        exact_name = snap.agg(F.countDistinct("c_name")).first()[0]
        exact_key = snap.agg(F.countDistinct("c_custkey")).first()[0]
        # clean buckets answer from sketches; the rewritten ones scan
        assert got["files_sketched"] > 0, got
        assert got["files_scanned"] > 0, got
        assert (
            abs(got["estimate"] - exact_name) <= max(1, exact_name * 0.05)
        ), (got, exact_name)
        return local_frame(spark, 
            [
                ("distinct_name", int(exact_name)),
                ("distinct_key", int(exact_key)),
            ],
            "metric string, value long",
        ).orderBy("metric")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_clone(spark, sf_dir):
    """Zero-copy shallow clone (table/clone.py — the Delta SHALLOW
    CLONE analogue): the standard two-batch COW fixture is cloned
    metadata-only, then BOTH sides diverge — the clone upserts +2000
    for %5==0 keys, the source deletes %11==0 keys — and the result is
    both final states side-tagged. The clone continues the source's
    version space (asserted: base = source latest + 1), its divergence
    writes land under its own root, and neither side sees the other's
    change; DuckDB replays both lineages from first principles."""
    from hudi_spark_plus_spark.table.clone import clone_table

    work = tempfile.mkdtemp(prefix="hsp_cloneq_")
    try:
        src = _build_lake(spark, sf_dir, f"{work}/src", "cow")
        c = clone_table(spark, src, f"{work}/dst")
        assert c.log.latest().version == src.log.latest().version + 1
        base = load_table(spark, sf_dir, "customer").where(
            F.col("c_custkey") < SUBSET
        )
        c.merge(
            base.where(F.col("c_custkey") % 5 == 0).select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(3).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "c_custkey",
                "c_name",
                F.round(
                    F.col("c_acctbal")
                    + F.when(F.col("c_custkey") % 3 == 0, 1000.0).otherwise(0.0)
                    + 2000.0,
                    4,
                ).alias("acctbal"),
            ),
            "c1",
        )
        src.merge(
            base.where(F.col("c_custkey") % 11 == 0).select(
                F.col("c_custkey").cast("string").alias("_key"),
                F.lit(3).cast("long").alias("_ts"),
                F.lit("delete").alias("_op"),
                "c_custkey",
                "c_name",
                F.round("c_acctbal", 4).alias("acctbal"),
            ),
            "s3",
        )
        out = (
            src.snapshot()
            .select(F.lit("src").alias("side"), "c_custkey",
                    F.round("acctbal", 4).alias("acctbal"))
            .unionByName(
                c.snapshot().select(
                    F.lit("clone").alias("side"), "c_custkey",
                    F.round("acctbal", 4).alias("acctbal"),
                )
            )
            .orderBy("side", "c_custkey")
        )
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_lake_meta_agg(spark, sf_dir):
    """Metadata-only aggregates (stats_count/stats_minmax,
    lake_table.py — the Hudi metadata-table / Delta stats COUNT(*)
    fast path): snapshot COUNT answered from per-file ``live_rows``
    manifest arithmetic, MIN/MAX from col_stats where provably exact.
    COW fixture: 200 customers inserted, then %50==3 updated (+1000)
    and %50==17 deleted — the COW count must cost ZERO data reads
    (asserted), and min/max must reject the tombstone-holding rewritten
    files while serving clean buckets from metadata (asserted). MOR
    fixture: same batches as deltas — only delta-touched buckets may
    scan (asserted), values identical. The DuckDB oracle recomputes
    every metric from first principles, so a metadata shortcut that
    drifts from scan truth (e.g. a deleted extremum surfacing, or a
    superseded MOR version double-counted) hash-mismatches."""
    bound = 200
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") < bound
    )

    def batches():
        b1 = c.select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "c_custkey",
            F.round("c_acctbal", 4).alias("acctbal"),
        )
        b2 = c.where(
            (F.col("c_custkey") % 50 == 3) | (F.col("c_custkey") % 50 == 17)
        ).select(
            F.col("c_custkey").cast("string").alias("_key"),
            F.lit(2).cast("long").alias("_ts"),
            F.when(F.col("c_custkey") % 50 == 17, "delete")
            .otherwise("upsert")
            .alias("_op"),
            "c_custkey",
            F.round(F.col("c_acctbal") + 1000.0, 4).alias("acctbal"),
        )
        return b1, b2

    rows = []
    cow_minmax = None
    work = tempfile.mkdtemp(prefix="hsp_metaagg_")
    try:
        for mode in ("cow", "mor"):
            lake = LakeTable(spark, f"{work}/{mode}", buckets=8)
            b1, b2 = batches()
            lake.merge(b1, "b1", mode=mode)
            lake.merge(b2, "b2", mode=mode)
            sc = lake.stats_count()
            mm = lake.stats_minmax("acctbal")
            mk = lake.stats_minmax("c_custkey")
            if mode == "cow":
                # the headline 100-TB contract: a COW COUNT(*) is pure
                # manifest arithmetic — zero files read
                assert sc["files_scanned"] == 0, sc
                # DOUBLE columns never trust footer stats (NaN handling
                # is writer-dependent, ADVICE r10 #2): acctbal scans...
                assert mm["files_metadata"] == 0, mm
                # ...while the LONG key column (no NaN to mistrust)
                # serves clean files from metadata and scans ONLY the
                # tombstone-holding ones — exactly the live files where
                # live_rows != rows (a deleted row may BE the extremum)
                assert mk["files_metadata"] > 0, mk
                dirty = sum(
                    1
                    for f in lake.log.live_files()
                    if f.live_rows is not None
                    and f.live_rows != f.rows
                    and f.live_rows != 0  # all-tombstone files skip
                )
                assert mk["files_scanned"] == dirty, (mk, dirty)
                cow_minmax = (float(mm["min"]), float(mm["max"]))
                rows.append(("min_custkey", float(mk["min"])))
                rows.append(("max_custkey", float(mk["max"])))
                rows.append(("cow_v1_count", float(
                    lake.stats_count(version=1)["count"]
                )))
                rows.append(("min_acctbal", cow_minmax[0]))
                rows.append(("max_acctbal", cow_minmax[1]))
            else:
                # MOR: only delta-touched bucket numbers pay a scan
                assert sc["files_metadata"] > 0, sc
                assert 0 < sc["files_scanned"], sc
                assert (mm["min"], mm["max"]) == cow_minmax, (
                    "MOR metadata min/max diverged from COW"
                )
            rows.append((f"{mode}_count", float(sc["count"])))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return local_frame(spark, 
        rows, "metric string, value double"
    ).orderBy("metric")


LAKE_QUERIES = {
    "q-lake-ndv": q_lake_ndv,
    "q-lake-clone": q_lake_clone,
    "q-lake-meta-agg": q_lake_meta_agg,
    "q-lake-matview": q_lake_matview,
    "q-lake-matview-avg": q_lake_matview_avg,
    "q-lake-matview-ndv": q_lake_matview_ndv,
    "q-lake-matview-join": q_lake_matview_join,
    "q-lake-matview-join-minmax": q_lake_matview_join_minmax,
    "q-lake-matview-pctl": q_lake_matview_pctl,
    "q-lake-record-history": q_lake_record_history,
    "q-lake-record-history-batch": q_lake_record_history_batch,
    "q-lake-matview-minmax": q_lake_matview_minmax,
    "q-lake-matview-pruned": q_lake_matview_pruned,
    "q-lake-retype": q_lake_retype,
    "q-lake-functional-index": q_lake_functional_index,
    "q-lake-partial-update": q_lake_partial_update,
    "q-lake-secondary-index": q_lake_secondary_index,
    "q-lake-merge-into": q_lake_merge_into,
    "q-lake-dml": q_lake_dml,
    "q-lake-bootstrap": q_lake_bootstrap,
    "q-lake-stream-sink": q_lake_stream_sink,
    "q-lake-format-write": q_lake_format_write,
    "q-lake-cdc-source": q_lake_cdc_source,
    "q-lake-batch-source": q_lake_batch_source,
    "q-lake-cdc-feed": q_lake_cdc_feed,
    "q-lake-savepoint": q_lake_savepoint,
    "q-lake-global-index": q_lake_global_index,
    "q-lake-timepart": q_lake_timepart,
    "q-lake-overwrite": q_lake_overwrite,
    "q-lake-partitioned": q_lake_partitioned,
    "q-lake-zorder": q_lake_zorder,
    "q-lake-compact": q_lake_compact,
    "q-lake-concurrent": q_lake_concurrent,
    "q-lake-mor-ro": q_lake_mor_ro,
    "q-lake-history": q_lake_history,
    "q-lake-colstats": q_lake_colstats,
    "q-lake-rollback": q_lake_rollback,
    "q-lake-derived": q_lake_derived,
    "q-lake-evolve": q_lake_evolve,
    "q-lake-roundtrip": q_lake_roundtrip,
    "q-lake-mor": q_lake_mor,
    "q-lake-point-lookup": q_lake_point_lookup,
    "q-lake-time-travel": q_lake_time_travel,
    "q-lake-incremental": q_lake_incremental,
    "q-lake-incremental-mor": q_lake_incremental_mor,
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

# batch 2's winners: updates carry +1000 acctbal, deletes are tombstones
# whose payload is the deleting batch's row (also +1000 by construction)
_INCREMENTAL_ORACLE = f"""
        SELECT c_custkey,
               CAST(c_custkey % 7 = 0 AS INT) AS deleted,
               ROUND(c_acctbal + 1000.0, 4) AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET}
          AND (c_custkey % 3 = 0 OR c_custkey % 7 = 0)
        ORDER BY c_custkey
    """

LAKE_ORACLES = {
    # the hash-checked payload is EXACT distinct counts over the live
    # two-batch state (q16 doctrine: the HLL estimate is asserted
    # in-fixture, never hashed — sketches differ across engines)
    "q-lake-ndv": """
        WITH live AS (
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey < 200 AND c_custkey % 50 <> 17
        )
        SELECT * FROM (
            SELECT 'distinct_key' AS metric,
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS value
            FROM live
            UNION ALL
            SELECT 'distinct_name',
                   CAST(COUNT(DISTINCT c_name) AS BIGINT) FROM live
        ) ORDER BY metric
    """,
    # both lineages replayed from first principles: src = two-batch
    # state minus %11 deletes; clone = two-batch state with %5 keys
    # re-upserted at +2000 (on top of the %3 +1000 where both apply)
    "q-lake-clone": f"""
        WITH c AS (
            SELECT * FROM customer WHERE c_custkey < {SUBSET}
        ),
        two_batch AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 3 = 0
                        THEN ROUND(c_acctbal + 1000.0, 4)
                        ELSE ROUND(c_acctbal, 4) END AS acctbal
            FROM c WHERE c_custkey % 7 <> 0
        )
        SELECT * FROM (
            SELECT 'src' AS side, c_custkey, acctbal
            FROM two_batch WHERE c_custkey % 11 <> 0
            UNION ALL
            -- the %5 upsert also RESURRECTS %7-deleted keys (its _ts 3
            -- beats the tombstone), hence the widened WHERE
            SELECT 'clone', c_custkey,
                   CASE WHEN c_custkey % 5 = 0
                        THEN ROUND(c_acctbal
                             + CASE WHEN c_custkey % 3 = 0
                                    THEN 1000.0 ELSE 0.0 END
                             + 2000.0, 4)
                        WHEN c_custkey % 3 = 0
                        THEN ROUND(c_acctbal + 1000.0, 4)
                        ELSE ROUND(c_acctbal, 4) END AS acctbal
            FROM c
            WHERE c_custkey % 7 <> 0 OR c_custkey % 5 = 0
        ) ORDER BY side, c_custkey
    """,
    # Every metric recomputed from first principles: live = inserted
    # minus deletes, updates applied. A metadata shortcut that diverges
    # from scan truth cannot hash-match.
    "q-lake-meta-agg": """
        WITH c AS (SELECT * FROM customer WHERE c_custkey < 200),
        live AS (
            SELECT CASE WHEN c_custkey % 50 = 3
                        THEN ROUND(c_acctbal + 1000.0, 4)
                        ELSE ROUND(c_acctbal, 4) END AS acctbal
            FROM c WHERE c_custkey % 50 <> 17)
        SELECT * FROM (
            SELECT 'cow_count' AS metric,
                   CAST((SELECT COUNT(*) FROM live) AS DOUBLE) AS value
            UNION ALL
            SELECT 'cow_v1_count',
                   CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
            UNION ALL
            SELECT 'mor_count',
                   CAST((SELECT COUNT(*) FROM live) AS DOUBLE)
            UNION ALL
            SELECT 'min_acctbal', (SELECT MIN(acctbal) FROM live)
            UNION ALL
            SELECT 'max_acctbal', (SELECT MAX(acctbal) FROM live)
            UNION ALL
            SELECT 'min_custkey',
                   (SELECT CAST(MIN(c_custkey) AS DOUBLE) FROM c
                    WHERE c_custkey % 50 <> 17)
            UNION ALL
            SELECT 'max_custkey',
                   (SELECT CAST(MAX(c_custkey) AS DOUBLE) FROM c
                    WHERE c_custkey % 50 <> 17)
        ) ORDER BY metric
    """,
    # MERGE INTO: [half, top) updated/inserted at +500, then every 10th
    # key under top deleted; keys < half keep base balances
    "q-lake-merge-into": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey >= {SUBSET // 2}
                    THEN ROUND(c_acctbal + 500.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET + SUBSET // 2}
          AND c_custkey % 10 <> 0
        ORDER BY c_custkey
    """,
    # predicate DML: snapshot = non-%7 keys with +1000 on %3; the
    # incremental slice shows updates (%3) and tombstones (%7) — a %21
    # key was updated BEFORE its delete, so its tombstone carries the
    # updated balance (tombstone payload = matched row, delete_where)
    # matview replay: from-scratch GROUP BY of the final source state
    # (%9 deleted — taking precedence over %5 — %5 moved to 'MOVED',
    # [SUBSET, SUBSET+15) inserted as 'NEW')
    "q-lake-matview": f"""
        WITH final AS (
          SELECT CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment,
                 c_nationkey
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 9 <> 0
          UNION ALL
          SELECT 'NEW' AS c_mktsegment, c_nationkey
          FROM customer
          WHERE c_custkey >= {SUBSET} AND c_custkey < {SUBSET + 15}
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(c_nationkey) AS BIGINT) AS sum_nk
        FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # record-history replay: key 1 has seed+update+tombstone states,
    # key 11 seed+update, key 2 seed only (carried copies collapse);
    # the tombstone carries the delete batch's NULL payload
    "q-lake-record-history": """
        WITH k AS (
          SELECT c_custkey, ROUND(c_acctbal, 4) AS bal
          FROM customer WHERE c_custkey IN (1, 2, 11)
        )
        SELECT * FROM (
          SELECT c_custkey AS key, CAST(1 AS BIGINT) AS ver,
                 CAST(1 AS BIGINT) AS ts, FALSE AS deleted, bal FROM k
          UNION ALL
          SELECT c_custkey, 2, 2, FALSE, ROUND(bal + 100.0, 4)
          FROM k WHERE c_custkey % 10 = 1
          UNION ALL
          SELECT c_custkey, 3, 3, TRUE, CAST(NULL AS DOUBLE)
          FROM k WHERE c_custkey % 20 = 1
        ) ORDER BY key, ver
    """,
    # ndv matview replay: exact distinct per group from first
    # principles (cnt comes from the VIEW, exact nd from the final
    # state; the view's HLL estimates are asserted in-fixture)
    "q-lake-matview-ndv": f"""
        WITH final AS (
          SELECT CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment,
                 c_nationkey
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 9 <> 0
          UNION ALL
          SELECT 'NEW' AS c_mktsegment, c_nationkey
          FROM customer
          WHERE c_custkey >= {SUBSET} AND c_custkey < {SUBSET + 15}
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(count(DISTINCT c_nationkey) AS BIGINT) AS nd_nationkey
        FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # join-matview replay: final fact (inserts/deletes/fk re-points
    # applied) joined to final dim (segment moves + deletes applied) —
    # the from-scratch GROUP BY the incremental view must equal
    "q-lake-matview-join": f"""
        WITH fact AS (
          SELECT CASE WHEN o_orderkey % 3 <> 2 AND o_orderkey % 7 <> 0
                           AND o_orderkey % 11 = 3
                      THEN (o_custkey + 7) % {SUBSET}
                      ELSE o_custkey END AS fk,
                 CAST(o_orderkey % 97 AS BIGINT) AS o_units
          FROM orders
          WHERE o_orderkey < {SUBSET * 4}
            AND NOT (o_orderkey % 3 <> 2 AND o_orderkey % 7 = 0)
        ),
        dim AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 9 <> 0
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(o_units) AS BIGINT) AS sum_o_units
        FROM fact JOIN dim ON fk = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # join matview with min/max measures: same replayed churn as
    # q-lake-matview-join plus the o_pri extreme columns
    "q-lake-matview-join-minmax": f"""
        WITH fact AS (
          SELECT CASE WHEN o_orderkey % 3 = 2
                      THEN 1000000 + (o_custkey % 10)
                      WHEN o_orderkey % 7 <> 0 AND o_orderkey % 11 = 3
                      THEN (o_custkey + 7) % {SUBSET}
                      ELSE o_custkey END AS fk,
                 CAST(o_orderkey % 97 AS BIGINT) AS o_units,
                 CAST((o_orderkey * 13) % 251 AS BIGINT) AS o_pri
          FROM orders
          WHERE o_orderkey < {SUBSET * 4}
            AND NOT (o_orderkey % 3 <> 2 AND o_orderkey % 7 = 0)
          UNION ALL
          SELECT CAST(2000000 + (range % 5) AS BIGINT) AS fk,
                 CAST(range AS BIGINT) AS o_units,
                 CAST((range * 17) % 251 AS BIGINT) AS o_pri
          FROM range(20) WHERE range % 4 <> 0
        ),
        dim AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 9 <> 0
          UNION ALL
          SELECT CAST(1000000 + range AS BIGINT) AS c_custkey,
                 'NEW' AS c_mktsegment
          FROM range(10)
          UNION ALL
          SELECT CAST(2000000 + range AS BIGINT) AS c_custkey,
                 'SYN' AS c_mktsegment
          FROM range(5)
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(o_units) AS BIGINT) AS sum_o_units,
               CAST(min(o_pri) AS BIGINT) AS min_o_pri,
               CAST(max(o_pri) AS BIGINT) AS max_o_pri
        FROM fact JOIN dim ON fk = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # pctl matview replay: lossless-regime sketches == exact discrete
    # quantile (quantile_disc); NULL-free by construction
    "q-lake-matview-pctl": f"""
        WITH final AS (
          SELECT CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment,
                 (c_custkey * 37) % 101 AS v
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 9 <> 0
          UNION ALL
          SELECT 'NEW' AS c_mktsegment, (c_custkey * 37) % 101 AS v
          FROM customer
          WHERE c_custkey >= {SUBSET} AND c_custkey < {SUBSET + 15}
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(quantile_disc(v, 0.5) AS DOUBLE) AS p50_v,
               CAST(quantile_disc(v, 0.9) AS DOUBLE) AS p90_v
        FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # batch record-history replay: identical churn to the single-key
    # fixture; the key-set call returns the union of the three keys'
    # states (and nothing for the missing key)
    "q-lake-record-history-batch": """
        WITH k AS (
          SELECT c_custkey, ROUND(c_acctbal, 4) AS bal
          FROM customer WHERE c_custkey IN (1, 2, 11)
        )
        SELECT * FROM (
          SELECT c_custkey AS key, CAST(1 AS BIGINT) AS ver,
                 CAST(1 AS BIGINT) AS ts, FALSE AS deleted, bal FROM k
          UNION ALL
          SELECT c_custkey, 2, 2, FALSE, ROUND(bal + 100.0, 4)
          FROM k WHERE c_custkey % 10 = 1
          UNION ALL
          SELECT c_custkey, 3, 3, TRUE, CAST(NULL AS DOUBLE)
          FROM k WHERE c_custkey % 20 = 1
        ) ORDER BY key, ver
    """,
    # avg matview replay: NULL-aware (AVG divides by non-null count;
    # the 'NEW' group is all-NULL so its avg is NULL while cnt > 0)
    "q-lake-matview-avg": f"""
        WITH final AS (
          SELECT CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment,
                 CASE WHEN c_custkey % 7 = 3 THEN NULL
                      ELSE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
                 END AS bal
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 9 <> 0
          UNION ALL
          SELECT 'NEW' AS c_mktsegment, CAST(NULL AS BIGINT) AS bal
          FROM customer
          WHERE c_custkey >= {SUBSET} AND c_custkey < {SUBSET + 15}
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               ROUND(CAST(sum(bal) AS DOUBLE) / count(bal), 4) AS avg_bal
        FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # min/max matview replay: same churn as q-lake-matview, but the
    # view carries count + min/max of nationkey and name per segment
    # (partial recompute — deletes removed several segments' minima)
    "q-lake-matview-minmax": f"""
        WITH final AS (
          SELECT CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                      ELSE c_mktsegment END AS c_mktsegment,
                 c_nationkey, c_name
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 9 <> 0
          UNION ALL
          SELECT 'NEW' AS c_mktsegment, c_nationkey, c_name
          FROM customer
          WHERE c_custkey >= {SUBSET} AND c_custkey < {SUBSET + 15}
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               min(c_nationkey) AS min_nk,
               max(c_nationkey) AS max_nk,
               min(c_name) AS min_name,
               max(c_name) AS max_name
        FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # pruned partial recompute: BUILDING %7 rows got nationkey+30;
    # every other row is untouched — replay on the final state
    "q-lake-matview-pruned": f"""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(min(nk) AS BIGINT) AS min_nk,
               CAST(max(nk) AS BIGINT) AS max_nk
        FROM (
          SELECT c_mktsegment,
                 CASE WHEN c_mktsegment = 'BUILDING'
                       AND c_custkey % 7 = 0
                      THEN c_nationkey + 30
                      ELSE c_nationkey END AS nk
          FROM customer WHERE c_custkey < {SUBSET}
        )
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # retype replay: every nk became a string at the rewrite; %6 keys
    # then got the post-retype string-shaped upsert
    "q-lake-retype": f"""
        SELECT c_custkey,
               CASE WHEN c_custkey % 6 = 0
                    THEN 'N' || CAST(c_nationkey + 1 AS VARCHAR)
                    ELSE CAST(c_nationkey AS VARCHAR) END AS nk
        FROM customer WHERE c_custkey < {SUBSET}
        ORDER BY c_custkey
    """,
    # functional-index probes: p1 = 1999 orders (pruned through the
    # month expression index), p2 = 2000+ orders (stale-index
    # conservative scan of the post-build batch)
    "q-lake-functional-index": f"""
        SELECT 'p1' AS mode, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS od,
               ROUND(o_totalprice, 4) AS price
        FROM orders
        WHERE o_orderkey < {FNIDX_ORDER_BOUND}
          AND strftime(o_orderdate, '%Y') = '1999'
        UNION ALL
        SELECT 'p2' AS mode, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS od,
               ROUND(o_totalprice, 4) AS price
        FROM orders
        WHERE o_orderkey < {FNIDX_ORDER_BOUND}
          AND strftime(o_orderdate, '%Y') IN ('2000', '2001')
        ORDER BY mode, o_orderkey
    """,
    # partial-update replay: %4 keys got +100 balances (names kept by
    # the NULL sentinel), %6 keys then got VIP names (balances kept by
    # column absence), [SUBSET, SUBSET+10) inserted with NULL balances
    "q-lake-partial-update": f"""
        SELECT c_custkey,
               CASE WHEN c_custkey % 6 = 0
                    THEN 'VIP#' || c_custkey
                    ELSE c_name END AS c_name,
               CASE WHEN c_custkey % 4 = 0
                    THEN ROUND(c_acctbal + 100.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal
        FROM customer WHERE c_custkey < {SUBSET}
        UNION ALL
        SELECT c_custkey, 'VIP#' || c_custkey AS c_name,
               CAST(NULL AS DOUBLE) AS acctbal
        FROM customer
        WHERE c_custkey >= {SUBSET} AND c_custkey < {SUBSET + 10}
        ORDER BY c_custkey
    """,
    # secondary-index probes over deterministic TPC-H names: p1 = the
    # four indexed probe keys; p2 = the late (post-index) key, found
    # via the stale-index conservative scan; p3 = only the RENAMED row
    # (the old name was superseded by the MOR delta)
    "q-lake-secondary-index": f"""
        SELECT 'p1' AS mode, c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN ({", ".join(str(k) for k in SIDX_PROBE_KEYS)})
        UNION ALL
        SELECT 'p2' AS mode, c_custkey, c_name, c_mktsegment
        FROM customer WHERE c_custkey = {SIDX_LATE_KEY}
        UNION ALL
        SELECT 'p3' AS mode, c_custkey,
               'RENAMED#{SIDX_MOVED_KEY}' AS c_name, c_mktsegment
        FROM customer WHERE c_custkey = {SIDX_MOVED_KEY}
        ORDER BY mode, c_custkey
    """,
    "q-lake-dml": f"""
        SELECT 'snap' AS mode, c_custkey, c_name,
               CASE WHEN c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               0 AS deleted
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey % 7 <> 0
        UNION ALL
        SELECT 'incr' AS mode, c_custkey, c_name,
               CASE WHEN c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               CAST(c_custkey % 7 = 0 AS INT) AS deleted
        FROM customer
        WHERE c_custkey < {SUBSET}
          AND (c_custkey % 3 = 0 OR c_custkey % 7 = 0)
        ORDER BY mode, c_custkey
    """,
    # bootstrap fixture: snapshot = LWW over bootstrap + one merge that
    # only touches keys < 34 (updates %3 at +1000, deletes %7); the
    # synthesized record key is the plain string cast of c_custkey;
    # incremental(1) = the merge's winners (tombstones at the deleting
    # batch's +1000 payload)
    "q-lake-bootstrap": f"""
        SELECT 'snap' AS mode, c_custkey,
               CAST(c_custkey AS VARCHAR) AS key, c_name,
               CASE WHEN c_custkey < 34 AND c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               0 AS deleted
        FROM customer
        WHERE c_custkey < {SUBSET}
          AND NOT (c_custkey < 34 AND c_custkey % 7 = 0)
        UNION ALL
        SELECT 'incr' AS mode, c_custkey,
               CAST(c_custkey AS VARCHAR) AS key, c_name,
               ROUND(c_acctbal + 1000.0, 4) AS acctbal,
               CAST(c_custkey % 7 = 0 AS INT) AS deleted
        FROM customer
        WHERE c_custkey < 34
          AND (c_custkey % 3 = 0 OR c_custkey % 7 = 0)
        ORDER BY mode, c_custkey
    """,
    # d=2024-01-02 slice (custkey % 3 = 1): snapshot = live rows at
    # base acctbal (+1000 updates hit % 3 = 0, a different partition);
    # incremental(begin=1) = batch-2 tombstones at the deleting batch's
    # +1000 payload
    "q-lake-batch-source": f"""
        SELECT 'snap' AS mode, c_custkey, c_name,
               ROUND(c_acctbal, 4) AS acctbal, 0 AS deleted
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey % 3 = 1
          AND c_custkey % 7 <> 0
        UNION ALL
        SELECT 'incr' AS mode, c_custkey, c_name,
               ROUND(c_acctbal + 1000.0, 4) AS acctbal, 1 AS deleted
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey % 3 = 1
          AND c_custkey % 7 = 0
        ORDER BY mode, c_custkey
    """,
    # global-index relocation: multiples of 5 live ONLY in 'moved' (at
    # +1000), everyone else keeps their original derived segment
    "q-lake-global-index": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 5 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               CASE WHEN c_custkey % 5 = 0 THEN 'moved'
                    ELSE CAST(c_custkey % 3 AS VARCHAR) END AS s
        FROM customer
        WHERE c_custkey < {SUBSET}
        ORDER BY c_custkey
    """,
    # the CDC feed over (1, 2]: u/d for in-SUBSET changes with original
    # acctbal as the before-image, i for the new key wave with NULL
    # the streamed-in customer subset, order-free final state
    "q-lake-stream-sink": f"""
        SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET}
        ORDER BY c_custkey
    """,
    # two format appends (second idempotently replayed) then a format
    # MOR upsert: wave keys at ver 2 (+1000), surviving updated
    # multiples of 3 at ver 3 (+77), deleted multiples of 7 gone,
    # untouched batch-1 keys at ver 1
    "q-lake-format-write": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey >= {SUBSET}
                         THEN ROUND(c_acctbal + 1000.0, 4)
                    WHEN c_custkey % 3 = 0
                         THEN ROUND(c_acctbal + 77.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               '2024-01-0' || CAST(1 + c_custkey % 3 AS VARCHAR) AS d,
               CAST(CASE WHEN c_custkey >= {SUBSET} THEN 2
                         WHEN c_custkey % 3 = 0 THEN 3
                         ELSE 1 END AS BIGINT) AS ver
        FROM customer
        WHERE c_custkey < {SUBSET} + 20
          AND NOT (c_custkey < {SUBSET} AND c_custkey % 7 = 0)
        ORDER BY c_custkey
    """,
    # identical change classification through the format reader
    "q-lake-cdc-source": f"""
        SELECT CASE
                 WHEN c_custkey >= {SUBSET} THEN 'i'
                 WHEN c_custkey % 7 = 0 THEN 'd'
                 ELSE 'u'
               END AS _change_op,
               CAST(2 AS BIGINT) AS _change_ver,
               c_custkey,
               ROUND(c_acctbal + 1000.0, 4) AS acctbal,
               CASE WHEN c_custkey < {SUBSET}
                    THEN ROUND(c_acctbal, 4) END AS before_acctbal
        FROM customer
        WHERE (c_custkey < {SUBSET}
               AND (c_custkey % 3 = 0 OR c_custkey % 7 = 0))
           OR (c_custkey >= {SUBSET} AND c_custkey < {SUBSET} + 20)
        ORDER BY c_custkey
    """,
    "q-lake-cdc-feed": f"""
        SELECT CASE
                 WHEN c_custkey >= {SUBSET} THEN 'i'
                 WHEN c_custkey % 7 = 0 THEN 'd'
                 ELSE 'u'
               END AS _change_op,
               CAST(2 AS BIGINT) AS _change_ver,
               c_custkey,
               ROUND(c_acctbal + 1000.0, 4) AS acctbal,
               CASE WHEN c_custkey < {SUBSET}
                    THEN ROUND(c_acctbal, 4) END AS before_acctbal
        FROM customer
        WHERE (c_custkey < {SUBSET}
               AND (c_custkey % 3 = 0 OR c_custkey % 7 = 0))
           OR (c_custkey >= {SUBSET} AND c_custkey < {SUBSET} + 20)
        ORDER BY c_custkey
    """,
    # savepoint + restore rewinds to the pristine batch-1 state
    "q-lake-savepoint": f"""
        SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET}
        ORDER BY c_custkey
    """,
    # UTC-day derivation replayed in DuckDB; "last 2 days" = the two
    # greatest distinct day strings, matching partition_values()[-2:]
    "q-lake-timepart": """
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(ts) AS ts_us,
                   strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d') AS day
            FROM events WHERE event_id % 47 = 0
        )
        SELECT event_id, user_id, event_type, ts_us
        FROM e
        WHERE day >= (
            SELECT MIN(day) FROM (
                SELECT DISTINCT day FROM e ORDER BY day DESC LIMIT 2
            )
        )
        ORDER BY event_id
    """,
    # final state after the replacecommit timeline: partition 01
    # (custkey%3==0) untouched, partition 02 (custkey%3==1) replaced
    # with only its even custkeys at +500, partition 03 dropped
    "q-lake-overwrite": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 3 = 1
                    THEN ROUND(c_acctbal + 500.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               '2024-01-0' || CAST(1 + c_custkey % 3 AS VARCHAR) AS d
        FROM customer
        WHERE c_custkey < {SUBSET}
          AND (c_custkey % 3 = 0
               OR (c_custkey % 3 = 1 AND c_custkey % 2 = 0))
        ORDER BY c_custkey
    """,
    # partitions 2024-01-01..02 = custkey % 3 in (0, 1); merge semantics
    # identical to the roundtrip, plus the derived partition column
    "q-lake-partitioned": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               '2024-01-0' || CAST(1 + c_custkey % 3 AS VARCHAR) AS d
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey % 7 <> 0
          AND c_custkey % 3 IN (0, 1)
        ORDER BY c_custkey
    """,
    # layout rewrite is logically invisible: unchanged roundtrip state
    "q-lake-zorder": _ROUNDTRIP_ORACLE,
    # compaction + vacuum are logically invisible too
    "q-lake-compact": _ROUNDTRIP_ORACLE,
    # post-compaction the RO view converges to the real-time state
    "q-lake-mor-ro": _ROUNDTRIP_ORACLE,
    # pruned value-range scan == plain filtered roundtrip state
    "q-lake-colstats": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey % 7 <> 0
          AND c_custkey BETWEEN 10 AND 30
        ORDER BY c_custkey
    """,
    # deterministic timeline: two merges of the full key subset (rows
    # include tombstones, so both commits carry every key)
    "q-lake-history": f"""
        SELECT 1 AS version, 'merge' AS operation, 'b1' AS batch_id,
               (SELECT COUNT(*) FROM customer WHERE c_custkey < {SUBSET})
                   AS n_rows
        UNION ALL
        SELECT 2, 'merge', 'b2',
               (SELECT COUNT(*) FROM customer WHERE c_custkey < {SUBSET})
        ORDER BY version
    """,
    # disjoint halves: evens +100 (writer 0), odds > 1 +200 (writer 1),
    # custkey 1 from the seed at its original balance (LWW: seed _ts=99)
    "q-lake-concurrent": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey = 1 THEN ROUND(c_acctbal, 4)
                    WHEN c_custkey % 2 = 0 THEN ROUND(c_acctbal + 100.0, 4)
                    ELSE ROUND(c_acctbal + 200.0, 4) END AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey >= 1
        ORDER BY c_custkey
    """,
    # the corruption must be invisible: same oracle as the roundtrip
    # history that never had it
    "q-lake-rollback": _ROUNDTRIP_ORACLE,
    # full recompute over the settled source state (the incremental
    # path must be indistinguishable from it); round_even = Spark rint
    "q-lake-derived": f"""
        WITH fs AS (
          SELECT c_custkey % 10 AS grp,
                 CASE WHEN c_custkey % 3 = 0
                      THEN ROUND(c_acctbal + 1000.0, 4)
                      ELSE ROUND(c_acctbal, 4) END AS acctbal
          FROM customer
          WHERE c_custkey < {SUBSET} AND c_custkey % 7 <> 0
        )
        SELECT grp, COUNT(*) AS cnt,
               CAST(SUM(CAST(round_even(acctbal * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS bal_micros
        FROM fs GROUP BY grp ORDER BY grp
    """,
    # final state after rename+drop+batch3: %5 rows carry +5000 balance
    # and the re-added UPPER(c_name); batch-2 deletes (%7) stay gone
    # unless revived by batch 3 (ts 3 > tombstone ts 2); everyone else
    # keeps their pre-evolution balance under the new name with NULL
    # c_name (the drop)
    "q-lake-evolve": f"""
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0
                    THEN ROUND(c_acctbal + 5000.0, 4)
                    WHEN c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS balance,
               CASE WHEN c_custkey % 5 = 0 THEN upper(c_name)
                    ELSE NULL END AS c_name
        FROM customer
        WHERE c_custkey < {SUBSET}
          AND (c_custkey % 5 = 0 OR c_custkey % 7 <> 0)
        ORDER BY c_custkey
    """,
    "q-lake-roundtrip": _ROUNDTRIP_ORACLE,
    "q-lake-mor": _ROUNDTRIP_ORACLE,
    "q-lake-point-lookup": f"""
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 3 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal
        FROM customer
        WHERE c_custkey < {SUBSET} AND c_custkey % 11 = 0
          AND c_custkey % 7 <> 0
        ORDER BY c_custkey
    """,
    "q-lake-incremental": _INCREMENTAL_ORACLE,
    "q-lake-incremental-mor": _INCREMENTAL_ORACLE,
    # batch 1's state: every key < SUBSET at its original acctbal
    "q-lake-time-travel": f"""
        SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal
        FROM customer WHERE c_custkey < {SUBSET}
        ORDER BY c_custkey
    """,
}
