"""CDC check queries q-cdc-1..3 (FIXTURES.md §2/§3) over a deterministic
fixture derived from ``orders``.

The driver's DuckDB oracle only pre-registers the ten testdata tables, so
``cdc_events`` is derived — identically in Spark and in the oracle SQL
(pure integer arithmetic on ``orders``, no randomness) — giving the CDC
semantics a real hash-checked oracle:

* q-cdc-1: last-write-wins dedup (N8/N9), ties broken by arrival seq
* q-cdc-2: upsert/delete split cardinality (N11)
* q-cdc-3: END-TO-END — wrap the events into real JSON envelopes, run the
  full engine pipeline (parse -> key -> dedup -> merge) through THREE
  sequential micro-batches into four lake tables under a temp dir, read
  the final snapshots back; must equal the oracle's single SQL replay.
"""

from __future__ import annotations

import json
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from hudi_spark_plus_spark.localdf import local_frame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from hudi_spark_plus_spark.operators.sync import sync_batch
from hudi_spark_plus_spark.plans import config as cfg
from hudi_spark_plus_spark.sources.loaders import load_table
from hudi_spark_plus_spark.table.lake_table import LakeTable

# Identical derivation in both engines: ~4 (db, table) routes, ~200 keys
# per route -> multiple versions per key, 1/7 deletes, coarse ts with
# duplicates (tie-break coverage), seq = unique arrival order.
_DERIVE_EXPRS = [
    "o_orderkey AS seq",
    "CASE WHEN o_orderkey % 2 = 0 THEN 'db1' ELSE 'db2' END AS db_name",
    "CASE WHEN o_orderkey % 3 = 0 THEN 't_order' ELSE 't_customer' END AS table_name",
    "CASE WHEN o_orderkey % 7 = 0 THEN 'delete' "
    "WHEN o_orderkey % 5 = 0 THEN 'insert' ELSE 'update' END AS op",
    "CAST(1723500000 + (o_orderkey % 50) AS BIGINT) AS ts",
    "o_custkey % 200 AS key_id",
    "o_orderstatus AS col_a",
    "o_totalprice AS col_b",
]

CDC_EVENTS_CTE = """
    WITH cdc_events AS (
      SELECT o_orderkey AS seq,
             CASE WHEN o_orderkey % 2 = 0 THEN 'db1' ELSE 'db2' END AS db_name,
             CASE WHEN o_orderkey % 3 = 0 THEN 't_order'
                  ELSE 't_customer' END AS table_name,
             CASE WHEN o_orderkey % 7 = 0 THEN 'delete'
                  WHEN o_orderkey % 5 = 0 THEN 'insert'
                  ELSE 'update' END AS op,
             CAST(1723500000 + (o_orderkey % 50) AS BIGINT) AS ts,
             o_custkey % 200 AS key_id,
             o_orderstatus AS col_a,
             o_totalprice AS col_b
      FROM orders
    )
"""

ROW_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("key_id", LongType()),
        StructField("col_a", StringType()),
        StructField("col_b", DoubleType()),
    ]
)


def derive_cdc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").selectExpr(*_DERIVE_EXPRS)


def build_envelopes(events: DataFrame) -> DataFrame:
    """Flat events -> one JSON change envelope per (db, table, ts, op)
    group, matching the reference format exactly
    (BinlogSyncHoodieCommand.scala:44-52; FIXTURES.md §4)."""
    schema_json = json.dumps(json.loads(ROW_SCHEMA.json()))
    rows = (
        events.groupBy("db_name", "table_name", "ts", "op")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("seq", "key_id", "col_a", "col_b"))
            ).alias("rows")
        )
    )
    return rows.select(
        F.to_json(
            F.struct(
                F.col("db_name").alias("databaseName"),
                F.col("table_name").alias("tableName"),
                F.lit(schema_json).alias("schema"),
                F.col("op").alias("type"),
                F.col("ts").alias("timestamp"),
                F.col("rows").alias("rows"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )


def sync_options(base_path: str) -> dict[str, str]:
    """Reference-API options for the four fixture tables (README.md
    surface: templated global path + per-table namespaced keys)."""
    opts = {
        cfg.HOODIE_PATH: base_path + "/{db}/ods_{db}_{table}",
        cfg.SOURCE_SHUFFLE_PARALLELISM: "8",
        cfg.SINK_SHUFFLE_PARALLELISM: "4",
        cfg.DEDUP_ORDER_FIELDS: "seq",
        cfg.BUCKETS: "4",
    }
    for db in ("db1", "db2"):
        for t in ("t_customer", "t_order"):
            p = f"{db}.{t}."
            opts[p + cfg.RECORDKEY_FIELD] = "key_id"
            opts[p + cfg.PRECOMBINE_FIELD] = "seq"
            opts[p + cfg.TABLE_NAME] = f"ods_{db}_{t}"
    return opts


def run_cdc_pipeline(
    spark: SparkSession, sf_dir: str, n_batches: int = 3
) -> DataFrame:
    """q-cdc-3 engine side: envelopes -> n sequential micro-batches ->
    four lake tables -> final snapshots unioned."""
    events = derive_cdc_events(spark, sf_dir)
    max_seq = events.agg(F.max("seq")).first()[0]
    step = max_seq // n_batches + 1
    work = tempfile.mkdtemp(prefix="hsp_cdc_")
    opts = sync_options(work)
    try:
        for b in range(n_batches):
            lo, hi = b * step, (b + 1) * step
            env = build_envelopes(
                events.where((F.col("seq") >= lo) & (F.col("seq") < hi))
            )
            sync_batch(spark, env, opts, batch_id=b)
        out = None
        for db in ("db1", "db2"):
            for t in ("t_customer", "t_order"):
                lake = LakeTable(
                    spark, f"{work}/{db}/ods_{db}_{t}", buckets=4
                )
                snap = lake.snapshot().select(
                    F.lit(db).alias("db_name"),
                    F.lit(t).alias("table_name"),
                    "key_id",
                    "col_a",
                    F.round("col_b", 4).alias("col_b"),
                )
                out = snap if out is None else out.unionByName(snap)
        # materialize before the temp dir disappears
        result = out.orderBy("db_name", "table_name", "key_id")
        rows = result.collect()
        return local_frame(spark, rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_cdc_1(spark, sf_dir):
    """LWW dedup over the flat fixture — engine primitive N9 (window
    row_number, single shuffle)."""
    ev = derive_cdc_events(spark, sf_dir)
    w = Window.partitionBy("db_name", "table_name", "key_id").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("db_name", "table_name", "key_id", "op", "col_a")
        .orderBy("db_name", "table_name", "key_id")
    )


def q_cdc_2(spark, sf_dir):
    """Upsert/delete split cardinality after dedup (N11)."""
    ev = derive_cdc_events(spark, sf_dir)
    w = Window.partitionBy("db_name", "table_name", "key_id").orderBy(
        F.col("ts").desc(), F.col("seq").desc()
    )
    surv = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        surv.withColumn(
            "bucket",
            F.when(F.col("op") == "delete", "delete").otherwise("upsert"),
        )
        .groupBy("db_name", "table_name", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("db_name", "table_name", "bucket")
    )


def q_cdc_3(spark, sf_dir):
    """Full envelope->lake-table pipeline vs SQL replay (H1/H2/H5/Q5)."""
    return run_cdc_pipeline(spark, sf_dir)


# -- q-cdc-4: in-band schema WIDENING mid-stream ----------------------------

_WIDE_INT_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("key_id", LongType()),
        StructField("col_w", IntegerType()),
    ]
)
_WIDE_LONG_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("key_id", LongType()),
        StructField("col_w", LongType()),
    ]
)


def derive_wide_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table widening fixture: deterministic subset of orders."""
    return load_table(spark, sf_dir, "orders").where("o_orderkey % 11 = 0").selectExpr(
        "o_orderkey AS seq",
        "o_custkey % 50 AS key_id",
        "CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'update' END AS op",
        "CAST(1723500000 + (o_orderkey % 40) AS BIGINT) AS ts",
    )


def build_wide_envelopes(events: DataFrame, row_schema: StructType) -> DataFrame:
    """Envelope builder with a CALLER-declared in-band schema — the
    widening scenario is precisely 'a later envelope declares a wider
    type for an existing column'."""
    schema_json = json.dumps(json.loads(row_schema.json()))
    rows = events.groupBy("ts", "op").agg(
        F.sort_array(
            F.collect_list(F.struct("seq", "key_id", "col_w"))
        ).alias("rows")
    )
    return rows.select(
        F.to_json(
            F.struct(
                F.lit("db1").alias("databaseName"),
                F.lit("t_wide").alias("tableName"),
                F.lit(schema_json).alias("schema"),
                F.col("op").alias("type"),
                F.col("ts").alias("timestamp"),
                F.col("rows").alias("rows"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )


def q_cdc_4(spark, sf_dir):
    """Mid-stream type widening end-to-end: batch 0 declares ``col_w``
    as INT (values fit int32), batch 1 re-declares it BIGINT with values
    beyond int32. The merge must widen the stored schema (int->bigint),
    keep batch-0 rows readable from their untouched int32 files, and the
    final snapshot must equal the oracle's all-bigint SQL replay."""
    ev = derive_wide_events(spark, sf_dir)
    max_seq = ev.agg(F.max("seq")).first()[0] or 0
    mid = max_seq // 2
    work = tempfile.mkdtemp(prefix="hsp_cdcw_")
    opts = {
        cfg.HOODIE_PATH: work + "/{db}/ods_{db}_{table}",
        cfg.SOURCE_SHUFFLE_PARALLELISM: "8",
        cfg.SINK_SHUFFLE_PARALLELISM: "4",
        cfg.DEDUP_ORDER_FIELDS: "seq",
        cfg.BUCKETS: "4",
        "db1.t_wide." + cfg.RECORDKEY_FIELD: "key_id",
        "db1.t_wide." + cfg.PRECOMBINE_FIELD: "seq",
        "db1.t_wide." + cfg.TABLE_NAME: "ods_db1_t_wide",
    }
    try:
        b0 = ev.where(F.col("seq") < mid).withColumn(
            "col_w", F.expr("CAST(key_id * 3 + seq % 7 AS INT)")
        )
        b1 = ev.where(F.col("seq") >= mid).withColumn(
            "col_w", F.expr("CAST(5000000000 + key_id AS BIGINT)")
        )
        s0 = sync_batch(
            spark, build_wide_envelopes(b0, _WIDE_INT_SCHEMA), opts, batch_id=0
        )
        s1 = sync_batch(
            spark, build_wide_envelopes(b1, _WIDE_LONG_SCHEMA), opts, batch_id=1
        )
        assert s0.get("db1.t_wide") == "ok" and s1.get("db1.t_wide") == "ok", (
            s0, s1,
        )
        lake = LakeTable(spark, f"{work}/db1/ods_db1_t_wide")
        result = (
            lake.snapshot().select("key_id", "col_w").orderBy("key_id")
        )
        rows = result.collect()
        return local_frame(spark, rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -- q-cdc-partitioned: H4 partition half through the FULL config chain -----

_PART_ROW_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("key_id", LongType()),
        StructField("part_d", StringType()),
        StructField("col_a", StringType()),
    ]
)


def derive_part_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table partitioned fixture: each key's partition value is a
    FUNCTION of the key (key_id % 3 -> p0/p1/p2), so a key never moves
    between partitions — the well-formed CDC shape for Hudi's
    non-global index."""
    return (
        load_table(spark, sf_dir, "orders")
        .where("o_orderkey % 4 = 1")
        .selectExpr(
            "o_orderkey AS seq",
            "CASE WHEN o_orderkey % 7 = 0 THEN 'delete' "
            "WHEN o_orderkey % 5 = 0 THEN 'insert' ELSE 'update' END AS op",
            "CAST(1723500000 + (o_orderkey % 50) AS BIGINT) AS ts",
            "o_custkey % 120 AS key_id",
            "concat('p', CAST((o_custkey % 120) % 3 AS STRING)) AS part_d",
            "o_orderstatus AS col_a",
        )
    )


def build_part_envelopes(events: DataFrame) -> DataFrame:
    schema_json = json.dumps(json.loads(_PART_ROW_SCHEMA.json()))
    rows = events.groupBy("ts", "op").agg(
        F.sort_array(
            F.collect_list(F.struct("seq", "key_id", "part_d", "col_a"))
        ).alias("rows")
    )
    return rows.select(
        F.to_json(
            F.struct(
                F.lit("dbp").alias("databaseName"),
                F.lit("t_part").alias("tableName"),
                F.lit(schema_json).alias("schema"),
                F.col("op").alias("type"),
                F.col("ts").alias("timestamp"),
                F.col("rows").alias("rows"),
            ),
            {"ignoreNullFields": "false"},
        ).alias("value")
    )


def q_cdc_partitioned(spark, sf_dir):
    """H4's partition half through the FULL reference config chain
    (README.md:59,65 / BinlogSyncHoodieCommand.scala:99-102):
    ``hoodie.datasource.write.keygenerator.class =
    SimpleKeyGenerator`` + ``hoodie.datasource.write.partitionpath.
    field = part_d`` -> plans/config -> sync -> LakeTable. Two
    micro-batches of envelopes land in a PARTITIONED lake table;
    asserts inline that the layout (``_part=pX`` dirs), the persisted
    partition metadata (no-arg reopen), and structural pruning all
    engage; returns a partition-pruned snapshot (p0+p2 only) that must
    equal the oracle's LWW replay filtered to those partitions."""
    import glob as _glob
    import os as _os

    ev = derive_part_events(spark, sf_dir)
    max_seq = ev.agg(F.max("seq")).first()[0] or 0
    step = max_seq // 2 + 1
    work = tempfile.mkdtemp(prefix="hsp_cdcp_")
    opts = {
        cfg.HOODIE_PATH: work + "/{db}/ods_{db}_{table}",
        cfg.SOURCE_SHUFFLE_PARALLELISM: "8",
        cfg.SINK_SHUFFLE_PARALLELISM: "4",
        cfg.DEDUP_ORDER_FIELDS: "seq",
        cfg.BUCKETS: "4",
        "dbp.t_part." + cfg.RECORDKEY_FIELD: "key_id",
        "dbp.t_part." + cfg.PRECOMBINE_FIELD: "seq",
        "dbp.t_part." + cfg.TABLE_NAME: "ods_dbp_t_part",
        "dbp.t_part." + cfg.KEYGENERATOR_CLASS:
            "org.apache.hudi.keygen.SimpleKeyGenerator",
        "dbp.t_part." + cfg.PARTITIONPATH_FIELD: "part_d",
    }
    try:
        for b in range(2):
            env = build_part_envelopes(
                ev.where(
                    (F.col("seq") >= b * step) & (F.col("seq") < (b + 1) * step)
                )
            )
            st = sync_batch(spark, env, opts, batch_id=b)
            assert st.get("dbp.t_part") == "ok", st
        path = f"{work}/dbp/ods_dbp_t_part"
        # layout: partition dirs on disk
        assert _glob.glob(_os.path.join(path, "data", "*", "_part=p*")), (
            "sync wrote no _part dirs"
        )
        # persistence: a no-arg reopen sees the partition metadata
        lake = LakeTable(spark, path)
        assert lake.partition_fields == ["part_d"]
        assert lake.partition_values() == ["p0", "p1", "p2"]
        # structural pruning engages (file-level, before any scan)
        live = lake.log.live_files()
        kept = lake._prune_partitions(live, partitions=["p1"])
        assert kept and len(kept) < len(live)
        assert all(f.partition == "p1" for f in kept)
        result = (
            lake.snapshot(partitions=["p0", "p2"])
            .select("key_id", "part_d", "col_a")
            .orderBy("key_id")
        )
        rows = result.collect()
        return local_frame(spark, rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -- q-cdc-transformer: N19 SQL transformer hook end-to-end -----------------

# Projects (seq passthrough), derives (upper, exact cents), and FILTERS —
# the filter is KEY-STABLE (on the record key, not a value) so every
# batch drops the same keys and the oracle is the plain LWW replay over
# the surviving key set. The reference's hook is the same <SRC>
# placeholder contract (BinlogSyncHoodieCommand.scala:104-111).
TRANSFORMER_QUERY_SQL = """
    SELECT seq, key_id, upper(col_a) AS col_a,
           ROUND(col_b, 4) AS col_b,
           CAST(ROUND(col_b * 100, 0) AS BIGINT) AS price_cents
    FROM <SRC> WHERE key_id % 4 <> 0
"""


def q_cdc_transformer(spark, sf_dir):
    """N19 end-to-end: the db1.t_customer event slice through TWO
    micro-batches with ``hoodie.transformer.sql`` configured — the
    transformer projects, uppercases, derives exact integer cents, and
    filters out every key divisible by 4. Final snapshot must equal the
    oracle's LWW replay over transformed survivors."""
    ev = derive_cdc_events(spark, sf_dir).where(
        (F.col("db_name") == "db1") & (F.col("table_name") == "t_customer")
    )
    max_seq = ev.agg(F.max("seq")).first()[0] or 0
    step = max_seq // 2 + 1
    work = tempfile.mkdtemp(prefix="hsp_cdct_")
    opts = {
        cfg.HOODIE_PATH: work + "/{db}/ods_{db}_{table}",
        cfg.SOURCE_SHUFFLE_PARALLELISM: "8",
        cfg.SINK_SHUFFLE_PARALLELISM: "4",
        cfg.DEDUP_ORDER_FIELDS: "seq",
        cfg.BUCKETS: "4",
        "db1.t_customer." + cfg.RECORDKEY_FIELD: "key_id",
        "db1.t_customer." + cfg.PRECOMBINE_FIELD: "seq",
        "db1.t_customer." + cfg.TABLE_NAME: "ods_db1_t_customer",
        "db1.t_customer." + cfg.TRANSFORMER_SQL: TRANSFORMER_QUERY_SQL,
    }
    try:
        for b in range(2):
            env = build_envelopes(
                ev.where(
                    (F.col("seq") >= b * step) & (F.col("seq") < (b + 1) * step)
                )
            )
            st = sync_batch(spark, env, opts, batch_id=b)
            assert st.get("db1.t_customer") == "ok", st
        lake = LakeTable(spark, f"{work}/db1/ods_db1_t_customer")
        result = (
            lake.snapshot()
            .select("key_id", "seq", "col_a", "col_b", "price_cents")
            .orderBy("key_id")
        )
        rows = result.collect()
        return local_frame(spark, rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -- q-cdc-retention: N6 raw-binlog retention -------------------------------


def q_cdc_retention(spark, sf_dir):
    """N6 end-to-end: run the full sync with ``keepbinlog`` enabled over
    two micro-batches, then read the RETAINED raw envelopes back from
    disk and aggregate them — envelope counts, event counts, and the
    timestamp range per (db, table, type) must match the oracle's
    derivation of what the producer grouped. Proves retention persists
    bytes (the reference materializes but never writes — SURVEY Q4) and
    that what it persists is the exact envelope stream."""
    from pyspark.sql.types import ArrayType

    ev = derive_cdc_events(spark, sf_dir)
    max_seq = ev.agg(F.max("seq")).first()[0] or 0
    step = max_seq // 2 + 1
    work = tempfile.mkdtemp(prefix="hsp_cdcr_")
    opts = sync_options(work + "/tables")
    opts[cfg.KEEP_BINLOG_ENABLE] = "true"
    opts[cfg.BINLOG_PATH] = work + "/binlog"
    try:
        for b in range(2):
            env = build_envelopes(
                ev.where(
                    (F.col("seq") >= b * step) & (F.col("seq") < (b + 1) * step)
                )
            )
            sync_batch(spark, env, opts, batch_id=b)
        env_schema = StructType(
            [
                StructField("databaseName", StringType()),
                StructField("tableName", StringType()),
                StructField("type", StringType()),
                StructField("timestamp", LongType()),
                StructField("rows", ArrayType(ROW_SCHEMA)),
            ]
        )
        retained = spark.read.text(work + "/binlog/batch_id=*")
        parsed = retained.select(
            F.from_json("value", env_schema).alias("e")
        ).select("e.*")
        result = (
            parsed.groupBy(
                F.col("databaseName").alias("db_name"),
                F.col("tableName").alias("table_name"),
                F.col("type").alias("op"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_envelopes"),
                F.sum(F.size("rows")).alias("n_events"),
                F.min("timestamp").alias("min_ts"),
                F.max("timestamp").alias("max_ts"),
            )
            .orderBy("db_name", "table_name", "op")
        )
        rows = result.collect()
        return local_frame(spark, rows, result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


CDC_QUERIES = {
    "q-cdc-1": q_cdc_1,
    "q-cdc-2": q_cdc_2,
    "q-cdc-3": q_cdc_3,
    "q-cdc-4": q_cdc_4,
    "q-cdc-partitioned": q_cdc_partitioned,
    "q-cdc-transformer": q_cdc_transformer,
    "q-cdc-retention": q_cdc_retention,
}

CDC_ORACLES = {
    "q-cdc-1": CDC_EVENTS_CTE
    + """
        SELECT db_name, table_name, key_id, op, col_a FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY db_name, table_name, key_id
              ORDER BY ts DESC, seq DESC) AS rn
          FROM cdc_events) t WHERE rn = 1
        ORDER BY db_name, table_name, key_id
    """,
    "q-cdc-2": CDC_EVENTS_CTE
    + """
        SELECT db_name, table_name,
               CASE WHEN op = 'delete' THEN 'delete' ELSE 'upsert' END AS bucket,
               COUNT(*) AS cnt
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY db_name, table_name, key_id
                  ORDER BY ts DESC, seq DESC) AS rn
              FROM cdc_events) t WHERE rn = 1
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q-cdc-3": CDC_EVENTS_CTE
    + """
        SELECT db_name, table_name, key_id, col_a,
               ROUND(col_b, 4) AS col_b FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY db_name, table_name, key_id
              ORDER BY ts DESC, seq DESC) AS rn
          FROM cdc_events) t
        WHERE rn = 1 AND op <> 'delete'
        ORDER BY db_name, table_name, key_id
    """,
    # LWW replay of the partitioned-table fixture, filtered to the
    # returned partitions (partition is a function of the key, so
    # partition-scoped identity == key identity here)
    "q-cdc-partitioned": """
        WITH cdc AS (
          SELECT o_orderkey AS seq,
                 CASE WHEN o_orderkey % 7 = 0 THEN 'delete'
                      WHEN o_orderkey % 5 = 0 THEN 'insert'
                      ELSE 'update' END AS op,
                 CAST(1723500000 + (o_orderkey % 50) AS BIGINT) AS ts,
                 o_custkey % 120 AS key_id,
                 'p' || CAST((o_custkey % 120) % 3 AS VARCHAR) AS part_d,
                 o_orderstatus AS col_a
          FROM orders WHERE o_orderkey % 4 = 1
        )
        SELECT key_id, part_d, col_a FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
          FROM cdc) t
        WHERE rn = 1 AND op <> 'delete' AND part_d IN ('p0', 'p2')
        ORDER BY key_id
    """,
    # LWW replay over the db1.t_customer route, restricted to the
    # transformer's surviving keys, with the transformer's projections
    "q-cdc-transformer": CDC_EVENTS_CTE
    + """
        SELECT key_id, seq, upper(col_a) AS col_a,
               ROUND(col_b, 4) AS col_b,
               CAST(ROUND(col_b * 100, 0) AS BIGINT) AS price_cents
        FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
          FROM cdc_events
          WHERE db_name = 'db1' AND table_name = 't_customer') t
        WHERE rn = 1 AND op <> 'delete' AND key_id % 4 <> 0
        ORDER BY key_id
    """,
    # Envelopes are grouped per (batch, db, table, ts, op): envelope
    # count = distinct (batch, ts) per group key; event count = raw rows
    "q-cdc-retention": CDC_EVENTS_CTE
    + """
        SELECT db_name, table_name, op,
               COUNT(DISTINCT CAST(FLOOR(seq /
                        ((SELECT MAX(seq) FROM cdc_events) // 2 + 1))
                        AS BIGINT)
                              * 4294967296 + ts) AS n_envelopes,
               COUNT(*) AS n_events,
               MIN(ts) AS min_ts,
               MAX(ts) AS max_ts
        FROM cdc_events
        GROUP BY db_name, table_name, op
        ORDER BY db_name, table_name, op
    """,
    # All-bigint replay of the widening pipeline: the engine's int batch
    # + bigint batch must converge to the same final values
    "q-cdc-4": """
        WITH we AS (
          SELECT o_orderkey AS seq,
                 o_custkey % 50 AS key_id,
                 CASE WHEN o_orderkey % 7 = 0 THEN 'delete'
                      ELSE 'update' END AS op,
                 CAST(1723500000 + (o_orderkey % 40) AS BIGINT) AS ts,
                 CASE WHEN o_orderkey <
                        (SELECT MAX(o_orderkey) // 2 FROM orders
                         WHERE o_orderkey % 11 = 0)
                      THEN CAST(o_custkey % 50 AS BIGINT) * 3
                           + o_orderkey % 7
                      ELSE 5000000000 + o_custkey % 50 END AS col_w
          FROM orders WHERE o_orderkey % 11 = 0
        )
        SELECT key_id, col_w FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
          FROM we) t
        WHERE rn = 1 AND op <> 'delete'
        ORDER BY key_id
    """,
}
