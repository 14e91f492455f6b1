"""CDC pipeline tests: oracle parity, reference quirks, replay property
(SURVEY §5.2.3-4)."""

import random

import pytest
from pyspark.sql import functions as F

from hudi_spark_plus_spark.operators import cdc
from hudi_spark_plus_spark.operators.cdc_queries import (
    CDC_ORACLES,
    CDC_QUERIES,
    ROW_SCHEMA,
    build_envelopes,
    sync_options,
)
from hudi_spark_plus_spark.operators.sync import sync_batch
from hudi_spark_plus_spark.plans import config as cfg
from hudi_spark_plus_spark.table.lake_table import LakeTable
from tests.harness import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(CDC_QUERIES))
def test_cdc_query_matches_oracle(name, spark, sf_dir, con):
    compare(CDC_QUERIES[name](spark, sf_dir), con, CDC_ORACLES[name], name)


def _mk_events(spark, rows):
    """rows: (seq, db, table, op, ts, key_id, col_a, col_b)"""
    return spark.createDataFrame(
        rows,
        "seq long, db_name string, table_name string, op string, ts long,"
        " key_id long, col_a string, col_b double",
    )


def test_envelope_parse_path(spark):
    """N7/N17/N18: envelope JSON -> exploded typed records."""
    ev = _mk_events(spark, [(1, "db1", "t_customer", "update", 100, 7, "x", 1.5)])
    env = build_envelopes(ev)
    parsed = cdc.parse_envelopes(env)
    row = parsed.collect()[0]
    assert row[cdc.DB_COL] == "db1" and row[cdc.TABLE_COL] == "t_customer"
    assert row[cdc.OP_COL] == "upsert" and row["_ts"] == 100
    schema = cdc.decode_schema(row[cdc.SCHEMA_COL])
    decoded = cdc.decode_rows(parsed, schema).collect()[0]
    assert decoded["key_id"] == 7 and decoded["col_b"] == 1.5


def test_quirk_q1_misconfigured_table_isolated(spark, tmp_path):
    """Q1 fix: a table with missing config must not poison the batch's
    other tables (the reference's non-local return aborts them all)."""
    ev = _mk_events(
        spark,
        [
            (1, "db1", "t_customer", "update", 10, 1, "a", 1.0),
            (2, "db1", "t_mystery", "update", 10, 2, "b", 2.0),  # unconfigured
        ],
    )
    opts = sync_options(str(tmp_path))
    status = sync_batch(spark, build_envelopes(ev), opts, batch_id=0)
    assert status["db1.t_customer"] == "ok"
    assert status["db1.t_mystery"].startswith("skipped")
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    assert lake.snapshot().count() == 1


def test_quirk_q2_delete_only_table(spark, tmp_path):
    """Q2 fix: a table whose batch slice is deletes-only must still be
    processed (reference hits an empty upsert RDD and skips)."""
    opts = sync_options(str(tmp_path))
    up = _mk_events(spark, [(1, "db1", "t_customer", "update", 10, 1, "a", 1.0),
                            (2, "db1", "t_order", "update", 10, 5, "b", 2.0)])
    sync_batch(spark, build_envelopes(up), opts, batch_id=0)
    dels = _mk_events(spark, [(3, "db1", "t_customer", "delete", 20, 1, None, None),
                              (4, "db1", "t_order", "update", 20, 6, "c", 3.0)])
    status = sync_batch(spark, build_envelopes(dels), opts, batch_id=1)
    assert status == {"db1.t_customer": "ok", "db1.t_order": "ok"}
    cust = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    assert cust.snapshot().count() == 0  # deleted
    orde = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_order", buckets=4)
    assert orde.snapshot().count() == 2


def test_quirk_q5_same_key_insert_delete_one_batch(spark, tmp_path):
    """Q5: same-key insert+delete in one batch nets to the larger ts."""
    opts = sync_options(str(tmp_path))
    ev = _mk_events(
        spark,
        [
            (1, "db1", "t_customer", "update", 10, 1, "born", 1.0),
            (2, "db1", "t_customer", "delete", 20, 1, None, None),  # delete last
            (3, "db1", "t_customer", "delete", 10, 2, None, None),
            (4, "db1", "t_customer", "update", 20, 2, "alive", 2.0),  # upsert last
        ],
    )
    sync_batch(spark, build_envelopes(ev), opts, batch_id=0)
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    rows = {r["key_id"]: r["col_a"] for r in lake.snapshot().collect()}
    assert rows == {2: "alive"}


def test_sync_batch_idempotent_replay(spark, tmp_path):
    """H5: re-running a committed micro-batch is a no-op."""
    opts = sync_options(str(tmp_path))
    ev = _mk_events(spark, [(1, "db1", "t_customer", "update", 10, 1, "a", 1.0)])
    env = build_envelopes(ev)
    sync_batch(spark, env, opts, batch_id=7)
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    v = lake.log.latest().version
    sync_batch(spark, env, opts, batch_id=7)  # replay after "crash"
    assert lake.log.latest().version == v
    assert lake.snapshot().count() == 1


def test_retention_writes_raw_envelopes(spark, tmp_path):
    """Q4 fix: keepbinlog actually persists the raw envelope stream."""
    opts = sync_options(str(tmp_path / "tables"))
    opts[cfg.KEEP_BINLOG_ENABLE] = "true"
    opts[cfg.BINLOG_PATH] = str(tmp_path / "binlog")
    ev = _mk_events(spark, [(1, "db1", "t_customer", "update", 10, 1, "a", 1.0)])
    sync_batch(spark, build_envelopes(ev), opts, batch_id=3)
    kept = spark.read.text(str(tmp_path / "binlog" / "batch_id=3"))
    assert kept.count() == 1
    assert "databaseName" in kept.first()[0]


def test_transformer_sql_hook(spark, tmp_path):
    """N19: <SRC> placeholder SQL transform applied pre-merge."""
    opts = sync_options(str(tmp_path))
    opts["db1.t_customer." + cfg.TRANSFORMER_SQL] = (
        "SELECT seq, key_id, UPPER(col_a) AS col_a, col_b * 10 AS col_b"
        " FROM <SRC>"
    )
    ev = _mk_events(spark, [(1, "db1", "t_customer", "update", 10, 1, "abc", 1.5)])
    sync_batch(spark, build_envelopes(ev), opts, batch_id=0)
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    row = lake.snapshot().collect()[0]
    assert row["col_a"] == "ABC" and row["col_b"] == 15.0


def test_cdc_replay_property(spark, tmp_path):
    """SURVEY §5.2.3: random upsert/delete sequences, arbitrary batch
    boundaries (arrival-ordered), vs a single-threaded dict replay
    honoring LWW by (ts, seq)."""
    rng = random.Random(42)
    n, keys = 400, 30
    events = []
    for seq in range(n):
        op = "delete" if rng.random() < 0.2 else "update"
        events.append(
            (seq, "db1", "t_customer", op, rng.randrange(20),
             rng.randrange(keys), f"v{seq}", float(seq))
        )
    # oracle: dict replay, winner = max (ts, seq) per key
    best = {}
    for seq, _db, _t, op, ts, k, a, b in events:
        if k not in best or (ts, seq) >= (best[k][0], best[k][1]):
            best[k] = (ts, seq, op, a, b)
    expect = {k: (v[3], v[4]) for k, v in best.items() if v[2] != "delete"}

    opts = sync_options(str(tmp_path))
    # arrival-ordered random batch boundaries
    cuts = sorted(rng.sample(range(1, n), 4))
    lo = 0
    for i, hi in enumerate(cuts + [n]):
        chunk = [e for e in events if lo <= e[0] < hi]
        lo = hi
        if not chunk:
            continue
        sync_batch(spark, build_envelopes(_mk_events(spark, chunk)), opts, batch_id=i)
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    got = {
        r["key_id"]: (r["col_a"], r["col_b"])
        for r in lake.snapshot().collect()
    }
    assert got == expect


def test_malformed_envelope_lines_are_skipped(spark, tmp_path):
    """Garbage lines in the stream must not break the batch: from_json
    yields null envelopes, explode drops them, valid lines process."""
    good = build_envelopes(
        _mk_events(spark, [(1, "db1", "t_customer", "update", 10, 1, "a", 1.0)])
    ).collect()[0]["value"]
    lines = spark.createDataFrame(
        [(good,), ("{not valid json",), ("",), ('{"databaseName":"db1"}',)],
        "value string",
    )
    opts = sync_options(str(tmp_path))
    status = sync_batch(spark, lines, opts, batch_id=0)
    assert status["db1.t_customer"] == "ok"
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    assert lake.snapshot().count() == 1


def test_per_table_dedup_order_fields(spark, tmp_path):
    """Each table's configured tie-break field applies to its own rows —
    a batch mixing tables with different tie-break columns must not
    cross-apply one table's field to the other (review finding)."""
    opts = sync_options(str(tmp_path))
    # t_customer ties break on seq (default fixture config); t_order on
    # col_b via per-table override
    opts["db1.t_order." + cfg.DEDUP_ORDER_FIELDS] = "col_b"
    ev = _mk_events(
        spark,
        [
            # same key, same ts: t_customer winner = larger seq ("late")
            (10, "db1", "t_customer", "update", 5, 1, "early", 1.0),
            (20, "db1", "t_customer", "update", 5, 1, "late", 2.0),
            # same key, same ts: t_order winner = larger col_b ("big"),
            # even though its seq is SMALLER
            (30, "db1", "t_order", "update", 5, 9, "big", 99.0),
            (40, "db1", "t_order", "update", 5, 9, "small", 1.0),
        ],
    )
    sync_batch(spark, build_envelopes(ev), opts, batch_id=0)
    cust = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    assert {r["col_a"] for r in cust.snapshot().collect()} == {"late"}
    orde = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_order", buckets=4)
    assert {r["col_a"] for r in orde.snapshot().collect()} == {"big"}


def test_simple_keygen_in_cdc_path(spark, tmp_path):
    """keygenerator.class=simple: the record key is the raw key column
    (review finding: config was previously ignored on the CDC path)."""
    opts = sync_options(str(tmp_path))
    opts["db1.t_customer." + cfg.KEYGENERATOR_CLASS] = "simple"
    ev = _mk_events(spark, [(1, "db1", "t_customer", "update", 10, 42, "a", 1.0)])
    sync_batch(spark, build_envelopes(ev), opts, batch_id=0)
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    rows = lake.snapshot().collect()
    assert rows[0]["_key"] == "42"  # raw key, not an md5 digest


def test_inband_schema_evolution_across_batches(spark, tmp_path):
    """Mid-stream ALTER TABLE: a later envelope declares an extra column.
    Within one batch the LATEST-ts schema decodes all rows (older rows
    null-fill); the merge widens the stored table additively."""
    import json as _json

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    old_schema = StructType([
        StructField("seq", LongType()), StructField("key_id", LongType()),
        StructField("col_a", StringType()), StructField("col_b", DoubleType()),
    ])
    new_schema = StructType(list(old_schema.fields) + [
        StructField("col_c", StringType()),
    ])

    def envelope(schema, ts, rows):
        return _json.dumps({
            "databaseName": "db1", "tableName": "t_customer",
            "schema": _json.dumps(_json.loads(schema.json())),
            "type": "update", "timestamp": ts, "rows": rows,
        })

    opts = sync_options(str(tmp_path))
    # batch 0: one old-schema envelope and one new-schema envelope with a
    # LARGER ts -> the new schema must win the in-batch pick
    b0 = spark.createDataFrame(
        [
            (envelope(old_schema, 10, [{"seq": 1, "key_id": 1, "col_a": "a", "col_b": 1.0}]),),
            (envelope(new_schema, 20, [{"seq": 2, "key_id": 2, "col_a": "b", "col_b": 2.0, "col_c": "NEW"}]),),
        ],
        "value string",
    )
    sync_batch(spark, b0, opts, batch_id=0)
    lake = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    rows = {r["key_id"]: r for r in lake.snapshot().collect()}
    assert rows[2]["col_c"] == "NEW"
    assert rows[1]["col_c"] is None  # old-schema row null-filled

    # batch 1: old-schema-only envelopes still merge into the widened table
    b1 = spark.createDataFrame(
        [(envelope(old_schema, 30, [{"seq": 3, "key_id": 1, "col_a": "a2", "col_b": 1.5}]),)],
        "value string",
    )
    sync_batch(spark, b1, opts, batch_id=1)
    rows = {r["key_id"]: r for r in lake.snapshot().collect()}
    assert rows[1]["col_a"] == "a2" and rows[1]["col_c"] is None
    assert rows[2]["col_c"] == "NEW"


def test_simple_keygen_two_tables_no_cross_table_collision(spark, tmp_path):
    """Two tables both on simple keygen with OVERLAPPING raw key values in
    one batch: the dedup window must scope per (db, table) — a global
    window keyed only on _key would silently drop one table's row
    (ADVICE round-1 finding)."""
    opts = sync_options(str(tmp_path))
    opts["db1.t_customer." + cfg.KEYGENERATOR_CLASS] = "simple"
    opts["db1.t_order." + cfg.KEYGENERATOR_CLASS] = "simple"
    ev = _mk_events(
        spark,
        [
            # same raw key value 7, same ts, different tables
            (1, "db1", "t_customer", "update", 10, 7, "cust", 1.0),
            (2, "db1", "t_order", "update", 10, 7, "ord", 2.0),
        ],
    )
    status = sync_batch(spark, build_envelopes(ev), opts, batch_id=0)
    assert status == {"db1.t_customer": "ok", "db1.t_order": "ok"}
    cust = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer", buckets=4)
    orde = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_order", buckets=4)
    assert [r["col_a"] for r in cust.snapshot().collect()] == ["cust"]
    assert [r["col_a"] for r in orde.snapshot().collect()] == ["ord"]


def test_incompatible_schema_change_isolated_per_table(spark, tmp_path):
    """A table whose in-band schema declares a non-widening type change
    is skipped with an error; OTHER tables in the same batch commit
    normally (Q1 isolation extended to schema errors)."""
    import json as _json

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    opts = sync_options(str(tmp_path))
    ev = _mk_events(
        spark,
        [
            (1, "db1", "t_customer", "update", 10, 1, "a", 1.0),
            (2, "db1", "t_order", "update", 10, 2, "b", 2.0),
        ],
    )
    assert sync_batch(spark, build_envelopes(ev), opts, batch_id=0) == {
        "db1.t_customer": "ok",
        "db1.t_order": "ok",
    }
    # batch 1: t_customer re-declares col_b (double) as STRING -> skipped;
    # t_order unaffected
    bad_schema = StructType([
        StructField("seq", LongType()), StructField("key_id", LongType()),
        StructField("col_a", StringType()), StructField("col_b", StringType()),
    ])
    bad = spark.createDataFrame(
        [(
            _json.dumps({
                "databaseName": "db1", "tableName": "t_customer",
                "schema": bad_schema.json(), "type": "upsert",
                "timestamp": 20,
                "rows": [_json.dumps(
                    {"seq": 3, "key_id": 1, "col_a": "x", "col_b": "oops"}
                )],
            }),
        ), (
            _json.dumps({
                "databaseName": "db1", "tableName": "t_order",
                "schema": ROW_SCHEMA.json(), "type": "upsert",
                "timestamp": 20,
                "rows": [_json.dumps(
                    {"seq": 4, "key_id": 2, "col_a": "b2", "col_b": 2.5}
                )],
            }),
        )],
        "value string",
    )
    status = sync_batch(spark, bad, opts, batch_id=1)
    assert status["db1.t_order"] == "ok"
    assert status["db1.t_customer"].startswith("skipped:")
    orde = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_order")
    assert {r["col_a"] for r in orde.snapshot().collect()} == {"b2"}
    cust = LakeTable(spark, f"{tmp_path}/db1/ods_db1_t_customer")
    assert {r["col_a"] for r in cust.snapshot().collect()} == {"a"}


def test_sync_mor_mode_matches_cow(spark, tmp_path):
    """engine.table.write.mode=mor through the FULL envelope pipeline:
    final snapshots must equal the COW run on the same stream."""
    ev = _mk_events(
        spark,
        [
            (1, "db1", "t_customer", "update", 10, 1, "a", 1.0),
            (2, "db1", "t_customer", "update", 20, 1, "a2", 1.5),
            (3, "db1", "t_customer", "update", 10, 2, "b", 2.0),
            (4, "db1", "t_customer", "delete", 30, 2, None, None),
            (5, "db1", "t_order", "update", 10, 3, "c", 3.0),
        ],
    )
    results = {}
    for mode, sub in (("cow", "c"), ("mor", "m")):
        opts = sync_options(f"{tmp_path}/{sub}")
        opts[cfg.WRITE_MODE] = mode
        # two batches so MOR actually appends deltas on batch 2
        sync_batch(spark, build_envelopes(ev.where(F.col("seq") <= 3)), opts, 0)
        sync_batch(spark, build_envelopes(ev.where(F.col("seq") > 3)), opts, 1)
        snap = {}
        for t in ("t_customer", "t_order"):
            lake = LakeTable(spark, f"{tmp_path}/{sub}/db1/ods_db1_{t}")
            snap[t] = {
                r["key_id"]: r["col_a"] for r in lake.snapshot().collect()
            }
        results[mode] = snap
    assert results["cow"] == results["mor"]
    assert results["mor"]["t_customer"] == {1: "a2"}
    # MOR table really has delta files
    lake = LakeTable(spark, f"{tmp_path}/m/db1/ods_db1_t_customer")
    assert "delta" in {f.kind for f in lake.log.live_files()}
