"""CDC dataflow operators — all-DataFrame (SURVEY §2.1 N7-N11, N16-N18).

The reference implements these as hand-written RDD code invisible to
Catalyst (BinlogSyncHoodieCommand.scala:241-277); here each step is a
declarative DataFrame transform so Catalyst plans the whole pipeline:

    envelope from_json -> posexplode(rows) -> md5 key -> window LWW dedup
    -> upsert/delete filters -> per-table second from_json decode

Exactly ONE shuffle in the core pipeline (the dedup window's hash
partitioning by key) vs the reference's two (groupBy + the per-key list
materialization it implies). No driver-side row data except the distinct
table list (N10 — table count << row count by construction).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from hudi_spark_plus_spark.table.keygen import KEY_COL, OP_COL, TS_COL, record_key_expr

# Envelope keys (BinlogSyncHoodieCommand.scala:44-52). ``rows`` elements
# are JSON objects surfaced as raw strings (StringType target keeps the
# original text) for the per-table second-stage decode (N18).
ENVELOPE_SCHEMA = StructType(
    [
        StructField("databaseName", StringType()),
        StructField("tableName", StringType()),
        StructField("schema", StringType()),
        StructField("type", StringType()),
        StructField("timestamp", LongType()),
        StructField("rows", ArrayType(StringType())),
    ]
)

DB_COL = "_db"
TABLE_COL = "_table"
SCHEMA_COL = "_schema"
POS_COL = "_pos"
VALUE_COL = "value"
DELETE_OP = "delete"
UPSERT_OP = "upsert"


def parse_envelopes(df: DataFrame, value_col: str = VALUE_COL) -> DataFrame:
    """N7: envelope parse + rows explode.

    One record per row image, envelope metadata carried as flat ``_``
    columns (the reference's ``__meta__`` attachment, scala:246-247).
    ``_pos`` is the row's position within its envelope — the stable
    within-envelope arrival order used for dedup tie-breaks (the
    reference relies on stable sortBy, scala:264-265).
    """
    e = df.select(F.from_json(F.col(value_col), ENVELOPE_SCHEMA).alias("e"))
    x = e.select(
        F.col("e.databaseName").alias(DB_COL),
        F.col("e.tableName").alias(TABLE_COL),
        F.col("e.schema").alias(SCHEMA_COL),
        # anything != "delete" is an upsert (scala:51-52, 272, 276)
        F.when(F.col("e.type") == DELETE_OP, DELETE_OP)
        .otherwise(UPSERT_OP)
        .alias(OP_COL),
        F.col("e.timestamp").alias(TS_COL),
        F.posexplode("e.rows").alias(POS_COL, VALUE_COL),
    )
    return x


def with_record_key(
    df: DataFrame, key_fields_by_table: dict[tuple[str, str], list[str]],
    keygen_by_table: dict[tuple[str, str], str] | None = None,
) -> DataFrame:
    """N8: record key from configured per-table key columns.

    Key column values are extracted from the still-encoded row JSON with
    ``get_json_object`` — cheap, avoids decoding full payloads before
    dedup (the reference also keys on the raw JSON record, scala:251-259).

    Keygen: "composite" (default — the reference's md5 recipe, applied
    regardless of keygen class in the reference itself) or "simple" (raw
    single key column as string). Other/unknown generators fall back to
    composite on this pre-decode path — arbitrary plugin keygens need
    decoded columns and apply on the LakeTable-direct path
    (table/keygen.py:record_key_expr).
    """
    keygen_by_table = keygen_by_table or {}
    key_col: Column | None = None
    for (db, table), fields in key_fields_by_table.items():
        vals = [
            F.coalesce(
                F.get_json_object(F.col(VALUE_COL), f"$.{f}"), F.lit("null")
            )
            for f in fields
        ]
        keygen = keygen_by_table.get((db, table), "composite")
        if keygen == "simple" and len(vals) == 1:
            this_key = vals[0]
        else:
            this_key = F.md5(
                F.concat_ws("_", F.lit(db), F.lit(table), *vals)
            )
        cond = (F.col(DB_COL) == db) & (F.col(TABLE_COL) == table)
        key_col = (
            F.when(cond, this_key)
            if key_col is None
            else key_col.when(cond, this_key)
        )
    if key_col is None:
        raise ValueError("no table key configuration supplied")
    return df.withColumn(KEY_COL, key_col)


def lww_dedup(
    df: DataFrame,
    order_fields: list[str] | None = None,
    order_exprs: list[Column] | None = None,
) -> DataFrame:
    """N9: last-write-wins dedup — keep the latest operation per key.

    Single window shuffle (vs the reference's groupBy + per-key list sort,
    scala:260-266). Order: envelope timestamp desc, then configured
    payload tie-break fields (extracted from row JSON; ``decimal(38,9)``
    preserves full int64 precision — a double cast would collide values
    above 2^53) desc, then within-envelope position desc.

    ``order_exprs``: prebuilt tie-break Columns (e.g. per-table CASE
    expressions when one batch carries tables with different tie-break
    fields) — takes precedence over ``order_fields``.

    The window partitions by (_db, _table, _key) when the routing columns
    are present: composite keys already embed db/table in the md5, but
    the "simple" keygen emits the raw column value, so two tables with
    overlapping simple-key values must not collide in one global window
    (one table's row would silently be dropped from the batch).
    """
    order = [F.col(TS_COL).desc()]
    if order_exprs:
        order.extend(c.desc() for c in order_exprs)
    else:
        for f in order_fields or []:
            order.append(tie_break_expr(f).desc())
    order.append(F.col(POS_COL).desc())
    parts = [c for c in (DB_COL, TABLE_COL) if c in df.columns] + [KEY_COL]
    w = Window.partitionBy(*parts).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def tie_break_expr(field: str) -> Column:
    """Numeric tie-break value from the encoded row JSON (null for
    non-numeric — falls through to the position tie-break)."""
    return F.get_json_object(F.col(VALUE_COL), f"$.{field}").cast(
        "decimal(38,9)"
    )


def split_ops(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """N11: upsert/delete split — two lazy filters over the same plan."""
    return df.where(F.col(OP_COL) != DELETE_OP), df.where(F.col(OP_COL) == DELETE_OP)


def distinct_tables(df: DataFrame) -> list[tuple[str, str, str]]:
    """N10: batch table-metadata discovery. The only driver-side collect
    in the pipeline; bounded by table count, not row count."""
    rows = (
        df.select(DB_COL, TABLE_COL, SCHEMA_COL)
        .distinct()
        .collect()
    )
    return [(r[0], r[1], r[2]) for r in rows]


def decode_schema(schema_json: str) -> StructType:
    """N17: in-band Spark DataType JSON -> StructType; fail fast if the
    declared type is not a struct (scala:152-157)."""
    dt = StructType.fromJson(json.loads(schema_json))
    if not isinstance(dt, StructType):
        raise ValueError(f"in-band schema is not a struct: {schema_json}")
    return dt


def decode_rows(
    df: DataFrame, schema: StructType, options: dict[str, str] | None = None
) -> DataFrame:
    """N18: second-stage JSON->struct decode with the in-band schema; the
    table config map doubles as Spark JSON options (timestampFormat et al,
    scala:192-206). Keeps engine meta columns alongside ``data.*``."""
    keep = [c for c in df.columns if c != VALUE_COL]
    return df.select(
        *keep,
        F.from_json(F.col(VALUE_COL), schema, options or {}).alias("data"),
    ).select(*keep, "data.*")
