"""Scale-oriented join helpers (SURVEY §4 / 100 TB posture).

* ``salted_join`` — explicit skew mitigation for the pathological case
  AQE's skew-join splitting can't fix: a *broadcast-too-big* dimension
  joined on a key where a handful of values dominate the fact side.
  Fact rows get a random salt in [0, buckets); the dimension is exploded
  x buckets; the join key becomes (key, salt), spreading each hot key
  over ``buckets`` reducers. Exact same result set as the plain join.

* ``write_bucketed`` / co-located joins — Spark bucketed tables
  (``bucketBy`` + ``saveAsTable``): two tables bucketed by the same key
  into the same bucket count sort-merge-join WITHOUT a shuffle on either
  side — the layout cost is paid once at write time. This is the
  "pre-partition the 100 TB fact table once, join it cheaply forever"
  pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Skew-spread equi-join: identical semantics to
    ``fact.join(dim, key, how)`` for how in {inner, left}."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: list[str],
    right_on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: attach to each left row the right row with
    the LARGEST ``right_ts`` <= ``left_ts`` within its key group.

    Scale shape (the reason this is not a range join): union both sides,
    ONE shuffle on the key, one window sort, and a running
    ``last(..., ignorenulls)`` carries the latest right payload forward
    to each left row. Cost is O((|L|+|R|) log) per key group — a range
    inner join (``r.ts <= l.ts`` then groupBy-max) multiplies each left
    row by ALL earlier right rows of its key first, which is quadratic
    on active keys and the classic at-scale killer for as-of semantics.
    At equal timestamps the right row qualifies (<=): right rows sort
    before left rows on the tie.

    ``right_cols`` are the right-side payload columns to attach; their
    names must not collide with left's columns. ``how``: "inner" drops
    left rows with no earlier right row; "left" keeps them with nulls.

    Timestamp columns: integral epoch columns are compared as-is (both
    sides must share one unit); TIMESTAMP / TIMESTAMP_NTZ columns are
    normalized to epoch MICROS (``unix_micros``, sub-second exact — a
    plain long cast would truncate to whole seconds and silently
    coarsen the match). Other types raise.
    """
    if how not in ("inner", "left"):
        raise ValueError("asof_join supports inner/left")
    if len(left_on) != len(right_on):
        raise ValueError("left_on/right_on length mismatch")
    from pyspark.sql.window import Window

    def _epoch(df: DataFrame, col: str):
        dt = dict(df.dtypes).get(col)
        if dt in ("bigint", "int", "long", "smallint", "tinyint"):
            return "int", F.col(col).cast("long")
        if dt == "timestamp":
            return "ts", F.unix_micros(F.col(col))
        if dt == "timestamp_ntz":
            return "ts", F.unix_micros(F.col(col).cast("timestamp"))
        raise ValueError(
            f"asof_join ts column {col!r} has unsupported type {dt!r}; "
            "use an integral epoch or a timestamp column"
        )

    l_kind, l_epoch = _epoch(left, left_ts)
    r_kind, r_epoch = _epoch(right, right_ts)
    if l_kind != r_kind:
        # an integral side keeps its caller-chosen unit while a
        # timestamp side becomes micros — comparing them silently
        # mis-joins (one side ~10^6 off); make the caller pick one
        raise ValueError(
            f"asof_join ts columns mix an integral epoch ({left_ts!r} "
            f"vs {right_ts!r}) with a timestamp type; convert one side "
            "so both share a unit (e.g. unix_micros the integral side "
            "or cast the timestamp side)"
        )

    keys = [f"_asof_k{i}" for i in range(len(left_on))]
    r_sel = right.select(
        *[F.col(k).alias(a) for k, a in zip(right_on, keys)],
        r_epoch.alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload"),
    )
    payload_t = r_sel.schema["_asof_payload"].dataType
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    l_sel = left.select(
        *[F.col(k).alias(a) for k, a in zip(left_on, keys)],
        l_epoch.alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(payload_t).alias("_asof_payload"),
        left_struct.alias("_asof_left"),
    )
    left_t = l_sel.schema["_asof_left"].dataType
    u = l_sel.unionByName(
        r_sel.withColumn("_asof_left", F.lit(None).cast(left_t))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn(
            "_asof_m", F.last("_asof_payload", ignorenulls=True).over(w)
        )
        .where(F.col("_asof_side") == 1)
    )
    if how == "inner":
        matched = matched.where(F.col("_asof_m").isNotNull())
    return matched.select(
        F.col("_asof_left.*"),
        *[F.col(f"_asof_m.{c}").alias(c) for c in right_cols],
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) catalog table. Joins and
    aggregations on ``bucket_col`` between tables bucketed the same way
    run shuffle-free (verify via .explain: no Exchange above the scans)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)
