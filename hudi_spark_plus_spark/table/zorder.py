"""Z-order (Morton) clustering command (SURVEY M5; reference kernel
BitUtil.java:122-157 interleave/deinterleave).

The reference vendors Hudi's bit-interleave primitives for multi-column
data layout. Spark-native equivalent: compute the Morton code of the
cluster columns as a JVM bit expression, then rewrite the table
range-partitioned + sorted by that code. Files then hold tight min/max
ranges on BOTH dimensions, so commit-log stats pruning (and parquet
row-group pruning) can skip files for predicates on either column — the
file-skipping payoff the reference gets from Hudi clustering.

Everything is a pure Column expression (``aggregate`` over bit indices):
no UDF, whole-stage codegen applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(even: Column | str, odd: Column | str, bits: int = 32) -> Column:
    """Morton interleave: bit i of ``even`` -> bit 2i, bit i of ``odd`` ->
    bit 2i+1 (the reference's BitUtil.interleave semantics). Inputs are
    taken as non-negative 32-bit ints."""
    e = F.col(even) if isinstance(even, str) else even
    o = F.col(odd) if isinstance(odd, str) else odd
    return F.expr(
        f"""aggregate(sequence(0, {bits - 1}), 0L, (acc, i) ->
              acc
              + shiftleft(cast(shiftright({e._jc.toString()}, i) & 1 as bigint), 2 * i)
              + shiftleft(cast(shiftright({o._jc.toString()}, i) & 1 as bigint), 2 * i + 1))"""
    )


def deinterleave_bits(z: Column | str, bits: int = 32) -> tuple[Column, Column]:
    """Inverse: (even, odd) halves of a Morton code."""
    zc = (F.col(z) if isinstance(z, str) else z)._jc.toString()
    even = F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) ->"
        f" acc + shiftleft(cast(shiftright({zc}, 2 * i) & 1 as bigint), i))"
    )
    odd = F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) ->"
        f" acc + shiftleft(cast(shiftright({zc}, 2 * i + 1) & 1 as bigint), i))"
    )
    return even, odd


def _rank_normalize(df: DataFrame, col: str, out: str) -> DataFrame:
    """Map an arbitrary orderable column to a dense 32-bit rank so Morton
    interleaving treats both dimensions uniformly (standard Z-order
    practice — raw values with wild ranges would starve one dimension)."""
    from pyspark.sql.window import Window

    # percent_rank is a single window over the clustering scan — acceptable
    # for a layout-rewrite command (itself a full-table job)
    w = Window.orderBy(F.col(col))
    return df.withColumn(
        out, (F.percent_rank().over(w) * ((1 << 20) - 1)).cast("bigint")
    )


def with_zvalue(df: DataFrame, col_a: str, col_b: str, out: str = "_z") -> DataFrame:
    """Attach the Morton code of two rank-normalized columns."""
    d = _rank_normalize(df, col_a, "_ra")
    d = _rank_normalize(d, col_b, "_rb")
    return d.withColumn(
        out, interleave_bits(F.col("_ra"), F.col("_rb"), bits=20)
    ).drop("_ra", "_rb")


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Z-value of (col_a, col_b):
    range-partitioned so each file owns a contiguous Z range, sorted
    within files so parquet row-group stats are tight on both columns."""
    z = with_zvalue(df, col_a, col_b)
    (
        z.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_cluster_table(lake, col_a: str, col_b: str) -> None:
    """OPTIMIZE ZORDER BY-equivalent for a LakeTable: rewrite the current
    snapshot with rows Z-ordered WITHIN each key bucket (same logical
    data, tombstones preserved). Keeping the bucket dirs preserves the
    merge path's selective copy-on-write; the Z sort within each bucket
    file tightens parquet row-group min/max on both cluster columns, so
    predicate pushdown skips row groups server-side."""
    from hudi_spark_plus_spark.table.keygen import BUCKET_COL, KEY_COL, bucket_expr
    from hudi_spark_plus_spark.table.lake_table import (
        _BLOOM_OPTS,
        _collect_file_entries,
    )

    snap = lake.snapshot(include_deleted=True)
    z = with_zvalue(snap, col_a, col_b)
    absd, rel = lake.log.new_data_subdir()
    (
        z.withColumn(BUCKET_COL, bucket_expr(F.col(KEY_COL), lake.buckets))
        .repartition(lake.buckets, F.col(BUCKET_COL))
        .sortWithinPartitions(BUCKET_COL, "_z")
        .drop("_z")
        .write.mode("append")
        .options(**_BLOOM_OPTS)  # keep the key bloom filter through rewrites
        .partitionBy(BUCKET_COL)
        .parquet(absd)
    )
    files = _collect_file_entries(lake.path, rel)
    lake.log.commit("cluster", files, schema_json=lake.log.latest().schema_json)
