"""local_frame (localdf.py) — Arrow-path local frames must be
indistinguishable from spark.createDataFrame for every shape the
engine builds, and actually take the Arrow path for the common ones
(single partition = no per-evaluation Python-worker fan-out)."""

import decimal

from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hudi_spark_plus_spark.localdf import local_frame


def test_matches_classic_for_arrays(spark):
    sch = "cell int, c array<double>"
    rows = [(i, [float(i), i + 0.5]) for i in range(4)]
    df = local_frame(spark, rows, sch)
    ref = spark.createDataFrame(rows, sch)
    assert df.schema == ref.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))
    # never more partitions than rows (the classic pickled path fans
    # out to defaultParallelism slices regardless of row count)
    assert df.rdd.getNumPartitions() <= len(rows)


def test_roundtrips_collected_rows_exactly(spark, sf_dir):
    src = spark.read.parquet(f"{sf_dir}/events.parquet").limit(20)
    rows = src.collect()
    df = local_frame(spark, rows, src.schema)
    assert df.schema == src.schema  # incl. timestamp_ntz
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, rows))


def test_decimal_binary_null_and_empty(spark):
    sch = StructType(
        [
            StructField("a", DecimalType(12, 2), True),
            StructField("b", BinaryType(), True),
            StructField("n", StringType(), True),
        ]
    )
    df = local_frame(
        spark, [(decimal.Decimal("1.25"), b"xy", None)], sch
    )
    assert df.schema == sch
    assert df.collect() == [Row(a=decimal.Decimal("1.25"), b=b"xy", n=None)]
    empty = local_frame(spark, [], sch)
    assert empty.schema == sch and empty.count() == 0


def test_row_objects_and_dicts(spark):
    sch = StructType(
        [
            StructField("id", LongType(), True),
            StructField("v", ArrayType(IntegerType(), True), True),
        ]
    )
    df1 = local_frame(spark, [Row(id=1, v=[1, 2])], sch)
    df2 = local_frame(spark, [{"id": 1, "v": [1, 2]}], sch)
    assert df1.collect() == df2.collect() == [Row(id=1, v=[1, 2])]


def test_fallback_preserves_semantics(spark):
    # map keys are a shape from_pylist handles through dicts ambiguously
    # in older arrow versions; whatever path is taken, the result must
    # equal the classic builder's
    sch = "id int, m map<string,int>"
    rows = [(1, {"a": 1})]
    df = local_frame(spark, rows, sch)
    ref = spark.createDataFrame(rows, sch)
    assert df.schema == ref.schema
    assert df.collect() == ref.collect()


def test_double_values_bit_exact(spark):
    vals = [0.1 + 0.2, 1e-300, -0.0, float(2**53 - 1)]
    sch = StructType([StructField("x", DoubleType(), True)])
    df = local_frame(spark, [(v,) for v in vals], sch)
    got = sorted(r["x"] for r in df.collect())
    assert got == sorted(vals)
