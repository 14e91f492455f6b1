"""Scale-pattern join helpers: salting equivalence, bucketed co-location."""

import re

from pyspark.sql import functions as F

from hudi_spark_plus_spark.operators.joins import salted_join, write_bucketed
from hudi_spark_plus_spark.sources.loaders import load_table


def test_salted_join_equivalence(spark, sf_dir):
    """Salted join must return exactly the plain join's result set,
    including skewed hot keys."""
    li = load_table(spark, sf_dir, "lineitem")
    # synthesize skew: fold most keys onto one hot supplier
    fact = li.withColumn(
        "skey",
        F.when(F.col("l_suppkey") % 3 == 0, F.lit(1)).otherwise(
            F.col("l_suppkey")
        ),
    )
    dim = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("skey"), "s_name"
    )
    plain = fact.join(dim, "skey").groupBy("skey").count()
    salted = salted_join(fact, dim, "skey").groupBy("skey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key SMJ with no Exchange above the
    scans (co-located join — the pay-layout-once pattern)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    write_bucketed(od, "b_orders", "o_orderkey", 8)
    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no shuffle exchange anywhere above the bucketed scans
        assert not re.search(r"Exchange (hash|range)partitioning", plan), plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
