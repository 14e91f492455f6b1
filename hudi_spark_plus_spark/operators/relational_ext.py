"""Extended relational coverage beyond q01-q28 (SURVEY §2.4 families):
pivot, exact percentiles, and the remaining set operations — each with an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_spark_plus_spark.sources.loaders import load_table


def q_pivot(spark, sf_dir):
    """Pivot (columnar re-shape of a grouped aggregate). Fixed pivot
    values keep the plan single-pass and the output schema static."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .sum("l_quantity")
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 4).alias("qty_f"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 4).alias("qty_o"),
    ).orderBy("l_returnflag")


def q_percentile(spark, sf_dir):
    """Exact interpolated percentiles (continuous quantile) per group.
    The approx variant (approx_percentile/percentile_approx) is sketch-
    based and engine-specific — asserted in-engine instead (tests)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


def q_union(spark, sf_dir):
    """UNION (distinct) + UNION ALL cardinality in one result."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("x")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("x")
    )
    dist = c.union(s).distinct().agg(F.count(F.lit(1)).alias("n_distinct"))
    alln = c.union(s).agg(F.count(F.lit(1)).alias("n_all"))
    return dist.crossJoin(alln).orderBy("n_distinct")


def q_except(spark, sf_dir):
    """EXCEPT: custkeys with a >400k order but no finished ('F') order.

    (The nation-key formulation was vacuous — customer and supplier
    cover the same 25 nations in this testdata; 52 rows at sf0.01.)
    """
    o = load_table(spark, sf_dir, "orders")
    hi = (
        o.where(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("x"))
    )
    fin = (
        o.where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("x"))
    )
    # subtract == EXCEPT (distinct) — matches the oracle's DISTINCT+EXCEPT
    return hi.subtract(fin).orderBy("x")


def q_join_salted(spark, sf_dir):
    """Skew-spread (salted) equi-join under oracle control: the salt
    must be semantically invisible — the aggregate over the salted join
    hash-matches the oracle's plain join. This is the skew pattern AQE
    can't fix (dimension too big to broadcast, hot fact keys)."""
    from hudi_spark_plus_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    return (
        salted_join(li, su, "suppkey")
        .groupBy("suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
        )
        .orderBy("suppkey")
    )


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube q14/q15): two chosen
    grouping shapes in one pass, with GROUPING() markers to
    disambiguate the null rows."""
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               COUNT(*) AS cnt,
               ROUND(SUM(o_totalprice), 4) AS total
        FROM parquet.`{sf_dir}/orders.parquet`
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        ORDER BY g_prio, g_status, o_orderpriority, o_orderstatus
        """
    )


def q_exists_correlated(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS subqueries (decorrelated by
    Catalyst into semi/anti joins — the plan a hand-written semi join
    would produce, from declarative SQL)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("c_v")
    o.createOrReplaceTempView("o_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM c_v
        WHERE EXISTS (SELECT 1 FROM o_v
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM o_v
                          WHERE o_custkey = c_custkey
                            AND o_orderstatus = 'F'
                            AND o_totalprice < 1000)
        ORDER BY c_custkey
        """
    )


def q_scalar_subquery(spark, sf_dir):
    """Scalar subqueries — uncorrelated (global totals, computed once
    and broadcast) and correlated (per-row aggregate, decorrelated into
    a join): orders beating 1.5x the global average price, with each
    customer's own order count and lifetime total alongside.

    All comparisons/aggregates run in exact integer CENTS (prices have 2
    decimals, so ROUND(x*100, 0) is rounding-mode-proof): a double AVG's
    value depends on summation order, which differs between engines and
    flips borderline rows/rounded digits — integer math is associative
    and hash-stable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("c_v2")
    o.createOrReplaceTempView("o_v2")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice, 4) AS price,
               (SELECT COUNT(*) FROM o_v2 o2
                WHERE o2.o_custkey = o.o_custkey) AS cust_orders,
               (SELECT SUM(CAST(ROUND(o2.o_totalprice * 100, 0) AS BIGINT))
                FROM o_v2 o2
                WHERE o2.o_custkey = o.o_custkey) AS cust_total_cents
        FROM o_v2 o
        WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              * 2 * (SELECT COUNT(*) FROM o_v2)
              > 3 * (SELECT SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                     FROM o_v2)
        ORDER BY o_orderkey
        """
    )


EXT_QUERIES = {
    "q-grouping-sets": q_grouping_sets,
    "q-exists-correlated": q_exists_correlated,
    "q-scalar-subquery": q_scalar_subquery,
    "q-pivot": q_pivot,
    "q-percentile": q_percentile,
    "q-union": q_union,
    "q-except": q_except,
    "q-join-salted": q_join_salted,
}

EXT_ORACLES = {
    "q-grouping-sets": """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               COUNT(*) AS cnt,
               ROUND(SUM(o_totalprice), 4) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        ORDER BY g_prio, g_status, o_orderpriority, o_orderstatus
    """,
    "q-exists-correlated": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice < 1000)
        ORDER BY c_custkey
    """,
    "q-scalar-subquery": """
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice, 4) AS price,
               (SELECT COUNT(*) FROM orders o2
                WHERE o2.o_custkey = o.o_custkey) AS cust_orders,
               CAST((SELECT SUM(CAST(ROUND(o2.o_totalprice * 100, 0) AS BIGINT))
                     FROM orders o2
                     WHERE o2.o_custkey = o.o_custkey)
                    AS BIGINT) AS cust_total_cents
        FROM orders o
        WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
              * 2 * (SELECT COUNT(*) FROM orders)
              > 3 * (SELECT SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                     FROM orders)
        ORDER BY o_orderkey
    """,
    "q-pivot": """
        SELECT l_returnflag,
               ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
                                       THEN l_quantity END), 0.0), 4)
                   AS qty_f,
               ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
                                       THEN l_quantity END), 0.0), 4)
                   AS qty_o
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q-percentile": """
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q-union": """
        SELECT (SELECT COUNT(*) FROM (
                   SELECT c_nationkey AS x FROM customer
                   UNION
                   SELECT s_nationkey AS x FROM supplier)) AS n_distinct,
               (SELECT COUNT(*) FROM (
                   SELECT c_nationkey AS x FROM customer
                   UNION ALL
                   SELECT s_nationkey AS x FROM supplier)) AS n_all
        ORDER BY n_distinct
    """,
    "q-except": """
        SELECT x FROM (
          SELECT DISTINCT o_custkey AS x FROM orders
          WHERE o_totalprice > 400000
          EXCEPT
          SELECT DISTINCT o_custkey AS x FROM orders
          WHERE o_orderstatus = 'F') t
        ORDER BY x
    """,
    # the plain join the salted variant must be indistinguishable from
    "q-join-salted": """
        SELECT l_suppkey AS suppkey, s_name,
               COUNT(*) AS cnt, ROUND(SUM(l_quantity), 4) AS qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2 ORDER BY suppkey
    """,
}
