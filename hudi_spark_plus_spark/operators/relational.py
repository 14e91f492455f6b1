"""Relational operator surface (SURVEY.md §2.4, check queries q01-q28).

The reference exposes the whole Spark SQL surface through its transformer
hook (BinlogSyncHoodieCommand.scala:110 runs arbitrary ``spark.sql``) and
its lake tables are Spark SQL relations. Here every declared operator
category is implemented with the public DataFrame API so Catalyst plans it
(predicate pushdown, column pruning, broadcast join selection, partial
aggregation, whole-stage codegen all come free — SURVEY.md §4.3).

Each ``qNN`` function takes ``(spark, sf_dir)`` and returns a DataFrame
whose column names/types match the DuckDB oracle SQL in ``ORACLES`` — the
driver hash-compares the two at sf0.01.

Determinism conventions (SURVEY.md §2): total ORDER BY, ROUND(x, 4) on
floating-point outputs, timestamps surfaced as epoch-microsecond BIGINTs or
ISO strings (events.ts layout varies by testdata generation — epoch-nanos
BIGINT or TIMESTAMP_NTZ; loaders.epoch_us normalizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from hudi_spark_plus_spark.sources.loaders import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- scans / projection / filter ------------------------------------------


def q01(spark, sf_dir):
    """Parquet scan + projection + pushed filter (SURVEY K6/q01).

    Plan check: PushedFilters [GreaterThan(l_quantity,45.0)], ReadSchema
    only the 3 output columns.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q02(spark, sf_dir):
    """Projection with computed columns (SURVEY q02)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 0.9, 4).alias("discounted"),
        F.upper("o_orderstatus").alias("st"),
    ).orderBy("o_orderkey")


def q03(spark, sf_dir):
    """IN / BETWEEN / LIKE predicates (SURVEY q03)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.where(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_acctbal").between(100, 5000)
            & F.col("c_name").like("%5%")
        )
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q04(spark, sf_dir):
    """Null-safe conditional filter (SURVEY q04)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(F.coalesce("o_orderpriority", F.lit("NONE")) != "1-URGENT")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


# --- joins -----------------------------------------------------------------


def q05(spark, sf_dir):
    """3-way inner equi-join; dims broadcast explicitly (SURVEY q05)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("n_name", "r_name")
    )


def q06(spark, sf_dir):
    """Left outer join + aggregate (SURVEY q06)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


def q07(spark, sf_dir):
    """Full outer join on keys (SURVEY q07)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return (
        j.select(
            F.coalesce("c_custkey", F.lit(-1)).alias("ck"),
            F.coalesce("o_custkey", F.lit(-1)).alias("ok"),
        )
        .groupBy("ck", "ok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("ck", "ok")
    )


def q08(spark, sf_dir):
    """Semi join / EXISTS (SURVEY q08)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    hot = li.where(F.col("l_quantity") > 49)
    return (
        s.join(hot, s.s_suppkey == hot.l_suppkey, "left_semi")
        .select("s_suppkey")
        .orderBy("s_suppkey")
    )


def q09(spark, sf_dir):
    """Anti join / NOT EXISTS — the delete-merge primitive (SURVEY H2).

    Customers with no order above 400k (202 rows at sf0.01; the unfiltered
    variant was vacuous — every custkey has orders in this testdata).
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q10(spark, sf_dir):
    """Mixed equi + range (theta) join (SURVEY q10).

    Equi key keeps it a hash join; the range predicate is a post-join
    filter, so no nested-loop blowup at scale. part is broadcast-sized.
    """
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_partkey == p.p_partkey) & li.l_quantity.between(
        p.p_size, p.p_size + 10
    )
    return (
        li.join(F.broadcast(p), cond)
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("p_partkey")
    )


def q11(spark, sf_dir):
    """As-of style join: latest event at-or-before a per-order anchor (q11).

    events.ts arrives as epoch-nanos BIGINT or TIMESTAMP_NTZ depending on
    the testdata layout; compare in microseconds. The anchor is a
    deterministic per-order cutoff spread across the events window
    (2024-01-01 + (o_orderkey % 696 + 1) hours, in epoch micros) — the
    original o_orderdate anchor (1995-2001) predates every event, which
    made the check vacuous. Pure integer arithmetic, so no timestamp
    dialect hazard between Spark and the oracle.

    Engine shape (r7): ``asof_join`` — union both sides + ONE window
    over the user key, never the expanding inner range-join (each order
    × all earlier events of its user) that r5 flagged as the at-scale
    killer. Plan-tested join-free in test_plan_quality.
    """
    from hudi_spark_plus_spark.operators.joins import asof_join
    from hudi_spark_plus_spark.sources.loaders import epoch_us

    base_us = 1704067200000000  # epoch micros of 2024-01-01T00:00:00Z
    hour_us = 3600000000
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", epoch_us(ev, "ts").alias("ts_us")
    ).withColumn("last_event_ts", F.col("ts_us"))
    od = o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.lit(base_us)
            + (F.col("o_orderkey") % 696 + 1).cast("long") * F.lit(hour_us)
        ).alias("od_us"),
    )
    j = asof_join(
        od, e,
        left_on=["o_custkey"], right_on=["user_id"],
        left_ts="od_us", right_ts="ts_us",
        right_cols=["last_event_ts"], how="inner",
    )
    return j.select("o_orderkey", "last_event_ts").orderBy("o_orderkey")


# --- aggregation -----------------------------------------------------------


def q12(spark, sf_dir):
    """Grouped aggregation sum/avg/min/max/count (SURVEY q12)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_extendedprice"), 4).alias("s"),
            F.round(F.avg("l_discount"), 4).alias("a"),
            F.round(F.min("l_quantity"), 4).alias("mn"),
            F.round(F.max("l_quantity"), 4).alias("mx"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q13(spark, sf_dir):
    """COUNT(DISTINCT) per group (SURVEY q13)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("u"))
        .orderBy("o_orderpriority")
    )


def q14(spark, sf_dir):
    """ROLLUP multi-level aggregate (SURVEY q14)."""
    n = _t(spark, sf_dir, "nation")
    return (
        n.rollup("n_regionkey", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("n_regionkey").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


def q15(spark, sf_dir):
    """CUBE multi-level aggregate (SURVEY q15)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("q"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q16(spark, sf_dir):
    """Exact global COUNT(DISTINCT) (SURVEY q16; approx variant is
    asserted in-engine with a 5% bound, see tests)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(F.countDistinct("l_partkey").alias("u")).orderBy("u")


# --- windows ---------------------------------------------------------------


def q17(spark, sf_dir):
    """Ranking window — the LWW-dedup primitive (SURVEY N9/q17)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_custkey", F.round("c_acctbal", 4).alias("c_acctbal"))
        .orderBy("c_custkey")
    )


def q18(spark, sf_dir):
    """LAG analytic window (SURVEY q18)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_ok"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def q19(spark, sf_dir):
    """Running sum with ROWS frame (SURVEY q19).

    (l_orderkey, l_linenumber) is not unique in the testdata, so the
    window order includes l_extendedprice — ties then only occur between
    rows with equal addends, keeping the running-sum multiset
    deterministic across engines. The OUTPUT order must also include rs:
    rows sharing (l_orderkey, l_linenumber) carry distinct running sums,
    and without rs in the sort the two engines may interleave them
    differently.
    """
    li = _t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_extendedprice").over(w), 4).alias("rs"),
        )
        .orderBy("l_orderkey", "l_linenumber", "rs")
    )


def q20(spark, sf_dir):
    """Global top-k: TakeOrderedAndProject, no full sort at scale (q20)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 4).alias("tp"))
        .limit(25)
    )


# --- set ops / scalar functions -------------------------------------------


def q21(spark, sf_dir):
    """INTERSECT set op (SURVEY q21)."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("x")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("x")
    )
    return c.intersect(s).orderBy("x")


def q22(spark, sf_dir):
    """String functions + md5 record-key derivation (SURVEY N8/K7).

    Key recipe matches the reference: md5("{db}_{table}_{v1}_..."),
    BinlogSyncHoodieCommand.scala:251-259 + Md5Util.scala:6-12.
    """
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(
            F.concat_ws(
                "_",
                F.lit("db1"),
                F.lit("t_customer"),
                F.col("c_custkey").cast("string"),
            )
        ).alias("k"),
        F.substring("c_name", 1, 8).alias("pfx"),
        F.length("c_mktsegment").alias("ln"),
    ).orderBy("c_custkey")


def q23(spark, sf_dir):
    """Date/time functions (SURVEY q23). Truncated month surfaced as an
    ISO date string so both engines hash identically."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.date_trunc("month", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("m"),
        )
        .groupBy("y", "m")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("y", "m")
    )


def q24(spark, sf_dir):
    """Math + bit functions (SURVEY K2/q24) — popcount via bit_count."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.bit_count("p_partkey").alias("bc"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 4).alias("d"),
        (F.col("p_size") % 7).alias("m"),
    ).orderBy("p_partkey")


def q25(spark, sf_dir):
    """CASE/WHEN + NULLIF conditionals — the op-type branch (SURVEY N11)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("s"),
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pr"),
    ).orderBy("o_orderkey")


def q26(spark, sf_dir):
    """Split + explode + re-aggregate — UDTF surface (SURVEY N7/q26)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey", F.explode(F.split("p_name", " ")).alias("w")
        )
        .groupBy("p_partkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("w")), ",").alias(
                "words"
            )
        )
        .orderBy("p_partkey")
    )


def q27(spark, sf_dir):
    """JSON extraction from a string column (SURVEY N18/K8/q27)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("device")
    ).orderBy("event_id")


def q28(spark, sf_dir):
    """Scalar pandas UDF parity with the pure-SQL expression (SURVEY q28).

    Arrow-vectorized (JVM<->Python in columnar batches) — the engine's
    sanctioned slow path; row-at-a-time Python UDFs are banned in hot
    paths.
    """
    @F.pandas_udf(DoubleType())
    def py_udf(x):
        return x * 2 + 1

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", py_udf("l_quantity").alias("u")
    ).orderBy("l_orderkey", "l_linenumber")


RELATIONAL_QUERIES = {
    f"q{i:02d}": fn
    for i, fn in enumerate(
        [
            q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
            q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
            q21, q22, q23, q24, q25, q26, q27, q28,
        ],
        start=1,
    )
}


# DuckDB oracle SQL (dialect-adjusted per FIXTURES.md §3 conventions).
RELATIONAL_ORACLES = {
    "q01": """
        SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
        FROM lineitem WHERE l_quantity > 45
        ORDER BY l_orderkey, l_linenumber
    """,
    "q02": """
        SELECT o_orderkey, ROUND(o_totalprice * 0.9, 4) AS discounted,
               UPPER(o_orderstatus) AS st
        FROM orders ORDER BY o_orderkey
    """,
    "q03": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING','MACHINERY')
          AND c_acctbal BETWEEN 100 AND 5000 AND c_name LIKE '%5%'
        ORDER BY c_custkey
    """,
    "q04": """
        SELECT o_orderkey FROM orders
        WHERE COALESCE(o_orderpriority, 'NONE') <> '1-URGENT'
        ORDER BY o_orderkey
    """,
    "q05": """
        SELECT n.n_name, r.r_name, COUNT(*) AS cnt
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name ORDER BY n.n_name, r.r_name
    """,
    "q06": """
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    "q07": """
        SELECT COALESCE(c.c_custkey, -1) AS ck,
               COALESCE(o.o_custkey, -1) AS ok, COUNT(*) AS cnt
        FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q08": """
        SELECT s.s_suppkey FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
        ORDER BY s.s_suppkey
    """,
    "q09": """
        SELECT c.c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        ORDER BY c.c_custkey
    """,
    "q10": """
        SELECT p.p_partkey, COUNT(*) AS cnt
        FROM part p JOIN lineitem l
          ON l.l_partkey = p.p_partkey
         AND l.l_quantity BETWEEN p.p_size AND p.p_size + 10
        GROUP BY p.p_partkey ORDER BY p.p_partkey
    """,
    "q11": """
        SELECT o.o_orderkey, MAX(epoch_us(e.ts)) AS last_event_ts
        FROM orders o JOIN events e
          ON e.user_id = o.o_custkey
         AND epoch_us(e.ts) <= 1704067200000000
                               + (o.o_orderkey % 696 + 1) * 3600000000
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    "q12": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               ROUND(SUM(l_extendedprice), 4) AS s,
               ROUND(AVG(l_discount), 4) AS a,
               ROUND(MIN(l_quantity), 4) AS mn,
               ROUND(MAX(l_quantity), 4) AS mx
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q13": """
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS u
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q14": """
        SELECT n_regionkey, n_name, COUNT(*) AS cnt
        FROM nation GROUP BY ROLLUP (n_regionkey, n_name)
        ORDER BY n_regionkey NULLS FIRST, n_name NULLS FIRST
    """,
    "q15": """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS q
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q16": """
        SELECT COUNT(DISTINCT l_partkey) AS u FROM lineitem ORDER BY u
    """,
    "q17": """
        SELECT c_custkey, ROUND(c_acctbal, 4) AS c_acctbal FROM (
          SELECT c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer) t WHERE rn <= 3 ORDER BY c_custkey
    """,
    "q18": """
        SELECT o_custkey, o_orderkey,
               LAG(o_orderkey) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev_ok
        FROM orders ORDER BY o_custkey, o_orderkey
    """,
    "q19": """
        SELECT l_orderkey, l_linenumber,
               ROUND(SUM(l_extendedprice) OVER (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_extendedprice
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     4) AS rs
        FROM lineitem ORDER BY l_orderkey, l_linenumber, rs
    """,
    "q20": """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS tp FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    "q21": """
        SELECT x FROM (
          SELECT c_nationkey AS x FROM customer
          INTERSECT
          SELECT s_nationkey AS x FROM supplier) t ORDER BY x
    """,
    "q22": """
        SELECT c_custkey,
               MD5(CONCAT_WS('_', 'db1', 't_customer',
                             CAST(c_custkey AS VARCHAR))) AS k,
               SUBSTR(c_name, 1, 8) AS pfx, LENGTH(c_mktsegment) AS ln
        FROM customer ORDER BY c_custkey
    """,
    "q23": """
        SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
               CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE)
                    AS VARCHAR) AS m,
               COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q24": """
        SELECT p_partkey, BIT_COUNT(p_partkey) AS bc,
               ROUND(ABS(p_retailprice - 1000.0), 4) AS d,
               MOD(p_size, 7) AS m
        FROM part ORDER BY p_partkey
    """,
    "q25": """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN 'final'
                    WHEN o_orderstatus = 'O' THEN 'open'
                    ELSE 'other' END AS s,
               NULLIF(o_orderpriority, '5-LOW') AS pr
        FROM orders ORDER BY o_orderkey
    """,
    "q26": """
        SELECT p_partkey, STRING_AGG(w, ',' ORDER BY w) AS words FROM (
          SELECT p_partkey, UNNEST(STRING_SPLIT(p_name, ' ')) AS w
          FROM part) t
        GROUP BY p_partkey ORDER BY p_partkey
    """,
    "q27": """
        SELECT event_id, JSON_EXTRACT_STRING(props, '$.k') AS device
        FROM events ORDER BY event_id
    """,
    "q28": """
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity * 2 + 1 AS DOUBLE) AS u
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
}
