"""Event-time window check queries (engine extensions, SURVEY §2.5).

Tumbling and sliding windows have exact DuckDB oracles (``time_bucket``);
session windows are oracled with the classic gaps-and-islands rewrite
(LAG + cumulative session counter) — a new session starts when the gap
from the previous event exceeds the threshold, ``end = last + gap``,
exactly Spark's ``session_window`` semantics.
"""

from __future__ import annotations

from hudi_spark_plus_spark.sources.loaders import load_table
from hudi_spark_plus_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def q_win_tumbling(spark, sf_dir):
    df = tumbling_agg(load_table(spark, sf_dir, "events"), "1 hour")
    return df.orderBy("ws", "event_type")


def q_win_sliding(spark, sf_dir):
    df = sliding_agg(load_table(spark, sf_dir, "events"), "1 hour", "30 minutes")
    return df.orderBy("ws", "event_type")


def q_win_session(spark, sf_dir):
    df = session_agg(load_table(spark, sf_dir, "events"), "5 minutes")
    return df.orderBy("ws", "user_id")


def q_win_range(spark, sf_dir):
    """RANGE-frame window (trailing 1-hour per-user activity): for each
    event, the count and fixed-point value sum of that user's events in
    the preceding hour INCLUDING peers at the same instant (RANGE, not
    ROWS — tie-inclusive on both engines). The sum accumulates integer
    micros so tie ORDER between engines cannot produce ULP drift, and
    the window partitions by user — never global."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hudi_spark_plus_spark.sources.loaders import epoch_us

    e = load_table(spark, sf_dir, "events")
    e = e.select(
        "user_id",
        "event_id",
        epoch_us(e, "ts").alias("t_us"),
        # rint = IEEE half-even on the double product, = DuckDB's
        # round_even and numpy .round (same discipline as the stateful
        # running-agg stream)
        F.expr("CAST(rint(value * 1000000) AS BIGINT)").alias("micros"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us").rangeBetween(
        -3_600_000_000, Window.currentRow
    )
    return e.select(
        "user_id",
        "event_id",
        "t_us",
        F.count(F.lit(1)).over(w).alias("cnt_1h"),
        F.sum("micros").over(w).alias("sum_1h_micros"),
    ).orderBy("event_id")


WINDOW_QUERIES = {
    "q-win-tumbling": q_win_tumbling,
    "q-win-sliding": q_win_sliding,
    "q-win-session": q_win_session,
    "q-win-range": q_win_range,
}

WINDOW_ORACLES = {
    "q-win-tumbling": """
        SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                    AS VARCHAR) AS ws,
               event_type, COUNT(*) AS cnt, ROUND(SUM(value), 4) AS sv
        FROM events GROUP BY 1, 2 ORDER BY ws, event_type
    """,
    "q-win-session": """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS t FROM events
        ), marked AS (
          SELECT user_id, t,
                 CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                           >= 300000000
                      OR LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM e
        ), sess AS (
          SELECT user_id, t,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT MIN(t) AS ws, MAX(t) + 300000000 AS we, user_id,
               COUNT(*) AS cnt
        FROM sess GROUP BY user_id, sid ORDER BY ws, user_id
    """,
    "q-win-sliding": """
        WITH buckets AS (
          SELECT CAST(ts AS TIMESTAMP) AS t, event_type FROM events
        ), expanded AS (
          SELECT CAST(time_bucket(INTERVAL '30 minutes', t) AS VARCHAR) AS b30,
                 time_bucket(INTERVAL '30 minutes', t) AS tb, t, event_type
          FROM buckets
        )
        SELECT CAST(w AS VARCHAR) AS ws, event_type, COUNT(*) AS cnt FROM (
          SELECT tb - INTERVAL '30 minutes' AS w, t, event_type FROM expanded
          UNION ALL
          SELECT tb AS w, t, event_type FROM expanded
        ) s
        WHERE t >= w AND t < w + INTERVAL '1 hour'
        GROUP BY w, event_type ORDER BY ws, event_type
    """,
    # RANGE frame over integer micros; sums in exact integers (no
    # HUGEINT/double leak: CAST ... AS BIGINT per the house rule)
    "q-win-range": """
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS t_us,
                 CAST(round_even(value * 1000000, 0) AS BIGINT) AS micros
          FROM events
        )
        SELECT user_id, event_id, t_us,
               CAST(COUNT(*) OVER (
                 PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cnt_1h,
               CAST(SUM(micros) OVER (
                 PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS sum_1h_micros
        FROM e ORDER BY event_id
    """,
}
