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


WINDOW_QUERIES = {
    "q-win-tumbling": q_win_tumbling,
    "q-win-sliding": q_win_sliding,
    "q-win-session": q_win_session,
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
}
