"""Event-time window check queries (engine extensions, SURVEY §2.5).

Tumbling and sliding windows have exact DuckDB oracles (``time_bucket``);
session windows have no DuckDB equivalent and get the driver's rows-only
check (asserted properly in tests/test_streaming.py instead).
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
    "q-win-session": q_win_session,  # rows-only (no ANSI-SQL session window)
}

WINDOW_ORACLES = {
    "q-win-tumbling": """
        SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                    AS VARCHAR) AS ws,
               event_type, COUNT(*) AS cnt, ROUND(SUM(value), 4) AS sv
        FROM events GROUP BY 1, 2 ORDER BY ws, event_type
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
