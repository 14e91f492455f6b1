"""Differential-oracle harness: Spark result vs DuckDB result.

Approximates the driver's t2 compare (CORRECTNESS_r{N}.json): row count,
column-name set, and an order-insensitive value hash with columns sorted
by name. Mismatch reporting is richer here (first differing rows) so
failures are debuggable locally.
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb

from hudi_spark_plus_spark.sources.loaders import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the testdata parquet files as views, like the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # collapse float-repr noise; queries already ROUND(x, 4)
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


def compare(spark_df, con, oracle_sql: str, name: str = "?") -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(oracle_sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in d_cols
    ), f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_set = _rowset([c.lower() for c in s_cols], s_rows)
    d_set = _rowset([c.lower() for c in d_cols], d_rows)
    if s_set != d_set:
        only_s = list((s_set - d_set).items())[:5]
        only_d = list((d_set - s_set).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only-spark: {only_s}\n only-duck: {only_d}"
        )
