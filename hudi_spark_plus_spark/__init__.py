"""hudi_spark_plus_spark — a PySpark-native analytics / CDC-lake engine.

A from-scratch reimplementation of the capabilities of the reference
project AirToSupply/hudi-spark-plus (a Spark+Hudi binlog-CDC sink), built
entirely on public PySpark APIs:

* CDC envelope stream  ->  N keyed lake tables kept in sync (SURVEY.md §2.1)
* keyed lake table format: Parquet + JSON commit log, LWW merge semantics
  (SURVEY.md §2.3 / §7 M3)
* the full relational query surface the reference exposes through its SQL
  transformer hook (SURVEY.md §2.4)
* large-scale training-data operators (dedup, similarity, text analysis)

Everything is DataFrame/SQL-first: Catalyst plans every step; no RDDs.
"""

__version__ = "0.1.0"

from hudi_spark_plus_spark.session import configure_session, get_spark


def Engine(spark):
    """Lazy import of the user-facing facade (hudi_spark_plus_spark.engine)."""
    from hudi_spark_plus_spark.engine import Engine as _Engine

    return _Engine(spark)


__all__ = ["configure_session", "get_spark", "Engine", "__version__"]
