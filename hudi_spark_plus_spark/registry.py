"""Central query/oracle registry consumed by __spark_entry__.py.

Every implemented operator from SURVEY.md §2 contributes one entry to
``all_queries()`` and (when SQL-expressible) a DuckDB oracle to
``all_oracles()``. Keys must match; column names must match between the
Spark DataFrame and the oracle SQL (driver hashes columns sorted by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from hudi_spark_plus_spark.operators.relational import RELATIONAL_QUERIES

    out: dict[str, QueryFn] = {}
    out.update(RELATIONAL_QUERIES)
    try:
        from hudi_spark_plus_spark.operators.cdc_queries import CDC_QUERIES

        out.update(CDC_QUERIES)
    except ImportError:
        pass
    try:
        from hudi_spark_plus_spark.operators.llm_queries import LLM_QUERIES

        out.update(LLM_QUERIES)
    except ImportError:
        pass
    return out


def all_oracles() -> dict[str, str]:
    from hudi_spark_plus_spark.operators.relational import RELATIONAL_ORACLES

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    try:
        from hudi_spark_plus_spark.operators.cdc_queries import CDC_ORACLES

        out.update(CDC_ORACLES)
    except ImportError:
        pass
    try:
        from hudi_spark_plus_spark.operators.llm_queries import LLM_ORACLES

        out.update(LLM_ORACLES)
    except ImportError:
        pass
    return out
