"""Central query/oracle registry consumed by __spark_entry__.py.

Every implemented operator from SURVEY.md §2 contributes one entry to
``all_queries()`` and (when SQL-expressible) a DuckDB oracle to
``all_oracles()``. Keys must match; column names must match between the
Spark DataFrame and the oracle SQL (driver hashes columns sorted by name).
Modules without an oracle entry get the driver's weaker rows-only check
(documented per query).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# (module, queries-dict attr, oracles-dict attr)
_SOURCES = [
    ("hudi_spark_plus_spark.operators.relational", "RELATIONAL_QUERIES", "RELATIONAL_ORACLES"),
    ("hudi_spark_plus_spark.operators.relational_ext", "EXT_QUERIES", "EXT_ORACLES"),
    ("hudi_spark_plus_spark.operators.cdc_queries", "CDC_QUERIES", "CDC_ORACLES"),
    ("hudi_spark_plus_spark.operators.window_queries", "WINDOW_QUERIES", "WINDOW_ORACLES"),
    ("hudi_spark_plus_spark.operators.stream_queries", "STREAM_QUERIES", "STREAM_ORACLES"),
    ("hudi_spark_plus_spark.operators.udf_queries", "UDF_QUERIES", "UDF_ORACLES"),
    ("hudi_spark_plus_spark.operators.llm_queries", "LLM_QUERIES", "LLM_ORACLES"),
    ("hudi_spark_plus_spark.operators.lake_queries", "LAKE_QUERIES", "LAKE_ORACLES"),
]

# Registry (= dict insertion) order is the order a bounded driver pass
# visits queries. Round 1's CORRECTNESS file lacked rows for exactly the
# 4 most-recently-registered queries, so the ones that went unchecked are
# pinned to the FRONT this round; the engine-specific no-oracle
# signature queries sit at the back (llm_queries dict order).
_PRIORITY_FIRST = [
    "q-lake-roundtrip",
    "q-lake-mor",
    "q-lake-point-lookup",
    "q-lake-time-travel",
    "q-lake-incremental",
    "q-lake-incremental-mor",
    "q-join-salted",
    "q-emb-neardup-exact",
    "q-emb-neardup-lsh",
    "q-media-features",
    # round-2 session additions: newest registrations are the ones a
    # bounded pass historically dropped, so pin them near the front too
    "q-stream-stateful-dedup",
    "q-stream-stateful-agg",
    "q-stream-join",
    "q-doc-dup-clusters",
    "q-doc-split",
    "q-doc-gopher",
    "q-doc-pack",
    "q-doc-sample",
    "q-emb-dedup-e2e",
    "q-doc-dedup-e2e",
    "q-doc-chunks",
    "q-cdc-4",
    "q-emb-ann-lsh",
    "q-emb-ann-ivf",
]


def _gather(attr_idx: int) -> dict:
    out: dict = {}
    for mod_name, qattr, oattr in _SOURCES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        attr = (qattr, oattr)[attr_idx]
        out.update(getattr(mod, attr, {}))
    head = {k: out[k] for k in _PRIORITY_FIRST if k in out}
    head.update((k, v) for k, v in out.items() if k not in head)
    return head


def all_queries() -> dict[str, QueryFn]:
    return _gather(0)


def all_oracles() -> dict[str, str]:
    return _gather(1)
