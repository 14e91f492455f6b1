"""Arrow-path construction of SMALL driver-local DataFrames.

``spark.createDataFrame(<python rows>)`` takes the pickled-RDD path: the
rows are split across ``defaultParallelism`` slices and EVERY evaluation
of the frame spins that many Python workers to unpickle a handful of
rows — measured 4.7 s for a 16-row ``coalesce(1).write.parquet`` on
local[32] (one task deserializing 32 python partitions serially),
vs 0.14 s through Arrow (guide §4: the boundary cost is HOW data
crosses, not how much). The engine builds many such frames: metadata
sidecars (ANN centroids/codebooks, NDV sketch-part path mappings),
bounded key lists, and the fixture-query "collect + rebuild so the tmp
dir can be deleted" pattern.

``local_frame`` builds the same frame through ONE Arrow record batch:
single partition, no Python workers on evaluation, exact schema. Any
input Arrow cannot represent (rare nested shapes) falls back to the
classic path, and a frame whose resulting schema differs from the
requested one is rebuilt classically too — callers are guaranteed
bit-identical schema + values either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import StructType


def _as_struct(schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    return StructType.fromDDL(schema)


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)``, via one Arrow batch.

    ``rows``: an iterable of ``Row``/tuple/dict (driver-local, SMALL —
    this materializes the list). ``schema``: StructType or DDL string.
    Falls back to the classic builder whenever the Arrow round trip
    cannot reproduce the exact requested schema, so the result is
    always indistinguishable from ``spark.createDataFrame``."""
    struct = _as_struct(schema)
    rows = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        names = struct.fieldNames()
        data = [
            r.asDict(recursive=True)
            if isinstance(r, Row)
            else (r if isinstance(r, dict) else dict(zip(names, r)))
            for r in rows
        ]
        tbl = pa.Table.from_pylist(data, schema=to_arrow_schema(struct))
        df = spark.createDataFrame(tbl, schema=struct)
        if df.schema == struct:
            return df
    except Exception:
        pass
    return spark.createDataFrame(rows, struct)
