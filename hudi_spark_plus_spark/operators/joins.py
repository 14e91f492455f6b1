"""Scale-oriented join helpers (SURVEY §4 / 100 TB posture).

* ``salted_join`` — explicit skew mitigation for the pathological case
  AQE's skew-join splitting can't fix: a *broadcast-too-big* dimension
  joined on a key where a handful of values dominate the fact side.
  Fact rows get a random salt in [0, buckets); the dimension is exploded
  x buckets; the join key becomes (key, salt), spreading each hot key
  over ``buckets`` reducers. Exact same result set as the plain join.

* ``write_bucketed`` / co-located joins — Spark bucketed tables
  (``bucketBy`` + ``saveAsTable``): two tables bucketed by the same key
  into the same bucket count sort-merge-join WITHOUT a shuffle on either
  side — the layout cost is paid once at write time. This is the
  "pre-partition the 100 TB fact table once, join it cheaply forever"
  pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Skew-spread equi-join: identical semantics to
    ``fact.join(dim, key, how)`` for how in {inner, left}."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) catalog table. Joins and
    aggregations on ``bucket_col`` between tables bucketed the same way
    run shuffle-free (verify via .explain: no Exchange above the scans)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table_name)
