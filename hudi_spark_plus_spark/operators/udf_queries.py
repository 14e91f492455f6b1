"""UDF-surface check queries (SURVEY §2.4 "UDF surface" row).

The reference's transformer hook means any Spark UDF kind is part of its
declared capability. q28 covers scalar pandas UDFs; these cover the rest:

* q-udaf-grouped     — grouped-agg pandas UDF (Arrow): per-group weighted
  average, oracled by the equivalent SQL aggregate.
* q-udf-grouped-map  — ``applyInPandas`` grouped-map: per-group z-score
  normalization, oracled by the window-function rewrite.

Both are deterministic float pipelines: the pandas (numpy f64) arithmetic
is ordered to match the SQL formulation so ROUND(x, 4) hash-matches.

NOTE: no ``from __future__ import annotations`` — pandas_udf needs real
type hints.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from hudi_spark_plus_spark.sources.loaders import load_table


def q_udaf_grouped(spark, sf_dir):
    """Grouped-agg pandas UDAF: quantity-weighted mean discount.

    (Small-magnitude ratio on purpose: summation-order differences
    between pandas pairwise sums and SQL engines stay ~1e-12, far below
    the ROUND(·, 4) grid — price-scale sums would not hash reliably.)
    """

    @F.pandas_udf(DoubleType())
    def weighted_avg(disc: pd.Series, qty: pd.Series) -> float:
        den = float(qty.sum())
        if den == 0.0:
            return None
        return float((disc * qty).sum() / den)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg("l_discount", "l_quantity"), 4
            ).alias("wavg")
        )
        .orderBy("l_returnflag")
    )


def q_udf_grouped_map(spark, sf_dir):
    """applyInPandas grouped-map: z-score of acctbal within each nation
    (population std, ddof=0 — matches SQL stddev_pop)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sigma = pdf["c_acctbal"].std(ddof=0)
        z = (pdf["c_acctbal"] - mu) / sigma if sigma > 0 else pdf["c_acctbal"] * 0.0
        return pd.DataFrame(
            {"c_custkey": pdf["c_custkey"], "z": z}
        )

    c = load_table(spark, sf_dir, "customer")
    out = c.groupBy("c_nationkey").applyInPandas(
        zscore, "c_custkey long, z double"
    )
    return out.select("c_custkey", F.round("z", 4).alias("z")).orderBy(
        "c_custkey"
    )


UDF_QUERIES = {
    "q-udaf-grouped": q_udaf_grouped,
    "q-udf-grouped-map": q_udf_grouped_map,
}

UDF_ORACLES = {
    "q-udaf-grouped": """
        SELECT l_returnflag,
               ROUND(SUM(l_discount * l_quantity) / SUM(l_quantity), 4)
                   AS wavg
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q-udf-grouped-map": """
        SELECT c_custkey,
               ROUND(CASE WHEN stddev_pop(c_acctbal)
                               OVER (PARTITION BY c_nationkey) > 0
                          THEN (c_acctbal - AVG(c_acctbal)
                                OVER (PARTITION BY c_nationkey))
                               / (stddev_pop(c_acctbal)
                                  OVER (PARTITION BY c_nationkey))
                          ELSE 0.0 END, 4) AS z
        FROM customer ORDER BY c_custkey
    """,
}
