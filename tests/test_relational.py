"""t2-style differential tests for the relational surface (q01-q28)."""

import pytest

from hudi_spark_plus_spark.operators.relational import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)
from tests.harness import compare, duck_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = RELATIONAL_QUERIES[name](spark, sf_dir)
    compare(df, con, RELATIONAL_ORACLES[name], name)


def test_approx_count_distinct_within_bound(spark, sf_dir):
    """q16's approx variant: engine-only relative-error assertion
    (SURVEY §2.4 note — sketches differ across engines by design)."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.sources.loaders import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).first()[0]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02)
    ).first()[0]
    assert abs(approx - exact) / exact <= 0.05
