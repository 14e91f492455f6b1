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


def test_engine_facade(spark, sf_dir, tmp_path):
    """Engine: SQL over registered views + lake table view + CDC sync."""
    from hudi_spark_plus_spark.engine import Engine
    from hudi_spark_plus_spark.operators.cdc_queries import (
        build_envelopes,
        sync_options,
    )

    eng = Engine(spark).register_testdata(sf_dir)
    row = eng.sql(
        "SELECT COUNT(*) AS c FROM lineitem WHERE l_quantity > 45"
    ).first()
    assert row["c"] > 0

    ev = spark.createDataFrame(
        [(1, "db1", "t_customer", "update", 10, 1, "a", 1.0)],
        "seq long, db_name string, table_name string, op string, ts long,"
        " key_id long, col_a string, col_b double",
    )
    status = eng.sync(build_envelopes(ev), sync_options(str(tmp_path)), 0)
    assert status["db1.t_customer"] == "ok"
    t = eng.lake_table(
        f"{tmp_path}/db1/ods_db1_t_customer", buckets=4, view="cust_lake"
    )
    assert eng.sql("SELECT COUNT(*) c FROM cust_lake").first()["c"] == 1


def _ext_oracle_names():
    from hudi_spark_plus_spark.operators.relational_ext import (
        EXT_ORACLES,
        EXT_QUERIES,
    )

    return sorted(n for n in EXT_QUERIES if n in EXT_ORACLES and n != "q-join-salted")


@pytest.mark.parametrize("name", _ext_oracle_names())
def test_ext_query_matches_oracle(name, spark, sf_dir, con):
    from hudi_spark_plus_spark.operators.relational_ext import (
        EXT_ORACLES,
        EXT_QUERIES,
    )

    compare(EXT_QUERIES[name](spark, sf_dir), con, EXT_ORACLES[name], name)


def test_engine_maintenance_methods(spark, tmp_path):
    """Engine facade: compact / vacuum / zorder drive the maintenance
    commands end-to-end on a real table."""
    from hudi_spark_plus_spark.engine import Engine

    eng = Engine(spark)
    t = eng.lake_table(str(tmp_path / "t"), buckets=4)
    df = spark.createDataFrame(
        [(f"k{i}", 1, "upsert", f"v{i}", i % 10, (i * 3) % 10) for i in range(50)],
        "_key string, _ts long, _op string, val string, a int, b int",
    )
    t.merge(df, "b0")
    eng.optimize_zorder(str(tmp_path / "t"), "a", "b", buckets=4)
    stats = eng.compact(str(tmp_path / "t"), buckets=4)
    assert stats["files_after"] <= 4
    v = eng.vacuum(str(tmp_path / "t"), keep_last=1, buckets=4)
    assert v["versions_dropped"] >= 2
    assert t.snapshot().count() == 50
