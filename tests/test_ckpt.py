"""release_local_checkpoint (ckpt.py): DataFrame.unpersist is a silent
no-op for localCheckpoints (they persist the internal RDD directly,
never registering in the cache manager) — the helper must release the
blocks for real, and be a safe no-op on arbitrary frames."""

from hudi_spark_plus_spark.ckpt import release_all, release_local_checkpoint


def _persistent(spark):
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_df_unpersist_is_noop_but_release_works(spark):
    base = _persistent(spark)
    df = spark.range(1000).selectExpr("id", "id % 7 AS g")
    c = df.localCheckpoint(eager=True)
    assert _persistent(spark) == base + 1
    # the documented-but-wrong way: cache-manager unpersist does nothing
    c.unpersist(True)
    assert _persistent(spark) == base + 1
    # the real handle: the LogicalRDD's wrapped RDD
    assert release_local_checkpoint(c, blocking=True)
    assert _persistent(spark) == base


def test_release_is_safe_noop_on_plain_frames(spark):
    df = spark.range(10).selectExpr("id * 2 AS x")
    assert release_local_checkpoint(df) is False
    agg = df.groupBy().sum("x")
    assert release_local_checkpoint(agg) is False
    assert agg.collect()[0][0] == 90  # frame still usable


def test_release_all_counts(spark):
    base = _persistent(spark)
    a = spark.range(100).localCheckpoint(eager=True)
    b = spark.range(200).localCheckpoint(eager=True)
    plain = spark.range(5)
    assert release_all((a, plain, b), blocking=True) == 2
    assert _persistent(spark) == base
