"""User-facing engine facade (SURVEY M2's thin ``engine.sql()`` entry).

One object that wires the pieces together the way the reference's users
consume them: relational SQL over registered tables (the transformer
surface), lake tables as queryable relations (H6), and the CDC sync as a
method. Everything underneath is the public DataFrame API.

    eng = Engine(spark).register_testdata("/root/testdata/sf0.01")
    eng.sql("SELECT l_returnflag, count(*) c FROM lineitem GROUP BY 1")
    t = eng.lake_table("/lake/db1/orders")      # snapshot as temp view
    eng.sync(envelope_df, options, batch_id=0)  # one CDC micro-batch
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hudi_spark_plus_spark.operators.sync import sync_batch
from hudi_spark_plus_spark.session import configure_session
from hudi_spark_plus_spark.sources.loaders import TABLES, load_table
from hudi_spark_plus_spark.table.lake_table import LakeTable


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = configure_session(spark)
        self._lake_tables: dict[str, LakeTable] = {}

    # -- relational surface -------------------------------------------------

    def register_testdata(
        self, sf_dir: str, names: tuple[str, ...] = TABLES
    ) -> "Engine":
        for n in names:
            load_table(self.spark, sf_dir, n).createOrReplaceTempView(n)
        return self

    def sql(self, query: str) -> DataFrame:
        """Arbitrary Spark SQL over everything registered (the
        reference's transformer capability, N19/§2.4)."""
        return self.spark.sql(query)

    # -- lake tables --------------------------------------------------------

    def lake_table(
        self, path: str, buckets: int | None = None, view: str | None = None
    ) -> LakeTable:
        """``buckets=None`` (the default) uses the table's persisted bucket
        count; an explicit value is only needed (and only legal) when it
        matches, or when creating a brand-new table."""
        t = self._lake_tables.get(path)
        if t is None:
            t = LakeTable(self.spark, path, buckets)
        elif buckets is not None and buckets != t.buckets:
            # same validation a fresh LakeTable would apply — the cache
            # must not silently swallow a conflicting explicit request
            raise ValueError(
                f"table at {path} is open with buckets={t.buckets}; "
                f"caller requested buckets={buckets}"
            )
        self._lake_tables[path] = t
        if view:
            t.snapshot().createOrReplaceTempView(view)
        return t

    # -- table maintenance ---------------------------------------------------

    def compact(self, path: str, buckets: int | None = None) -> dict:
        """Small-file compaction (~one file per bucket)."""
        from hudi_spark_plus_spark.table.maintenance import compact

        return compact(self.lake_table(path, buckets))

    def vacuum(
        self, path: str, keep_last: int = 1, buckets: int | None = None
    ) -> dict:
        """Drop old timeline versions + delete unreferenced data files."""
        from hudi_spark_plus_spark.table.maintenance import vacuum

        return vacuum(self.lake_table(path, buckets), keep_last)

    def optimize_zorder(
        self, path: str, col_a: str, col_b: str, buckets: int | None = None
    ) -> None:
        """OPTIMIZE ZORDER BY-equivalent: rewrite Z-clustered on two cols."""
        from hudi_spark_plus_spark.table.zorder import zorder_cluster_table

        zorder_cluster_table(self.lake_table(path, buckets), col_a, col_b)

    # -- CDC ----------------------------------------------------------------

    def sync(
        self, envelope_df: DataFrame, options: dict[str, str], batch_id=0
    ) -> dict[str, str]:
        """Run one CDC micro-batch (envelope strings in ``value``)."""
        return sync_batch(self.spark, envelope_df, options, batch_id)
