"""Persistent, mutable ANN index: IVF state managed AS a lake table.

``ivf_topk`` (similarity.py) is the one-shot shape — fit + assign +
probe in one query. A 100-TB embedding corpus doesn't re-fit and
re-assign per query: it maintains an INDEX that new batches are added
to, deleted documents are removed from, and queries probe as it stands.
``IvfIndex`` packages that lifecycle on the engine's own table format,
the same move as ``SignatureStore`` for dedup state:

* **coarse quantizer is fixed at build** — KMeans centroids (seeded,
  sample-bounded fit) persist in a ``centroids/`` parquet sidecar plus
  an O_EXCL params pin (n_centroids/dim/seed — reopening a path with a
  different geometry raises instead of silently mixing cell spaces).
  Centroids are the IVF contract: assignments only stay comparable
  under one fixed quantizer, so growing the corpus never re-fits (the
  standard IVF deployment rule; rebuild = new index when drift
  matters).
* **cell assignments are a lake table** keyed by the vector id:
  ``add(df, batch_id)`` assigns cells (one Arrow-vectorized pandas_udf
  against the broadcast centroid matrix) and merges exactly once per
  ``batch_id`` (H5 — a crash-replayed ingest cannot double-add, and a
  STALE replayed add cannot resurrect a vector a later ``remove``
  tombstoned, because operation timestamps are version-derived LWW);
  ``remove(ids, batch_id)`` is O(removed) key tombstones, no index
  rewrite. Re-adding an id is an upsert (vector update moves cells
  correctly — the key wins, the stale cell row is superseded).
* **search is the ivf_topk probe** against the CURRENT snapshot:
  queries probe their ``nprobe`` nearest cells, candidates come from
  one equi-join on the cell id (scan fraction ~ nprobe/n_centroids of
  the index, never the corpus), exact cosine re-rank of candidates
  only, per-query top-k window. Time travel of the index state comes
  from the format for free (``search(..., version=)``).
"""

import json
import os
import shutil
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from hudi_spark_plus_spark.functions.similarity import DOT_EXPR, NORM_EXPR
from hudi_spark_plus_spark.table.lake_table import LakeTable

_PARAMS_FILE = "_ann_params.json"
_CENTROIDS_DIR = "centroids"


class IvfIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        pfile = os.path.join(path, _PARAMS_FILE)
        try:
            with open(pfile) as fh:
                self.params = json.load(fh)
        except FileNotFoundError:
            raise ValueError(
                f"no ANN index at {path}; create one with IvfIndex.build"
            ) from None
        rows = (
            self.spark.read.parquet(
                os.path.join(
                    path, self.params.get("centroids_dir", _CENTROIDS_DIR)
                )
            )
            .orderBy("cell")
            .collect()
        )  # bounded: n_centroids rows — the quantizer, not the corpus
        self.centers = np.array([r["c"] for r in rows], dtype=np.float64)
        self.table = LakeTable(spark, os.path.join(path, "assignments"))

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int = 16,
        seed: int = 42,
        fit_sample_max: int = 100_000,
        buckets: int = 8,
    ) -> "IvfIndex":
        """Fit the coarse quantizer (sample-bounded, seeded), persist
        it, and add ``corpus`` as the index's first batch."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        pfile = os.path.join(path, _PARAMS_FILE)
        already = FileExistsError(
            f"ANN index already built at {path}; a second build "
            "would remix cell spaces — use a new path"
        )
        # Fail fast BEFORE any fit or write (ADVICE r11 #1): the old
        # flow overwrote the shared centroids/ dir and only then lost
        # the pin race — leaving committed assignments paired with a
        # NEW quantizer fit, the exact cell-space mix the pin guards.
        if os.path.exists(pfile):
            raise already
        c = corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        ).withColumn("features", array_to_vector("vec"))
        n = c.count()
        fit_df = c
        if n > fit_sample_max:
            fit_df = c.sample(fraction=min(1.0, fit_sample_max / n), seed=seed)
        model = KMeans(
            k=n_centroids, seed=seed, maxIter=8, featuresCol="features"
        ).fit(fit_df)
        centers = np.stack(model.clusterCenters())
        os.makedirs(path, exist_ok=True)
        # Each attempt writes its fit to a UNIQUE sidecar dir and the
        # O_EXCL params pin — published LAST, as the commit point —
        # names which dir is THE quantizer. A crash before the pin
        # leaves only an unreferenced dir (path not bricked: rebuild
        # writes its own dir and pins it); a concurrent build that
        # loses the pin race removes its dir and raises — the winner's
        # centroids are never touched, so cell spaces never mix.
        cdir = f"{_CENTROIDS_DIR}.{uuid.uuid4().hex}"
        params = {
            "n_centroids": n_centroids,
            "dim": int(centers.shape[1]),
            "seed": seed,
            "centroids_dir": cdir,
        }
        spark.createDataFrame(
            [(i, [float(x) for x in centers[i]]) for i in range(len(centers))],
            "cell int, c array<double>",
        ).coalesce(1).write.parquet(os.path.join(path, cdir))
        from hudi_spark_plus_spark.functions.signature_store import (
            _atomic_pin,
        )

        if not _atomic_pin(pfile, json.dumps(params)):
            shutil.rmtree(os.path.join(path, cdir), ignore_errors=True)
            raise already
        idx = cls(spark, path)
        idx.table = LakeTable(
            spark, os.path.join(path, "assignments"), buckets=buckets
        )
        idx.add(corpus, "build", id_col=id_col, vec_col=vec_col)
        return idx

    def _next_ts(self) -> int:
        """Version-derived LWW (same rule as SignatureStore): a later
        remove always beats an earlier add's rows, and a re-add after
        remove resurrects instead of losing to the stale tombstone."""
        latest = self.table.log.latest()
        return (latest.version if latest else 0) + 1

    def _with_cells(self, df: DataFrame, vec_col: str) -> DataFrame:
        centers = self.centers

        @F.pandas_udf(IntegerType())
        def cell_of(vecs: pd.Series) -> pd.Series:
            if not len(vecs):
                return pd.Series([], dtype="int32")
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

        return df.withColumn("cell", cell_of(vec_col))

    def add(
        self,
        df: DataFrame,
        batch_id: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        rows = self._with_cells(
            df.select(
                F.col(id_col).alias("id"),
                # normalize storage to array<double>: input corpora vary
                # (float32 embeddings are common) and the remove-path
                # tombstones must share one schema with every add
                F.col(vec_col).cast("array<double>").alias("vec"),
            ),
            "vec",
        ).select(
            F.col("id").cast("string").alias("_key"),
            F.lit(self._next_ts()).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            F.col("id").cast("long").alias("id"),
            "cell",
            "vec",
        )
        self.table.merge(rows, batch_id=batch_id)

    def remove(self, ids, batch_id: str) -> None:
        if not isinstance(ids, DataFrame):
            ids = self.spark.createDataFrame(
                [(int(i),) for i in ids], "id long"
            )
        tombs = (
            ids.select(F.col("id").cast("long").alias("id"))
            .distinct()
            .select(
                F.col("id").cast("string").alias("_key"),
                F.lit(self._next_ts()).cast("long").alias("_ts"),
                F.lit("delete").alias("_op"),
                "id",
                F.lit(None).cast("int").alias("cell"),
                F.lit(None).cast("array<double>").alias("vec"),
            )
        )
        self.table.merge(tombs, batch_id=batch_id)

    # -- reads --------------------------------------------------------------

    def assignments(self, version: int | None = None) -> DataFrame:
        return self.table.snapshot(version=version).select("id", "cell", "vec")

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        version: int | None = None,
    ) -> DataFrame:
        """(q_id, n_id, sim, rank): top-k over the index AS IT STANDS
        (or at a time-travel ``version``) — one cell-id equi-join,
        exact cosine re-rank of the probed cells' candidates only."""
        centers, np_ = self.centers, nprobe

        @F.pandas_udf(ArrayType(IntegerType()))
        def probe_cells(vecs: pd.Series) -> pd.Series:
            if not len(vecs):
                return pd.Series([], dtype=object)
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1)[:, :np_].astype(np.int32)
            return pd.Series(list(order))

        q = queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ).withColumn("cell", F.explode(probe_cells("q_vec")))
        cand = (
            self.assignments(version)
            .withColumnRenamed("id", "n_id")
            .withColumnRenamed("vec", "n_vec")
            .join(q, "cell")
            .where(F.col("q_id") != F.col("n_id"))
        )
        dot = F.expr(DOT_EXPR.format(a="q_vec", b="n_vec"))
        nq = F.expr(NORM_EXPR.format(a="q_vec"))
        nc = F.expr(NORM_EXPR.format(a="n_vec"))
        scored = cand.select(
            "q_id", "n_id", (dot / (nq * nc)).alias("sim_raw")
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("q_id").orderBy(
            F.col("sim_raw").desc(), F.col("n_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "q_id", "n_id", F.round("sim_raw", 4).alias("sim"), "rank"
            )
        )
