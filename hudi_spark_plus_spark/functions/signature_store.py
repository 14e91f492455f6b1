"""Near-dup signature state managed AS a lake table.

``banded_signatures`` factored MinHash dedup state into a persistable
(id, band, band_key) relation; the bench fixtures persist it as plain
parquet appends. ``SignatureStore`` packages that state on the engine's
OWN table format, which buys — for free — exactly what a 100-TB ingest
pipeline needs around its dedup state:

- **exactly-once ingest**: each batch's signature append is a keyed
  merge with a ``batch_id`` (H5 idempotence) — a crashed-and-replayed
  foreachBatch cannot double-insert signatures, which would otherwise
  make every future probe report the doc as its own duplicate's dup.
- **GC by tombstone** (the prune_signature_state lifecycle, now
  delta-sized): a deleted document's ``bands`` signature rows are
  removed by key — O(deleted × bands) tombstones, never a state rewrite.
- **time travel / incremental / clone**: the state is a lake table, so
  "what did the dedup state look like when batch N landed" and
  zero-copy dev branches of production state come from the format,
  not from bespoke code.

Signature rows are keyed ``{doc_id}:{band}`` — deterministic, so GC can
synthesize a dead document's exact key set without reading the state.
Parameters (k, bands, ngram) are pinned in the store directory at
creation; reopening with different values raises (mixed-parameter
signatures would silently never collide).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_spark_plus_spark.functions.dedup import (
    banded_signatures,
    incremental_neardup_pairs,
)
from hudi_spark_plus_spark.table.lake_table import LakeTable

_PARAMS_FILE = "_signature_params.json"


class SignatureStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        k: int = 64,
        bands: int = 16,
        ngram: int = 3,
        buckets: int = 16,
    ):
        self.spark = spark
        self.k, self.bands, self.ngram = k, bands, ngram
        params = {"k": k, "bands": bands, "ngram": ngram}
        pfile = os.path.join(path, _PARAMS_FILE)
        if os.path.exists(pfile):
            with open(pfile) as fh:
                stored = json.load(fh)
            if stored != params:
                raise ValueError(
                    f"signature store at {path} was created with {stored}; "
                    f"reopening with {params} would produce signatures "
                    "that never collide with the stored ones"
                )
        else:
            os.makedirs(path, exist_ok=True)
            with open(pfile, "w") as fh:
                json.dump(params, fh)
        self.table = LakeTable(spark, path, buckets=buckets)

    # -- state views --------------------------------------------------------

    def state(self, version: int | None = None) -> DataFrame:
        """The (id, band, band_key) relation probes join against —
        the lake snapshot with engine columns projected away."""
        if not self.table.exists():
            return self.spark.createDataFrame(
                [], "id long, band int, band_key long"
            )
        return self.table.snapshot(version=version).select(
            "id", "band", "band_key"
        )

    # -- lifecycle ----------------------------------------------------------

    def _next_ts(self) -> int:
        """Operation timestamp = next table version: a later operation
        always wins LWW, so prune-then-re-ingest (a document deleted
        and later re-added) resurrects the signature instead of losing
        to the stale tombstone a fixed timestamp would pin."""
        latest = self.table.log.latest()
        return (latest.version if latest else 0) + 1

    def _sig_rows(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        from pyspark.sql.types import IntegralType

        field = df.schema[id_col]
        if not isinstance(field.dataType, IntegralType):
            # string ids could collide through the "{id}:{band}" key
            # separator ("a:1"+band 2 vs "a"+band 12)
            raise ValueError(
                f"SignatureStore requires an integral id column; "
                f"{id_col} is {field.dataType.simpleString()}"
            )
        return banded_signatures(
            df, id_col, text_col, self.k, self.bands, self.ngram
        ).select(
            F.concat_ws(":", F.col("id"), F.col("band")).alias("_key"),
            F.lit(self._next_ts()).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            F.col("id").cast("long").alias("id"),
            "band",
            "band_key",
        )

    def probe(
        self,
        batch_df: DataFrame,
        corpus_df: DataFrame,
        id_col: str,
        text_col: str,
        verify_threshold: float | None = None,
        max_bucket_size: int = 1_000_000,
    ) -> DataFrame:
        """Near-dup pairs of ``batch_df`` against the CURRENT stored
        state (plus within-batch) — O(batch) minhash + one band-keyed
        join; ``corpus_df`` supplies candidate texts for verification
        (see incremental_neardup_pairs for the id-disjoint contract)."""
        return incremental_neardup_pairs(
            batch_df,
            corpus_df,
            self.state(),
            id_col,
            text_col,
            self.k,
            self.bands,
            self.ngram,
            verify_threshold=verify_threshold,
            max_bucket_size=max_bucket_size,
        )

    def ingest(
        self, df: DataFrame, id_col: str, text_col: str, batch_id: str
    ) -> None:
        """Append the documents' signatures, exactly once per
        ``batch_id``: a replayed crash-recovery call is a no-op commit,
        so state rows can never duplicate (a doubled signature would
        make every later probe self-match through the duplicate)."""
        self.table.merge(
            self._sig_rows(df, id_col, text_col), batch_id=batch_id
        )

    def prune(self, dead_ids, batch_id: str) -> None:
        """GC deleted documents' signatures by KEY — the keys are
        synthesized from the id alone (``id:band`` for every band), so
        the prune is O(dead × bands) tombstones with no state read.
        ``dead_ids``: DataFrame with an ``id`` column, or an iterable
        of ids (bounded caller lists)."""
        if not isinstance(dead_ids, DataFrame):
            dead_ids = self.spark.createDataFrame(
                [(int(i),) for i in dead_ids], "id long"
            )
        tombs = (
            dead_ids.select(F.col("id").cast("long").alias("id"))
            .distinct()
            # bounded-literal expansion (bands rows, broadcast), the
            # engine's standard idiom — never a data-sized cartesian
            .crossJoin(
                F.broadcast(
                    self.spark.range(self.bands).select(
                        F.col("id").cast("int").alias("band")
                    )
                )
            )
            .select(
                F.concat_ws(":", F.col("id"), F.col("band")).alias("_key"),
                F.lit(self._next_ts()).cast("long").alias("_ts"),
                F.lit("delete").alias("_op"),
                "id",
                "band",
                F.lit(None).cast("long").alias("band_key"),
            )
        )
        self.table.merge(tombs, batch_id=batch_id)
