"""Oracle-checked stateful-streaming queries (engine extension, §2.5).

Genuinely-streaming checks that are still DuckDB-expressible: the stream
is two deterministic micro-batches spooled from the `events` table
(batch = ``event_id % 2``, file modification times force batch order),
so cross-batch stateful semantics — first-seen dedup, running per-key
totals — have an exact SQL formulation over the same parquet. This
upgrades the stateful operators from "rows-only" to full hash-checked
rows in CORRECTNESS_r{N}.json.

Fixture prep collects the bounded 2k-row event slice driver-side to
write the two spool files (fixture I/O, not a query plan — same pattern
as cdc_queries' envelope spooling); the streamed pipeline itself is all
executor-side.
"""

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import functions as F

from hudi_spark_plus_spark.localdf import local_frame

from hudi_spark_plus_spark.operators.lake_queries import SUBSET as LAKE_SUBSET
from hudi_spark_plus_spark.sources.loaders import epoch_us, load_table
from hudi_spark_plus_spark.streaming.stateful import (
    stateful_dedup_stream,
    stateful_running_agg_stream,
)

EVENT_BOUND = 2000
_SRC_SCHEMA = (
    "event_id long, user_id long, event_type string, ts long, value double"
)


def _spool_two_batches(spark, sf_dir: str, work: str) -> str:
    """Write the event slice as two JSON spool files (batch = id % 2);
    modification times make the file source read batch 0 first."""
    ev = load_table(spark, sf_dir, "events")
    rows = (
        # spool epoch-us longs so the JSON round-trip is exact and
        # matches the oracle's epoch_us(ts), whatever the source layout
        ev.where(F.col("event_id") < EVENT_BOUND)
        .select(
            "event_id",
            "user_id",
            "event_type",
            epoch_us(ev, "ts").alias("ts"),
            "value",
        )
        .collect()
    )
    src_dir = os.path.join(work, "stream_src")
    os.makedirs(src_dir)
    now = time.time()
    for batch in (0, 1):
        path = os.path.join(src_dir, f"batch{batch}.json")
        with open(path, "w") as f:
            for r in rows:
                if r["event_id"] % 2 == batch:
                    f.write(json.dumps(r.asDict()) + "\n")
        os.utime(path, (now - 120 + batch * 60, now - 120 + batch * 60))
    return src_dir


def _run_stream(spark, out_df_fn, src_dir: str, work: str, mode: str):
    """Start the availableNow stream on the spool dir, run to completion,
    return the materialized memory-sink rows (collected before the
    caller removes the work dir).

    The state store spawns one task (and one Python worker round) per
    shuffle partition PER MICRO-BATCH; at the fixture's bounded 2k rows
    that fixed overhead dominates, so the stream runs on 8 partitions.
    Safe to scope here: the result is fully collected before the conf is
    restored, and each run starts a fresh checkpoint (the partition
    count a state store pins at first start)."""
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        src = (
            spark.readStream.schema(_SRC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(src_dir)
        )
        name = "hsp_stream_" + uuid.uuid4().hex[:8]
        query = (
            out_df_fn(src)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            # awaitTermination returns False on timeout WITHOUT raising;
            # a stopped mid-flight stream would hand back a silently
            # partial memory sink — fail loudly instead
            if not query.awaitTermination(300):
                raise TimeoutError(
                    "availableNow stream did not finish within 300s"
                )
        finally:
            query.stop()
        result = spark.table(name)
        rows = result.collect()
        schema = result.schema
        spark.catalog.dropTempView(name)
        return local_frame(spark, rows, schema)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def q_stream_stateful_dedup(spark, sf_dir):
    """Cross-batch first-seen dedup (applyInPandasWithState): one row per
    user — their earliest (ts, event_id) row from the FIRST micro-batch
    that contains the user. Users whose every event has an odd event_id
    surface from batch 1; everyone else from batch 0 — state suppresses
    their batch-1 rows."""
    work = tempfile.mkdtemp(prefix="hsp_ssd_")
    try:
        src_dir = _spool_two_batches(spark, sf_dir, work)
        out = _run_stream(
            spark,
            lambda s: stateful_dedup_stream(
                s, "user_id", ("ts", "event_id")
            ),
            src_dir,
            work,
            "append",
        )
        return out.select(
            "user_id", "event_id", "event_type", "ts"
        ).orderBy("user_id")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_stateful_agg(spark, sf_dir):
    """Cross-batch running per-user totals (update mode): one row per
    (user, batch-with-rows) carrying lifetime-running count and sum as
    of that batch. The sum is the operator's fixed-point accumulator
    (micros, exact BIGINT) — integers end-to-end, so the oracle compare
    has no float rounding-mode surface at all."""
    work = tempfile.mkdtemp(prefix="hsp_ssa_")
    try:
        src_dir = _spool_two_batches(spark, sf_dir, work)
        out = _run_stream(
            spark,
            lambda s: stateful_running_agg_stream(s, "user_id", "value"),
            src_dir,
            work,
            "update",
        )
        return out.select(
            "user_id",
            "batch_rows",
            "total_rows",
            F.col("total_sum_scaled").alias("total_sum_micros"),
        ).orderBy("user_id", "total_rows")
    finally:
        shutil.rmtree(work, ignore_errors=True)


JOIN_WINDOW_US = 86_400_000_000  # 1 day


def q_stream_join(spark, sf_dir):
    """Stream-stream event-time inner join (§2.5): the even-id event
    stream joined to the odd-id stream per user within a 1-day
    event-time window, watermarked on both sides. The watermark delay
    (30 days) exceeds the fixture's time span, so no row is ever late
    and the inner-join result is deterministic — the API shape is the
    real production one (two watermarked streams + a time-range join
    condition for state cleanup), only the delay is fixture-sized."""
    work = tempfile.mkdtemp(prefix="hsp_ssj_")
    try:
        src_dir = _spool_two_batches(spark, sf_dir, work)
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            def side(parity, tag):
                return (
                    spark.readStream.schema(_SRC_SCHEMA)
                    .json(src_dir)
                    .where(F.col("event_id") % 2 == parity)
                    .select(
                        F.col("user_id").alias(f"{tag}_user"),
                        F.col("event_id").alias(f"{tag}_id"),
                        F.col("ts").alias(f"{tag}_us"),
                        F.timestamp_micros(F.col("ts")).alias(f"{tag}_t"),
                    )
                    .withWatermark(f"{tag}_t", "30 days")
                )

            a, b = side(0, "a"), side(1, "b")
            joined = a.join(
                b,
                (F.col("a_user") == F.col("b_user"))
                & (F.col("b_t") >= F.col("a_t"))
                & (
                    F.col("b_t")
                    <= F.col("a_t") + F.expr("interval 1 day")
                ),
                "inner",
            ).select(
                F.col("a_user").alias("user_id"),
                F.col("a_id"),
                F.col("b_id"),
                (F.col("b_us") - F.col("a_us")).alias("gap_us"),
            )
            name = "hsp_sj_" + uuid.uuid4().hex[:8]
            query = (
                joined.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not query.awaitTermination(300):
                    raise TimeoutError(
                        "availableNow stream did not finish within 300s"
                    )
            finally:
                query.stop()
            result = spark.table(name)
            rows = result.collect()
            schema = result.schema
            spark.catalog.dropTempView(name)
            return local_frame(spark, rows, schema).orderBy(
                "a_id", "b_id"
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment (§2.5 surface the reference's transformer
    users reach for constantly): the event stream joined per micro-batch
    to the BROADCAST customer dimension, aggregated per market segment
    in complete mode. Two micro-batches; the final memory-sink state
    must equal the oracle's single static join+aggregate. Sums are
    exact integer micros."""
    from hudi_spark_plus_spark.sources.loaders import load_table

    work = tempfile.mkdtemp(prefix="hsp_ssq_")
    try:
        src_dir = _spool_two_batches(spark, sf_dir, work)
        dim = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        out = _run_stream(
            spark,
            lambda s: (
                s.join(
                    F.broadcast(dim), s.user_id == dim.c_custkey, "inner"
                )
                .groupBy("c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum(
                        F.expr("CAST(rint(value * 1000000) AS BIGINT)")
                    ).alias("val_micros"),
                )
            ),
            src_dir,
            work,
            "complete",
        )
        return out.orderBy("c_mktsegment")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_lake_source(spark, sf_dir):
    """``readStream.format("lake-table")`` — the lake commit timeline
    as a genuine Structured Streaming source (PySpark 4 Python Data
    Source; Hudi incremental-streaming-read analogue) under oracle
    control. Builds the standard two-batch customer table, streams ALL
    versions with availableNow + foreachBatch, and returns the
    collected change rows: one row per record at its final in-range
    state with its commit version — updates carry +1000 acctbal,
    deletes surface as tombstones (the deleting batch's payload),
    untouched rows stream from version 1."""
    from hudi_spark_plus_spark.operators.lake_queries import (
        SUBSET, _build_lake,
    )
    from hudi_spark_plus_spark.streaming import stream_source

    work = tempfile.mkdtemp(prefix="hsp_streamlake_")
    try:
        lake = _build_lake(spark, sf_dir, work + "/t", "cow")
        stream_source.register(spark)
        rows: list = []

        def take(df, _bid):
            rows.extend(
                df.select(
                    "c_custkey",
                    F.col("_deleted").cast("int").alias("deleted"),
                    F.round("acctbal", 4).alias("acctbal"),
                    F.col("_commit_ver").alias("ver"),
                ).collect()
            )

        q = (
            spark.readStream.format("lake-table")
            .option("path", lake.path)
            .load()
            .writeStream.foreachBatch(take)
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out_schema = (
            "c_custkey bigint, deleted int, acctbal double, ver bigint"
        )
        return local_frame(spark, 
            sorted(tuple(r) for r in rows), out_schema
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_neardup(spark, sf_dir):
    """STREAMING incremental near-dup ingest (functions/dedup.py
    banded_signatures + incremental_neardup_pairs driven from
    Structured Streaming): each micro-batch is probed against the
    PERSISTED signature state — never the corpus — then its survivors'
    signatures and texts are appended to the state, so a duplicate of
    a batch-1 survivor arriving in batch 2 is caught by state the
    pipeline itself grew (the cross-batch property a batch-global
    re-minhash cannot test). Corpus: docs < 300 with %4 != 0, state
    seeded from it. Batch 0: fresh docs 300-349 + corpus %20==1 copies
    at +off. Batch 1: fresh 350-399 + corpus %20==3 copies at +off +
    copies of batch-0 FRESH docs (%10==5) at +2·off — those must pair
    iff their source SURVIVED batch 0. Survivor rule (both engines):
    drop a doc iff it matched state ('corpus' scope) or a lower-id
    doc of its own batch ('delta' scope dup side). Verified at
    jaccard 1.0 — equal distinct-shingle sets, replayed exactly by
    DuckDB including the survivor-state construction.

    r11 (VERDICT r10 directive 6): state routes through
    ``StreamingNearDup`` — BOTH state surfaces (signatures + survivor
    texts) are lake tables committed exactly-once per stream batch_id,
    so a crashed-and-replayed micro-batch is a state no-op (the
    restart-replay property is unit-tested in
    test_signature_store.py); the raw-parquet-append state of r10 had
    no replay protection. Pair output is IDENTICAL: same probe, same
    survivor rule, same state content."""
    from hudi_spark_plus_spark.functions.signature_store import (
        StreamingNearDup,
    )
    from hudi_spark_plus_spark.operators.llm_queries import _plant_offset

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = d.agg(F.max("doc_id")).first()[0]
    off = _plant_offset(max_id if max_id is not None else 0)
    did = F.col("doc_id")
    corpus = d.where((did < 300) & (did % 4 != 0))
    fresh1 = d.where((did >= 300) & (did < 350))
    fresh2 = d.where((did >= 350) & (did < 400))
    b0 = fresh1.unionByName(
        corpus.where(did % 20 == 1).withColumn("doc_id", did + F.lit(off))
    )
    b1 = (
        fresh2.unionByName(
            corpus.where(did % 20 == 3).withColumn(
                "doc_id", did + F.lit(off)
            )
        ).unionByName(
            fresh1.where(did % 10 == 5).withColumn(
                "doc_id", did + F.lit(2 * off)
            )
        )
    )

    work = tempfile.mkdtemp(prefix="hsp_streamnd_")
    try:
        src_dir = os.path.join(work, "src")
        os.makedirs(src_dir)
        now = time.time()
        for i, b in enumerate((b0, b1)):
            path = os.path.join(src_dir, f"batch{i}.json")
            with open(path, "w") as fh:
                for r in b.collect():  # bounded fixture spool (~110/doc)
                    fh.write(json.dumps(r.asDict()) + "\n")
            os.utime(path, (now - 120 + i * 60,) * 2)
        pipe = StreamingNearDup(
            spark,
            os.path.join(work, "state"),
            verify_threshold=1.0,
            max_bucket_size=1_000_000,
        )
        pipe.seed(corpus, "doc_id", "text")
        collected: list = []

        def on_batch(bdf, bid):
            # exactly-once per stream batch id: the pipeline probes the
            # batch against state it itself grew, then commits survivor
            # texts + signatures transactionally; a replayed bid is a
            # no-op (pairs=None)
            pairs = pipe.process_batch(bdf, "doc_id", "text", f"b{bid}")
            if pairs is not None:
                collected.extend(
                    (int(bid), r["new_id"], r["dup_id"], r["jac"], r["scope"])
                    for r in pairs.collect()
                )

        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src_dir)
        )
        q = (
            src.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                raise TimeoutError(
                    "availableNow stream did not finish within 300s"
                )
        finally:
            q.stop()
        return local_frame(spark, 
            collected,
            "batch int, new_id long, dup_id long, jac double, scope string",
        ).orderBy("batch", "scope", "new_id", "dup_id")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_ann_index(spark, sf_dir):
    """STREAMING maintenance of the persistent ANN index
    (functions/ann_index.py IvfIndex.add driven from Structured
    Streaming foreachBatch, exactly-once per stream batch id — the
    StreamingNearDup move applied to similarity state): the index is
    built on the natural corpus, then two micro-batches stream in 6
    exact copies of every query (j=1..3 in batch 0, j=4..6 in batch
    1); inside each batch the add is immediately REPLAYED with the
    same stream batch id and must no-op (the crash window of a
    foreachBatch restart). After the stream, copies j=1 are removed
    and batch 0 is re-read from its spool and replayed once more —
    suppressed by batch-id idempotence (H5; the suppression horizon
    is the vacuum retention, the same caveat every batch id carries —
    ann_index.py module docstring). Search then returns copies j=2..6 per
    query at sim 1.0, ranked by n_id — the same deterministic
    construction (and oracle) as q-emb-ann-index, with the mutation
    lifecycle arriving through a real stream + checkpoint instead of
    batch calls."""
    from hudi_spark_plus_spark.functions.ann_index import IvfIndex
    from hudi_spark_plus_spark.operators.llm_queries import _id_offset

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    off = _id_offset(e, "vec_id")
    queries = e.where(F.col("vec_id") < 10)

    def copies(j_lo, j_hi):
        return (
            queries.withColumn(
                "j",
                F.explode(F.array([F.lit(i) for i in range(j_lo, j_hi)])),
            )
            .withColumn("vec_id", F.col("vec_id") + F.col("j") * F.lit(off))
            .drop("j")
        )

    work = tempfile.mkdtemp(prefix="hsp_streamann_")
    try:
        idx = IvfIndex.build(
            spark, f"{work}/idx", e, n_centroids=8, buckets=2
        )
        src_dir = os.path.join(work, "src")
        os.makedirs(src_dir)
        for i, b in enumerate((copies(1, 4), copies(4, 7))):
            with open(os.path.join(src_dir, f"batch{i}.json"), "w") as fh:
                for r in b.collect():  # bounded spool: 30 rows/batch
                    fh.write(
                        json.dumps(
                            {
                                "vec_id": r["vec_id"],
                                "embedding": list(r["embedding"]),
                            }
                        )
                        + "\n"
                    )

        def on_batch(bdf, bid):
            idx.add(bdf, f"sb{bid}")
            ver = idx.table.log.latest().version
            idx.add(bdf, f"sb{bid}")  # in-flight replay: exactly-once
            if idx.table.log.latest().version != ver:
                raise AssertionError("replayed stream add committed twice")

        src = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .json(src_dir)
        )
        q = (
            src.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                raise TimeoutError(
                    "availableNow stream did not finish within 300s"
                )
        finally:
            q.stop()
        removed = [
            int(r["vec_id"]) + off
            for r in queries.select("vec_id").collect()
        ]
        idx.remove(removed, "b-gc")
        # stale crash-replay of batch 0 AFTER the remove
        b0 = spark.read.schema("vec_id long, embedding array<double>").json(
            os.path.join(src_dir, "batch0.json")
        )
        idx.add(b0, "sb0")
        if idx.assignments().where(F.col("id").isin(removed)).count():
            raise AssertionError("stale stream add resurrected removed ids")
        out = idx.search(queries, k=5, nprobe=4).orderBy("q_id", "rank")
        rows = out.collect()  # materialize before the workdir vanishes
        return local_frame(spark, rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


STREAM_QUERIES = {
    "q-stream-neardup": q_stream_neardup,
    "q-stream-ann-index": q_stream_ann_index,
    "q-stream-lake-source": q_stream_lake_source,
    "q-stream-static-join": q_stream_static_join,
    "q-stream-stateful-dedup": q_stream_stateful_dedup,
    "q-stream-stateful-agg": q_stream_stateful_agg,
    "q-stream-join": q_stream_join,
}

def _sh_cte(src: str) -> str:
    """Distinct sorted word-3-gram shingle set per doc (the same
    normalization the MinHash side shingles on) — the equal-set join
    these oracles verify jaccard-1.0 pairs with."""
    return rf"""
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM {src}"""


STREAM_ORACLES = {
    # identical construction (and oracle) to q-emb-ann-index: the
    # surviving copies are j=2..6 per query at sim 1.0, ranked by n_id
    "q-stream-ann-index": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT e.vec_id AS q_id,
               CAST(e.vec_id + (SELECT o FROM off) * j AS BIGINT) AS n_id,
               CAST(1.0 AS DOUBLE) AS sim,
               CAST(j - 1 AS INT) AS rank
        FROM embeddings e, UNNEST(generate_series(2, 6)) AS t(j)
        WHERE e.vec_id < 10
        ORDER BY q_id, rank
    """,
    # full replay INCLUDING the survivor-state construction: batch-0
    # survivors join the probe state for batch 1, so a batch-1 copy of
    # a batch-0 fresh doc pairs iff its source survived batch 0
    "q-stream-neardup": rf"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents
        ),
        corpus AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id < 300 AND doc_id % 4 <> 0
        ),
        b0 AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id >= 300 AND doc_id < 350
          UNION ALL
          SELECT doc_id + (SELECT o FROM off), text FROM corpus
          WHERE doc_id % 20 = 1
        ),
        b1 AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id >= 350 AND doc_id < 400
          UNION ALL
          SELECT doc_id + (SELECT o FROM off), text FROM corpus
          WHERE doc_id % 20 = 3
          UNION ALL
          SELECT doc_id + 2 * (SELECT o FROM off), text FROM documents
          WHERE doc_id >= 300 AND doc_id < 350 AND doc_id % 10 = 5
        ),
        shc AS ({_sh_cte('corpus')}),
        sh0 AS ({_sh_cte('b0')}),
        sh1 AS ({_sh_cte('b1')}),
        p0c AS (
          SELECT d.doc_id AS new_id, c.doc_id AS dup_id
          FROM sh0 d JOIN shc c ON d.g = c.g WHERE len(d.g) > 0
        ),
        p0d AS (
          SELECT a.doc_id AS new_id, b.doc_id AS dup_id
          FROM sh0 a JOIN sh0 b ON a.g = b.g AND a.doc_id < b.doc_id
          WHERE len(a.g) > 0
        ),
        surv0 AS (
          SELECT s.doc_id, s.g FROM sh0 s
          WHERE s.doc_id NOT IN (SELECT new_id FROM p0c)
            AND s.doc_id NOT IN (SELECT dup_id FROM p0d)
        ),
        state1 AS (
          SELECT doc_id, g FROM shc
          UNION ALL SELECT doc_id, g FROM surv0
        ),
        p1c AS (
          SELECT d.doc_id AS new_id, c.doc_id AS dup_id
          FROM sh1 d JOIN state1 c ON d.g = c.g WHERE len(d.g) > 0
        ),
        p1d AS (
          SELECT a.doc_id AS new_id, b.doc_id AS dup_id
          FROM sh1 a JOIN sh1 b ON a.g = b.g AND a.doc_id < b.doc_id
          WHERE len(a.g) > 0
        )
        SELECT * FROM (
          SELECT 0 AS batch, new_id, dup_id,
                 CAST(1.0 AS DOUBLE) AS jac, 'corpus' AS scope FROM p0c
          UNION ALL
          SELECT 0, new_id, dup_id, CAST(1.0 AS DOUBLE), 'delta' FROM p0d
          UNION ALL
          SELECT 1, new_id, dup_id, CAST(1.0 AS DOUBLE), 'corpus' FROM p1c
          UNION ALL
          SELECT 1, new_id, dup_id, CAST(1.0 AS DOUBLE), 'delta' FROM p1d
        )
        ORDER BY batch, scope, new_id, dup_id
    """,
    # one change row per record at its final state: batch-2 winners
    # (updates +1000, tombstoned deletes) at version 2, the rest at 1
    "q-stream-lake-source": f"""
        SELECT c_custkey,
               CAST(c_custkey % 7 = 0 AS INT) AS deleted,
               CASE WHEN c_custkey % 3 = 0 OR c_custkey % 7 = 0
                    THEN ROUND(c_acctbal + 1000.0, 4)
                    ELSE ROUND(c_acctbal, 4) END AS acctbal,
               CAST(CASE WHEN c_custkey % 3 = 0 OR c_custkey % 7 = 0
                         THEN 2 ELSE 1 END AS BIGINT) AS ver
        FROM customer
        WHERE c_custkey < {LAKE_SUBSET}
        ORDER BY c_custkey
    """,
    # the streamed two-batch complete-mode aggregate must converge to
    # the plain static join+aggregate over the same slice
    "q-stream-static-join": f"""
        SELECT c_mktsegment,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(round_even(value * 1000000, 0) AS BIGINT))
                    AS BIGINT) AS val_micros
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.event_id < {EVENT_BOUND}
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    # first batch (event_id parity) containing the user, then that
    # batch's earliest row by (ts, event_id)
    "q-stream-stateful-dedup": f"""
        WITH e AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts,
                 event_id % 2 AS batch
          FROM events WHERE event_id < {EVENT_BOUND}
        ), fb AS (
          SELECT user_id, MIN(batch) AS first_batch FROM e GROUP BY user_id
        ), ranked AS (
          SELECT e.*, ROW_NUMBER() OVER (
                   PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                 ) AS rn
          FROM e JOIN fb
            ON e.user_id = fb.user_id AND e.batch = fb.first_batch
        )
        SELECT user_id, event_id, event_type, ts
        FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
    # event-time-bounded self-join over the same bounded slice, split by
    # event-id parity exactly as the two spooled streams are
    "q-stream-join": f"""
        WITH e AS (
          SELECT event_id, user_id, epoch_us(ts) AS t
          FROM events WHERE event_id < {EVENT_BOUND}
        ), a AS (SELECT * FROM e WHERE event_id % 2 = 0),
           b AS (SELECT * FROM e WHERE event_id % 2 = 1)
        SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
               b.t - a.t AS gap_us
        FROM a JOIN b ON a.user_id = b.user_id
         AND b.t >= a.t AND b.t <= a.t + CAST({JOIN_WINDOW_US} AS BIGINT)
        ORDER BY a_id, b_id
    """,
    # per (user, batch) row with cumulative totals in batch order;
    # total_rows is strictly increasing per user so it doubles as the
    # deterministic secondary sort key. The sum mirrors the engine's
    # fixed-point accumulator exactly: round_even (banker's, = numpy
    # .round on the same IEEE double product) to micros per row, then
    # exact integer summation — no HUGEINT/double leak possible.
    "q-stream-stateful-agg": f"""
        WITH e AS (
          SELECT user_id, event_id % 2 AS batch,
                 CAST(round_even(value * 1000000, 0) AS BIGINT) AS micros
          FROM events WHERE event_id < {EVENT_BOUND}
        ), g AS (
          SELECT user_id, batch, COUNT(*) AS batch_rows,
                 SUM(micros) AS batch_sum
          FROM e GROUP BY user_id, batch
        )
        SELECT user_id, batch_rows,
               CAST(SUM(batch_rows) OVER (
                 PARTITION BY user_id ORDER BY batch
               ) AS BIGINT) AS total_rows,
               CAST(SUM(batch_sum) OVER (
                 PARTITION BY user_id ORDER BY batch
               ) AS BIGINT) AS total_sum_micros
        FROM g ORDER BY user_id, total_rows
    """,
}
