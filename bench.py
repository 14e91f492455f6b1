#!/usr/bin/env python
"""Benchmark driver (BASELINE.md protocol).

Runs every registered check query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line:

    {"metric": "total_query_wall_sec", "value": <sum sec>, "unit": "sec",
     "queries": {"q01": sec, ...}, "sf": 0.1,
     "cdc": {"rows_per_s": ..., "batch_p50_s": ..., "batch_p95_s": ...}}

Query timing: full materialization via the noop sink (no collect cost).
CDC ingest: the BASELINE protocol's envelope stream (fixture rows ->
10k-row micro-batches -> lake tables), reported as end-to-end rows/s and
per-batch p50/p95.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from hudi_spark_plus_spark.registry import all_queries

    out: dict[str, float] = {}
    qs = all_queries()
    # warm-up: JVM/codegen/file-listing paths
    qs["q01"](spark, sf_dir).count()
    # ... and the streaming state-store/Python-worker path, at the
    # smallest fixture: otherwise the alphabetically-first stateful
    # query absorbs the one-time bring-up (~2s) and reads as a
    # per-query regression (the r3 q-stream-stateful-agg artifact)
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if "q-stream-stateful-agg" in qs and os.path.isdir(tiny):
        qs["q-stream-stateful-agg"](spark, tiny).count()
    # ... and the Python Data Source bring-up (format registration +
    # worker-side pyarrow imports, ~4-6s once per session), same
    # reasoning: otherwise the alphabetically-first lake-format read
    # and the first format write each absorb it and read as per-query
    # regressions (the r8 q-lake-format-write 5.5s->9.8s artifact —
    # warm steady-state is ~3.6s)
    if os.path.isdir(tiny):
        for wname in ("q-lake-batch-source", "q-lake-format-write"):
            if wname in qs:
                qs[wname](spark, tiny).count()
    for name in sorted(qs):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        _materialize(df)
        out[name] = round(time.perf_counter() - t0, 3)
    _clear_session_state(spark)
    return out


def _clear_session_state(spark) -> None:
    """Drop cached/localCheckpointed RDD state between phases so one
    phase's pinned memory doesn't tax the next (minhash/simhash queries
    localCheckpoint their banded signatures)."""
    spark.catalog.clearCache()
    # JavaSparkContext's map is a java.util.Map (the Scala one's keySet
    # can't cross py4j — toArray needs an implicit ClassTag)
    jsc = spark.sparkContext._jsc
    for rdd_id in list(jsc.getPersistentRDDs().keySet().toArray()):
        jsc.sc().unpersistRDD(rdd_id, False)


def bench_cdc(spark, sf_dir: str, rows_per_batch: int = 10_000) -> dict:
    """BASELINE CDC protocol: fixture envelope stream -> lake tables in
    ``rows_per_batch``-row micro-batches; rows/s end-to-end + batch
    latency percentiles."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.operators.cdc_queries import (
        build_envelopes,
        derive_cdc_events,
        sync_options,
    )
    from hudi_spark_plus_spark.operators.sync import sync_batch

    from hudi_spark_plus_spark.plans import config as cfg
    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.maintenance import compact, vacuum

    events = derive_cdc_events(spark, sf_dir).persist()
    n = events.count()
    max_seq = events.agg(F.max("seq")).first()[0]
    n_batches = max(1, n // rows_per_batch)
    step = max_seq // n_batches + 1
    work = tempfile.mkdtemp(prefix="hsp_bench_cdc_")
    out: dict = {}
    try:
        # Producer side (NOT timed): materialize each micro-batch's
        # envelope stream to disk first — the engine ingests envelope
        # text, it doesn't pay for synthesizing it. Shared by both
        # write-mode passes.
        for b in range(n_batches):
            build_envelopes(
                events.where(
                    (F.col("seq") >= b * step) & (F.col("seq") < (b + 1) * step)
                )
            ).coalesce(4).write.mode("overwrite").text(f"{work}/in/b{b}")
        events.unpersist()

        # Warm-up (NOT timed), symmetric with the query phase's: one
        # micro-batch through each write mode into a throwaway dir.
        # Measured (r9, back-to-back same-session passes): the FIRST
        # CDC pass of a session runs up to ~1.9x slower than the
        # second on identical code — parse/merge plan JIT, py4j and
        # parquet write-path bring-up — so an unwarmed record measures
        # session cold-start, not ingest throughput.
        for mode in ("cow", "mor"):
            wopts = sync_options(f"{work}/warm-{mode}")
            wopts[cfg.WRITE_MODE] = mode
            sync_batch(
                spark, spark.read.text(f"{work}/in/b0"), wopts, batch_id=0
            )
        shutil.rmtree(f"{work}/warm-cow", ignore_errors=True)
        shutil.rmtree(f"{work}/warm-mor", ignore_errors=True)

        # Same stream through both write modes: COW (rewrite affected
        # buckets; merge-free reads) is the headline "cdc" record for
        # baseline continuity, MOR (delta appends; read-time resolution)
        # is reported alongside — ingest speed vs reader latency is
        # exactly the trade the two modes make.
        for mode in ("cow", "mor"):
            opts = sync_options(f"{work}/tables-{mode}")
            opts[cfg.WRITE_MODE] = mode
            lat: list[float] = []
            t0 = time.perf_counter()
            for b in range(n_batches):
                env = spark.read.text(f"{work}/in/b{b}")
                bt = time.perf_counter()
                sync_batch(spark, env, opts, batch_id=b)
                lat.append(time.perf_counter() - bt)
            total = time.perf_counter() - t0

            # Table-services honesty: after sustained micro-batch
            # ingest, run compaction + vacuum and report what a READER
            # pays before vs after — the number a long-running
            # deployment actually cares about (COW accumulates small
            # files, MOR accumulates deltas the reader must resolve).
            tables = [
                f"{work}/tables-{mode}/{db}/ods_{db}_{t}"
                for db in ("db1", "db2")
                for t in ("t_customer", "t_order")
            ]

            def read_all_tables() -> float:
                rt = time.perf_counter()
                for p in tables:
                    _materialize(LakeTable(spark, p).snapshot())
                return time.perf_counter() - rt

            snap_pre = read_all_tables()
            # inline-compaction evidence: after sustained MOR ingest the
            # per-bucket delta count must be bounded by the trigger
            # threshold (snapshot reads resolve at most that many deltas
            # per bucket — no unbounded read amplification)
            max_deltas = 0
            for p in tables:
                per_bucket: dict[int, int] = {}
                for f in LakeTable(spark, p).log.live_files():
                    if f.kind == "delta":
                        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
                max_deltas = max(max_deltas, max(per_bucket.values(), default=0))
            ct = time.perf_counter()
            cstats = [compact(LakeTable(spark, p)) for p in tables]
            for p in tables:
                vacuum(LakeTable(spark, p), keep_last=1)
            compact_s = time.perf_counter() - ct
            snap_post = read_all_tables()
            lat.sort()
            out["cdc" if mode == "cow" else "cdc_mor"] = {
                "rows": n,
                "batches": n_batches,
                "rows_per_s": round(n / total, 1),
                "batch_p50_s": round(lat[len(lat) // 2], 3),
                "batch_p95_s": round(
                    lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3
                ),
                "files_before_compact": sum(s["files_before"] for s in cstats),
                "files_after_compact": sum(s["files_after"] for s in cstats),
                "compact_vacuum_s": round(compact_s, 3),
                "snap_read_pre_compact_s": round(snap_pre, 3),
                "snap_read_post_compact_s": round(snap_post, 3),
                "max_deltas_per_bucket": max_deltas,
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def bench_cdc_s3(spark, sf_dir: str, rows_per_batch: int = 10_000) -> dict:
    """The CDC pass with EVERY commit published through the S3
    conditional-write binding (S3ConditionalPutFinalizer against the
    in-process façade, wired via the engine.table.commit.finalizer
    plugin — VERDICT r11 stretch 8): rows/s + batch latency side by
    side with the POSIX-publish `cdc` record puts a number on the
    per-commit conditional-PUT protocol overhead a real object-store
    deployment pays. The façade is localhost HTTP, so the measured
    delta is protocol round-trips + the read-back machinery, not WAN
    latency — a lower bound, stated as such in BASELINE.md.

    Three sub-phases over the SAME envelope stream (r12 directives
    5+6):

    * ``cdc_s3`` — COW, fault-free (baseline continuity);
    * ``cdc_s3_mor`` — MOR delta-append commits: more, smaller
      commits, the path most exposed to per-commit protocol overhead;
    * ``cdc_s3_fault`` — COW with a documented deterministic fault
      schedule injected at the store (per micro-batch b: one 409
      conflict when b%3==0, one lost-200 when b%4==1, one post-write
      502 when b%5==2 — ≈78% of batches see ≥1 fault), pricing the
      retry/read-back protocol under load. Integrity is ASSERTED, not
      assumed: per-table fsck (no missing files, latest version
      readable) and snapshot row counts equal to the fault-free pass.
    """
    import os as _os

    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.operators.cdc_queries import (
        build_envelopes,
        derive_cdc_events,
        sync_options,
    )
    from hudi_spark_plus_spark.operators.sync import sync_batch
    from hudi_spark_plus_spark.plans import config as cfg
    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.maintenance import fsck
    from hudi_spark_plus_spark.table.s3_facade import (
        FACADE_ROOT_ENV,
        FACADE_URL_ENV,
        S3Facade,
    )

    events = derive_cdc_events(spark, sf_dir).persist()
    n = events.count()
    max_seq = events.agg(F.max("seq")).first()[0]
    n_batches = max(1, n // rows_per_batch)
    step = max_seq // n_batches + 1
    work = tempfile.mkdtemp(prefix="hsp_bench_cdcs3_")
    facade = S3Facade(work)
    old_env = {
        k: os.environ.get(k) for k in (FACADE_URL_ENV, FACADE_ROOT_ENV)
    }
    os.environ[FACADE_URL_ENV] = facade.url
    os.environ[FACADE_ROOT_ENV] = work
    out: dict = {}
    try:
        for b in range(n_batches):
            build_envelopes(
                events.where(
                    (F.col("seq") >= b * step) & (F.col("seq") < (b + 1) * step)
                )
            ).coalesce(4).write.mode("overwrite").text(f"{work}/in/b{b}")
        events.unpersist()

        def run_pass(tag, mode, faults):
            opts = sync_options(f"{work}/tables-{tag}")
            opts[cfg.WRITE_MODE] = mode
            opts[cfg.COMMIT_FINALIZER] = (
                "hudi_spark_plus_spark.table.s3_facade:finalizer_from_env"
            )
            # warm-up (NOT timed), symmetric with bench_cdc's
            wopts = dict(opts)
            wopts[cfg.HOODIE_PATH] = (
                f"{work}/warm-{tag}" + "/{db}/ods_{db}_{table}"
            )
            sync_batch(
                spark, spark.read.text(f"{work}/in/b0"), wopts, batch_id=0
            )
            shutil.rmtree(f"{work}/warm-{tag}", ignore_errors=True)
            puts0 = facade.puts_seen
            faults_injected = 0
            lat: list[float] = []
            t0 = time.perf_counter()
            for b in range(n_batches):
                if faults:
                    # deterministic, documented schedule (see docstring)
                    if b % 3 == 0:
                        facade.conflict_budget += 1
                        faults_injected += 1
                    if b % 4 == 1:
                        facade.drop_success_responses += 1
                        faults_injected += 1
                    if b % 5 == 2:
                        facade.gateway_502_after_write += 1
                        faults_injected += 1
                env = spark.read.text(f"{work}/in/b{b}")
                bt = time.perf_counter()
                sync_batch(spark, env, opts, batch_id=b)
                lat.append(time.perf_counter() - bt)
            total = time.perf_counter() - t0
            # un-triggered fault budget must not leak into later passes
            facade.conflict_budget = 0
            facade.drop_success_responses = 0
            facade.gateway_502_after_write = 0
            lat.sort()
            rec = {
                "rows": n,
                "batches": n_batches,
                "rows_per_s": round(n / total, 1),
                "batch_p50_s": round(lat[len(lat) // 2], 3),
                "batch_p95_s": round(
                    lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3
                ),
                "conditional_puts": facade.puts_seen - puts0,
            }
            if faults:
                rec["faults_injected"] = faults_injected
            counts = {}
            for db in ("db1", "db2"):
                for t in ("t_customer", "t_order"):
                    p = f"{work}/tables-{tag}/{db}/ods_{db}_{t}"
                    lake = LakeTable(spark, p)
                    counts[f"{db}.{t}"] = lake.snapshot().count()
                    if faults:
                        audit = fsck(lake)
                        assert audit["ok"], (p, audit)
            if faults:
                # record_history spot-audit: one key's full timeline —
                # exactly one state per commit version (a lost commit
                # would truncate it, a duplicated apply would fork it)
                from hudi_spark_plus_spark.table.audit import (
                    record_history,
                )

                lake = LakeTable(
                    spark, f"{work}/tables-{tag}/db1/ods_db1_t_customer"
                )
                key = lake.snapshot().select("_key").first()[0]
                hist = record_history(lake, key).select(
                    "_commit_ver"
                ).collect()
                vers = [r[0] for r in hist]
                assert vers and len(vers) == len(set(vers)), vers
            rec["_counts"] = counts
            return rec

        out["cdc_s3"] = run_pass("s3", "cow", faults=False)
        out["cdc_s3_mor"] = run_pass("s3-mor", "mor", faults=False)
        out["cdc_s3_fault"] = run_pass("s3-fault", "cow", faults=True)
        # zero lost AND zero duplicated rows under faults: every table
        # converges to the fault-free pass's exact row counts
        assert out["cdc_s3_fault"].pop("_counts") == out["cdc_s3"]["_counts"]
        assert out["cdc_s3_mor"].pop("_counts") == out["cdc_s3"].pop("_counts")
        return out
    finally:
        for k, v in old_env.items():
            if v is None:
                _os.environ.pop(k, None)
            else:
                _os.environ[k] = v
        facade.close()
        shutil.rmtree(work, ignore_errors=True)


def bench_ann_compaction(spark, sf_dir: str, n_batches: int = 10) -> dict:
    """VERDICT r12 stretch 8: streaming-churn maintenance for the ANN
    assignments table. Deployment-sized index + ``n_batches`` MOR
    micro-batch adds (delta appends, the streaming-maintenance write
    shape), then the engine's small-file trigger via
    ``IvfIndex.maintain()``. Reported: the fixed 20-query search
    latency BEFORE vs AFTER compaction (median of 3 — read-time delta
    resolution inside probed cells is what compaction buys back) and
    the live-file fold."""
    import statistics
    import tempfile as _tf

    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.functions.ann_index import IvfIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    work = _tf.mkdtemp(prefix="hsp_anncomp_")
    try:
        idx = IvfIndex.build(
            spark, f"{work}/idx", emb,
            n_centroids=max(8, n // 250), buckets=1,
        )
        base = int(emb.agg(F.max("vec_id")).first()[0]) + 1
        churn = emb.limit(200).localCheckpoint(eager=True)
        for b in range(n_batches):
            idx.add(
                churn.select(
                    (F.col("vec_id") + base * (b + 1)).alias("vec_id"),
                    "embedding",
                ),
                f"churn-{b}",
                mode="mor",
            )
        queries = emb.orderBy("vec_id").limit(20).localCheckpoint(eager=True)

        def timed_search() -> float:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                idx.search(queries, k=5, nprobe=4).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            return statistics.median(runs)

        pre = timed_search()
        stats = idx.maintain(max_deltas_per_bucket=2)
        post = timed_search()
        queries.unpersist()
        churn.unpersist()
        return {
            "ann_compaction": {
                "churn_batches": n_batches,
                "files_before": stats["files_before"],
                "files_after": stats["files_after"],
                "search_pre_compact_s": round(pre, 3),
                "search_post_compact_s": round(post, 3),
                "post_over_pre": round(post / max(pre, 1e-9), 2),
            }
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


# The most expensive registry queries (BENCH_r02 top-5 among data-scaled
# candidates; streaming queries are fixture-bounded by design and excluded)
SPOT10X_QUERIES = [
    "q-doc-dedup-e2e",
    "q-doc-dup-clusters",
    "q-doc-minhash-full",
    "q-emb-ann-ivf",
    "q-emb-dedup-e2e",
    # r8: the substring-dedup wide shuffle (windows keyed by text) is
    # the newest content-keyed exchange — probe that it scales with
    # rows, not pairs (replicas are alphabet-rotated, so cross-replica
    # windows cannot collide and dup spans grow linearly)
    "q-doc-substr-dedup",
    # r9 (VERDICT r8 #5): the remaining r8 operators. BM25's idf table
    # is per-distinct-term (flat) and scoring is one (doc,term) agg;
    # SemDeDup's auto-k must keep per-cluster gram matrices bounded as
    # n grows (the test_semdedup_auto_k_scales_with_corpus invariant,
    # here probed at 10x rows); DSIR is a broadcast-weights scan + one
    # TakeOrdered.
    "q-doc-bm25",
    "q-emb-semdedup",
    "q-doc-dsir",
]


def _probe_matview_refresh(spark, d: str) -> float:
    """Matview-refresh spot10x shape (VERDICT r8 #5): seed an
    AggregateView over a lake table built from ``d``'s documents, then
    time ONLY an incremental refresh of a FIXED-size churn slice (500
    docs). Group-delta maintenance is O(changed groups + touched
    units), never O(view) — so the 10x-source ratio should stay well
    below 10 even though the view's source grew 10x (touched units'
    base files do grow with source size; that residual is what the
    recorded ratio makes visible)."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.matview import AggregateView

    work = tempfile.mkdtemp(prefix="hsp_spotmv_")
    try:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        seed = docs.select(
            F.col("doc_id").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        src = LakeTable(spark, f"{work}/src", buckets=8)
        src.merge(seed, "b1")
        mv = AggregateView(
            spark, f"{work}/mv", src, ["lang"], ["n_chars"]
        )
        mv.refresh()
        churn = (
            docs.orderBy("doc_id")
            .limit(500)
            .select(
                F.col("doc_id").cast("string").alias("_key"),
                F.lit(2).cast("long").alias("_ts"),
                F.lit("upsert").alias("_op"),
                "doc_id",
                F.lit("moved").alias("lang"),  # cross-group updates
                (F.col("n_chars").cast("long") + 1).alias("n_chars"),
            )
        )
        src.merge(churn, "b2")
        t0 = time.perf_counter()
        mv.refresh()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _probe_incremental_neardup(spark, d: str) -> float:
    """Incremental near-dup spot10x shape: a FIXED 300-doc batch probed
    against the (1x vs 10x) corpus's banded signature state. Setup
    (state build — the one-time cost a deployment amortizes across
    ingests) is excluded; the timed part is what every ingest pays:
    batch signatures + the band-keyed state join + candidate
    verification. Should grow far slower than the corpus (the state
    join's probe side is fixed; only the state's row count grows)."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.functions.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = docs.orderBy("doc_id").limit(300)
    # corpus = everything NOT in the batch (docs minus batch). The r9
    # record had this anti-join reversed (batch minus docs == empty), so
    # the probe timed batch-vs-empty-state — meaningless (ADVICE r9 #1).
    corpus = docs.join(batch.select("doc_id"), "doc_id", "left_anti")
    state = banded_signatures(corpus, "doc_id", "text").localCheckpoint(
        eager=True
    )
    t0 = time.perf_counter()
    incremental_neardup_pairs(
        batch, corpus, state, "doc_id", "text", verify_threshold=1.0
    ).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    state.unpersist()
    return dt


def _probe_semdedup_autok(spark, d: str) -> float:
    """SemDeDup's SCALE contract is auto-K (cluster population bounded
    at SEMDEDUP_TARGET_CLUSTER_ROWS as n grows — the paper's own rule).
    The oracled q-emb-semdedup pins an explicit K so DuckDB can replay
    the seeds, which makes ITS ratio O(n^2/K) by construction (measured
    exponent 1.28 at 50x, r10) — this probe times the deployment shape
    instead: n_clusters=None."""
    import time as _t

    from hudi_spark_plus_spark.functions.similarity import semdedup

    emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    t0 = _t.perf_counter()
    semdedup(emb, "vec_id", "embedding", n_clusters=None).write.format(
        "noop"
    ).mode("overwrite").save()
    return _t.perf_counter() - t0


# custom probes: (setup excluded from timing; the callable returns the
# measured seconds itself)
def _probe_partition_scoped_optimize(spark, d: str) -> float:
    """Fixed-work probe for partition-scoped clustering (the
    OPTIMIZE ... WHERE surface): the table is partitioned into
    constant-size 1000-doc slabs, so the 10× fixture has 10× the
    PARTITIONS — and clustering exactly ONE of them must cost
    O(partition), not O(table). Ratio ≈ 1 is the contract; the small
    residual is manifest handling, which grows with partition count."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.zorder import zorder_cluster_table

    work = tempfile.mkdtemp(prefix="hsp_spotopt_")
    try:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        seed = docs.select(
            F.col("doc_id").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "doc_id",
            (F.col("doc_id") / 1000).cast("long").cast("string").alias("slab"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        t = LakeTable(
            spark, f"{work}/t", buckets=4, partition_fields=["slab"]
        )
        t.insert(seed, "b1")
        t0 = time.perf_counter()
        zorder_cluster_table(
            t, "doc_id", "n_chars", partitions=["0"]
        )
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _probe_meta_agg(spark, d: str) -> float:
    """Fixed-work probe for the metadata aggregates (VERDICT r10
    directive 7): the table is partitioned into constant-size 1000-doc
    slabs, so the 10× fixture has 10× the FILES — and
    stats_count + stats_minmax + approx_ndv must stay O(manifest):
    driver arithmetic plus (for NDV) one tiny job over sidecar sketch
    parts, never a data scan. Setup (table build + sketch build — the
    one-time indexing cost) is excluded; the timed part is what every
    query pays, on a FRESH handle so cold manifest resolution is
    included in the claim. Ratio ≈ 1 is the contract; the residual is
    manifest parse + sketch-part read, both metadata-sized."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.ndv import approx_ndv, create_ndv_sketch

    work = tempfile.mkdtemp(prefix="hsp_spotmeta_")
    try:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        seed = docs.select(
            F.col("doc_id").cast("string").alias("_key"),
            F.lit(1).cast("long").alias("_ts"),
            F.lit("upsert").alias("_op"),
            "doc_id",
            "lang",
            (F.col("doc_id") / 1000).cast("long").cast("string").alias("slab"),
        )
        t = LakeTable(
            spark, f"{work}/t", buckets=4, partition_fields=["slab"]
        )
        t.insert(seed, "b1")
        create_ndv_sketch(t, "lang")
        fresh = LakeTable(spark, f"{work}/t", buckets=4)
        t0 = time.perf_counter()
        sc = fresh.stats_count()
        mm = fresh.stats_minmax("doc_id")
        nd = approx_ndv(fresh, "lang")
        dt = time.perf_counter() - t0
        assert sc["files_scanned"] == 0 and mm["files_scanned"] == 0
        assert nd["files_scanned"] == 0
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _probe_ann_search_fixed(spark, d: str) -> float:
    """Fixed-work probe for the persistent ANN index's SEARCH path
    (VERDICT r11 directive 2 — the one new scale-sensitive path that
    lacked one): the index is built at the deployment sizing rule
    (n_centroids grows with the corpus so cell population stays
    ~constant) and a FIXED 20-query batch is searched. With the
    cell-partitioned layout (r12) search reads only the probed cells'
    files via snapshot(partitions=probed_cells), so the timed cost is
    O(nprobe × cell_rows) — independent of index size: ratio ≈ 1. The
    pre-r12 full-snapshot read grew linearly with the index. Setup
    (quantizer fit + first add) is excluded: that is the one-time cost
    an index amortizes; the timed part is what every query batch pays."""
    import tempfile as _tf

    from hudi_spark_plus_spark.functions.ann_index import IvfIndex

    emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    work = _tf.mkdtemp(prefix="hsp_annprobe_")
    try:
        idx = IvfIndex.build(
            spark, f"{work}/idx", emb,
            n_centroids=max(8, n // 250), buckets=1,
        )
        queries = emb.orderBy("vec_id").limit(20).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        idx.search(queries, k=5, nprobe=4).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        queries.unpersist()
        return dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


SPOT10X_PROBES = {
    "matview-fixed-churn-refresh": _probe_matview_refresh,
    "neardup-fixed-batch-vs-corpus": _probe_incremental_neardup,
    "semdedup-autok": _probe_semdedup_autok,
    "optimize-fixed-partition": _probe_partition_scoped_optimize,
    "meta-agg-fixed": _probe_meta_agg,
    "ann-search-fixed": _probe_ann_search_fixed,
}


def _replicate_fixtures(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    """``factor``× the documents/embeddings fixtures, preserving WORKLOAD
    SHAPE: each replica is transformed uniformly (alphabet rotation for
    text, dimension rotation for vectors) so near-dup/cluster structure
    is preserved WITHIN a replica but replicas don't near-dup each other
    — dup pairs scale ~linearly with rows instead of quadratically.
    Replica ids are DENSE (``id * factor + i``): the max id stays
    ~factor× the fixture's max instead of jumping to 10^8-scale sparse
    ids — matching how a real corpus's id space grows with its row count
    (the r6 sparse offsets tripped the then-fixed planted-copy offset
    and killed the whole bench run, VERDICT r6 #2).
    Other tables are symlinked as-is."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = []
    for i in range(factor):
        rot = alpha[i:] + alpha[:i]
        reps.append(
            docs.select(
                (F.col("doc_id") * factor + i).alias("doc_id"),
                (F.translate("text", alpha, rot) if i else F.col("text")).alias(
                    "text"
                ),
                "lang",
                "source",
                "n_chars",
            )
        )
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = []
    for i in range(factor):
        # cyclic dimension shift: within-replica cosine structure is
        # exactly preserved; cross-replica pairs decorrelate
        vec = (
            F.concat(
                F.slice("embedding", i + 1, 1 << 20), F.slice("embedding", 1, i)
            )
            if i
            else F.col("embedding")
        )
        reps.append(
            emb.select(
                (F.col("vec_id") * factor + i).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f not in (
            "documents.parquet",
            "embeddings.parquet",
        ):
            os.symlink(os.path.join(sf_dir, f), os.path.join(out_dir, f))


def bench_spot10x(spark, sf_dir: str, factor: int = 10) -> dict:
    """Scaling probe: time the most expensive registry queries at 1× and
    ``factor``× fixture rows and report the wall-clock ratio — separates
    fixture-bounded costs (ratio ≈ 1: state-store machinery, iteration
    rounds, fit overhead) from data-scaled ones (ratio → factor for
    linear plans; anything superlinear is a scale red flag)."""
    from hudi_spark_plus_spark.registry import all_queries

    qs = all_queries()
    scaled = tempfile.mkdtemp(prefix="hsp_spot10x_")
    out: dict = {}
    try:
        _replicate_fixtures(spark, sf_dir, scaled, factor)
        for name in SPOT10X_QUERIES:
            t0 = time.perf_counter()
            _materialize(qs[name](spark, sf_dir))
            t1 = time.perf_counter() - t0
            _clear_session_state(spark)
            t0 = time.perf_counter()
            _materialize(qs[name](spark, scaled))
            tn = time.perf_counter() - t0
            _clear_session_state(spark)
            out[name] = {
                "t1_s": round(t1, 3),
                "tNx_s": round(tn, 3),
                "ratio": round(tn / max(t1, 1e-9), 2),
            }
        for name, probe in SPOT10X_PROBES.items():
            t1 = probe(spark, sf_dir)
            _clear_session_state(spark)
            tn = probe(spark, scaled)
            _clear_session_state(spark)
            out[name] = {
                "t1_s": round(t1, 3),
                "tNx_s": round(tn, 3),
                "ratio": round(tn / max(t1, 1e-9), 2),
            }
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
    return out


def compact_summary(result: dict) -> dict:
    """Compact (<1.5 KB) record for the FINAL stdout line.

    The driver keeps only the last ~2000 chars of stdout and parses the
    LAST line; the full 145-query record is ~5 KB, so printing it whole
    guarantees a truncated, unparseable tail (BENCH_r07-r10 all recorded
    "parsed": null for exactly this reason — VERDICT r10 directive 1).
    The full record stays in BENCH.out.json; this line carries the
    acceptance metrics (total, q01-q28 subtotal, CDC rows/s, worst
    spot10x ratio) plus the 28 relational per-query timings — small
    enough to never truncate, in the driver's metric/value/unit shape."""
    qs = result.get("queries", {})
    q0128 = {
        k: v for k, v in qs.items() if len(k) == 3 and k[0] == "q" and k[1:].isdigit()
    }
    spot = result.get("spot10x", {})
    out = {
        "metric": result.get("metric"),
        "value": result.get("value"),
        "unit": result.get("unit"),
        "sf": result.get("sf"),
        "n_queries": len(qs),
        "q01_q28_s": round(sum(q0128.values()), 3) if q0128 else None,
        "cdc_rows_per_s": result.get("cdc", {}).get("rows_per_s"),
        "cdc_mor_rows_per_s": result.get("cdc_mor", {}).get("rows_per_s"),
        "cdc_s3_rows_per_s": result.get("cdc_s3", {}).get("rows_per_s"),
        "cdc_s3_mor_rows_per_s": result.get("cdc_s3_mor", {}).get(
            "rows_per_s"
        ),
        "cdc_s3_fault_rows_per_s": result.get("cdc_s3_fault", {}).get(
            "rows_per_s"
        ),
        "ann_compact_post_over_pre": result.get("ann_compaction", {}).get(
            "post_over_pre"
        ),
        "spot10x_max": max((v["ratio"] for v in spot.values()), default=None),
        "queries": q0128,
        "detail": "BENCH.out.json",
    }
    if result.get("contended_with_pids"):
        out["contended_with_pids"] = result["contended_with_pids"]
    if result.get("phases_done"):  # crashed mid-run: say how far it got
        out["phases_done"] = result["phases_done"]
    # hard budget: the per-query dict is the only elastic part — drop it
    # before ever risking the truncation that nulled four rounds of records
    if len(json.dumps(out)) > 1500:
        out.pop("queries", None)
    return out


def _foreign_spark_jvms() -> list[int]:
    """PIDs of Spark JVMs already running before this bench starts.

    Per-query numbers under CPU contention are noise (the r4 working-tree
    rerun disagreed with the committed record by ~9% for exactly this
    reason); any live Spark JVM at bench start is foreign by definition —
    ours hasn't launched yet."""
    pids = []
    try:
        proc_entries = os.listdir("/proc")
    except OSError:  # non-Linux: no procfs — skip the contention check
        return []
    for pid in proc_entries:
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "java" in cmd and ("org.apache.spark" in cmd or "pyspark" in cmd):
            pids.append(int(pid))
    return pids


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hudi_spark_plus_spark.session import get_spark

    contended = _foreign_spark_jvms()
    if contended:
        print(
            f"WARNING: {len(contended)} Spark JVM(s) already running "
            f"(pids {contended}) — per-query timings will be contention "
            f"noise; stop them or discard this record",
            file=sys.stderr,
            flush=True,
        )

    spark = get_spark("hsp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = sf_name
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.out.json"
    )
    result = {
        "metric": "total_query_wall_sec",
        "value": None,
        "unit": "sec",
        "queries": {},
        "sf": sf,
        **({"contended_with_pids": contended} if contended else {}),
        "phases_done": [],
    }

    def checkpoint(phase: str) -> None:
        # durable after EVERY phase: a crash in a later phase must not
        # erase the ~20 min of completed work (the r6 spot10x crash
        # discarded the whole run because only the final write existed)
        result["phases_done"] = result.get("phases_done", []) + [phase]
        with open(out_path, "w") as fh:
            json.dump(result, fh)
            fh.write("\n")

    try:
        # CDC first: its state is fully torn down afterwards, while the
        # query phase leaves JVM warmth that benefits neither unfairly
        cdc = bench_cdc(spark, sf_dir)
        result.update(cdc)
        checkpoint("cdc")
        _clear_session_state(spark)
        result.update(bench_cdc_s3(spark, sf_dir))
        checkpoint("cdc_s3")
        _clear_session_state(spark)
        result.update(bench_ann_compaction(spark, sf_dir))
        checkpoint("ann_compaction")
        _clear_session_state(spark)
        queries = bench_queries(spark, sf_dir)
        result["queries"] = queries
        result["value"] = round(sum(queries.values()), 3)
        checkpoint("queries")
        if os.environ.get("SPARK_GRAFT_SPOT10X", "1") != "0":
            spot = bench_spot10x(spark, sf_dir)
            if spot:
                result["spot10x"] = spot
            checkpoint("spot10x")
        result.pop("phases_done", None)  # complete record: marker gone
        # durable copy FIRST: the driver's stdout capture has truncated
        # the tail before (BENCH_r02/r03 "parsed": null) — the file is
        # the canonical record, the final printed line the contract
        with open(out_path, "w") as fh:
            json.dump(result, fh)
            fh.write("\n")
    finally:
        # Quiesce Spark COMPLETELY before the final print: rounds 7-9
        # all recorded parsed=null because JVM shutdown stack traces
        # (RejectedExecutionException from statusUpdate etc.) landed on
        # the captured stream AFTER the JSON line, and the driver parses
        # the LAST line of output (BENCH_r01 tail proves that contract).
        # Log level OFF silences the shutdown ERRORs; the post-stop
        # sleep lets any straggler JVM threads flush first.
        try:
            spark.sparkContext.setLogLevel("OFF")
        except Exception:
            pass
        try:
            spark.stop()
        except Exception:
            pass
        time.sleep(2)
        sys.stderr.flush()
        sys.stdout.flush()
        print(json.dumps(compact_summary(result)), flush=True)


if __name__ == "__main__":
    main()
