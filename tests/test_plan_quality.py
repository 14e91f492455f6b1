"""Plan-quality guards: the physical plans the 100 TB posture depends on
must not silently regress (SURVEY §4.3 / build-brief requirements)."""

import re

import pytest

from hudi_spark_plus_spark.operators.relational import q01, q05, q10, q17

pytestmark = pytest.mark.slow  # full-tier suite (see pytest.ini)


def plan_of(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(q01(spark, sf_dir))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_quantity" in scan and "45" in plan
    # pruned read schema: none of the untouched columns are scanned
    for col in ("l_partkey", "l_suppkey", "l_returnflag", "l_shipdate"):
        assert col not in scan, f"unpruned column {col} in scan"


def test_q05_dimensions_broadcast(spark, sf_dir):
    plan = plan_of(q05(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_q10_range_join_stays_hash(spark, sf_dir):
    """The theta predicate must ride an equi hash join as a post-filter,
    never a nested-loop/cartesian plan."""
    plan = plan_of(q10(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q11_asof_join_has_no_join_operator(spark, sf_dir):
    """The as-of join (VERDICT r5 directive 7 / r6 directive 3) must be
    the union+window shape: ONE window over the key, ZERO join operators
    — the old expanding inner range-join (each order × all earlier
    events of its user, then groupBy-max) is the at-scale killer this
    guards against."""
    from hudi_spark_plus_spark.operators.relational import q11

    plan = plan_of(q11(spark, sf_dir))
    assert "Join" not in plan, plan  # no join operator of ANY kind
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert "Union" in plan


def test_asof_join_left_and_tie_semantics(spark):
    """asof_join unit semantics: latest right at-or-BEFORE (ties
    included), inner drops unmatched, left keeps them as nulls."""
    from hudi_spark_plus_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 5, 2), ("b", 7, 3), ("c", 9, 4)],
        "k string, lts long, lid int",
    )
    right = spark.createDataFrame(
        [("a", 5, "r1"), ("a", 8, "r2"), ("a", 11, "r3"), ("b", 8, "r4")],
        "k string, rts long, rv string",
    )
    inner = asof_join(
        left, right, ["k"], ["k"], "lts", "rts", ["rv"], how="inner"
    )
    got = {(r["lid"], r["rv"]) for r in inner.collect()}
    # lid=1 (a@10): r2@8; lid=2 (a@5): tie -> r1@5; b@7: no rts<=7 on b
    # is false (8>7) -> dropped; c: no right rows -> dropped
    assert got == {(1, "r2"), (2, "r1")}
    outer = asof_join(
        left, right, ["k"], ["k"], "lts", "rts", ["rv"], how="left"
    )
    got = {(r["lid"], r["rv"]) for r in outer.collect()}
    assert got == {(1, "r2"), (2, "r1"), (3, None), (4, None)}


def test_asof_join_timestamp_columns_keep_subsecond_precision(spark):
    """TIMESTAMP ts columns must match at micros precision — a plain
    long cast would truncate to whole seconds and pick the WRONG right
    row when candidates differ only sub-second. Unsupported ts types
    raise instead of silently coarsening."""
    import datetime

    import pytest as _pytest

    from hudi_spark_plus_spark.operators.joins import asof_join

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    us = lambda n: base + datetime.timedelta(microseconds=n)  # noqa: E731
    left = spark.createDataFrame(
        [("a", us(500_000), 1)], "k string, lts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("a", us(400_000), "early"), ("a", us(600_000), "late")],
        "k string, rts timestamp, rv string",
    )
    got = asof_join(
        left, right, ["k"], ["k"], "lts", "rts", ["rv"]
    ).collect()
    # whole-second truncation would see three equal ts=0 values and
    # tie-break to "late" (0.6s) — the row AFTER the left event
    assert [(r["lid"], r["rv"]) for r in got] == [(1, "early")]
    bad = spark.createDataFrame([("a", "x", 1)], "k string, lts string, lid int")
    with _pytest.raises(ValueError, match="unsupported type"):
        asof_join(bad, right, ["k"], ["k"], "lts", "rts", ["rv"])
    # mixed integral/timestamp pairs silently mis-join (one side keeps
    # its caller unit, the other becomes micros) — must raise instead
    mixed = spark.createDataFrame([("a", 5, 1)], "k string, lts long, lid int")
    with _pytest.raises(ValueError, match="mix"):
        asof_join(mixed, right, ["k"], ["k"], "lts", "rts", ["rv"])


def test_q17_dedup_is_single_shuffle(spark, sf_dir):
    """The LWW-dedup primitive: exactly one hash-partitioning exchange
    (the window), plus the final presentation sort."""
    plan = plan_of(q17(spark, sf_dir))
    hashes = re.findall(r"Exchange hashpartitioning", plan)
    assert len(hashes) == 1, plan


def test_mor_resolution_window_is_key_partitioned(spark, tmp_path):
    """The merge-on-read read-time resolution must be a hash-partitioned
    window on the record key — never a single-partition global window
    (the zorder round-1 mistake must not reappear here)."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"), buckets=2)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "_key string, _ts long, _op string, val string"
    )
    t.merge(mk([("k1", 1, "upsert", "a")]), "b0", mode="mor")
    t.merge(mk([("k1", 2, "upsert", "b")]), "b1", mode="mor")
    plan = plan_of(t.snapshot())
    assert "Window" in plan
    assert "hashpartitioning(_key" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_salted_join_spreads_without_extra_shuffles(spark, sf_dir):
    """q-join-salted: the salted fact side must NOT gain exchanges beyond
    the join + aggregate the plain query needs, and no cartesian shapes."""
    from hudi_spark_plus_spark.operators.relational_ext import q_join_salted

    plan = plan_of(q_join_salted(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_approx_percentile_in_engine_bound(spark, sf_dir):
    """Approx percentile sketch: engine-only relative-error assertion
    (cross-engine sketches differ by design, SURVEY §2.4 note)."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.sources.loaders import load_table

    o = load_table(spark, sf_dir, "orders")
    exact, approx = o.select(
        F.expr("percentile(o_totalprice, 0.5)"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)"),
    ).first()
    assert abs(approx - exact) / exact < 0.05


def test_pack_sequences_window_is_shard_partitioned(spark, sf_dir):
    """Sequence packing must never plan a single-partition global window
    — the running-offset window hash-partitions on the shard key."""
    from hudi_spark_plus_spark.operators.llm_queries import q_doc_pack

    plan = plan_of(q_doc_pack(spark, sf_dir))
    assert "Window" in plan
    assert "hashpartitioning(shard" in plan, plan
    assert "Exchange SinglePartition" not in plan.split("Sort")[0], plan


def test_dup_cluster_rounds_have_no_cartesian_shapes(spark):
    """One label-propagation round must stay hash joins end-to-end."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.functions.clustering import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "id_a long, id_b long"
    )
    df = connected_components(pairs)
    plan = plan_of(df.groupBy("cluster_id").agg(F.count("*").alias("n")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The corpus side of decontamination must join the eval gram set by
    BROADCAST — a shuffle of the full corpus gram stream here would be
    the 100 TB bottleneck."""
    from hudi_spark_plus_spark.operators.llm_queries import LLM_QUERIES

    plan = plan_of(LLM_QUERIES["q-doc-decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_window_is_doc_partitioned(spark, sf_dir):
    """The top-2-gram window partitions by document — never a global
    single-partition window."""
    from hudi_spark_plus_spark.operators.llm_queries import LLM_QUERIES

    plan = plan_of(LLM_QUERIES["q-doc-repetition"](spark, sf_dir))
    assert "Window" in plan
    assert "SinglePartition" not in plan.split("Window")[0].splitlines()[-1]
    # no window without a PARTITION BY over doc_id
    import re as _re

    for m in _re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "doc_id" in m.group(1)


def test_column_mapping_identity_is_plan_noop(spark, tmp_path):
    """For tables that never renamed, the physical/logical mapping must
    add NO projection node — the plan is byte-identical in shape to the
    pre-mapping design."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"), buckets=2)
    t.merge(
        spark.createDataFrame(
            [("k1", 1, "upsert", "a")],
            "_key string, _ts long, _op string, val string",
        ),
        "b0",
    )
    plan = plan_of(t.snapshot())
    # one scan, a filter on the tombstone flag — and no rename Project
    # between them beyond the column selection itself
    assert plan.count("Project") <= 1


def test_new_pipeline_query_plans_are_bounded(spark, sf_dir):
    """Round-3 additions keep the shapes the 100 TB posture requires:
    the pipeline capstone joins by hash/broadcast only; the unigram
    bucketing's single nested-loop join is the 1-row threshold
    broadcast (bounded by construction); the mixture is a pure filter
    (rates resolved in a bounded driver-side aggregate, no join)."""
    from hudi_spark_plus_spark.operators.llm_queries import LLM_QUERIES

    p1 = plan_of(LLM_QUERIES["q-doc-pipeline-e2e"](spark, sf_dir))
    assert "CartesianProduct" not in p1
    assert "BroadcastNestedLoopJoin" not in p1
    p2 = plan_of(LLM_QUERIES["q-doc-unigram-ppl"](spark, sf_dir))
    assert "CartesianProduct" not in p2
    assert p2.count("BroadcastNestedLoopJoin") <= 1  # 1-row cuts only
    p3 = plan_of(LLM_QUERIES["q-doc-mixture"](spark, sf_dir))
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in p3, f"mixture must be a pure filter, found {j}"


def test_incremental_dedup_never_joins_full_corpus(spark, sf_dir):
    """The bloom path must keep the corpus out of the new-batch plan:
    candidates verify through hash semi/anti joins only — no nested
    loop, no cartesian, and exactly one semi-join (the verification)."""
    from hudi_spark_plus_spark.functions.dedup import incremental_dedup
    from hudi_spark_plus_spark.sources.loaders import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    out = incremental_dedup(
        d.where(F.col("doc_id") >= 400),
        d.where(F.col("doc_id") < 400),
        "doc_id",
        "text",
    )
    plan = plan_of(out)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_lines_uses_no_window(spark, sf_dir):
    """Line reassembly must be a groupBy + in-group array_sort, never a
    global/partitioned Window (and never a cartesian)."""
    from hudi_spark_plus_spark.functions.dedup import (
        dedup_lines,
        segment_words_expr,
    )
    from hudi_spark_plus_spark.sources.loaders import load_table

    d = load_table(spark, sf_dir, "documents")
    seg = d.select("doc_id", segment_words_expr("text", 8).alias("_l"))
    plan = plan_of(dedup_lines(seg, "doc_id", "_l"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_plan_takeordered_and_broadcast(spark, sf_dir):
    """DSIR selection must plan as TakeOrderedAndProject (no full sort
    materializes for a top-n) with BROADCAST weight joins (the bucket
    tables are n_buckets rows), and no cartesian/NL joins anywhere."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.functions.selection import dsir_select
    from hudi_spark_plus_spark.sources.loaders import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = plan_of(dsir_select(d, F.col("lang") == "en", 100))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join is allowed: the standing 1-row
    # broadcast-totals crossJoin idiom (same adjudication as
    # relational_ext.py:54 / ngrams.py:275)
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "SortMergeJoin" not in plan, "weight join must broadcast"


def test_semdedup_plan_no_allpairs_join(spark, sf_dir):
    """SemDeDup's pair stage is per-cluster applyInPandas — the plan
    must contain the grouped-map node and NO join at all (an engine
    regression to a self-join would be the quadratic shape the operator
    exists to avoid)."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.functions.similarity import semdedup
    from hudi_spark_plus_spark.sources.loaders import load_table

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    plan = plan_of(semdedup(e.select("vec_id", "embedding")))
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_semdedup_auto_k_scales_with_corpus(spark):
    """n_clusters=None sizes K to the corpus: big synthetic id range ->
    more clusters -> bounded cluster populations (the paper's scaling
    rule), floored at 8 and capped at the seed-table ceiling."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.functions.similarity import (
        SEMDEDUP_TARGET_CLUSTER_ROWS,
        semdedup,
    )

    n = 4 * SEMDEDUP_TARGET_CLUSTER_ROWS
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 97 + 1).cast("float"),
            (F.col("id") * 7 % 89 + 1).cast("float"),
            (F.col("id") * 13 % 83 + 1).cast("float"),
            (F.col("id") * 29 % 79 + 1).cast("float"),
        ).alias("embedding"),
    )
    out = semdedup(df, n_clusters=None, threshold_centi=100)
    k = out.select("cluster_id").distinct().count()
    # auto K = n // target = 4; floor lifts it to 8 -> more than the
    # fixed-8 default would give a 10x corpus, and every row clusters
    assert k >= 4
    assert out.count() == n
    small = semdedup(df.limit(100), n_clusters=None, threshold_centi=100)
    assert small.select("cluster_id").distinct().count() <= 8


def test_bm25_plans_topk_and_broadcast_constants(spark, sf_dir):
    """BM25 must take its top-k with TakeOrderedAndProject (per-partition
    heap + k-row driver merge — never a global sort) and join the
    terms-row idf/corpus constants by broadcast, not shuffle."""
    from hudi_spark_plus_spark.operators.llm_queries import q_doc_bm25

    plan = plan_of(q_doc_bm25(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_substring_dedup_no_cartesian_single_wide_shuffle(spark, sf_dir):
    """Substring dedup's only content-keyed shuffle is the window-text
    group (the 'suffix array' step); everything else partitions by doc
    id. No cartesian products, no nested-loop joins on data."""
    from hudi_spark_plus_spark.operators.llm_queries import (
        q_doc_substr_dedup,
    )

    plan = plan_of(q_doc_substr_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the wide shuffle on the window text appears exactly once as a
    # hashpartitioning on the substring column
    assert len(re.findall(r"hashpartitioning\(sub", plan)) <= 2


def test_fn_index_build_scan_is_column_pruned(spark, tmp_path):
    """The functional-index build job must read ONLY the expression's
    input columns — a build that scans the full schema defeats the
    'one cheap metadata job' contract at 100 TB."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable
    import pyspark.sql.functions as F

    t = LakeTable(spark, str(tmp_path / "fnp"), buckets=2)
    t.insert(
        spark.createDataFrame(
            [(f"k{i}", 1, f"2024-01-{i % 28 + 1:02d}", i, "x" * 50)
             for i in range(20)],
            "_key string, _ts long, dt string, n long, blob string",
        ),
        "b1",
    )
    files = t.log.live_files()
    df = (
        t._read_files(files)
        .select(
            F.input_file_name().alias("_f"),
            F.expr("substring(dt, 1, 7)").alias("_v"),
        )
        .groupBy("_f")
        .agg(F.min("_v"), F.max("_v"))
    )
    scan = next(
        l for l in plan_of(df).splitlines() if "FileScan parquet" in l
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert m, scan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"dt"}, read_cols


def test_matview_delta_is_single_shuffle_of_the_slice(spark, tmp_path):
    """The maintenance delta must be ONE exchange keyed by the group
    (partial aggregation below it), reading the CDC slice — never the
    source snapshot. A second content shuffle or a snapshot-sized scan
    here turns refresh cost from O(delta) into O(table)."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.matview import AggregateView

    src = LakeTable(spark, str(tmp_path / "mvsrc"), buckets=2)
    src.merge(
        spark.createDataFrame(
            [("k1", 1, "upsert", "a", 1), ("k2", 1, "upsert", "b", 2)],
            "_key string, _ts long, _op string, g string, v long",
        ),
        "b1",
    )
    src.merge(
        spark.createDataFrame(
            [("k1", 2, "upsert", "b", 3)],
            "_key string, _ts long, _op string, g string, v long",
        ),
        "b2",
    )
    mv = AggregateView(spark, str(tmp_path / "mvv"), src, ["g"], ["v"])
    plan = plan_of(mv._deltas(1, 2))
    # partial+final hash agg around exactly one group-keyed exchange
    # (the CDC before-image join adds its own bounded exchanges; the
    # DELTA aggregation itself must contribute exactly one)
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    frag = plan[plan.index("HashAggregate"):]
    # the aggregation's own exchange is hashpartitioning on the group
    assert re.search(r"hashpartitioning.*\bg\b", plan), plan


def test_scan_for_values_reads_only_kept_files(spark, tmp_path):
    """Secondary-index equality scans must plan a FileScan over the
    Bloom-hit files only — the pruning is I/O-level, visible in the
    number of scanned files."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable

    t = LakeTable(spark, str(tmp_path / "sip"), buckets=4)
    t.merge(
        spark.createDataFrame(
            [(f"k{i:02d}", 1, "upsert", f"cat{i % 7}") for i in range(60)],
            "_key string, _ts long, _op string, cat string",
        ),
        "b1",
    )
    t.merge(
        spark.createDataFrame(
            [("k00", 2, "upsert", "UNIQUE")],
            "_key string, _ts long, _op string, cat string",
        ),
        "b2",
    )
    t.create_secondary_index("cat")
    kept, live = t.files_for_values("cat", ["UNIQUE"])
    assert len(kept) < len(live)
    df = t.scan_for_values("cat", ["UNIQUE"])
    # executed scan must reference no more files than kept
    n_scanned = plan_of(df).count(".parquet")
    assert n_scanned <= len(kept) * 2  # path may appear in 2 plan spots


def test_minmax_view_recompute_is_broadcast_semi_no_cartesian(
    spark, tmp_path
):
    """MinMaxView partial recompute: the source scan must be pruned by
    a BROADCAST semi-join on the affected groups (the set is bounded by
    the refresh slice) and aggregated once — a shuffled join or a
    cartesian here turns refresh from O(affected rows) into O(table)."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.matview import MinMaxView

    src = LakeTable(spark, str(tmp_path / "mmsrc"), buckets=2)
    src.merge(
        spark.createDataFrame(
            [("k1", 1, "upsert", "a", 1), ("k2", 1, "upsert", "b", 2)],
            "_key string, _ts long, _op string, g string, v long",
        ),
        "b1",
    )
    mm = MinMaxView(spark, str(tmp_path / "mmv"), src, ["g"], ["v"])
    affected = spark.createDataFrame([("a",)], "g string")
    plan = plan_of(mm._recompute_frame(affected))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_approx_ndv_union_is_broadcast_join_over_parts(spark, tmp_path):
    """The NDV estimate's trusted-path join (r11 executor-side sketch
    residence): sketch parts join the trusted path set via a BROADCAST
    hash join of path strings — never a shuffle of sketch bytes, never
    a cartesian — and the union plan reads the sidecar parquet, not the
    table data."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.table import ndv
    from hudi_spark_plus_spark.table.lake_table import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"), buckets=4)
    t.merge(
        spark.createDataFrame(
            [(str(k), 1, "upsert", f"n{k % 7}") for k in range(50)],
            "_key string, _ts long, _op string, name string",
        ),
        "b1",
    )
    ndv.create_ndv_sketch(t, "name")
    m = ndv.ndv_manifest(t, "name")
    files = t.log.live_files()
    trusted = spark.createDataFrame([(f.path,) for f in files], "path string")
    joined = (
        ndv._read_parts(t, "name", m)
        .join(F.broadcast(trusted), "path")
        .select("s")
    )
    plan = plan_of(joined)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    # both scans are metadata-sized inputs (sidecar parts + path list);
    # the TABLE's data dir must not appear in the estimate plan
    assert all("/data/" not in l for l in scans), scans


def test_ann_search_files_read_subset_of_probed_cells(spark, tmp_path):
    """VERDICT r11 directive 1 plan guard: the persistent ANN index's
    search must PLAN only probed-cell partitions' files — manifest
    partition elimination, visible in the executed plan's file paths
    (`_part=<cell>/`). Complements test_ann_index.py's spy-based guard
    (which pins the snapshot(partitions=) wiring); this one pins the
    physical plan the wiring produces."""
    import numpy as np

    from hudi_spark_plus_spark.functions.ann_index import IvfIndex

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 8)) * 5
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.normal(size=8)])
        for i in range(120)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    idx = IvfIndex.build(
        spark, str(tmp_path / "ann"), corpus, n_centroids=4, buckets=2
    )
    # all three queries from ONE cluster: the probed-cell union stays
    # a strict subset of the 4 populated cells
    queries = spark.createDataFrame(
        [r for r in rows if r[0] % 4 == 0][:3],
        "vec_id long, embedding array<double>",
    )
    df = idx.search(queries, k=3, nprobe=2)
    assert df.count() > 0  # the pruned plan still answers
    # inputFiles() is the planned I/O set (plan text truncates paths)
    planned_cells = {
        int(m)
        for f in df.inputFiles()
        for m in re.findall(r"_part=(\d+)/", f)
    }
    all_cells = {
        int(p) for p in idx.table.partition_values() if p != "default"
    }
    assert planned_cells, "no partition dirs among the planned files"
    assert planned_cells <= all_cells
    # nprobe=2 of 4 populated cells: strictly fewer than all, and the
    # tombstone partition ('default', were one live) is never planned
    assert len(planned_cells) < len(all_cells), planned_cells
    assert not any("_part=default" in f for f in df.inputFiles())


def test_migrated_ann_search_files_read_subset_of_probed_cells(
    spark, tmp_path
):
    """VERDICT r12 directive 1: a LEGACY (pre-cell-partitioned) index
    migrated via rebuild(migrate=True) must produce the same pruned
    physical plan as a native r12 index — files read ⊆ probed cells.
    (The legacy index itself is the full-snapshot fallback the r12
    layout retired; migration is its one-call exit.)"""
    import numpy as np

    from tests.test_ann_index import make_legacy_index

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 8)) * 5
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.normal(size=8)])
        for i in range(120)
    ]
    legacy = make_legacy_index(spark, str(tmp_path / "legacy"), rows)
    idx = legacy.rebuild(str(tmp_path / "migrated"), migrate=True)
    queries = spark.createDataFrame(
        [r for r in rows if r[0] % 4 == 0][:3],
        "vec_id long, embedding array<double>",
    )
    df = idx.search(queries, k=3, nprobe=2)
    assert df.count() > 0
    planned_cells = {
        int(m)
        for f in df.inputFiles()
        for m in re.findall(r"_part=(\d+)/", f)
    }
    all_cells = {
        int(p) for p in idx.table.partition_values() if p != "default"
    }
    assert planned_cells, "no partition dirs among the planned files"
    assert planned_cells <= all_cells
    assert len(planned_cells) < len(all_cells), planned_cells


def test_joinview_fact_delta_broadcasts_dim_single_shuffle(spark, tmp_path):
    """VERDICT r12 directive 3 plan guard: a JoinView refresh's fact
    arm must read the CDC slice (never the fact snapshot), join the
    dim by BROADCAST (never a content shuffle of either side), and the
    delta aggregation must contribute exactly one group-keyed
    exchange. The companion matview guard (test_matview_delta...) pins
    the single-table shape; this pins the join shape."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.matview import JoinView

    fact = LakeTable(spark, str(tmp_path / "fact"), buckets=2)
    dim = LakeTable(spark, str(tmp_path / "dim"), buckets=2)
    dim.merge(
        spark.createDataFrame(
            [("c1", 1, "upsert", 1, "A"), ("c2", 1, "upsert", 2, "B")],
            "_key string, _ts long, _op string, "
            "c_custkey long, c_segment string",
        ),
        "d1",
    )
    fmk = (
        "_key string, _ts long, _op string, "
        "o_id long, o_custkey long, o_price long"
    )
    fact.merge(
        spark.createDataFrame(
            [("o1", 1, "upsert", 101, 1, 10),
             ("o2", 1, "upsert", 102, 2, 20)], fmk,
        ),
        "f1",
    )
    fact.merge(
        spark.createDataFrame(
            [("o1", 2, "upsert", 101, 2, 15)], fmk
        ),
        "f2",
    )
    from pyspark.sql import functions as F

    mv = JoinView(
        spark, str(tmp_path / "mv"), fact, dim,
        "o_custkey", "c_custkey", ["c_segment"], ["o_price"],
    )
    dim_side, fact_side = mv._sides()
    arm = mv._fact_arm(1, 2, 1, dim_side, fact_side)
    deltas = arm.groupBy("c_segment").agg(F.sum("_c").alias("cnt"))
    plan = plan_of(deltas)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"hashpartitioning.*c_segment", plan), plan


def test_joinview_dim_churn_prunes_fact_files(spark, tmp_path):
    """The dim step's fact read must be FILE-pruned by fk (secondary
    index here) at the PINNED fact version — refresh I/O is the
    affected fk values' files, never the fact."""
    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.matview import JoinView

    fact = LakeTable(spark, str(tmp_path / "fact"), buckets=8)
    dim = LakeTable(spark, str(tmp_path / "dim"), buckets=2)
    dim.merge(
        spark.createDataFrame(
            [(f"c{i}", 1, "upsert", i, "A") for i in range(40)],
            "_key string, _ts long, _op string, "
            "c_custkey long, c_segment string",
        ),
        "d1",
    )
    fact.merge(
        spark.createDataFrame(
            [(f"o{i}", 1, "upsert", 100 + i, i % 40, i) for i in range(400)],
            "_key string, _ts long, _op string, "
            "o_id long, o_custkey long, o_price long",
        ),
        "f1",
    )
    fact.create_secondary_index("o_custkey")
    mv = JoinView(
        spark, str(tmp_path / "mv"), fact, dim,
        "o_custkey", "c_custkey", ["c_segment"], ["o_price"],
    )
    mv.refresh()
    # one dim key changes: the fact read must keep only its files
    dim.merge(
        spark.createDataFrame(
            [("c3", 2, "upsert", 3, "MOVED")],
            "_key string, _ts long, _op string, "
            "c_custkey long, c_segment string",
        ),
        "d2",
    )
    from pyspark.sql import functions as F

    mv.refresh()
    assert mv.last_prune.get("strategy") == "file-pruned", mv.last_prune
    assert mv.last_prune["files_kept"] < mv.last_prune["files_live"], (
        mv.last_prune
    )
    # and the maintained state is still exact
    exact = {
        (r["c_segment"], r["cnt"])
        for r in fact.snapshot().alias("f")
        .join(dim.snapshot().alias("d"),
              F.col("f.o_custkey") == F.col("d.c_custkey"))
        .groupBy("c_segment")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    }
    got = {(r["c_segment"], r["cnt"]) for r in mv.df().collect()}
    assert got == exact


def test_joinview_minmax_recompute_prunes_fact_files(spark, tmp_path):
    """The min/max recompute reads the END-state fact FILE-pruned to
    the dirty groups' dim keys (secondary index here) — recompute I/O
    is the dirty groups' files, never the fact."""
    from pyspark.sql import functions as F

    from hudi_spark_plus_spark.table.lake_table import LakeTable
    from hudi_spark_plus_spark.table.matview import JoinView

    fact = LakeTable(spark, str(tmp_path / "fact"), buckets=8)
    dim = LakeTable(spark, str(tmp_path / "dim"), buckets=2)
    # one segment per customer: a single leaving row dirties exactly
    # one group, whose recompute must touch only that fk's files
    dim.merge(
        spark.createDataFrame(
            [(f"c{i}", 1, "upsert", i, f"S{i}") for i in range(40)],
            "_key string, _ts long, _op string, "
            "c_custkey long, c_segment string",
        ),
        "d1",
    )
    fact.merge(
        spark.createDataFrame(
            [(f"o{i}", 1, "upsert", 100 + i, i % 40, i) for i in range(400)],
            "_key string, _ts long, _op string, "
            "o_id long, o_custkey long, o_price long",
        ),
        "f1",
    )
    fact.create_secondary_index("o_custkey")
    mv = JoinView(
        spark, str(tmp_path / "mv"), fact, dim,
        "o_custkey", "c_custkey", ["c_segment"],
        minmax_cols=["o_price"],
    )
    st = mv.refresh()
    assert st["groups_recomputed"] == 0
    # delete S3's min holder: the group recomputes, file-pruned
    fact.merge(
        spark.createDataFrame(
            [("o3", 2, "delete", 103, 3, 3)],
            "_key string, _ts long, _op string, "
            "o_id long, o_custkey long, o_price long",
        ),
        "f2",
    )
    st = mv.refresh()
    assert st["groups_recomputed"] == 1
    assert mv.last_rec_prune.get("strategy") == "file-pruned", (
        mv.last_rec_prune
    )
    assert (
        mv.last_rec_prune["files_kept"] < mv.last_rec_prune["files_live"]
    ), mv.last_rec_prune
    s3 = {
        (r["cnt"], r["min_o_price"], r["max_o_price"])
        for r in mv.df().where(F.col("c_segment") == "S3").collect()
    }
    assert s3 == {(9, 43, 363)}


def test_pctl_sketches_are_executor_side_single_shuffle(spark):
    """VERDICT r12 directive 7 plan guard: quantile sketches are built
    executor-side (mapInPandas partials + per-group applyInPandas
    merge) with exactly ONE content shuffle (the per-group partial
    merge); the driver never holds a sketch."""
    from hudi_spark_plus_spark.table.pctl_sketch import group_sketches

    df = spark.range(0, 10_000, 1, 8).selectExpr(
        "CAST(id % 5 AS STRING) AS g", "id % 997 AS v"
    )
    sk = group_sketches(df, ["g"], ["v"])
    plan = plan_of(sk)
    assert "MapInPandas" in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    rows = sk.collect()
    assert len(rows) == 5 and all(r["cnt"] == 2000 for r in rows)
