"""Central query/oracle registry consumed by __spark_entry__.py.

Every implemented operator from SURVEY.md §2 contributes one entry to
``all_queries()`` and (when SQL-expressible) a DuckDB oracle to
``all_oracles()``. Keys must match; column names must match between the
Spark DataFrame and the oracle SQL (driver hashes columns sorted by name).
Modules without an oracle entry get the driver's weaker rows-only check
(documented per query).
"""

from __future__ import annotations

import importlib
import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# (module, queries-dict attr, oracles-dict attr)
_SOURCES = [
    ("hudi_spark_plus_spark.operators.relational", "RELATIONAL_QUERIES", "RELATIONAL_ORACLES"),
    ("hudi_spark_plus_spark.operators.relational_ext", "EXT_QUERIES", "EXT_ORACLES"),
    ("hudi_spark_plus_spark.operators.cdc_queries", "CDC_QUERIES", "CDC_ORACLES"),
    ("hudi_spark_plus_spark.operators.window_queries", "WINDOW_QUERIES", "WINDOW_ORACLES"),
    ("hudi_spark_plus_spark.operators.stream_queries", "STREAM_QUERIES", "STREAM_ORACLES"),
    ("hudi_spark_plus_spark.operators.udf_queries", "UDF_QUERIES", "UDF_ORACLES"),
    ("hudi_spark_plus_spark.operators.llm_queries", "LLM_QUERIES", "LLM_ORACLES"),
    ("hudi_spark_plus_spark.operators.lake_queries", "LAKE_QUERIES", "LAKE_ORACLES"),
]

# Registry (= dict insertion) order is the order a bounded driver pass
# visits queries; the registry is larger than the driver's 50-row cap, so
# the order decides which queries get re-verified on each round's freshly
# generated testdata. The rotation is SELF-MAINTAINING: it reads the
# CORRECTNESS_r*.json files the driver leaves in the repo root and sorts
# by the most recent round each query was verified green (hash-green, or
# a rows-only pass for declared no-oracle queries). Never-verified and
# red-row queries sort first; the most-recently-green sort last. Over
# successive rounds this round-robins the full surface through the
# bounded pass with no manual pinning.


def _last_green_round() -> dict[str, int]:
    root = Path(__file__).resolve().parent.parent
    last: dict[str, int] = {}
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


# Front-of-line pins: queries whose ENGINE or ORACLE side changed after
# their last green driver pass (the rotation ranks them by that stale
# green, which can push them behind the cap). Listed queries sort before
# everything else; remove a pin once a CORRECTNESS row proves the new
# code, and regenerate tests/query_source_hashes.json (the pin-lint
# baseline, hudi_spark_plus_spark/pinlint.py) in the same commit.
_PINNED = [
    # r12: all ten r11 pins re-greened in CORRECTNESS_r11.json and are
    # dropped. These five are the last r8-stale greens in the system
    # (VERDICT r11 directive 4 — the rotation's floor): one more pinned
    # pass retires the staleness debt entirely (every registry query's
    # newest green >= r9 after the r12 pass). Drop once re-greened.
    "q-lake-incremental",
    "q-lake-incremental-mor",
    "q-lake-mor",
    "q-lake-point-lookup",
    "q-lake-time-travel",
    # r12 semantic changes (pin until a CORRECTNESS row proves them):
    # - q-emb-ann-index: IvfIndex assignments now PARTITIONED by cell
    #   with search reading snapshot(partitions=probed_cells) — the
    #   VERDICT r11 directive-1 unpruned-scan fix; output is
    #   construction-identical but the whole read path is new
    "q-emb-ann-index",
    # - q-lake-record-history: audit.py refactored into shared batch
    #   machinery (_candidate_timeline_files/_read_eras_aligned — the
    #   directive-7 record_histories base); single-key output is
    #   construction-identical but the engine path is rewritten
    "q-lake-record-history",
    # - q-emb-ann-pq / q-emb-ann-ivfpq: the sq_dists kernel rewrite
    #   changed their pq_topk/ivfpq_topk path (review r12 #2 exposed
    #   that the old closure was blind to it — both re-oracled
    #   hash-green in-session, pinned for a driver row on current code)
    "q-emb-ann-pq",
    "q-emb-ann-ivfpq",
    # NOT pinned although flagged/changed:
    # - q-lake-clone: clone_table's pin naming + carried_batch_ids are
    #   new metadata the fixture's OUTPUT never observes (verified
    #   hash-green against the oracle in-session); 15 unit tests cover
    #   the new lifecycle (test_clone.py), and pinning it would push
    #   the list past the ≤10 cap.
    # - signature-store family (q-doc-neardup-store/-lifecycle): the
    #   O_EXCL params-pin fix only alters the create-race failure path.
    # - the broad q-lake-* family hash-flagged by the lake_table.py
    #   stats_minmax edit: the change touches only the metadata
    #   aggregate path those fixtures never call.
    # - the same family re-flagged by the NEW table/s3_finalizer.py
    #   (pin-lint folds the whole table/ dir into those hashes): the
    #   module is imported by nothing in any query path — it is the
    #   opt-in S3 binding of the commit finalizer, exercised only by
    #   tests/test_s3_finalizer.py.
    # - matview.py avg_cols + maintenance.py fsck/vacuum(dry_run):
    #   additive opt-in surfaces — avg_cols defaults empty (the
    #   maintained state columns, delta frame, and df() output are
    #   construction-identical for every existing view), dry_run
    #   defaults False (real-vacuum path untouched), fsck is new and
    #   report-only. The NEW q-lake-matview-avg sorts first as
    #   never-verified; fsck/dry-run are unit-tested ops tooling, not
    #   query operators.
    # - table/audit.py (record_history) is a NEW read-only module no
    #   existing query imports; its q-lake-record-history sorts first
    #   as never-verified.
    # r12 ADVICE fixes (family re-flagged by table/ edits, none pinned:
    # every change is a failure/race path no fixture output observes):
    # - clone.py: pin record now published atomically + verified-unlink
    #   in the failure handler (ADVICE r11 #3) — success path identical.
    # - ndv.py: approx_ndv retries through the reclaimed-parts
    #   retention race (ADVICE r11 #4) — estimates unchanged.
    # - s3_finalizer.py: 5xx reclassified ambiguous (ADVICE r11 #2) —
    #   still imported by no query path.
    # - ann_index.py build: centroids now land in a unique pinned dir
    #   (ADVICE r11 #1) — build output identical; q-emb-ann-index is
    #   pinned below anyway for the r12 search-path partitioning.
    # - matview.py gained NdvView (additive class; AggregateView and
    #   MinMaxView untouched) — q-lake-matview/-avg/-minmax outputs
    #   unaffected; the NEW q-lake-matview-ndv sorts first as
    #   never-verified, as does q-lake-record-history-batch.
    # - sync.py/config.py gained the engine.table.commit.finalizer
    #   plugin (K9 spec; default UNSET -> POSIX publish, byte-identical
    #   behavior for every existing sync) and table/ gained s3_facade.py
    #   (test/bench double, imported by no query path) — the q-cdc
    #   family re-flags on the table/ blob for these additive surfaces;
    #   the plugin itself is pinned by the sync-through-facade test and
    #   the cdc_s3 bench phase.
    # - similarity.py distance kernels rewritten to the shared matmul
    #   sq_dists (the (B,C,D) broadcast memory cliff, float64-pinned):
    #   flags the one-shot ANN family. Oracle constructions are
    #   centroid-independent (planted exact copies + code-match/
    #   exact-re-rank arms); all six affected queries re-oracled
    #   hash-green in-session, a numpy equivalence test pins kernel
    #   parity, and q-emb-ann-pq/-ivfpq are pinned above (review r12
    #   #2: the pre-fix closure missed their function-local imports).
    # - review r12 batch: snapshot_pruned_to_groups/files_for_* gained
    #   version= (None = latest, byte-identical default); matview
    #   recomputes now PIN the watermark version (q-lake-matview-ndv is
    #   never-verified and sorts first; -minmax/-pruned re-oracled
    #   hash-green in-session — single-writer fixtures are unaffected
    #   by the pin, documented not pinned); the pin-lint closure itself
    #   got deeper (classes + function-local imports), which moves ~80
    #   hashes WITHOUT semantic change — baseline regenerated, the new
    #   closure is the guard the old one claimed to be.
]


def _gather(attr_idx: int) -> dict:
    out: dict = {}
    for mod_name, qattr, oattr in _SOURCES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        attr = (qattr, oattr)[attr_idx]
        out.update(getattr(mod, attr, {}))
    last = _last_green_round()
    # stable sort: pinned first, then unverified/red (rank -1), then
    # oldest green round; registration order breaks ties deterministically
    ordered = sorted(
        out,
        key=lambda k: (-2, 0) if k in _PINNED else (last.get(k, -1), 1),
    )
    return {k: out[k] for k in ordered}


def all_queries() -> dict[str, QueryFn]:
    return _gather(0)


def all_oracles() -> dict[str, str]:
    return _gather(1)
