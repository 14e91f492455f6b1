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
    # r13: all nine r12 pins re-greened in CORRECTNESS_r12.json and are
    # dropped.
    # VERDICT r12 directive 4 — retire the r9 staleness floor: these
    # nine are the last r9-stale greens in the system; one pinned pass
    # moves every registry query's newest green to >= r10. Drop once
    # re-greened.
    "q-doc-hash-embed",
    "q-doc-tfidf",
    "q-emb-cosine-topk",
    "q-emb-quantize",
    "q-lake-dml",
    "q-lake-evolve",
    "q-lake-matview",
    "q-lake-rollback",
    "q-media-audio",
    # r13 semantic changes (pin until a CORRECTNESS row proves them):
    # - IvfIndex lifecycle edits (ADVICE r12 #2 + VERDICT directive 1):
    #   build now seeds under the reserved id __ann_build__ (a user
    #   add(df, "build") lands instead of being silently suppressed),
    #   add/remove reject reserved "__" ids, legacy-layout reopen warns,
    #   rebuild(migrate=True) carries params + batch-id history. Fixture
    #   outputs are construction-identical, but the build/add path every
    #   index fixture runs through is edited:
    "q-emb-ann-index",
    "q-emb-ann-index-pq",
    "q-stream-ann-index",
    # - NdvView union-path fold now filters tombstoned view rows
    #   explicitly (ADVICE r12 #1) — identical today by the cnt=0/NULL-
    #   sketch invariant, but the fold expression changed:
    "q-lake-matview-ndv",
    # - checkpoint-release sweep (ckpt.py: DataFrame.unpersist is a
    #   silent no-op for localCheckpoints — the engine now releases the
    #   wrapped plan-RDD for real). Results are construction-identical,
    #   but the per-batch/per-round execution paths of these fixtures
    #   changed (signature-store releases batch state after ingest,
    #   connected-components releases each superseded round):
    "q-stream-neardup",
    "q-doc-dup-clusters",
    "q-doc-dedup-e2e",
    "q-emb-dedup-e2e",
    # - r13 optimization session: NDV path-normalization UDF is now
    #   Arrow-serialized (ArrowEvalPython — same lambda, same per-file
    #   cardinality):
    "q-lake-ndv",
    # - r13 optimization session: matview refreshes checkpoint their
    #   bounded delta frames once (AggregateView src, MinMaxView
    #   affected+recomputed, PctlView recomputed) — values identical,
    #   execution path of every refresh changed:
    "q-lake-matview-avg",
    "q-lake-matview-minmax",
    "q-lake-matview-pctl",
    "q-lake-matview-pruned",
    "q-lake-derived",
    # - r13 optimization session: the merge fuses the affected-unit
    #   collect with the Bloom-probe collect when the probe could fire
    #   (lake_table._merge_once + _probe_would_gate). Every lake/cdc
    #   query funnels through merge; these four pin the distinct
    #   surfaces (bloom point-lookup, partitioned units, global index,
    #   merge_into composition) plus q-doc-neardup-store above the
    #   multi-file-bucket ingest shape the fusion targets:
    "q-doc-neardup-store",
    "q-lake-point-lookup",
    "q-lake-partitioned",
    "q-lake-global-index",
    "q-lake-merge-into",
    # - r13 optimization session: the integer similarity kernels
    #   (semdedup assignment + within-cluster gram,
    #   semantic_decontaminate scoring) now compute their int64 dots
    #   through float32 BLAS (similarity.int8_gemm) — bit-identical by
    #   arithmetic argument + test_int8_gemm + a full oracle pass on
    #   the exact diff, but the kernel inside these fixtures'
    #   ArrowEvalPython nodes changed (q-emb-dedup-e2e, the third
    #   consumer, is already pinned above):
    "q-emb-decontaminate",
    "q-emb-semdedup",
    # NOT pinned although hash-flagged (the table/ glob folds matview.py
    # + s3_facade.py edits into every q-lake-*/q-cdc-* hash; the r13
    # optimization session's lake_table.py merge edit folds into the
    # same family — the fused path's semantics are pinned by the five
    # representatives above + TestFusedUnitProbeCollect + two full
    # 155-query oracle passes green on the exact diff; the session's
    # bloom build/probe vectorization (bloom.py bulk_add +
    # ndarray might_contain_any, BIT-identical by construction and by
    # test_bloom_bulk) rides the same representatives + another full
    # 155-query oracle pass green on its exact diff):
    # - round-13 late batch: JoinView minmax/mm-neutral/prune-ladder
    #   edits concern JoinView only, whose three fixtures are
    #   never-checked this round (auto-front of the rotation);
    #   NdvView/PctlView gained only the post-commit release_all swap
    #   and MinMaxView a moved type-set constant — behavior identical,
    #   and q-lake-matview-ndv is already pinned above.
    # - s3_facade.py do_GET now reads under store.lock (ADVICE r12 #3):
    #   a test/bench double imported by no query path.
    # - the broad q-lake-*/q-cdc-* family: AggregateView/MinMaxView and
    #   every lake/cdc path are untouched this round; only NdvView's
    #   fold changed, and its one fixture is pinned above.
    # - pinlint.py's import scan moved from regex to ast (ADVICE r12
    #   #4): lint mechanics, not query semantics — baseline regenerated
    #   in the same commit; fold sets verified unchanged for real
    #   imports (regression test pins docstring-quoted imports OUT).
]


def _query_cost() -> dict[str, float]:
    """Last recorded per-query seconds (BENCH.out.json full record) —
    the cheap/expensive split (VERDICT r12 stretch 9). Committed with
    the repo, so the ordering is deterministic per round. Queries with
    no record (new this round) cost 0.0: they sort first within their
    staleness tier, which is where a never-benched query belongs."""
    root = Path(__file__).resolve().parent.parent
    try:
        rec = json.loads((root / "BENCH.out.json").read_text())
        q = rec.get("queries") or {}
        return {k: float(v) for k, v in q.items()}
    except (OSError, ValueError, TypeError):
        return {}


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
    cost = _query_cost()
    # stable sort: pinned first, then unverified/red (rank -1), then
    # oldest green round. WITHIN a staleness tier, CHEAP queries first
    # (VERDICT r12 stretch 9): when the driver's ~50-row cap lands
    # mid-tier, it retires many cheap stale greens instead of a few
    # expensive ones, so the staleness floor advances faster as the
    # registry grows. Registration order breaks remaining ties.
    ordered = sorted(
        out,
        key=lambda k: (
            (-2, 0, 0.0)
            if k in _PINNED
            else (last.get(k, -1), 1, cost.get(k, 0.0))
        ),
    )
    return {k: out[k] for k in ordered}


def all_queries() -> dict[str, QueryFn]:
    return _gather(0)


def all_oracles() -> dict[str, str]:
    return _gather(1)
