"""Approximate distinct counts from per-file HLL sketches.

The fourth metadata aggregate, completing stats_count/stats_minmax
(exact COUNT/MIN/MAX): ``approx_ndv`` answers COUNT(DISTINCT col)
approximately by UNIONING per-file Datasketches HLL sketches stored in
a finalizer-atomic sidecar (``_index/ndv_<col>/``, the secondary-index
lifecycle: stale is safe, retention keeps two manifests, reads
re-resolve once on the retention race). At 100 TB the estimate is a
driver-side union of one small sketch per file — no scan — and HLL's
error bound (~1.6%% at the default lg_k=12) is the ONLY source of
error by construction:

- a file's stored sketch is trusted only under the same exactness
  doctrine as stats_minmax — the file must be clean under
  ``_meta_agg_split`` (no delta resolution can supersede its rows) AND
  hold no tombstones (``live_rows == rows``), because HLL cannot
  subtract a deleted value;
- every untrusted or unsketched file is scanned (snapshot semantics —
  resolve + drop tombstones) into ONE fresh sketch and unioned in.

So stale sketches, MOR churn, and tombstones degrade to bounded extra
scan, never to an estimate over rows the snapshot does not contain.
Sketch build and union are pure JVM (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) — no Python in the loop.

Supported column types follow hll_sketch_agg: integral and string.
Nulls are ignored on both the sketch and scan paths, matching SQL
COUNT(DISTINCT).
"""

from __future__ import annotations

import base64
import json
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from hudi_spark_plus_spark.table.commit_log import CommitConflict
from hudi_spark_plus_spark.table.lake_table import DELETED_COL, LakeTable

NDV_PREFIX = "ndv_"
DEFAULT_LG_K = 12

_SKETCHABLE = ("string", "tinyint", "smallint", "int", "bigint")


def _ndv_field(lake: LakeTable, col: str):
    sch = lake.schema()
    if sch is None:
        raise ValueError(f"lake table at {lake.path} has no commits")
    for fld in sch.fields:
        if fld.name == col:
            t = fld.dataType.simpleString()
            if t not in _SKETCHABLE:
                raise ValueError(
                    f"NDV sketch supports {_SKETCHABLE} columns; "
                    f"{col!r} is {t!r}"
                )
            return fld
    raise ValueError(f"column {col!r} not in table schema")


def _sketch_expr(phys: str):
    # smallint/tinyint widen to int for hll_sketch_agg's input contract;
    # string/int/bigint pass through
    return F.hll_sketch_agg(
        F.col(phys).cast("string"), F.lit(DEFAULT_LG_K)
    )


def _build_entries(
    lake: LakeTable, files: list, col: str
) -> dict[str, str]:
    """One JVM-only job: per-file HLL sketch of ``col`` grouped by
    source file (column-pruned scan). Returns {relpath: sketch_b64};
    zero-row files get an empty-sketch sentinel ("")."""
    if not files:
        return {}
    fld = _ndv_field(lake, col)
    phys = lake._physical_of(fld)
    abs_to_rel = {
        os.path.normpath(lake.log.abs_path(f.path)): f.path for f in files
    }
    rows = (
        lake.spark.read.schema(
            StructType([StructField(phys, fld.dataType, True)])
        )
        .parquet(*[lake.log.abs_path(f.path) for f in files])
        .groupBy(F.input_file_name().alias("_f"))
        .agg(_sketch_expr(phys).alias("_s"))
        .collect()
    )
    out: dict[str, str] = {}
    for r in rows:
        p = r["_f"]
        if p.startswith("file:"):
            p = unquote(urlparse(p).path)
        rel = abs_to_rel.get(os.path.normpath(p))
        if rel is not None:
            out[rel] = base64.b64encode(bytes(r["_s"])).decode()
    for f in files:
        out.setdefault(f.path, "")
    return out


def _publish(lake: LakeTable, col: str, entries: dict, version: int) -> str:
    d = lake._index_dir(NDV_PREFIX + col)
    os.makedirs(d, exist_ok=True)
    content = json.dumps(
        {
            "col": col,
            "kind": "ndv",
            "version": version,
            "lg_k": DEFAULT_LG_K,
            "entries": entries,
        }
    )
    n = lake._latest_index_n(NDV_PREFIX + col) + 1
    for _ in range(lake.COMMIT_RETRIES + 1):
        target = os.path.join(d, f"index-{n:06d}.json")
        try:
            lake.log.finalizer.publish(content, target)
            lake._retire_index_manifests(d, n)
            return target
        except CommitConflict:
            n += 1
    raise CommitConflict(
        f"could not publish NDV sketch for {col!r} after "
        f"{lake.COMMIT_RETRIES + 1} attempts"
    )


def ndv_manifest(lake: LakeTable, col: str) -> dict | None:
    m = lake._open_latest_manifest(NDV_PREFIX + col)
    if m is None or m.get("kind") != "ndv":
        return None
    return m


def create_ndv_sketch(lake: LakeTable, col: str) -> dict:
    """Build (or fully rebuild) per-file sketches for every live file
    of the current snapshot."""
    latest = lake.log.latest()
    version = latest.version if latest else 0
    entries = _build_entries(lake, lake.log.live_files(), col)
    _publish(lake, col, entries, version)
    return {"col": col, "files": len(entries)}


def refresh_ndv_sketch(lake: LakeTable, col: str) -> dict:
    """Async-indexer catch-up: sketch ONLY live files missing from the
    published manifest (cost bounded by churn since the last build)."""
    m = ndv_manifest(lake, col)
    if m is None:
        return create_ndv_sketch(lake, col)
    have = m["entries"]
    missing = [f for f in lake.log.live_files() if f.path not in have]
    if not missing:
        return {"col": col, "files": 0}
    new = _build_entries(lake, missing, col)
    latest = lake.log.latest()
    _publish(
        lake, col, {**have, **new},
        latest.version if latest else 0,
    )
    return {"col": col, "files": len(new)}


def approx_ndv(lake: LakeTable, col: str) -> dict:
    """Approximate COUNT(DISTINCT col) over the CURRENT snapshot.
    Returns {"estimate", "files_sketched", "files_scanned"} — HLL error
    is the only approximation; see module docstring for the trust
    rule."""
    fld = _ndv_field(lake, col)
    m = ndv_manifest(lake, col) or {"entries": {}}
    entries = m["entries"]
    files = lake.log.live_files()
    meta, scan = lake._meta_agg_split(files)
    scan = list(scan)
    sketches: list[bytes] = []
    n_sketched = 0
    for f in meta:
        b64 = entries.get(f.path)
        if b64 is None or f.live_rows != f.rows:
            if f.live_rows != 0:  # all-tombstone files hold no live rows
                scan.append(f)
            continue
        n_sketched += 1
        if b64:
            sketches.append(base64.b64decode(b64))
    parts = []
    if sketches:
        parts.append(
            lake.spark.createDataFrame(
                [(s,) for s in sketches], "s binary"
            )
        )
    if scan:
        df = lake._scan_resolved(scan, None)
        parts.append(
            df.agg(
                F.hll_sketch_agg(
                    F.col(col).cast("string"), F.lit(DEFAULT_LG_K)
                ).alias("s")
            ).where(F.col("s").isNotNull())
        )
    if not parts:
        return {
            "estimate": 0,
            "files_sketched": n_sketched,
            "files_scanned": len(scan),
        }
    allsk = parts[0]
    for p in parts[1:]:
        allsk = allsk.unionByName(p)
    est = allsk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("s")).alias("e")
    ).first()["e"]
    return {
        "estimate": int(est or 0),
        "files_sketched": n_sketched,
        "files_scanned": len(scan),
    }
