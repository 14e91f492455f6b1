"""Deterministic mergeable quantile sketch — the percentile analogue of
the HLL machinery in ``table/ndv.py`` (VERDICT r12 directive 7).

A KLL-style multi-level sampler with DETERMINISTIC compaction (classic
Manku–Rajagopalan–Lindsay collapse: sort, keep alternating elements,
promote at doubled weight). Randomized KLL trades determinism for
slightly better constants; this engine's fixtures are hash-compared
against an exact oracle, and its recomputes must be replay-stable
(review r12 #1 doctrine), so determinism is the requirement and the
MRL-style bound is the price:

* every compaction of a level with item-weight ``w`` perturbs any rank
  by at most ``w``; the sketch ACCUMULATES that bound in ``err`` — the
  in-engine guarantee is ``|rank(reported q-quantile) − ceil(q·n)| ≤
  err``, checked by tests, not assumed;
* while nothing compacts (every level under ``k`` items) the sketch is
  LOSSLESS: ``err == 0`` and ``quantile`` equals the exact discrete
  quantile (value at 1-indexed position ``ceil(q·n)`` of the sorted
  multiset — DuckDB ``quantile_disc`` semantics, which is what lets
  fixture-scale views hash-match an exact SQL oracle, the same trick
  NdvView plays with HLL's exact sparse mode);
* ``merge`` is associative and deterministic given operand order; the
  view machinery always folds (stored ⊕ delta), so replays reproduce
  bytes exactly.

Values are float64 (measures are cast on entry; exact for integral
measures within 2^53 — the same envelope every double-returning SQL
aggregate has). NULLs are the caller's concern (the view filters them;
SQL percentile ignores NULLs).

Serialization is a compact JSON envelope in a BINARY column —
human-auditable in debris, schema-stable across versions, and small:
a level holds ≤ k float64s, and a sketch of any n holds ≤
k·log2(n/k) items.

Scale shape (used by ``table/matview.PctlView``): sketches are built
per PARTITION with ``mapInPandas`` (bounded memory — never
materializes a group), then merged per GROUP — ≤ n_partitions partial
sketches per group, each ≤ a few KB. The driver never holds a sketch.
"""

from __future__ import annotations

import json
import math

import pandas as pd

DEFAULT_K = 200


def empty(k: int = DEFAULT_K) -> dict:
    return {"k": k, "n": 0, "err": 0, "levels": [[]]}


def _compact(sk: dict) -> None:
    """Bottom-up deterministic collapse: any level over k items is
    sorted and every SECOND item (odd 0-based indices — the
    fixed-parity choice) promotes to the next level at doubled weight.
    Adds the level's item-weight to the rank-error bound per pass."""
    k = sk["k"]
    lv = sk["levels"]
    i = 0
    while i < len(lv):
        if len(lv[i]) > k:
            lv[i].sort()
            promoted = lv[i][1::2]
            lv[i] = []
            if i + 1 == len(lv):
                lv.append([])
            lv[i + 1].extend(promoted)
            sk["err"] += 1 << i
        i += 1


def add_values(sk: dict, values) -> dict:
    """Fold an iterable of numbers into the sketch (mutates + returns)."""
    buf = sk["levels"][0]
    for v in values:
        buf.append(float(v))
        sk["n"] += 1
    _compact(sk)
    return sk


def merge(a: dict, b: dict) -> dict:
    """Deterministic merge (a ⊕ b): level-wise concatenation + collapse.
    ``k`` must match (views pin it at definition time)."""
    if a["k"] != b["k"]:
        raise ValueError(f"sketch k mismatch: {a['k']} vs {b['k']}")
    out = {
        "k": a["k"],
        "n": a["n"] + b["n"],
        "err": a["err"] + b["err"],
        "levels": [],
    }
    for i in range(max(len(a["levels"]), len(b["levels"]))):
        la = a["levels"][i] if i < len(a["levels"]) else []
        lb = b["levels"][i] if i < len(b["levels"]) else []
        out["levels"].append(list(la) + list(lb))
    _compact(out)
    return out


def quantile(sk: dict, q: float) -> float | None:
    """Discrete quantile estimate: the item whose cumulative weight
    first reaches ``ceil(q·n)`` over the weight-sorted items (exact
    ``quantile_disc`` when err == 0). None on an empty sketch."""
    n = sk["n"]
    if n <= 0:
        return None
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    items: list[tuple[float, int]] = []
    for i, level in enumerate(sk["levels"]):
        w = 1 << i
        items.extend((v, w) for v in level)
    items.sort(key=lambda t: t[0])
    target = max(1, math.ceil(q * n))
    cum = 0
    for v, w in items:
        cum += w
        if cum >= target:
            return v
    return items[-1][0]


def serialize(sk: dict) -> bytes:
    return json.dumps(sk, separators=(",", ":")).encode()


def deserialize(b: bytes | None, k: int = DEFAULT_K) -> dict:
    if b is None:
        return empty(k)
    return json.loads(bytes(b).decode())


def group_sketches(df, group_cols: list[str], val_cols: list[str],
                   k: int = DEFAULT_K):
    """(group_cols..., cnt, pctl_<c> binary ...) — one deterministic
    quantile sketch per group per value column, plus the group's row
    count. Two-phase, 100-TB-shaped:

    * phase 1 (``mapInPandas``): per Arrow batch, per group, a PARTIAL
      sketch — bounded memory, never materializes a group; groups are
      keyed by the JSON rendering of the group tuple (NULL-safe,
      type-safe across the pandas boundary);
    * phase 2 (``applyInPandas`` on the key): ≤ one partial per
      (batch, group) to merge, each a few KB; partials fold in
      LEXICOGRAPHIC blob order so the result bytes are independent of
      Arrow partition arrival order (replay-stable, review r12 #1
      doctrine).

    NULL measure values are skipped (SQL percentile semantics); an
    all-NULL group carries a NULL sketch and cnt > 0."""
    from pyspark.sql import functions as F

    gk = F.to_json(
        F.struct(*group_cols), {"ignoreNullFields": "false"}
    ).alias("_gk")
    src = df.select(gk, *val_cols)
    schema = (
        "_gk string, cnt long, "
        + ", ".join(f"pctl_{c} binary" for c in val_cols)
    )

    def partials(batches):
        for pdf in batches:
            rows = {"_gk": [], "cnt": []}
            for c in val_cols:
                rows[f"pctl_{c}"] = []
            for key, g in pdf.groupby("_gk", dropna=False, sort=False):
                rows["_gk"].append(key)
                rows["cnt"].append(len(g))
                for c in val_cols:
                    vals = g[c].dropna().tolist()
                    rows[f"pctl_{c}"].append(
                        serialize(add_values(empty(k), vals))
                        if vals
                        else None
                    )
            if rows["_gk"]:
                yield pd.DataFrame(rows)

    part = src.mapInPandas(partials, schema)

    def merge_group(pdf):
        out = {"_gk": [pdf["_gk"].iloc[0]], "cnt": [int(pdf["cnt"].sum())]}
        for c in val_cols:
            blobs = sorted(
                bytes(b) for b in pdf[f"pctl_{c}"] if b is not None
            )
            if not blobs:
                out[f"pctl_{c}"] = [None]
            else:
                acc = deserialize(blobs[0], k)
                for b in blobs[1:]:
                    acc = merge(acc, deserialize(b, k))
                out[f"pctl_{c}"] = [serialize(acc)]
        return pd.DataFrame(out)

    merged = part.groupBy("_gk").applyInPandas(merge_group, schema)
    gschema = df.select(*group_cols).schema
    return merged.select(
        F.from_json("_gk", gschema).alias("_g"),
        "cnt",
        *[f"pctl_{c}" for c in val_cols],
    ).select(
        *[F.col(f"_g.{c}").alias(c) for c in group_cols],
        "cnt",
        *[f"pctl_{c}" for c in val_cols],
    )


def merge_sketch_cols(k: int = DEFAULT_K):
    """Null-tolerant two-column sketch merge as an Arrow-batched
    pandas_udf (stored ⊕ delta — the union-path fold). NULL acts as
    the identity; the operand ORDER is fixed by the caller, so folds
    are byte-deterministic."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def merge2(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None:
                out.append(None if y is None else bytes(y))
            elif y is None:
                out.append(bytes(x))
            else:
                out.append(
                    serialize(
                        merge(deserialize(bytes(x), k),
                              deserialize(bytes(y), k))
                    )
                )
        return pd.Series(out)

    return merge2


def quantile_col(q: float, k: int = DEFAULT_K):
    """Sketch-column discrete-quantile reader (pandas_udf, double)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def read_q(col: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else quantile(deserialize(bytes(b), k), q)
                for b in col
            ],
            dtype="float64",
        )

    return read_q
