"""Mechanical pin-lint (VERDICT r6 directive 4).

The registry workflow rule — "pin any query whose semantics changed
after its last green driver pass" — was violated twice in round 6 (q11
pinned needlessly, q-doc-corpus-stats changed unpinned). This module
turns the rule into a test: each registry query gets a SOURCE HASH over

* the query function's own source,
* the source of every function it (transitively) references by name —
  module-level helpers like ``_plant_copies`` and cross-module operator
  functions like ``minhash_lsh_pairs`` included,
* simple module-level constants it references (``NEARDUP_SUBSET``...),
* its oracle SQL string.

``tests/query_source_hashes.json`` is the committed baseline — the
hashes as of the last acknowledged state. ``tests/test_registry.py``
fails for any query whose current hash differs from the baseline UNLESS
the query is in ``registry._PINNED``: changing a query forces you to pin
it (so the next driver round re-greens it) and regenerate the baseline;
removing the pin after the green requires the hash to be back in sync.

Class internals are covered COARSELY (VERDICT r7 directive 4 — the
function-level closure was blind to ``LakeTable`` method changes,
exactly where round 7 made its biggest semantic edits): every
``q-lake-*`` / ``q-cdc-*`` query hash additionally folds in the full
source of the ``table/`` modules, and every ``*-source`` / ``*-sink``
/ ``*-format-write`` query (the Python Data Source read/write paths)
folds in ``sources/lake_reader.py`` + ``sources/lake_writer.py`` +
``streaming/stream_source.py``. Any edit to those files therefore
flags the whole family — by design: pin the flagged queries (the
driver's rotation re-greens them next round; pins are removed as green
rows land), don't silently regenerate the baseline over a semantic
change.

Regenerate the baseline with::

    python -m hudi_spark_plus_spark.pinlint
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import sys
import textwrap
from pathlib import Path


def _local_imports(src: str) -> list[tuple[str, list[str]]]:
    """(module, [SOURCE names — before any ``as``]) for every absolute
    ``from hudi_spark_plus_spark... import ...`` statement in ``src``.

    Function-LOCAL imports bind names at call time, so getattr on the
    query's module globals can never see them — without this the
    closure was blind to exactly those dependencies (review r12 #2: the
    sq_dists kernel rewrite changed pq_topk/ivfpq_topk and
    q-emb-ann-pq/-ivfpq hashes did not move, defeating the pin guard).
    Parsed with ``ast`` rather than a regex over the raw text (ADVICE
    r12 #4: the regex folded import statements QUOTED inside docstrings
    and string literals into the closure hash — over-inclusive,
    spurious baseline churn). The source names are folded (the hash
    tracks what the dependency IS, not what the query calls it)."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return []
    out = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.ImportFrom)
            and node.level == 0
            and (node.module or "").startswith("hudi_spark_plus_spark")
        ):
            out.append((node.module, [a.name for a in node.names]))
    return out


def _source_closure(fn, seen: set | None = None) -> str:
    """fn's source + the sources of hudi_spark_plus_spark functions AND
    classes it references by (global) name OR imports function-locally,
    recursively; plus repr of simple constants it reads. Classes fold
    their full source and recurse through their methods' dependencies
    (review r12 #2 follow-through: q-emb-ann-index's hash must move
    when IvfIndex — or anything IvfIndex calls — changes, without
    relying on the coarse q-lake-*/q-cdc-* whole-dir blobs).
    Deterministic traversal order."""
    if seen is None:
        seen = set()
    key = (getattr(fn, "__module__", ""), getattr(fn, "__qualname__", ""))
    if key in seen:
        return ""
    seen.add(key)
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return ""
    mod = sys.modules.get(fn.__module__)
    parts = [src]
    if mod is None:
        return src
    code = getattr(fn, "__code__", None)
    if code is None:
        if inspect.isclass(fn):
            for _, meth in sorted(inspect.getmembers(fn, inspect.isfunction)):
                if getattr(meth, "__module__", "").startswith(
                    "hudi_spark_plus_spark"
                ):
                    parts.append(_source_closure(meth, seen))
        return "\n".join(parts)
    names = set(code.co_names)
    # constants/functions referenced from nested code objects (lambdas,
    # inner defs) too
    for const in code.co_consts:
        if hasattr(const, "co_names"):
            names.update(const.co_names)

    def fold(name: str, obj) -> None:
        if obj is None:
            return
        if (
            inspect.isfunction(obj) or inspect.isclass(obj)
        ) and getattr(obj, "__module__", "").startswith(
            "hudi_spark_plus_spark"
        ):
            parts.append(_source_closure(obj, seen))
        elif isinstance(obj, (int, float, str, tuple, frozenset)):
            parts.append(f"{name}={obj!r}")

    for name in sorted(names):
        fold(name, getattr(mod, name, None))
    for module, imported_names in _local_imports(src):
        try:
            imported = importlib.import_module(module)
        except ImportError:
            continue
        for nm in imported_names:
            fold(nm, getattr(imported, nm, None))
    return "\n".join(parts)


_PKG_DIR = Path(__file__).resolve().parent


def _files_blob(paths) -> str:
    out = []
    for p in sorted(paths):
        try:
            out.append(f"--{p.name}--\n" + p.read_text())
        except OSError:
            continue
    return "\n".join(out)


def compute_hashes() -> dict[str, str]:
    from hudi_spark_plus_spark.registry import all_oracles, all_queries

    oracles = all_oracles()
    table_blob = _files_blob((_PKG_DIR / "table").glob("*.py"))
    ds_blob = _files_blob(
        [
            _PKG_DIR / "sources" / "lake_reader.py",
            _PKG_DIR / "sources" / "lake_writer.py",
            _PKG_DIR / "streaming" / "stream_source.py",
        ]
    )
    out: dict[str, str] = {}
    for name, fn in all_queries().items():
        blob = _source_closure(fn) + "\n--oracle--\n" + oracles.get(name, "")
        if name.startswith(("q-lake-", "q-cdc-")):
            blob += "\n--table-modules--\n" + table_blob
        if name.endswith(("-source", "-sink", "-format-write")):
            blob += "\n--datasource-modules--\n" + ds_blob
        out[name] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return dict(sorted(out.items()))


BASELINE_PATH = (
    Path(__file__).resolve().parent.parent / "tests" / "query_source_hashes.json"
)


def load_baseline() -> dict[str, str]:
    try:
        return json.loads(BASELINE_PATH.read_text())
    except (OSError, ValueError):
        return {}


def main() -> None:
    BASELINE_PATH.write_text(json.dumps(compute_hashes(), indent=1) + "\n")
    print(f"wrote {BASELINE_PATH}")


if __name__ == "__main__":
    main()
