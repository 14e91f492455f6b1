"""Registry rotation: the bounded driver pass must re-verify the stalest
queries first, with no manual pinning to forget."""

import json
from pathlib import Path

from hudi_spark_plus_spark.registry import (
    _last_green_round,
    all_oracles,
    all_queries,
)

ROOT = Path(__file__).resolve().parent.parent


def test_every_oracle_has_a_query():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    # every query is oracled as of r5 (the minhash/simhash trio got
    # planted-outcome hash oracles — rows-only count is 0)
    assert set(qs) == set(os_)


def test_rotation_orders_stalest_first():
    """Pinned queries (oracle upgraded since their last driver pass) sort
    first; after them the order is stalest-green-first."""
    from hudi_spark_plus_spark.registry import _PINNED

    order = list(all_queries())
    n_pin = sum(1 for q in order if q in _PINNED)
    assert all(q in _PINNED for q in order[:n_pin]), "pins must lead"
    rest = order[n_pin:]
    last = _last_green_round()
    ranks = [last.get(q, -1) for q in rest]
    assert ranks == sorted(ranks), "registry order must be stalest-green-first"


def test_bounded_pass_covers_unverified_queries():
    """Every query that has NEVER had a green driver row (any round) must
    land inside the driver's 50-row bounded pass — rounds may rotate
    older greens out (the registry is larger than the cap), but a query
    must never wait a round for its FIRST verification."""
    if not list(ROOT.glob("CORRECTNESS_r*.json")):
        return
    order = list(all_queries())
    ever_green = _last_green_round()
    never = [q for q in order if q not in ever_green]
    assert all(order.index(q) < 50 for q in never), (
        f"never-verified queries beyond slot 50: "
        f"{[q for q in never if order.index(q) >= 50]}"
    )


def test_pin_lint_changed_queries_are_pinned():
    """Mechanical pin discipline (VERDICT r6 directive 4): a query whose
    engine function / referenced helpers / oracle SQL changed since the
    committed baseline MUST be in _PINNED (so the next driver round
    re-greens it on current code). Changing a query: add the pin AND
    regenerate the baseline (``python -m hudi_spark_plus_spark.pinlint``).
    Removing a pin after its green row: regenerate the baseline in the
    same commit (a pinned query with an in-sync hash is a stale pin)."""
    from hudi_spark_plus_spark.pinlint import compute_hashes, load_baseline
    from hudi_spark_plus_spark.registry import _PINNED

    baseline = load_baseline()
    assert baseline, (
        "missing tests/query_source_hashes.json — run "
        "python -m hudi_spark_plus_spark.pinlint"
    )
    current = compute_hashes()
    changed_unpinned = [
        q
        for q, h in current.items()
        if q in baseline and baseline[q] != h and q not in _PINNED
    ]
    assert not changed_unpinned, (
        f"queries changed since baseline but not pinned: {changed_unpinned} "
        "— add to registry._PINNED and regenerate the baseline"
    )
    # new queries (no baseline entry) must appear in the baseline once it
    # is regenerated — forgetting leaves them permanently unlinted
    missing = [q for q in current if q not in baseline]
    assert not missing, (
        f"queries missing from the pin-lint baseline: {missing} — "
        "regenerate it (python -m hudi_spark_plus_spark.pinlint)"
    )


def test_oracle_types_and_nonvacuous():
    """Registry-wide oracle lint (VERDICT r4 directive 2).

    The driver's value hash is type-sensitive: DuckDB types SUM(BIGINT)
    as HUGEINT (INT128), which hash-mismatches Spark's BIGINT even when
    every value is equal — this bug class shipped red rows in r2 AND r4.
    The local harness string-normalizes numerics and cannot see it, so
    ban the types at the registry gate. Also ban vacuous oracles: the
    r1-r3 q-scalar-subquery green was on a 0-row query that verified
    nothing.
    """
    from tests.conftest import SF_DIR_ORACLE
    from tests.harness import duck_connection

    con = duck_connection(SF_DIR_ORACLE)
    banned = ("HUGEINT", "UHUGEINT", "DECIMAL")
    bad_types, vacuous = [], []
    for name, sql in all_oracles().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if any(b in t for b in banned):
                bad_types.append((name, col, t))
        if not con.sql(f"SELECT 1 FROM ({sql}) LIMIT 1").fetchall():
            vacuous.append(name)
    assert not bad_types, (
        f"oracle columns with hash-unstable DuckDB types (wrap in "
        f"CAST(... AS BIGINT) / CAST(... AS DOUBLE)): {bad_types}"
    )
    assert not vacuous, f"oracles returning 0 rows at sf0.01: {vacuous}"


def test_pin_lint_closure_sees_local_imports_and_classes():
    """Review r12 #2: the closure must fold dependencies reached ONLY
    through function-local imports (the sq_dists rewrite changed
    pq_topk and q-emb-ann-pq's hash did not move), and must fold
    engine CLASSES with their methods' transitive deps (q-emb-ann-index
    must track IvfIndex and everything IvfIndex calls)."""
    from hudi_spark_plus_spark.operators.llm_queries import LLM_QUERIES
    from hudi_spark_plus_spark.pinlint import _source_closure

    pq = _source_closure(LLM_QUERIES["q-emb-ann-pq"])
    assert "def pq_topk" in pq          # function-local import folded
    assert "def sq_dists" in pq         # ...and ITS dependency, transitively
    idx = _source_closure(LLM_QUERIES["q-emb-ann-index"])
    assert "class IvfIndex" in idx      # class folded
    assert "def sq_dists" in idx        # via a method's dependency


def test_pin_lint_import_scan_ignores_quoted_imports():
    """ADVICE r12 #4: the local-import scan parses the function's AST,
    so an import statement QUOTED inside a docstring or string literal
    is not folded into the closure hash (the old regex over raw source
    folded those — over-inclusive, spurious baseline churn). Real
    function-local imports — including parenthesized/aliased forms —
    still fold their SOURCE names."""
    import inspect

    from hudi_spark_plus_spark.pinlint import _local_imports, _source_closure

    def fake_query():
        """Doc that QUOTES an import:

            from hudi_spark_plus_spark.functions.similarity import pq_topk
        """
        s = (
            "from hudi_spark_plus_spark.functions.dedup "
            "import minhash_lsh_pairs"
        )
        from hudi_spark_plus_spark.functions.similarity import (
            pq_encode as enc,
        )
        from hudi_spark_plus_spark.functions.similarity import sq_dists

        return sq_dists, enc, s

    got = _local_imports(inspect.getsource(fake_query))
    assert got == [
        ("hudi_spark_plus_spark.functions.similarity", ["pq_encode"]),
        ("hudi_spark_plus_spark.functions.similarity", ["sq_dists"]),
    ]
    closure = _source_closure(fake_query)
    assert "def sq_dists" in closure
    assert "def pq_encode" in closure   # source name behind the alias
    assert "def pq_topk" not in closure          # docstring-quoted
    assert "def minhash_lsh_pairs" not in closure  # string-literal-quoted
