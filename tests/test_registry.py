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
    # no-oracle queries are the declared engine-specific signatures only
    assert set(qs) - set(os_) <= {
        "q-doc-minhash-full",
        "q-doc-minhash-lsh",
        "q-doc-simhash",
        "q-emb-ann-ivf",
    }


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
    """Every query without a green row in the LATEST correctness file must
    land inside the driver's 50-row bounded pass."""
    files = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    if not files:
        return
    latest = json.loads(files[-1].read_text())
    order = list(all_queries())

    def green(row):
        return row.get("hash_match") is True or (
            row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        )

    stale = [q for q in order if q not in latest or not green(latest[q])]
    assert all(order.index(q) < 50 for q in stale), (
        f"stale queries beyond slot 50: "
        f"{[q for q in stale if order.index(q) >= 50]}"
    )
