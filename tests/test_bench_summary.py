"""The bench's final stdout line must fit the driver's tail capture.

The driver keeps only the last ~2000 chars of bench stdout and parses
the LAST line; BENCH_r07-r10 all recorded ``"parsed": null`` because the
full per-query record (~5 KB) was truncated mid-line. bench.py now
prints ``compact_summary(result)`` as the final line — these tests pin
the budget so the record can never regress back to unparseable.
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _full_record():
    p = os.path.join(REPO, "BENCH.out.json")
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    # synthetic stand-in with the real record's shape and scale
    return {
        "metric": "total_query_wall_sec",
        "value": 263.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"q{i:02d}": 0.5 for i in range(1, 29)}
        | {f"q-lake-fixture-{i}": 2.0 for i in range(120)},
        "cdc": {"rows_per_s": 6146.6},
        "cdc_mor": {"rows_per_s": 7720.9},
        "spot10x": {"a": {"ratio": 1.1}, "b": {"ratio": 3.2}},
    }


def test_compact_summary_fits_driver_tail():
    line = json.dumps(bench.compact_summary(_full_record()))
    assert len(line) < 1500, f"{len(line)} chars — will truncate in driver tail"


def test_compact_summary_carries_acceptance_metrics():
    c = bench.compact_summary(_full_record())
    assert c["metric"] == "total_query_wall_sec"
    assert c["unit"] == "sec"
    assert isinstance(c["value"], (int, float))
    assert isinstance(c["q01_q28_s"], (int, float))
    assert c["cdc_rows_per_s"] and c["cdc_mor_rows_per_s"]
    assert c["spot10x_max"] is not None
    assert c["n_queries"] >= 28
    # per-query detail restricted to the 28 relational queries
    assert all(len(k) == 3 for k in c["queries"])


def test_compact_summary_drops_queries_over_budget():
    rec = _full_record()
    # pathological: per-query keys long enough to blow the budget
    rec["queries"] = {f"q{i:02d}": 123456.789 for i in range(1, 29)}
    rec["queries"]["q01"] = 1.0
    big = {**rec, "queries": {**rec["queries"], **{"x" * 200 + str(i): 1.0 for i in range(20)}}}
    c = bench.compact_summary(big)
    assert len(json.dumps(c)) < 1500


def test_compact_summary_partial_run_keeps_phase_marker():
    rec = _full_record()
    rec["phases_done"] = ["cdc"]
    c = bench.compact_summary(rec)
    assert c["phases_done"] == ["cdc"]
    assert len(json.dumps(c)) < 1500
