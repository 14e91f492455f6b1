"""Hypothesis property test: both matview shapes equal a from-scratch
GROUP BY of the source's final state under ARBITRARY generated churn
schedules and refresh cadences — deepening the seeded churn tests with
shrinkable cases (delta-addition for COUNT/SUM, partial recompute for
COUNT/MIN/MAX, multi-version slices, emptied groups, NULL groups,
cross-group moves all fall out of the generator).

Spark jobs per example are expensive (each refresh is a CDC read + a
merge), so examples are few and small — hypothesis still explores
tie-heavy and delete-heavy corners and shrinks failures to minimal
schedules.
"""

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

from pyspark.sql import functions as F

from hudi_spark_plus_spark.table.lake_table import LakeTable

pytestmark = [
    pytest.mark.slow,  # full-tier suite (see pytest.ini)
    pytest.mark.skipif(
        not HAS_HYPOTHESIS, reason="hypothesis not installed"
    ),
]

event = st.tuples(
    st.integers(min_value=0, max_value=4),          # key
    st.integers(min_value=0, max_value=2),          # ts (ties likely)
    st.sampled_from(["a", "b", None]),              # group (incl. NULL)
    st.integers(min_value=-3, max_value=3),         # value
    st.booleans(),                                  # is_delete
)
schedule = st.lists(event, min_size=1, max_size=10)
boundaries = st.lists(st.booleans(), min_size=10, max_size=10)
refresh_after = st.lists(st.booleans(), min_size=10, max_size=10)


def _drive(spark, work, events, cut, refresh_pts):
    """Source table through the schedule; refresh both views at the
    generated points and once at the end; return (agg_view, minmax_view,
    source)."""
    from hudi_spark_plus_spark.table.matview import (
        AggregateView,
        MinMaxView,
    )

    batches, cur = [], []
    for seq, e in enumerate(events):
        cur.append((seq, e))
        if cut[seq % len(cut)]:
            batches.append(cur)
            cur = []
    if cur:
        batches.append(cur)

    src = LakeTable(spark, str(work / "src"), buckets=2)
    agg = mm = None
    for i, batch in enumerate(batches):
        surv = {}
        for seq, (k, ts, g, v, is_del) in batch:
            if k not in surv or (ts, seq) >= surv[k][:2]:
                surv[k] = (ts, seq, g, v, is_del)
        rows = [
            (str(k), ts, "delete" if d else "upsert", g, v)
            for k, (ts, seq, g, v, d) in surv.items()
        ]
        src.merge(
            spark.createDataFrame(
                rows, "_key string, _ts long, _op string, g string, v long"
            ),
            batch_id=f"b{i}",
        )
        if agg is None:
            # views created after the first commit (schema known)
            agg = AggregateView(spark, str(work / "agg"), src, ["g"], ["v"])
            mm = MinMaxView(spark, str(work / "mm"), src, ["g"], ["v"])
        if refresh_pts[i % len(refresh_pts)]:
            agg.refresh()
            mm.refresh()
    agg.refresh()
    mm.refresh()
    return agg, mm, src


@given(events=schedule, cut=boundaries, refresh_pts=refresh_after)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_matviews_match_group_by_replay(
    spark, tmp_path_factory, events, cut, refresh_pts
):
    work = tmp_path_factory.mktemp("mvprop")
    agg, mm, src = _drive(spark, work, events, cut, refresh_pts)
    exp_sum = {
        (r["g"], r["cnt"], r["sv"])
        for r in src.snapshot()
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("v").cast("long").alias("sv"),
        )
        .collect()
    }
    got_sum = {
        (r["g"], r["cnt"], r["sum_v"]) for r in agg.df().collect()
    }
    assert got_sum == exp_sum, (sorted(got_sum, key=str),
                                sorted(exp_sum, key=str))
    exp_mm = {
        (r["g"], r["cnt"], r["mn"], r["mx"])
        for r in src.snapshot()
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    got_mm = {
        (r["g"], r["cnt"], r["min_v"], r["max_v"])
        for r in mm.df().collect()
    }
    assert got_mm == exp_mm, (sorted(got_mm, key=str),
                              sorted(exp_mm, key=str))


@given(events=schedule, cut=boundaries, refresh_pts=refresh_after)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pruned_recompute_matches_group_by_replay(
    spark, tmp_path_factory, events, cut, refresh_pts
):
    """The r10 file-pruned recompute path under ARBITRARY churn: the
    source carries a secondary index on the group column, so every
    refresh routes through files_for_any_value (index branch for
    non-null probe sets, fallback when a NULL group is affected) and
    in-commit maintenance keeps the index live across the schedule.
    The view must still equal the from-scratch GROUP BY."""
    from hudi_spark_plus_spark.table.matview import MinMaxView

    work = tmp_path_factory.mktemp("mvprune")
    batches, cur = [], []
    for seq, e in enumerate(events):
        cur.append((seq, e))
        if cut[seq % len(cut)]:
            batches.append(cur)
            cur = []
    if cur:
        batches.append(cur)

    src = LakeTable(spark, str(work / "src"), buckets=2)
    mm = None
    for i, batch in enumerate(batches):
        surv = {}
        for seq, (k, ts, g, v, is_del) in batch:
            if k not in surv or (ts, seq) >= surv[k][:2]:
                surv[k] = (ts, seq, g, v, is_del)
        rows = [
            (str(k), ts, "delete" if d else "upsert", g, v)
            for k, (ts, seq, g, v, d) in surv.items()
        ]
        src.merge(
            spark.createDataFrame(
                rows, "_key string, _ts long, _op string, g string, v long"
            ),
            batch_id=f"b{i}",
        )
        if mm is None:
            src.create_secondary_index("g")
            mm = MinMaxView(spark, str(work / "mm"), src, ["g"], ["v"])
        if refresh_pts[i % len(refresh_pts)]:
            mm.refresh()
    mm.refresh()
    exp = {
        (r["g"], r["cnt"], r["mn"], r["mx"])
        for r in src.snapshot()
        .groupBy("g")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    got = {
        (r["g"], r["cnt"], r["min_v"], r["max_v"])
        for r in mm.df().collect()
    }
    assert got == exp, (sorted(got, key=str), sorted(exp, key=str))
