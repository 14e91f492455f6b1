"""Hypothesis property tests for the round-4 dedup operators: the
distributed implementations must equal their obvious Python replays on
arbitrary generated corpora (few, small examples — each runs Spark
jobs — but hypothesis still explores dup-heavy/empty/boilerplate-heavy
corners and shrinks failures)."""

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

pytestmark = [
    pytest.mark.slow,  # full-tier suite (see pytest.ini)
    pytest.mark.skipif(
        not HAS_HYPOTHESIS, reason="hypothesis not installed"
    ),
]

# small word pool -> frequent exact dups and shared lines
word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "y"])
text = st.lists(word, min_size=1, max_size=6).map(" ".join)
corpus = st.lists(text, min_size=1, max_size=10)


@given(corpus=corpus, new=corpus)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_dedup_equals_anti_join(spark, corpus, new):
    from hudi_spark_plus_spark.functions.dedup import incremental_dedup

    cdf = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    ndf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(new)],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in incremental_dedup(ndf, cdf, "doc_id", "text").collect()
    }
    expected = {
        1000 + i for i, t in enumerate(new) if t not in set(corpus)
    }
    assert kept == expected


lines = st.lists(
    st.lists(word, min_size=1, max_size=3).map(" ".join),
    min_size=1,
    max_size=6,
)
docs_of_lines = st.lists(lines, min_size=1, max_size=6)


@given(docs=docs_of_lines, k=st.integers(min_value=2, max_value=3))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_lines_equals_python_replay(spark, docs, k):
    from hudi_spark_plus_spark.functions.dedup import dedup_lines

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, _lines array<string>"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_lines(df, "doc_id", "_lines", min_doc_freq=k).collect()
    }
    doc_freq: dict[str, set] = {}
    for i, ls in enumerate(docs):
        for ln in ls:
            doc_freq.setdefault(ln, set()).add(i)
    boiler = {ln for ln, ids in doc_freq.items() if len(ids) >= k}
    for i, ls in enumerate(docs):
        keep = [ln for ln in ls if ln not in boiler]
        if keep:
            assert got[i] == "\n".join(keep)
        else:
            assert i not in got
