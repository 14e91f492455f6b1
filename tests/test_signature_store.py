"""SignatureStore: near-dup signature state AS a lake table.

What the table format buys the dedup state — exactly-once ingest
(batch-id idempotent, a doubled signature would make later probes
self-match), delta-sized GC by synthesized key, prune-then-re-ingest
LWW correctness (version-derived operation timestamps), and time
travel of the state — plus the probe matching the raw
incremental_neardup_pairs answer bit-for-bit.
"""

import pytest
from pyspark.sql import functions as F

from hudi_spark_plus_spark.functions.dedup import (
    banded_signatures,
    incremental_neardup_pairs,
)
from hudi_spark_plus_spark.functions.signature_store import SignatureStore


def docs(spark, rows):
    """rows: (id, text)"""
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "how vexingly quick daft zebras jump today"),
    (4, "sphinx of black quartz judge my vow"),
]


@pytest.fixture()
def store(spark, tmp_path):
    return SignatureStore(spark, str(tmp_path / "sig"), buckets=4)


class TestStoreLifecycle:
    def test_ingest_probe_matches_raw_functions(self, spark, store):
        corpus = docs(spark, CORPUS)
        store.ingest(corpus, "doc_id", "text", "b1")
        batch = docs(
            spark,
            [(101, CORPUS[0][1]), (102, "a wholly novel document text")],
        )
        got = store.probe(
            batch, corpus, "doc_id", "text", verify_threshold=1.0
        ).collect()
        raw = incremental_neardup_pairs(
            batch, corpus,
            banded_signatures(corpus, "doc_id", "text"),
            "doc_id", "text", verify_threshold=1.0,
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, raw))
        assert [(r["new_id"], r["dup_id"]) for r in got] == [(101, 1)]

    def test_ingest_is_exactly_once_per_batch_id(self, spark, store):
        corpus = docs(spark, CORPUS)
        store.ingest(corpus, "doc_id", "text", "b1")
        n = store.state().count()
        store.ingest(corpus, "doc_id", "text", "b1")  # crash replay
        assert store.state().count() == n == 4 * store.bands
        # a doubled state would produce duplicate pair rows here
        batch = docs(spark, [(101, CORPUS[1][1])])
        pairs = store.probe(
            batch, corpus, "doc_id", "text", verify_threshold=1.0
        ).collect()
        assert [(r["new_id"], r["dup_id"]) for r in pairs] == [(101, 2)]

    def test_prune_is_delta_sized_and_stops_matches(self, spark, store):
        corpus = docs(spark, CORPUS)
        store.ingest(corpus, "doc_id", "text", "b1")
        store.prune([2], "gc1")
        live = docs(spark, [r for r in CORPUS if r[0] != 2])
        batch = docs(spark, [(201, CORPUS[1][1]), (202, CORPUS[2][1])])
        pairs = store.probe(
            batch, live, "doc_id", "text", verify_threshold=1.0
        ).collect()
        # the pruned doc 2 must not surface; doc 3's copy still pairs
        assert [(r["new_id"], r["dup_id"]) for r in pairs] == [(202, 3)]
        # GC wrote exactly bands tombstones, not a state rewrite
        assert store.state().count() == 3 * store.bands

    def test_prune_then_reingest_resurrects(self, spark, store):
        """The LWW trap a fixed operation timestamp springs: the
        re-ingest must beat the earlier tombstone."""
        corpus = docs(spark, CORPUS)
        store.ingest(corpus, "doc_id", "text", "b1")
        store.prune([1], "gc1")
        store.ingest(docs(spark, [CORPUS[0]]), "doc_id", "text", "b2")
        batch = docs(spark, [(301, CORPUS[0][1])])
        pairs = store.probe(
            batch, corpus, "doc_id", "text", verify_threshold=1.0
        ).collect()
        assert [(r["new_id"], r["dup_id"]) for r in pairs] == [(301, 1)]

    def test_state_time_travel(self, spark, store):
        corpus = docs(spark, CORPUS)
        store.ingest(corpus, "doc_id", "text", "b1")
        store.prune([1, 3], "gc1")
        assert store.state().count() == 2 * store.bands
        assert store.state(version=1).count() == 4 * store.bands

    def test_param_pinning(self, spark, tmp_path, store):
        with pytest.raises(ValueError, match="created with"):
            SignatureStore(spark, store.table.path, bands=8)
        # same params reopen fine
        again = SignatureStore(spark, store.table.path)
        assert again.bands == store.bands

    def test_integral_id_required(self, spark, store):
        s = spark.createDataFrame([("a", "text")], "doc_id string, text string")
        with pytest.raises(ValueError, match="integral id"):
            store.ingest(s, "doc_id", "text", "bX")

    def test_empty_store_probe(self, spark, store):
        batch = docs(spark, [(1, "anything at all here")])
        empty_corpus = docs(spark, [])
        pairs = store.probe(
            batch, empty_corpus, "doc_id", "text", verify_threshold=1.0
        )
        assert pairs.count() == 0
