"""Persistent IVF ANN index (functions/ann_index.py): the mutable
index lifecycle — exactly-once adds, tombstone removes, fixed
quantizer, time travel — plus recall sanity against brute force.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hudi_spark_plus_spark.functions.ann_index import IvfIndex
from hudi_spark_plus_spark.functions.similarity import cosine_topk


def vecs(spark, rows):
    """rows: (id, list[float])"""
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cluster_data(n_per=30, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, dim)) * 5
    rows = []
    i = 0
    for c in range(4):
        for _ in range(n_per):
            rows.append((i, [float(x) for x in centers[c] + rng.normal(size=dim)]))
            i += 1
    return rows


@pytest.fixture()
def index(spark, tmp_path):
    rows = _cluster_data()
    return IvfIndex.build(
        spark, str(tmp_path / "ann"), vecs(spark, rows),
        n_centroids=4, buckets=4,
    ), rows


class TestIvfIndexLifecycle:
    def test_search_matches_brute_force_on_clustered_data(
        self, spark, index
    ):
        idx, rows = index
        queries = vecs(spark, rows[:5])
        got = idx.search(queries, k=3, nprobe=2).collect()
        exact = cosine_topk(
            vecs(spark, rows), queries, k=3
        ).collect()
        g = {(r["q_id"], r["rank"]): r["n_id"] for r in got}
        e = {(r["q_id"], r["rank"]): r["n_id"] for r in exact}
        hits = sum(1 for k_ in e if g.get(k_) == e[k_])
        assert hits / len(e) >= 0.8  # clustered data: near-exact recall

    def test_add_is_exactly_once_and_remove_wins_replay(
        self, spark, index, tmp_path
    ):
        idx, rows = index
        q = vecs(spark, [rows[0]])
        planted = vecs(
            spark, [(10_000 + j, rows[0][1]) for j in range(3)]
        )
        idx.add(planted, "b-plant")
        top = idx.search(q, k=3, nprobe=1).collect()
        assert [r["n_id"] for r in top] == [10_000, 10_001, 10_002]
        assert all(r["sim"] == 1.0 for r in top)
        ver = idx.table.log.latest().version
        idx.add(planted, "b-plant")  # crash replay: no-op commit
        assert idx.table.log.latest().version == ver
        # remove one copy, then REPLAY the stale add: the tombstone
        # must win (version-derived LWW), never resurrect
        idx.remove([10_001], "b-gc")
        idx.add(planted, "b-plant")
        top = idx.search(q, k=3, nprobe=1).collect()
        assert [r["n_id"] for r in top] == [10_000, 10_002] + [
            top[2]["n_id"]
        ]
        assert 10_001 not in [r["n_id"] for r in top]

    def test_readd_after_remove_resurrects(self, spark, index):
        idx, rows = index
        idx.remove([5], "gc1")
        assert idx.assignments().where("id = 5").count() == 0
        idx.add(vecs(spark, [rows[5]]), "b-back")
        assert idx.assignments().where("id = 5").count() == 1

    def test_vector_update_moves_cells(self, spark, index):
        idx, rows = index
        # move vector 0 to the far side of the space: its cell row is
        # superseded (one live row), search finds it near its NEW pals
        far = rows[-1][1]
        idx.add(vecs(spark, [(0, far)]), "b-move")
        assert idx.assignments().where("id = 0").count() == 1
        top = idx.search(vecs(spark, [(99_999, far)]), k=1, nprobe=1).collect()
        assert top[0]["sim"] == 1.0 and top[0]["n_id"] in (0, len(rows) - 1)

    def test_time_travel_search(self, spark, index):
        idx, rows = index
        v_before = idx.table.log.latest().version
        idx.remove([1, 2, 3], "gc-tt")
        q = vecs(spark, [rows[1]])
        now_ids = {r["n_id"] for r in idx.search(q, k=5, nprobe=2).collect()}
        then_ids = {
            r["n_id"]
            for r in idx.search(q, k=5, nprobe=2, version=v_before).collect()
        }
        assert not {1, 2, 3} & now_ids
        assert 1 not in now_ids and 1 in then_ids or 1 not in then_ids
        # the removed id's own state is visible at the old version
        assert (
            idx.assignments(version=v_before).where("id = 1").count() == 1
        )

    def test_reopen_and_quantizer_pin(self, spark, index, tmp_path):
        idx, rows = index
        again = IvfIndex(spark, idx.path)
        assert np.allclose(again.centers, idx.centers)
        assert again.assignments().count() == idx.assignments().count()
        with pytest.raises(FileExistsError):
            IvfIndex.build(
                spark, idx.path, vecs(spark, rows[:10]), n_centroids=2
            )
        with pytest.raises(ValueError, match="no ANN index"):
            IvfIndex(spark, str(tmp_path / "nowhere"))

    def test_failed_rebuild_never_touches_quantizer(self, spark, index):
        """ADVICE r11 #1: the old build OVERWROTE the centroids sidecar
        before losing the pin race — committed assignments silently
        paired with a fresh quantizer fit. A losing build must leave
        the winner's quantizer (and search results) bit-identical."""
        import os

        idx, rows = index
        before_centers = idx.centers.copy()
        q = vecs(spark, rows[:3])
        before_search = sorted(
            map(tuple, idx.search(q, k=3, nprobe=2).collect())
        )
        with pytest.raises(FileExistsError):
            IvfIndex.build(
                spark, idx.path, vecs(spark, rows[:10]), n_centroids=2
            )
        again = IvfIndex(spark, idx.path)
        assert np.allclose(again.centers, before_centers)
        assert (
            sorted(map(tuple, again.search(q, k=3, nprobe=2).collect()))
            == before_search
        )
        # no stray sidecar dirs from the losing attempt
        dirs = [
            d for d in os.listdir(idx.path) if d.startswith("centroids")
        ]
        assert len(dirs) == 1

    def test_pin_race_loser_cleans_up_and_winner_survives(
        self, spark, index, monkeypatch
    ):
        """Two CONCURRENT builds both pass the fail-fast check; the pin
        decides the winner. The loser must remove its own sidecar dir
        and raise — never touching the winner's quantizer. Simulated by
        blinding the fail-fast check so the losing attempt runs all the
        way to the pin race."""
        import os

        idx, rows = index
        before_centers = idx.centers.copy()
        real_exists = os.path.exists
        monkeypatch.setattr(
            "hudi_spark_plus_spark.functions.ann_index.os.path.exists",
            lambda p: (
                False if p.endswith("_ann_params.json") else real_exists(p)
            ),
        )
        with pytest.raises(FileExistsError):
            IvfIndex.build(
                spark, idx.path, vecs(spark, rows[:10]), n_centroids=2
            )
        dirs = [
            d for d in os.listdir(idx.path) if d.startswith("centroids")
        ]
        assert len(dirs) == 1  # loser's unique dir was removed
        assert np.allclose(IvfIndex(spark, idx.path).centers, before_centers)
