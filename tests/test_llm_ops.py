"""LLM-data operator tests: oracle parity + recall/quality assertions for
the approximate (engine-specific) operators (SURVEY M6)."""

import pytest
from pyspark.sql import functions as F

from hudi_spark_plus_spark.functions.dedup import (
    exact_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
    with_simhash,
)
from hudi_spark_plus_spark.functions.multimodal import (
    decode_image_features,
    frame_sample_plan,
    synth_media_df,
)
from hudi_spark_plus_spark.functions.similarity import (
    cosine_pairs,
    cosine_topk,
    lsh_ann_topk,
    lsh_neardup_pairs,
)
from hudi_spark_plus_spark.operators.llm_queries import LLM_ORACLES, LLM_QUERIES
from hudi_spark_plus_spark.sources.loaders import load_table
from tests.harness import compare, duck_connection

pytestmark = pytest.mark.slow  # full-tier suite (see pytest.ini)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name", [n for n in sorted(LLM_QUERIES) if n in LLM_ORACLES]
)
def test_llm_query_matches_oracle(name, spark, sf_dir, con):
    compare(LLM_QUERIES[name](spark, sf_dir), con, LLM_ORACLES[name], name)


def test_no_rows_only_llm_queries():
    """Every LLM query is value-hash-oracled as of r5 (planted-outcome
    oracles for the MinHash/SimHash trio). A query without an oracle is
    a regression to the weaker rows-only driver check — fail loudly."""
    rows_only = sorted(set(LLM_QUERIES) - set(LLM_ORACLES))
    assert not rows_only, f"rows-only LLM queries reappeared: {rows_only}"


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """LSH candidates (verified >= t) must recover >=90% of the exact
    Jaccard pairs at the same threshold, with zero false positives
    (verification makes precision exact)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    t = 0.30
    exact = {
        (r["id_a"], r["id_b"])
        for r in exact_jaccard_pairs(d, "doc_id", "text", t).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", k=64, bands=16, verify_threshold=t
        ).collect()
    }
    assert lsh <= exact, "verified LSH pairs must be a subset of exact"
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.9


def test_simhash_self_duplicate_detection(spark):
    """Identical texts -> identical simhash; near-identical (one word
    swapped) -> small hamming distance."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the river"),
        (3, "the quick brown fox jumps over the lazy cat near the river"),
        (4, "completely different text about spark shuffles and parquet files"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    sig = {r["id"]: r["simhash"] for r in with_simhash(df, "text").collect()}
    assert sig[1] == sig[2]
    ham13 = bin(sig[1] ^ sig[3]).count("1")
    ham14 = bin(sig[1] ^ sig[4]).count("1")
    assert ham13 < ham14
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, "id", "text", max_hamming=3).collect()
    }
    assert (1, 2) in pairs


def test_ann_recall_on_planted_neighbors(spark, sf_dir):
    """LSH-ANN must recover planted near-duplicates (cosine ~0.995).
    Uniformly random vectors are the adversarial case for LSH — the
    recall contract is for genuinely similar data."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    base = e.collect()
    rng = np.random.RandomState(7)
    planted = []
    for r in base[:20]:
        v = np.array(r["embedding"], dtype=np.float64)
        nv = v + rng.randn(len(v)) * 0.02
        nv = nv / np.linalg.norm(nv)
        planted.append((int(r["vec_id"]) + 100000, [float(x) for x in nv], 0))
    aug = e.unionByName(
        spark.createDataFrame(
            planted, "vec_id long, embedding array<float>, label int"
        )
    )
    queries = aug.where(F.col("vec_id") >= 100000)
    exact1 = {
        r["q_id"]: r["n_id"]
        for r in cosine_topk(aug, queries, k=1).collect()
    }
    ann = lsh_ann_topk(aug, queries, k=1, bits=8, dim=64, n_tables=8)
    got1 = {r["q_id"]: r["n_id"] for r in ann.collect()}
    hits = sum(1 for q, n in exact1.items() if got1.get(q) == n)
    assert hits / len(exact1) >= 0.9, f"planted-neighbor recall {hits}/{len(exact1)}"


def test_lsh_neardup_pairs_recall_vs_exact(spark, sf_dir):
    """Embedding near-dup pairs: the LSH-bucketed path must recover
    >=90% of the exact cosine pairs at the same threshold on planted
    NOISY near-duplicates (cosine ~0.995 — the regime the operator is
    for), and exact verification makes every emitted pair a true one."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    base = e.collect()
    rng = np.random.RandomState(11)
    planted = []
    for r in base[:25]:
        v = np.array(r["embedding"], dtype=np.float64)
        nv = v + rng.randn(len(v)) * 0.02
        planted.append((int(r["vec_id"]) + 100000, [float(x) for x in nv], 0))
    aug = e.unionByName(
        spark.createDataFrame(
            planted, "vec_id long, embedding array<float>, label int"
        )
    )
    t = 0.95
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(aug, threshold=t).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(aug, threshold=t).collect()
    }
    assert lsh <= exact, "verified LSH pairs must be a subset of exact"
    assert exact, "fixture must actually contain near-dup pairs"
    assert len(lsh & exact) / len(exact) >= 0.9


def test_multimodal_real_decode_and_stub_gate(spark):
    """Round 2: width/height come from a REAL header parse of the
    container bytes (PNG IHDR / JPEG SOF0 / GIF descriptor); only
    unrecognized bytes fall back to metadata (allow_fake) or error."""
    from hudi_spark_plus_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        media_height,
        media_width,
    )

    media = synth_media_df(spark, 32)
    visual = media.where(F.col("kind") != "audio")
    n_visual = visual.count()
    feats = decode_image_features(visual)  # no allow_fake needed now
    rows = feats.collect()
    assert len(rows) == n_visual
    for r in rows:
        i = r["media_id"]
        assert (r["width"], r["height"]) == (media_width(i), media_height(i))
    # deterministic: same content digest on re-run
    again = {r["media_id"]: r["content_digest"] for r in feats.collect()}
    assert {r["media_id"]: r["content_digest"] for r in rows} == again

    garbage = spark.createDataFrame(
        [(0, "image", "application/octet-stream", bytearray(b"\x00" * 64),
          11, 7, None)],
        MEDIA_SCHEMA,
    )
    # unrecognized container: errors without allow_fake ...
    with pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        decode_image_features(garbage).collect()
    # ... and passes declared metadata through with it
    g = decode_image_features(garbage, allow_fake=True).collect()[0]
    assert (g["width"], g["height"]) == (11, 7)


def test_container_codecs_roundtrip():
    """Pure-Python encoders/parsers agree for every format + WAV."""
    from hudi_spark_plus_spark.functions.multimodal import (
        encode_gif_shell,
        encode_jpeg_shell,
        encode_png,
        parse_image_dims,
        parse_wav_meta,
    )
    import struct

    for w, h in [(1, 1), (16, 48), (640, 480), (63, 31)]:
        assert parse_image_dims(encode_png(w, h, seed=3)) == (w, h)
        assert parse_image_dims(encode_jpeg_shell(w, h)) == (w, h)
        assert parse_image_dims(encode_gif_shell(w, h)) == (w, h)
    assert parse_image_dims(b"not an image at all") is None
    assert parse_image_dims(b"") is None
    # minimal WAV: 8000 Hz mono 8-bit, 4000 frames -> 500 ms
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    data = b"data" + struct.pack("<I", 4000) + b"\x80" * 4000
    wav = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data)) + b"WAVE" + fmt + data
    assert parse_wav_meta(wav) == (8000, 500)
    assert parse_wav_meta(b"RIFFxxxx") is None


def test_frame_sample_plan(spark):
    rows = [(1, "video", "video/mp4", bytearray(b"xx"), None, None, 3500)]
    from hudi_spark_plus_spark.functions.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    samples = frame_sample_plan(df, every_ms=1000).collect()
    assert [r["sample_ms"] for r in samples] == [0, 1000, 2000, 3000]


def test_minhash_ignores_empty_documents(spark):
    """Empty/whitespace docs must not pair with each other (they have no
    shingles), and id-only grouping keeps text out of the shuffle key."""
    rows = [(1, ""), (2, "   "), (3, "real text with actual words here"),
            (4, "real text with actual words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text", k=16, bands=4).collect()
    }
    assert (1, 2) not in pairs
    assert (3, 4) in pairs


def test_ivf_recall_on_planted_neighbors(spark, sf_dir):
    """IVF ANN must recover planted near-duplicates — a near-identical
    vector lands in the same (or a probed) KMeans cell."""
    import numpy as np

    from hudi_spark_plus_spark.functions.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    base = e.collect()
    rng = np.random.RandomState(11)
    planted = []
    for r in base[:20]:
        v = np.array(r["embedding"], dtype=np.float64)
        nv = v + rng.randn(len(v)) * 0.02
        nv = nv / np.linalg.norm(nv)
        planted.append((int(r["vec_id"]) + 100000, [float(x) for x in nv], 0))
    aug = e.unionByName(
        spark.createDataFrame(
            planted, "vec_id long, embedding array<float>, label int"
        )
    )
    queries = aug.where(F.col("vec_id") >= 100000)
    exact1 = {
        r["q_id"]: r["n_id"] for r in cosine_topk(aug, queries, k=1).collect()
    }
    got1 = {
        r["q_id"]: r["n_id"]
        for r in ivf_topk(aug, queries, k=1, n_centroids=8, nprobe=3).collect()
    }
    hits = sum(1 for q, n in exact1.items() if got1.get(q) == n)
    assert hits / len(exact1) >= 0.9, f"IVF recall {hits}/{len(exact1)}"


def test_chunking_invariants(spark):
    """Reassembling chunks with the overlap dropped must reproduce the
    document exactly; consecutive chunks share exactly `overlap` chars;
    empty docs yield one empty chunk."""
    from hudi_spark_plus_spark.functions.chunking import chunk_documents

    rows = [
        (1, "a" * 48),               # shorter than one chunk
        (2, "abcdefghij" * 30),      # several chunks, partial tail
        (3, ""),                     # empty
        (4, "x" * 160),              # length == exactly one step
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    size, overlap, step = 100, 20, 80
    out = chunk_documents(df, "text", size=size, overlap=overlap).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
    for doc_id, text in rows:
        chunks = by_doc[doc_id]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == text, f"doc {doc_id} reassembly mismatch"
        for a, b in zip(chunks, chunks[1:]):
            assert a[step:] == b[: len(a) - step], f"doc {doc_id} overlap"
    assert by_doc[3] == [""]
    with pytest.raises(ValueError):
        chunk_documents(df, "text", size=10, overlap=10)


def test_connected_components_chain_and_keepers(spark):
    """A 6-node chain plus a triangle and an isolated pair: labels must
    be the min reachable id (multi-hop propagation), keepers exactly the
    cluster minima, and sizes correct."""
    import pytest as _pytest

    from hudi_spark_plus_spark.functions.clustering import (
        connected_components,
        dup_clusters,
    )

    pairs = spark.createDataFrame(
        # chain 10-11-12-13-14-15 (diameter 5), triangle 20-21-22,
        # pair 30-31
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
         (20, 21), (21, 22), (20, 22), (30, 31)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["cluster_id"]
            for r in connected_components(pairs).collect()}
    assert comp == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
                    20: 20, 21: 20, 22: 20, 30: 30, 31: 30}
    out = dup_clusters(pairs).collect()
    keepers = {r["node"] for r in out if r["is_keeper"]}
    assert keepers == {10, 20, 30}
    sizes = {r["node"]: r["cluster_size"] for r in out}
    assert sizes[15] == 6 and sizes[22] == 3 and sizes[31] == 2
    # non-convergence must be loud, not silently partial
    with _pytest.raises(RuntimeError):
        connected_components(pairs, max_iter=2)


def test_deterministic_split_is_stable_and_partition_free(spark):
    """The md5 split assignment must not depend on partitioning and must
    produce roughly the 80/10/10 design ratios."""
    from hudi_spark_plus_spark.operators.llm_queries import q_doc_split

    sf = "/root/testdata/sf0.01"
    a = {r["doc_id"]: r["split"]
         for r in q_doc_split(spark, sf).repartition(17).collect()}
    b = {r["doc_id"]: r["split"] for r in q_doc_split(spark, sf).collect()}
    assert a == b
    n = len(b)
    frac_train = sum(1 for s in b.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9


def test_pack_sequences_invariants(spark):
    """Within a shard, each item starts exactly where the previous one
    ended (concat semantics); seq_id/seq_off agree with the running
    offset; capacity must be positive."""
    import pytest as _pytest

    from hudi_spark_plus_spark.functions.packing import pack_sequences

    rows = [(i, 100 + (i * 37) % 300) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(
        df, "n_tokens", 512, F.col("doc_id") % 4
    ).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for items in by_shard.values():
        offset = 0
        for r in items:
            assert r["seq_id"] == offset // 512
            assert r["seq_off"] == offset % 512
            offset += r["n_tokens"]
    with _pytest.raises(ValueError):
        pack_sequences(df, "n_tokens", 0, F.col("doc_id") % 4)


def test_stratified_sample_rates_and_stability(spark):
    """Selection must be per-key stable (shrinking the corpus never
    changes a survivor's fate), hit the requested rates within hash
    tolerance, and keep unlisted strata whole."""
    from hudi_spark_plus_spark.functions.sampling import stratified_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, "lang", {"a": 0.5, "b": 0.1}, key_col="doc_id"
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["c"] == 1000
    assert abs(by_lang["a"] - 500) < 80
    assert abs(by_lang["b"] - 100) < 50
    kept_full = {r["doc_id"] for r in out.collect()}
    half = stratified_sample(
        df.where(F.col("doc_id") < 1500), "lang", {"a": 0.5, "b": 0.1},
        key_col="doc_id",
    )
    assert {r["doc_id"] for r in half.collect()} == {
        i for i in kept_full if i < 1500
    }
    with pytest.raises(ValueError):
        from hudi_spark_plus_spark.functions.sampling import hash_fraction_keep
        df.where(hash_fraction_keep(F.col("doc_id"), 1.5)).collect()


def test_decontaminate_flags_planted_overlap(spark):
    """A training doc that shares a 5-gram with an eval doc is flagged;
    one sharing only shorter runs is not; counts are per distinct gram."""
    from hudi_spark_plus_spark.functions.ngrams import ngram_decontaminate

    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # contains eval 5-grams "alpha..epsilon" and "beta..zeta"
            (1, "x alpha beta gamma delta epsilon zeta y"),
            # only a 4-word overlap -> no shared 5-gram
            (2, "alpha beta gamma delta other words here"),
            (3, "completely unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in ngram_decontaminate(train, ev, "doc_id", "text", 5).collect()
    }
    assert got == {1: (2, True), 2: (0, False), 3: (0, False)}


def test_pii_redaction_semantics(spark):
    """Emails are replaced before phones (a digit-run inside an address
    never leaks), multiple hits all redact, and clean text is unchanged."""
    from hudi_spark_plus_spark.functions.text import (
        pii_email_count,
        pii_phone_count,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c%d@ex-ample.co.uk and 555-123-4567 twice 999.888.7777"),
            (2, "digits 555-123-4567@host.com inside an address"),
            (3, "no pii here just words 12345"),
        ],
        "id long, t string",
    )
    rows = {
        r["id"]: (r["e"], r["p"], r["red"])
        for r in df.select(
            "id",
            pii_email_count(F.col("t")).alias("e"),
            pii_phone_count(F.col("t")).alias("p"),
            redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert rows[1] == (
        1, 2, "mail <EMAIL> and <PHONE> twice <PHONE>",
    )
    # counts are independent raw pattern hits (the phone-shaped local
    # part counts), but REDACTION is email-first so the address never
    # gets clipped mid-string
    assert rows[2] == (1, 1, "digits <EMAIL> inside an address")
    assert rows[3] == (0, 0, "no pii here just words 12345")


def test_repetition_signals_known_values(spark):
    """Hand-computed repetition stats on a crafted doc: 8 words, 4
    distinct -> dup_word_frac 0.5; top 2-gram 'a b' occurs 3 times."""
    from hudi_spark_plus_spark.functions.ngrams import repetition_signals

    df = spark.createDataFrame(
        [(1, "a b a b a b c d")], "doc_id long, t string"
    )
    r = repetition_signals(df, "doc_id", "t").collect()[0]
    assert r["dup_word_frac"] == 0.5
    assert r["top_2gram"] == "a b" and r["top_2gram_cnt"] == 3
    # 3 occurrences x 3 chars / 15 chars = 0.6
    assert r["top_2gram_char_frac"] == 0.6


def test_quantize_embeddings_known_values(spark):
    """Hand-checked int8 quantization: scale = max|v|, q = round(127
    v/scale) half-away-from-zero; zero vectors -> zeros with scale 0."""
    from hudi_spark_plus_spark.functions.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [2.0, -4.0, 1.0]),
            (2, [0.0, 0.0]),
            (3, [-0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: (r["q_scale"], r["qvec"])
        for r in quantize_embeddings(df).collect()
    }
    assert rows[1] == (4.0, [64, -127, 32])  # 63.5 rounds away to 64
    assert rows[2] == (0.0, [0, 0])
    assert rows[3] == (0.5, [-127])


def test_mp4_container_roundtrip_and_v1_parse():
    """Pure-Python MP4 shell: encode -> parse recovers dims + duration;
    a hand-built version-1 (64-bit) mvhd/tkhd parses too; junk and
    truncated boxes return None instead of raising."""
    import struct

    from hudi_spark_plus_spark.functions.multimodal import (
        _UNITY_MATRIX,
        _box,
        encode_mp4_shell,
        parse_mp4_meta,
    )

    for w, h, d in [(320, 240, 5000), (1, 1, 1), (1920, 1080, 3600_000)]:
        assert parse_mp4_meta(encode_mp4_shell(w, h, d)) == (w, h, d)
    # version-1 boxes: 64-bit ctime/mtime/duration
    mvhd1 = _box(
        b"mvhd",
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)          # ctime mtime (64-bit)
        + struct.pack(">IQ", 1000, 7500)    # timescale, duration
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10 + _UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd1 = _box(
        b"tkhd",
        b"\x01\x00\x00\x07"
        + struct.pack(">QQIxxxx", 0, 0, 1)  # ctime mtime track (+reserved)
        + struct.pack(">Q", 7500)           # duration (64-bit)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", 640 << 16, 360 << 16),
    )
    b1 = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(
        b"moov", mvhd1 + _box(b"trak", tkhd1)
    )
    assert parse_mp4_meta(b1) == (640, 360, 7500)
    assert parse_mp4_meta(b"\x00" * 64) is None
    assert parse_mp4_meta(encode_mp4_shell(320, 240, 5000)[:40]) is None


def test_media_mix_includes_video_and_decodes(spark):
    """The synthetic media table now carries real MP4 rows; the decode
    path recovers their dims from the tkhd box, and frame_sample_plan
    fans real durations into sample timestamps."""
    from hudi_spark_plus_spark.functions.multimodal import (
        decode_image_features,
        frame_sample_plan,
        media_duration_ms,
        media_kind,
        synth_media_df,
    )

    media = synth_media_df(spark, 64)
    vids = [i for i in range(64) if media_kind(i) == "mp4"]
    assert vids, "fixture must include mp4 rows"
    assert media.where(F.col("kind") == "video").count() == len(vids)
    feats = {r["media_id"]: (r["width"], r["height"])
             for r in decode_image_features(
                 media.where(F.col("kind") != "audio")).collect()}
    from hudi_spark_plus_spark.functions.multimodal import (
        media_height,
        media_width,
    )
    for i in vids:
        assert feats[i] == (media_width(i), media_height(i))
    plan = frame_sample_plan(media, every_ms=1000)
    got = {r["media_id"] for r in plan.collect()}
    assert got == set(vids)
    n0 = plan.where(F.col("media_id") == vids[0]).count()
    assert n0 == media_duration_ms(vids[0]) // 1000 + 1


def test_hash_embed_dense_chains_into_ann(spark):
    """Dense hash_embed: unit-norm vectors, identical texts embed
    identically (exact), and the output plugs straight into the
    similarity operators — top-1 for a duplicated doc is its twin at
    cosine ~1.0."""
    import math

    from hudi_spark_plus_spark.functions.embedding import hash_embed

    rows = [
        (1, "spark shuffles parquet files into sorted buckets"),
        (2, "completely different words about merge windows and keys"),
        (3, "spark shuffles parquet files into sorted buckets"),  # dup of 1
        (4, "a third text that shares nothing with the others at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hash_embed(df, "doc_id", "text", dim=32)
    vecs = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    assert vecs[1] == vecs[3]
    for v in vecs.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    queries = emb.where(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    corpus = emb.select(F.col("doc_id").alias("vec_id"), "embedding")
    top = cosine_topk(corpus, queries, k=1).collect()
    assert top[0]["n_id"] == 3 and top[0]["sim"] >= 0.9999


def test_wav_roundtrip_and_audio_decode(spark):
    """encode_wav -> parse_wav_meta round-trips rate and duration; the
    audio decode path recovers them for every wav row in the mix and
    rejects non-RIFF bytes without allow_fake."""
    from hudi_spark_plus_spark.functions.multimodal import (
        decode_audio_features,
        encode_wav,
        media_duration_ms,
        media_kind,
        media_sample_rate,
        parse_wav_meta,
        synth_media_df,
    )

    for rate, dur in [(4000, 500), (8000, 2375), (10000, 1000)]:
        assert parse_wav_meta(encode_wav(rate, dur)) == (rate, dur)
    media = synth_media_df(spark, 64)
    wavs = [i for i in range(64) if media_kind(i) == "wav"]
    assert wavs, "fixture must include wav rows"
    got = {
        r["media_id"]: (r["sample_rate"], r["duration_ms"])
        for r in decode_audio_features(
            media.where(F.col("kind") == "audio")
        ).collect()
    }
    assert got == {
        i: (media_sample_rate(i), media_duration_ms(i)) for i in wavs
    }
    import pytest as _pytest

    from hudi_spark_plus_spark.functions.multimodal import MEDIA_SCHEMA

    junk = spark.createDataFrame(
        [(0, "audio", "audio/flac", bytearray(b"\x00" * 64), 0, 0, 123)],
        MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        decode_audio_features(junk).collect()
    fake = decode_audio_features(junk, allow_fake=True).collect()[0]
    assert fake["duration_ms"] == 123


def test_ngram_ops_invariants(spark):
    """Structural invariants of the corpus-hygiene operators:
    self-decontamination flags everything, dup fractions are bounded and
    hit their extremes on all-identical / all-distinct corpora, and a
    single-word run has hand-computable repetition stats."""
    from hudi_spark_plus_spark.functions.ngrams import (
        dup_ngram_fraction,
        ngram_decontaminate,
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(4)]
        + [(10, "one unique sentence nothing shares these words")],
        "doc_id long, text string",
    )
    # eval == train: every doc shares its own 5-grams
    got = ngram_decontaminate(docs, docs, "doc_id", "text", 5).collect()
    assert all(r["contaminated"] for r in got)
    fr = {r["doc_id"]: r["dup_frac"] for r in dup_ngram_fraction(docs, "doc_id", "text", 3).collect()}
    assert all(0.0 <= v <= 1.0 for v in fr.values())
    assert all(fr[i] == 1.0 for i in range(4))  # identical docs
    assert fr[10] == 0.0  # shares no 3-gram with anything
    rep = repetition_signals(
        spark.createDataFrame([(1, "w w w w")], "doc_id long, text string"),
        "doc_id",
        "text",
    ).collect()[0]
    assert rep["dup_word_frac"] == 0.75
    assert rep["top_2gram"] == "w w" and rep["top_2gram_cnt"] == 3


def test_mixture_and_epoch_shuffle_invariants(spark):
    """Mixture: surviving token mass lands within hash tolerance of the
    budget, unbudgeted strata pass whole, membership is key-stable under
    corpus growth. Shuffle: permutations differ by seed, shards are
    balanced within tolerance, assignment is reproducible."""
    from hudi_spark_plus_spark.functions.sampling import (
        epoch_shuffle,
        token_budget_mixture,
    )

    rows = [(i, "a" if i % 3 else "b", 10) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    kept = token_budget_mixture(
        df, "lang", "n_tokens", {"a": 5000}, key_col="doc_id"
    )
    by = {
        r["lang"]: r["s"]
        for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert by["b"] == 10 * 1000  # unbudgeted stratum whole
    assert abs(by["a"] - 5000) < 1200  # ~budget within hash tolerance
    kept_ids = {r["doc_id"] for r in kept.where(F.col("lang") == "a").collect()}
    # key-stability: halving the corpus keeps the same survivors (rate
    # recomputed on the half -> same 0.25 ratio -> same cutoff)
    half = df.where((F.col("doc_id") < 1500) & (F.col("lang") == "a"))
    kept_half = token_budget_mixture(
        half, "lang", "n_tokens", {"a": 2500}, key_col="doc_id"
    )
    assert {r["doc_id"] for r in kept_half.collect()} == {
        i for i in kept_ids if i < 1500
    }
    s1 = epoch_shuffle(df.select("doc_id"), "doc_id", "e1", n_shards=8)
    s2 = epoch_shuffle(df.select("doc_id"), "doc_id", "e2", n_shards=8)
    o1 = [r["doc_id"] for r in s1.orderBy("shard", "sort_key").collect()]
    o2 = [r["doc_id"] for r in s2.orderBy("shard", "sort_key").collect()]
    assert o1 != o2  # different epoch -> different permutation
    assert sorted(o1) == sorted(o2) == list(range(3000))
    sizes = [r["n"] for r in s1.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 8 and max(sizes) < 2 * min(sizes)
    # reproducible
    o1b = [r["doc_id"] for r in epoch_shuffle(df.select("doc_id"), "doc_id", "e1", n_shards=8).orderBy("shard", "sort_key").collect()]
    assert o1 == o1b


def test_lsh_bucket_cap_bounds_candidates(spark):
    """1000 identical documents: without the cap, one LSH bucket per band
    would hold all 1000 docs and the self-join would emit ~500k pairs x
    16 bands. With the cap, those buckets are dropped entirely (bounded
    candidates) while distinct near-dup docs still pair up, and the
    identical docs still dedup via the exact pass."""
    from hudi_spark_plus_spark.functions.dedup import exact_dedup

    boiler = [(i, "the same boilerplate text repeated everywhere forever") for i in range(1000)]
    near = [
        (2000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2001, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")
    cand = minhash_lsh_pairs(
        df, "doc_id", "text", k=16, bands=4, max_bucket_size=100
    )
    rows = cand.collect()
    # the 1000-doc buckets are capped away; only the small near-dup
    # bucket contributes -> candidate count stays tiny, never ~500k
    assert len(rows) <= 10
    assert (2000, 2001) in {(r["id_a"], r["id_b"]) for r in rows}
    # mass-duplicates still surface through exact dedup
    ex = exact_dedup(df, "text", "doc_id").where(F.col("dup_cnt") == 1000)
    assert ex.count() == 1


def test_lsh_verify_shingles_are_semijoin_pruned(spark, sf_dir):
    """The exact-Jaccard verify step must compute shingles only for
    candidate ids (LeftSemi prune before the shingle transform), never
    shuffle corpus-wide shingle arrays."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    out = minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=4, verify_threshold=0.3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_dedup_lines_removes_boilerplate_preserves_order(spark):
    """Shared boilerplate lines vanish; unique lines survive in original
    order; a doc that is ALL boilerplate drops out."""
    from hudi_spark_plus_spark.functions.dedup import dedup_lines

    rows = [
        (1, ["COOKIE BANNER", "real content one", "FOOTER NAV"]),
        (2, ["COOKIE BANNER", "real content two", "FOOTER NAV"]),
        (3, ["FOOTER NAV", "COOKIE BANNER"]),  # pure boilerplate
        (4, ["only unique text here"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, _lines array<string>")
    out = {
        r["doc_id"]: (r["lines_kept"], r["clean_text"])
        for r in dedup_lines(df, "doc_id", "_lines", min_doc_freq=2).collect()
    }
    assert out[1] == (1, "real content one")
    assert out[2] == (1, "real content two")
    assert 3 not in out  # fully boilerplate
    assert out[4] == (1, "only unique text here")


def test_dedup_lines_ordering_multi_line(spark):
    from hudi_spark_plus_spark.functions.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, [f"line {i}" for i in range(20)])],
        "doc_id long, _lines array<string>",
    )
    r = dedup_lines(df, "doc_id", "_lines", min_doc_freq=2).first()
    assert r["clean_text"] == "\n".join(f"line {i}" for i in range(20))


def test_incremental_dedup_exact_no_false_negatives(spark):
    """The bloom can only over-approximate: every corpus-present text
    MUST be dropped (no false negatives by construction), and every
    novel text must survive (false positives die in exact verify)."""
    from hudi_spark_plus_spark.functions.dedup import (
        corpus_text_bloom,
        incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i}") for i in range(300)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        # 50 dups of the corpus + 50 novel
        [(1000 + i, f"corpus document number {i}") for i in range(50)]
        + [(2000 + i, f"brand new document {i}") for i in range(50)],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in
            incremental_dedup(new, corpus, "doc_id", "text").collect()}
    assert kept == {2000 + i for i in range(50)}
    # bloom is bounded metadata: m_bits/64 longs
    bloom = corpus_text_bloom(corpus, "text", m_bits=1 << 12)
    assert len(bloom) == (1 << 12) // 64
    assert any(bloom)  # bits actually set


def test_png_unfilter_all_filter_types():
    """decode_png_gray must invert every PNG scanline filter (Sub, Up,
    Average, Paeth), not just the None filter the synth encoder emits:
    filter a known image per spec, rebuild the PNG, decode, compare."""
    import struct
    import zlib

    import numpy as np

    from hudi_spark_plus_spark.functions.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png_gray,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(6, 9), dtype=np.uint8)

    def filt(img, ftype):
        h, w = img.shape
        out = bytearray()
        prev = np.zeros(w, dtype=np.uint8)
        for y in range(h):
            cur = img[y]
            out.append(ftype)
            for x in range(w):
                left = int(cur[x - 1]) if x else 0
                up = int(prev[x])
                ul = int(prev[x - 1]) if x else 0
                if ftype == 0:
                    v = int(cur[x])
                elif ftype == 1:
                    v = (int(cur[x]) - left) & 0xFF
                elif ftype == 2:
                    v = (int(cur[x]) - up) & 0xFF
                elif ftype == 3:
                    v = (int(cur[x]) - ((left + up) >> 1)) & 0xFF
                else:  # Paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else ul)
                    )
                    v = (int(cur[x]) - pred) & 0xFF
                out.append(v)
            prev = cur
        return bytes(out)

    for ftype in range(5):
        h, w = img.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        png = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(filt(img, ftype)))
            + _png_chunk(b"IEND", b"")
        )
        got = decode_png_gray(png)
        assert got is not None and (got == img).all(), f"filter {ftype}"
    # multi-IDAT reassembly: split the compressed stream across chunks
    comp = zlib.compress(filt(img, 4))
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 6, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", comp[: len(comp) // 2])
        + _png_chunk(b"IDAT", comp[len(comp) // 2:])
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png_gray(png)
    assert got is not None and (got == img).all()
    # non-grayscale / truncated bytes refuse instead of mis-decoding
    assert decode_png_gray(b"not a png") is None
    rgb_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    assert decode_png_gray(
        _PNG_SIG + _png_chunk(b"IHDR", rgb_ihdr) + _png_chunk(b"IEND", b"")
    ) is None


def test_pq_topk_recall_vs_exact(spark, sf_dir):
    """PQ ADC + refine must recover most of the exact top-5 per query on
    the natural corpus, and every emitted similarity must be the EXACT
    cosine (re-rank step) — approximation affects recall only."""
    from hudi_spark_plus_spark.functions.similarity import pq_topk

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r["q_id"], r["n_id"]): r["sim"]
        for r in cosine_topk(e, q, k=5).collect()
    }
    pq = {
        (r["q_id"], r["n_id"]): r["sim"]
        for r in pq_topk(e, q, k=5, refine=50).collect()
    }
    hits = set(pq) & set(exact)
    assert len(hits) / len(exact) >= 0.6, (len(hits), len(exact))
    for key in hits:  # exact re-rank: sims must agree exactly
        assert abs(pq[key] - exact[key]) < 1e-9


def test_ivfpq_topk_recall_vs_exact(spark, sf_dir):
    """IVF-PQ: probing + compressed scan must still recover most exact
    neighbors, and emitted sims are exact (re-rank)."""
    from hudi_spark_plus_spark.functions.similarity import ivfpq_topk

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500)
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r["q_id"], r["n_id"]): r["sim"]
        for r in cosine_topk(e, q, k=5).collect()
    }
    got = {
        (r["q_id"], r["n_id"]): r["sim"]
        for r in ivfpq_topk(e, q, k=5, nprobe=6, refine=50).collect()
    }
    hits = set(got) & set(exact)
    assert len(hits) / len(exact) >= 0.5, (len(hits), len(exact))
    for key in hits:
        assert abs(got[key] - exact[key]) < 1e-9


def test_semdedup_invariants(spark):
    """SemDeDup semantics on a hand-built corpus: exact copies prune to
    the lowest id, near-but-below-threshold pairs survive, clusters
    follow the nearest seed, zero vectors are kept, and a higher
    threshold never removes more."""
    from hudi_spark_plus_spark.functions.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # seed A
        (1, [0.0, 1.0, 0.0, 0.0]),   # seed B
        (2, [1.0, 0.05, 0.0, 0.0]),  # ~copy of A (cos ~0.9989) -> removed
        (3, [0.0, 1.0, 0.0, 0.0]),   # exact copy of B -> removed
        (4, [0.7, 0.7, 0.0, 0.0]),   # diagonal: cos 0.707 < 0.9 both
        (5, [0.0, 0.0, 0.0, 0.0]),   # zero vector: kept, never a dup
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_kept"])
        for r in semdedup(df, n_clusters=2, threshold_centi=90).collect()
    }
    assert got[0] == (0, True) and got[1] == (1, True)
    assert got[2][0] == 0 and got[2][1] is False
    assert got[3][0] == 1 and got[3][1] is False
    assert got[4][1] is True       # below threshold survives
    assert got[5][1] is True       # zero vector kept
    # threshold monotonicity: at 100 (exact copies only), vec 2's
    # quantized form differs from vec 0's -> only vec 3 is removed
    got100 = {
        r["vec_id"]: r["is_kept"]
        for r in semdedup(df, n_clusters=2, threshold_centi=100).collect()
    }
    removed90 = {k for k, v in got.items() if not v[1]}
    removed100 = {k for k, v in got100.items() if not v}
    assert removed100 <= removed90
    assert removed100 == {3}


def test_semdedup_exact_copies_prune_across_partitionings(spark, sf_dir):
    """The removal set is a pure function of the data: repartitioning
    must not change it (integer arithmetic everywhere — no float
    summation-order dependence)."""
    from hudi_spark_plus_spark.functions.similarity import semdedup

    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    planted = e.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000)
    )
    corpus = e.unionByName(planted).select("vec_id", "embedding")
    a = {
        (r["vec_id"], r["cluster_id"], r["is_kept"])
        for r in semdedup(corpus, n_clusters=4).collect()
    }
    b = {
        (r["vec_id"], r["cluster_id"], r["is_kept"])
        for r in semdedup(corpus.repartition(13), n_clusters=4).collect()
    }
    assert a == b
    removed = {v for v, _, kept in a if not kept}
    assert removed == {v + 1000 for v in range(0, 100, 10)}


def test_dsir_scores_semantics(spark):
    """DSIR weighting on a hand-built corpus: a document made of
    target-corpus tokens must out-rank (per token) one made of tokens
    the target never uses; empty documents score 0 but stay in the
    scores output; scores are partitioning-independent."""
    from hudi_spark_plus_spark.functions.selection import (
        dsir_scores,
        dsir_select,
    )

    rows = [
        (0, "alpha beta alpha beta", "tgt"),
        (1, "alpha beta gamma", "tgt"),
        (2, "alpha beta alpha", "raw"),       # target-like
        (3, "zulu yankee xray whiskey", "raw"),  # target-absent
        (4, "   ", "raw"),                     # empty after trim
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    s = {
        r["doc_id"]: (r["n_tokens"], r["dsir_score"])
        for r in dsir_scores(df, F.col("kind") == "tgt").collect()
    }
    assert len(s) == 5 and s[4] == (0, 0)
    per_tok = {k: v[1] / max(v[0], 1) for k, v in s.items()}
    assert per_tok[2] > per_tok[3]
    sel = dsir_select(df, F.col("kind") == "tgt", 2).collect()
    picked = [r["doc_id"] for r in sel]
    assert 3 not in picked  # target-absent never beats target-like
    assert all(r["n_tokens"] > 0 for r in sel)
    s2 = {
        r["doc_id"]: (r["n_tokens"], r["dsir_score"])
        for r in dsir_scores(
            df.repartition(7), F.col("kind") == "tgt"
        ).collect()
    }
    assert s == s2


def test_substring_dedup_semantics(spark):
    from hudi_spark_plus_spark.functions.ngrams import substring_dedup

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, "AAAA " + shared + " unique suffix zero 0123456789 padding"),
        (1, "BBBB " + shared + " other unique suffix one 9876543210 pad"),
        (2, "totally unique document with no duplicated windows at all"),
        (3, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r.asDict()
        for r in substring_dedup(
            df, "doc_id", "text", window=20, stride=10
        ).collect()
    }
    # doc 0 holds the canonical (first-occurrence) copies: untouched
    assert out[0]["dup_windows"] == 0 and out[0]["removed_chars"] == 0
    assert out[0]["clean_len"] == len(rows[0][1])
    # doc 1's duplicated windows merge into one excised span
    assert out[1]["dup_windows"] > 0
    assert out[1]["removed_chars"] >= 20
    assert (
        out[1]["clean_len"]
        == len(rows[1][1]) - out[1]["removed_chars"]
    )
    # unique and sub-window docs are untouched, md5 = original
    import hashlib

    for i in (2, 3):
        assert out[i]["dup_windows"] == 0
        assert out[i]["clean_len"] == len(rows[i][1])
        assert (
            out[i]["clean_md5"]
            == hashlib.md5(rows[i][1].encode()).hexdigest()
        )


def test_substring_dedup_partitioning_independent(spark):
    from hudi_spark_plus_spark.functions.ngrams import substring_dedup

    base = "word%d " * 30
    rows = [(i, (base % tuple(range(i, i + 30))) + "shared tail block "
             "that is long enough to duplicate across docs")
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        tuple(r)
        for r in substring_dedup(df, "doc_id", "text", 20, 10).collect()
    )
    b = sorted(
        tuple(r)
        for r in substring_dedup(
            df.repartition(7), "doc_id", "text", 20, 10
        ).collect()
    )
    assert a == b


def test_bm25_planted_relevance_and_partitioning(spark):
    from hudi_spark_plus_spark.functions.retrieval import bm25_topk

    rows = [
        (0, "table join query window table join query window table"),
        (1, "table join filler filler filler filler filler filler"),
        (2, "nothing relevant here at all just plain words padding"),
        (3, "query " + "filler " * 40),  # one hit, long doc: low score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["table", "join", "query", "window"]
    got = bm25_topk(df, "doc_id", "text", terms, k=3).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert got[0]["id"] == 0          # stuffed doc wins
    assert got[1]["id"] == 1          # two terms beats one diluted term
    assert all(r["id"] != 2 for r in got)  # no-hit doc never scored
    # integer scoring: identical output under any partitioning
    got2 = bm25_topk(
        df.repartition(5), "doc_id", "text", terms, k=3
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in got2]


def test_semantic_decontaminate_semantics(spark):
    from hudi_spark_plus_spark.functions.similarity import (
        semantic_decontaminate,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # exact eval copy -> hit
        (1, [0.99, 0.14, 0.0, 0.0]),  # near-copy (cos ~0.99) -> hit
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal -> clean
        (3, [-1.0, 0.0, 0.0, 0.0]),  # antipodal: dot < 0 -> clean
        (4, [0.0, 0.0, 0.0, 0.0]),   # zero vector -> clean
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["n_hits"], r["contaminated"])
        for r in semantic_decontaminate(
            corpus, ev, threshold_centi=90
        ).collect()
    }
    assert got[0] == (1, True)
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    # integer test: identical verdicts under any partitioning
    got2 = {
        r["vec_id"]: (r["n_hits"], r["contaminated"])
        for r in semantic_decontaminate(
            corpus.repartition(5), ev, threshold_centi=90
        ).collect()
    }
    assert got == got2


def test_semantic_decontaminate_bounds(spark):
    import pytest as _pytest

    from hudi_spark_plus_spark.functions.similarity import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [(0, [1.0] * 4)], "vec_id long, embedding array<float>"
    )
    wide = spark.createDataFrame(
        [(0, [1.0] * 80)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="dim <= 78"):
        semantic_decontaminate(
            spark.createDataFrame(
                [(1, [1.0] * 80)], "vec_id long, embedding array<float>"
            ),
            wide,
        ).collect()
    with _pytest.raises(ValueError, match="threshold_centi"):
        semantic_decontaminate(corpus, corpus, threshold_centi=0)
    # empty eval set: everything clean, no kernel invoked
    empty = corpus.where("vec_id < 0")
    out = semantic_decontaminate(corpus, empty).collect()
    assert [(r["n_hits"], r["contaminated"]) for r in out] == [(0, False)]


def test_normalized_dedup_collapses_reformatted_copies(spark):
    from hudi_spark_plus_spark.functions.dedup import (
        exact_dedup,
        normalized_dedup,
    )

    rows = [
        (1, "Hello,  World!"),
        (2, "hello world"),          # same class as 1
        (3, "  HELLO WORLD !!! "),   # same class as 1
        (4, "another doc"),
        (5, "Another   DOC."),       # same class as 4
        (6, "distinct entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["keeper_id"], r["dup_cnt"])
        for r in normalized_dedup(df, "text", "doc_id").collect()
    }
    assert got == {(1, 3), (4, 2), (6, 1)}
    # byte-exact dedup sees 6 distinct docs — the gap normalization closes
    assert exact_dedup(df, "text", "doc_id").count() == 6
    # partitioning-independent (pure function of the data)
    got2 = {
        (r["keeper_id"], r["dup_cnt"])
        for r in normalized_dedup(
            df.repartition(5), "text", "doc_id"
        ).collect()
    }
    assert got == got2


def test_incremental_neardup_pairs_scopes_and_pruning(spark):
    """incremental_neardup_pairs: a batch probed against PERSISTED
    corpus signatures finds (a) its copies of corpus docs (scope
    corpus), (b) its internal copies (scope delta), and nothing for
    genuinely novel text; the corpus is never re-minhashed (only its
    banded state is joined) and candidate verification is semi-join
    pruned. Plan: no cartesian anywhere."""
    from hudi_spark_plus_spark.functions.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, f"{words} corpus doc {i} " + words[::-1]) for i in range(8)],
        "doc_id long, text string",
    )
    state = banded_signatures(corpus, "doc_id", "text", k=32, bands=8)
    batch = spark.createDataFrame(
        [
            (100, f"{words} corpus doc 3 " + words[::-1]),  # copy of 3
            (101, "completely novel text nothing like the corpus at all"),
            (102, "twin twin twin unique within the batch only twin"),
            (103, "twin twin twin unique within the batch only twin"),
        ],
        "doc_id long, text string",
    )
    out = incremental_neardup_pairs(
        batch, corpus, state, "doc_id", "text",
        k=32, bands=8, verify_threshold=1.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = {(r["new_id"], r["dup_id"], r["scope"]) for r in out.collect()}
    assert (100, 3, "corpus") in rows
    assert (102, 103, "delta") in rows
    assert not any(r[0] == 101 or r[1] == 101 for r in rows)
    # state must match the banding minhash_lsh_pairs itself uses
    # (same k/bands/ngram => a corpus doc's copy collides on EVERY band)
    n_bands = state.where(F.col("id") == 3).count()
    assert n_bands == 8


def test_incremental_neardup_no_self_pairs_on_shared_ids(spark):
    """ADVICE r9 #3: ids shared between batch and state violate the
    documented disjointness precondition; the defense-in-depth guard
    must still never emit a corpus-scope self-pair (new_id == dup_id)."""
    from hudi_spark_plus_spark.functions.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, f"{words} shared doc {i} " + words[::-1]) for i in range(4)],
        "doc_id long, text string",
    )
    state = banded_signatures(corpus, "doc_id", "text", k=32, bands=8)
    # the batch RE-INGESTS id 2 with identical text: every band collides
    batch = spark.createDataFrame(
        [(2, f"{words} shared doc 2 " + words[::-1])],
        "doc_id long, text string",
    )
    out = incremental_neardup_pairs(
        batch, corpus, state, "doc_id", "text", k=32, bands=8
    ).collect()
    assert not any(r["new_id"] == r["dup_id"] for r in out)


def test_prune_signature_state_drops_deleted_docs(spark):
    """VERDICT r10 #3 (signature-state lifecycle): after documents are
    DELETED from the corpus, prune_signature_state(state, live) removes
    their banded signatures, so a later ingest of identical text no
    longer reports the ghost as dup_id (and verification never needs
    the missing text)."""
    from hudi_spark_plus_spark.functions.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
        prune_signature_state,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, f"{words} corpus doc {i} " + words[::-1]) for i in range(6)],
        "doc_id long, text string",
    )
    state = banded_signatures(corpus, "doc_id", "text", k=32, bands=8)
    # docs 3 and 4 are deleted from the corpus
    live = corpus.where(~F.col("doc_id").isin(3, 4))
    pruned = prune_signature_state(state, live, "doc_id")
    assert pruned.select("id").distinct().count() == 4
    assert pruned.where(F.col("id").isin(3, 4)).count() == 0
    # a batch copying the DELETED doc 3 and the LIVE doc 5
    batch = spark.createDataFrame(
        [
            (100, f"{words} corpus doc 3 " + words[::-1]),
            (101, f"{words} corpus doc 5 " + words[::-1]),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["new_id"], r["dup_id"])
        for r in incremental_neardup_pairs(
            batch, live, pruned, "doc_id", "text",
            k=32, bands=8, verify_threshold=1.0,
        ).collect()
    }
    assert (101, 5) in rows
    assert not any(dup in (3, 4) for _, dup in rows)
