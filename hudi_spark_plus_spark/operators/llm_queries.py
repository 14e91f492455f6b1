"""LLM training-data operator check queries (SURVEY M6).

Oracle-checked wherever the semantics are engine-neutral (exact dedup,
token stats, quality score, language ID, fingerprints, exact n-gram
Jaccard near-dup, brute-force cosine top-k) — and for the approximate
ANN indexes (LSH, IVF) via planted exact-duplicate neighbors whose
top-k is deterministic regardless of the engine-specific hash/centroid
internals. Only the MinHash/SimHash PAIR queries (whose output is the
signature collision set itself, xxhash64/seeded-hyperplane specific)
take the driver's rows-only check; they are instead validated by recall
tests against exact ground truth (tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_spark_plus_spark.localdf import local_frame

from hudi_spark_plus_spark.functions.chunking import chunk_documents
from hudi_spark_plus_spark.functions.clustering import dup_clusters
from hudi_spark_plus_spark.functions.dedup import (
    exact_dedup,
    exact_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from hudi_spark_plus_spark.functions.multimodal import (
    decode_audio_features,
    decode_image_features,
    encode_media_from_documents,
)
from hudi_spark_plus_spark.functions.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_topk,
    lsh_ann_topk,
    lsh_neardup_pairs,
    quantize_embeddings,
)
from hudi_spark_plus_spark.functions.embedding import hash_embed_components
from hudi_spark_plus_spark.functions.ngrams import (
    corpus_vocab,
    distinctive_terms,
    dup_ngram_fraction,
    ngram_decontaminate,
    repetition_signals,
)
from hudi_spark_plus_spark.functions.text import (
    bpe_token_count,
    char_count,
    fingerprint,
    lang_id_expr,
    pii_email_count,
    pii_phone_count,
    quality_score_expr,
    redact_pii,
    token_count,
)
from hudi_spark_plus_spark.sources.loaders import load_table, spread

NEARDUP_SUBSET = 150  # doc_id bound for the exact all-pairs oracle query
NEARDUP_THRESHOLD = 0.30


def q_doc_dedup_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").orderBy("text_hash")


NORMDUP_MOD = 5


def q_doc_dedup_normalized(spark, sf_dir):
    """Near-exact dedup over NORMALIZED text (functions/dedup.py
    normalized_dedup — lowercase / punctuation→space / whitespace
    collapse): every MODth doc gets a planted reformatted copy
    (leading spaces, uppercased, trailing '!!!') at a corpus-derived
    offset id — byte-exact hashing sees two documents, the normalized
    form collapses them to one class with the ORIGINAL id as keeper.
    Both the perturbation and the normalization replay in ANSI SQL
    (pure-ASCII corpus, so upper/lower round-trips identically in
    both engines)."""
    from hudi_spark_plus_spark.functions.dedup import normalized_dedup

    d = load_table(spark, sf_dir, "documents")
    off = _id_offset(d, "doc_id")
    copies = d.where(F.col("doc_id") % NORMDUP_MOD == 0).select(
        (F.col("doc_id") + off).alias("doc_id"),
        F.concat(
            F.lit("  "), F.upper("text"), F.lit(" !!!")
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(copies)
    return normalized_dedup(corpus, "text", "doc_id").orderBy(
        "norm_hash"
    )


def q_doc_token_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe"),
        char_count(F.col("text")).alias("n_chars_m"),
    ).orderBy("doc_id")


def q_doc_quality(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "_tl", F.expr("split(trim(lower(text)), '\\\\s+')")
    )
    return d.select(
        "doc_id", quality_score_expr("text", "_tl").alias("quality")
    ).orderBy("doc_id")


def q_doc_langid(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "_tl", F.expr("split(trim(lower(text)), '\\\\s+')")
    )
    return d.select(
        "doc_id", lang_id_expr("text", "_tl").alias("lang_pred")
    ).orderBy("doc_id")


def q_doc_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    ).orderBy("doc_id")


def q_doc_neardup_jaccard(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < NEARDUP_SUBSET
    )
    return exact_jaccard_pairs(
        d, "doc_id", "text", NEARDUP_THRESHOLD, ngram=3
    ).orderBy("id_a", "id_b")


def _plant_offset(max_id: int) -> int:
    """Smallest power of ten > max_id + 1 — the id stride between planted
    copy generations. Derived from the CORPUS (not a constant), so the
    planted-oracle device works on any id range: a 10^9-document corpus
    gets a 10^10 stride instead of colliding (the r6 fixed 10^6 offset
    asserted-and-died on the bench's replicated ids, VERDICT r6 #2).
    DuckDB mirrors the formula verbatim as
    ``POWER(10, CEIL(LOG10(MAX(doc_id) + 2)))`` — both sides are IEEE
    doubles, so they agree exactly."""
    import math

    return 10 ** math.ceil(math.log10(max_id + 2))


def _id_offset(df, col):
    """Corpus-derived planted-id stride (``_plant_offset`` over the
    table's max id — one bounded one-row agg) for fixtures that plant
    copies with explicit arithmetic rather than ``_plant_copies``.
    Replaces the r6-and-earlier fixed ``+100000`` strides, which would
    silently collide planted ids with real ones on any corpus past 10^5
    ids (same at-scale defect class as the r6 bench crash)."""
    mx = df.agg(F.max(col)).first()[0]
    return _plant_offset(mx if mx is not None else 0)


def _plant_copies(d, mod, residue=0, gens=1):
    """Append ``gens`` exact-copy rows (doc_id + g * offset, same text)
    for every doc with doc_id % mod == residue — the planted-outcome
    oracle device the ANN queries use (VERDICT r4 directive 3): an exact
    copy has an IDENTICAL sketch (MinHash signature / SimHash), so its
    pair is a guaranteed LSH/band candidate regardless of hash values,
    and the verified outcome (pair ids + exact similarity) is replayable
    in ANSI SQL.

    Planted ids live at doc_id + g*offset where the offset is derived
    from the corpus's own max id (one bounded one-row agg) — collision-
    free at ANY corpus scale."""
    max_id = d.agg(F.max("doc_id")).first()[0]
    offset = _plant_offset(max_id if max_id is not None else 0)
    src = d.where(F.col("doc_id") % mod == residue)
    copies = (
        src.withColumn(
            "_g", F.explode(F.array([F.lit(g) for g in range(1, gens + 1)]))
        )
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("_g") * F.lit(offset)
        )
        .drop("_g")
    )
    return d.unionByName(copies)


def q_doc_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs under a planted-outcome hash oracle:
    exact copies are planted (doc_id % 10 within the subset), candidates
    are exact-verified at jaccard = 1.0, so the output is precisely the
    equal-shingle-set pairs — DuckDB replays it without knowing the
    engine's hash family. The signature build, banding, bucket join and
    semi-join-pruned verify are all on the verified path. Distinct LSH
    config (k=32, bands=8 => r=4) from the full variant. Bucket capping
    is disabled here because a capped bucket could drop a planted pair
    nondeterministically; the cap itself is property-tested in
    tests/test_dedup_property.py and on by default in the API."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < NEARDUP_SUBSET)
        .select("doc_id", "text")
    )
    corpus = _plant_copies(d, mod=10)
    return minhash_lsh_pairs(
        corpus, "doc_id", "text", k=32, bands=8, ngram=3,
        verify_threshold=1.0, max_bucket_size=1_000_000,
    ).orderBy("id_a", "id_b")


def q_doc_minhash_full(spark, sf_dir):
    """FULL-corpus MinHash+LSH dedup (the scale path — no subset bound)
    under the same planted-outcome oracle: two copy generations per
    planted doc (doc_id % 50) yield 3-cliques, exercising multi-way pair
    enumeration inside buckets; verify at jaccard = 1.0 makes the
    outcome hash-replayable (see q_doc_minhash_lsh)."""
    d = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    corpus = _plant_copies(d, mod=50, gens=2)
    return minhash_lsh_pairs(
        corpus, "doc_id", "text", k=64, bands=16, ngram=3,
        verify_threshold=1.0, max_bucket_size=1_000_000,
    ).orderBy("id_a", "id_b")


def q_doc_simhash(spark, sf_dir):
    """SimHash near-dup pairs under the planted-outcome oracle: planted
    exact copies (doc_id % 10 == 3 within the subset) have identical
    64-bit SimHash (hamming 0, every 16-bit band collides), so candidacy
    is guaranteed; the exact token-set equality verify then admits
    exactly the equal-content pairs, which DuckDB replays. hamming is 0
    for every emitted pair by construction (equal token sets => equal
    signatures); n_tokens carries the verified content size."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < NEARDUP_SUBSET)
        .select("doc_id", "text")
    )
    corpus = _plant_copies(d, mod=10, residue=3)
    pairs = simhash_near_pairs(
        corpus, "doc_id", "text", max_hamming=8, max_bucket_size=1_000_000
    )
    tokset = F.expr(
        "sort_array(array_distinct(split(trim(text), '\\\\s+')))"
    )
    toks = corpus.select(F.col("doc_id"), tokset.alias("tk"))
    return (
        pairs.join(
            toks.select(F.col("doc_id").alias("id_a"), F.col("tk").alias("tk_a")),
            "id_a",
        )
        .join(
            toks.select(F.col("doc_id").alias("id_b"), F.col("tk").alias("tk_b")),
            "id_b",
        )
        .where(F.col("tk_a") == F.col("tk_b"))
        .select(
            "id_a", "id_b", "hamming", F.size("tk_a").alias("n_tokens")
        )
        .orderBy("id_a", "id_b")
    )


CHUNK_SIZE, CHUNK_OVERLAP = 200, 40  # step = 160


def q_doc_chunks(spark, sf_dir):
    """Fixed-size overlapping character chunks — the pre-embedding /
    packing step. Zero-shuffle map-side explode; oracled against
    DuckDB's generate_series formulation."""
    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        d, "text", size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    ).orderBy("doc_id", "chunk_id")


def q_emb_cosine_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        e, e.where(F.col("vec_id") < 10), k=5
    ).orderBy("q_id", "rank")


def q_emb_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN, made hash-checkable by planted neighbors: the
    corpus gains 5 exact copies of every query vector (ids q + j*100000,
    j in 1..5). Identical vectors share every sign-bit signature, so the
    bucket join always surfaces them, and sim ~1.0 beats every natural
    pair (max natural cosine ~0.6) — top-5 per query is exactly the
    planted set ranked by n_id, or the hash diverges. The pipeline under
    test is the real one (signatures, multiprobe bucket join, exact
    re-rank); recall on natural corpora is asserted vs brute force in
    tests."""
    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    queries = e.where(F.col("vec_id") < 10)
    copies = (
        queries.withColumn(
            "j", F.explode(F.array([F.lit(i) for i in range(1, 6)]))
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("j") * F.lit(off))
        .drop("j")
    )
    # the planted union feeds BOTH bucket-signature branches of the
    # join; localCheckpoint materializes it once instead of re-deriving
    # the explode lineage per branch (measured ~3x on the fixture)
    corpus = e.unionByName(copies).localCheckpoint()
    return lsh_ann_topk(corpus, queries, k=5, bits=8, dim=64).orderBy(
        "q_id", "rank"
    )


def q_emb_ann_ivf(spark, sf_dir):
    """IVF ANN (KMeans cells, nprobe probing, exact re-rank), made
    hash-checkable the same way as q-emb-ann-lsh: the corpus gains 5
    exact copies of every query vector. An identical vector maps to the
    identical KMeans cell, and a query's probe set always contains its
    own nearest cell, so all 5 copies surface at sim ~1.0 and beat every
    natural pair (max natural cosine ~0.6) — top-5 per query is exactly
    the planted set ranked by n_id regardless of which other cells the
    probe visits. Natural-corpus recall is asserted vs brute force in
    tests."""
    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    queries = e.where(F.col("vec_id") < 10)
    copies = (
        queries.withColumn(
            "j", F.explode(F.array([F.lit(i) for i in range(1, 6)]))
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("j") * F.lit(off))
        .drop("j")
    )
    # corpus feeds the KMeans fit, the cell assignment, and the probe
    # join — localCheckpoint the planted union so the explode lineage
    # computes once
    corpus = e.unionByName(copies).localCheckpoint()
    return ivf_topk(
        corpus, queries, k=5, n_centroids=16, nprobe=4
    ).orderBy("q_id", "rank")


def q_emb_ann_index(spark, sf_dir):
    """Persistent mutable ANN index (functions/ann_index.py IvfIndex —
    IVF state managed AS a lake table, the SignatureStore move applied
    to similarity search): build fixes the quantizer and adds the
    natural corpus; then the full mutation lifecycle runs under oracle
    control — 6 exact copies of every query ADDED as one batch
    (exactly-once: the add is REPLAYED and must no-op), copy j=1
    REMOVED (O(removed) tombstones), and the stale add replayed AGAIN
    (suppressed by batch-id idempotence, H5 — never a resurrect).
    Search then returns exactly copies j=2..6 per query at sim 1.0
    (identical vector -> identical cell -> own probe set), ranked by
    n_id — deterministic regardless of which other cells probe."""
    import tempfile as _tf
    import shutil as _sh

    from hudi_spark_plus_spark.functions.ann_index import IvfIndex

    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    queries = e.where(F.col("vec_id") < 10)
    planted = (
        queries.withColumn(
            "j", F.explode(F.array([F.lit(i) for i in range(1, 7)]))
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("j") * F.lit(off))
        .drop("j")
        .localCheckpoint()
    )
    work = _tf.mkdtemp(prefix="hsp_annidx_")
    try:
        # 8 cells x 2 buckets: with the cell-partitioned layout (r12)
        # files split by (cell, key-bucket) — the oracle construction
        # is independent of the quantizer size (identical vectors
        # co-assign under ANY centroids), so fixture file counts stay
        # small where 16x8 would write 128 files per commit for nothing
        idx = IvfIndex.build(
            spark, f"{work}/idx", e, n_centroids=8, buckets=2
        )
        idx.add(planted, "b-plant")
        ver = idx.table.log.latest().version
        idx.add(planted, "b-plant")  # crash replay: exactly-once no-op
        if idx.table.log.latest().version != ver:
            raise AssertionError("replayed add committed twice")
        removed = [int(r["vec_id"]) + off for r in queries.select("vec_id").collect()]
        idx.remove(removed, "b-gc")
        idx.add(planted, "b-plant")  # stale replay: H5 suppresses it
        if idx.assignments().where(
            F.col("id").isin(removed)
        ).count():
            raise AssertionError("stale add resurrected removed vectors")
        out = idx.search(queries, k=5, nprobe=4).orderBy("q_id", "rank")
        rows = out.collect()  # materialize before the workdir vanishes
        return local_frame(spark, rows, out.schema)
    finally:
        _sh.rmtree(work, ignore_errors=True)


def q_emb_ann_index_pq(spark, sf_dir):
    """PQ-resident persistent ANN index (VERDICT r11 directive 3 —
    functions/ann_index.py IvfIndex(pq=True)): the assignments table
    stores n_sub=8 PQ CODES per vector instead of raw float64s (the
    raw-vector index is the corpus re-materialized; the bytes-on-disk
    assertion lives in tests/test_ann_index.py), search ADC-scans the
    codes via a codebook-literal codegen expression and exact-re-ranks
    only the bounded top-refine ∪ full-code-match candidates, fetching
    their raw vectors from the corpus (exact_source). Same planted-copy
    lifecycle as q-emb-ann-index — 6 exact copies added (replayed:
    exactly-once no-op), copy j=1 removed, the stale add replayed again
    (suppressed by batch-id idempotence, H5) — and the same deterministic
    answer: copies j=2..6 per query at sim 1.0, ranked by n_id (exact
    duplicates encode to the query's own codes, so the code-match arm
    makes them candidates regardless of ADC rank; exact re-rank scores
    them 1.0)."""
    import tempfile as _tf
    import shutil as _sh

    from hudi_spark_plus_spark.functions.ann_index import IvfIndex

    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    queries = e.where(F.col("vec_id") < 10)
    planted = (
        queries.withColumn(
            "j", F.explode(F.array([F.lit(i) for i in range(1, 7)]))
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("j") * F.lit(off))
        .drop("j")
        .localCheckpoint()
    )
    work = _tf.mkdtemp(prefix="hsp_annpq_")
    try:
        idx = IvfIndex.build(
            spark, f"{work}/idx", e, n_centroids=8, buckets=2,
            pq=True, n_sub=8, n_codes=16,
        )
        if "vec" in idx.assignments().columns:
            raise AssertionError("pq index stored raw vectors")
        idx.add(planted, "b-plant")
        ver = idx.table.log.latest().version
        idx.add(planted, "b-plant")  # crash replay: exactly-once no-op
        if idx.table.log.latest().version != ver:
            raise AssertionError("replayed add committed twice")
        removed = [int(r["vec_id"]) + off for r in queries.select("vec_id").collect()]
        idx.remove(removed, "b-gc")
        idx.add(planted, "b-plant")  # stale replay: H5 suppresses it
        if idx.assignments().where(F.col("id").isin(removed)).count():
            raise AssertionError("stale add resurrected removed vectors")
        out = idx.search(
            queries, k=5, nprobe=4,
            exact_source=e.unionByName(planted),
        ).orderBy("q_id", "rank")
        rows = out.collect()  # materialize before the workdir vanishes
        return local_frame(spark, rows, out.schema)
    finally:
        _sh.rmtree(work, ignore_errors=True)


def q_emb_neardup_exact(spark, sf_dir):
    """Embedding-cosine near-dup, exact verifier path: the 20
    most-similar embedding pairs over a bounded subset (all-pairs is
    O(n^2) by design here; the production path is q-emb-neardup-lsh)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    return cosine_pairs(e, top_n=20).orderBy(
        F.col("sim").desc(), "id_a", "id_b"
    )


def q_emb_neardup_lsh(spark, sf_dir):
    """Embedding-cosine near-dup, bucketed LSH scale path, made
    hash-checkable: plant one exact duplicate per vec_id % 10 == 0
    (id + 100000), then every pair the pipeline emits at threshold 0.9
    must be exactly the planted (id, id+100000) set at sim 1.0 — the
    corpus's max NATURAL pairwise cosine is ~0.6, so recall below 1.0
    or any false positive diverges the hash."""
    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    planted = e.where((F.col("vec_id") % 10) == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(off)
    )
    corpus = e.unionByName(planted)
    return lsh_neardup_pairs(corpus, threshold=0.9).orderBy("id_a", "id_b")


PACK_CAPACITY, PACK_SHARDS = 512, 8


def q_doc_pack(spark, sf_dir):
    """Sequence packing: concat-then-slice assignment of documents to
    fixed-capacity token sequences, sharded so no global window exists
    (8 shards here; thousands at scale). Pure integer window arithmetic
    — exact oracle."""
    from hudi_spark_plus_spark.functions.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(
        d,
        "n_tokens",
        PACK_CAPACITY,
        F.col("doc_id") % PACK_SHARDS,
        order_cols=("doc_id",),
    ).select("doc_id", "shard", "n_tokens", "seq_id", "seq_off").orderBy(
        "doc_id"
    )


SAMPLE_RATES = {"en": 0.5, "zh": 0.75}  # downsample the head languages


def q_doc_sample(spark, sf_dir):
    """Deterministic stratified sampling: rebalance the corpus by
    downsampling head languages with md5-prefix cutoffs — stable across
    runs/partitionings and exactly reproducible by the SQL oracle."""
    from hudi_spark_plus_spark.functions.sampling import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        d, "lang", SAMPLE_RATES, key_col="doc_id", salt="rebalance"
    ).select("doc_id", "lang").orderBy("doc_id")


CLUSTER_SIM_THRESHOLD = 0.3  # data margin to boundary ~2e-4: exact-safe


def q_doc_dup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: transitive closure of the cosine pair graph
    via distributed min-label propagation, with canonical keeper per
    cluster. Oracled against a DuckDB recursive CTE computing the same
    min-reachable-id labeling — engine-neutral by construction."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    pairs = cosine_pairs(e, threshold=CLUSTER_SIM_THRESHOLD)
    return (
        dup_clusters(pairs)
        .select(
            F.col("node").alias("vec_id"),
            "cluster_id",
            "cluster_size",
            "is_keeper",
        )
        .orderBy("vec_id")
    )


def q_doc_split(spark, sf_dir):
    """Deterministic train/val/test assignment: lexicographic compare of
    the first md5 byte of a salted doc key — stable across engines,
    runs, and partitionings (the property a 100 TB split needs: adding
    machines or re-running never moves a document between splits).
    ~79.7% / ~10.2% / ~10.2% by hex-prefix cutoffs 'cc' and 'e6'."""
    from hudi_spark_plus_spark.functions.sampling import salted_hash_prefix

    d = load_table(spark, sf_dir, "documents")
    h = salted_hash_prefix(F.col("doc_id"), "split", nchars=2)
    return d.select(
        "doc_id",
        h.alias("bucket"),
        F.when(h < "cc", "train")
        .when(h < "e6", "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


def q_doc_gopher(spark, sf_dir):
    """Gopher-style quality gates (rule-based document filtering): word
    -count bounds, mean-word-length bounds, symbol ratio, stopword
    presence — each surfaced as its own boolean so downstream can weigh
    them, plus the conjunction. Pure Column exprs, zero shuffles."""
    from hudi_spark_plus_spark.functions.text import (
        punct_ratio,
        stopword_ratio_expr,
    )

    from hudi_spark_plus_spark.functions.text import tokens

    d = spread(load_table(spark, sf_dir, "documents")).withColumn(
        "_toks", tokens(F.col("text"))
    )
    n_words = F.size("_toks")
    mwl = F.expr(
        "aggregate(transform(_toks, t -> length(t)), 0, (a, x) -> a + x)"
    ) / F.greatest(n_words, F.lit(1))
    g_words = (n_words >= 50) & (n_words <= 100000)
    g_mwl = (mwl >= 3.0) & (mwl <= 10.0)
    g_sym = punct_ratio(F.col("text")) < 0.1
    g_stop = stopword_ratio_expr("text") >= 0.02
    return d.select(
        "doc_id",
        g_words.alias("gate_words"),
        g_mwl.alias("gate_mwl"),
        g_sym.alias("gate_symbols"),
        g_stop.alias("gate_stopwords"),
        (g_words & g_mwl & g_sym & g_stop).alias("keep"),
    ).orderBy("doc_id")


DOC_DEDUP_THRESHOLD = 0.9


def q_doc_dedup_e2e(spark, sf_dir):
    """END-TO-END TEXT near-dup dedup: plant one exact duplicate per
    doc_id % 10 == 0, mine candidates with MinHash+LSH banding (never
    all-pairs; candidates verified by exact Jaccard >= 0.9), resolve
    transitive clusters, anti-join the non-keepers out. The oracle
    recomputes the same pipeline declaratively (exact all-pairs Jaccard
    + recursive-CTE closure over the same planted corpus) — natural
    >= 0.9 pairs in the corpus participate identically on both sides,
    so this hash-checks LSH recall, the exact-verify step, cluster
    closure, and keeper selection together. Jaccard values are exact
    rationals (integer shingle counts), so the threshold compare cannot
    diverge between engines."""
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    off = _id_offset(d, "doc_id")
    planted = d.where((F.col("doc_id") % 10) == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(off)
    )
    corpus = d.unionByName(planted)
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", "text", k=64, bands=16, ngram=3,
        verify_threshold=DOC_DEDUP_THRESHOLD,
    )
    losers = (
        dup_clusters(pairs)
        .where(~F.col("is_keeper"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        corpus.join(losers, "doc_id", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


def q_emb_dedup_e2e(spark, sf_dir):
    """END-TO-END near-dup dedup pipeline, the full production shape in
    one query: plant one exact duplicate per vec_id % 10 == 0, mine
    candidate pairs with bucketed LSH (never all-pairs), resolve
    transitive clusters with distributed connected components, keep each
    cluster's canonical minimum, anti-join the losers out. Identical
    vectors always share every LSH signature and the corpus's max
    natural pairwise cosine is ~0.6, so the surviving set must be
    EXACTLY the original corpus — any lost original or surviving
    planted copy diverges the hash."""
    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    planted = e.where((F.col("vec_id") % 10) == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(off)
    )
    corpus = e.unionByName(planted)
    pairs = lsh_neardup_pairs(corpus, threshold=0.9)
    losers = (
        dup_clusters(pairs)
        .where(~F.col("is_keeper"))
        .select(F.col("node").alias("vec_id"))
    )
    return (
        corpus.join(losers, "vec_id", "left_anti")
        .select("vec_id")
        .orderBy("vec_id")
    )


DECONTAM_NGRAM = 5
EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 plays the benchmark/eval slice
DUPFRAC_NGRAM = 3


def q_doc_pipeline_e2e(spark, sf_dir):
    """The canonical pre-training text pipeline in ONE hash-checked
    query: Gopher quality gates -> exact-dedup keepers (min doc id per
    identical text among the gated set) -> word-5-gram test-set
    decontamination -> surviving doc ids. Every stage is the operator
    used by its standalone query; the composition pins stage ORDER and
    interaction (dedup before decontamination, eval slice excluded from
    training output) in a single hash. Shape: map-side gates, one
    hash-agg for keepers, broadcast semi-join for decontamination —
    nothing quadratic anywhere."""
    from hudi_spark_plus_spark.functions.text import (
        punct_ratio,
        stopword_ratio_expr,
        tokens,
    )

    d = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    train = d.where(F.col("doc_id") % EVAL_MOD != 0)
    ev = d.where(F.col("doc_id") % EVAL_MOD == 0)
    t = train.withColumn("_toks", tokens(F.col("text")))
    n_words = F.size("_toks")
    mwl = F.expr(
        "aggregate(transform(_toks, t -> length(t)), 0, (a, x) -> a + x)"
    ) / F.greatest(n_words, F.lit(1))
    keep = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mwl >= 3.0)
        & (mwl <= 10.0)
        & (punct_ratio(F.col("text")) < 0.1)
        & (stopword_ratio_expr("text") >= 0.02)
    )
    gated = t.where(keep).select("doc_id", "text")
    keepers = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = gated.join(keepers.select("doc_id"), "doc_id", "left_semi")
    decon = ngram_decontaminate(kept, ev, "doc_id", "text", DECONTAM_NGRAM)
    return (
        decon.where(~F.col("contaminated")).select("doc_id").orderBy("doc_id")
    )


def q_doc_decontaminate(spark, sf_dir):
    """Test-set decontamination: flag training docs sharing any word
    5-gram with the eval slice (doc_id % 97 == 0). The corpus side is a
    broadcast semi-join against the (small) eval gram set — no corpus
    shuffle."""
    d = spread(load_table(spark, sf_dir, "documents"))
    train = d.where(F.col("doc_id") % EVAL_MOD != 0)
    ev = d.where(F.col("doc_id") % EVAL_MOD == 0)
    return ngram_decontaminate(
        train, ev, "doc_id", "text", DECONTAM_NGRAM
    ).orderBy("doc_id")


def q_doc_dupfrac(spark, sf_dir):
    """Cross-document repetition: per doc, the fraction of its distinct
    3-grams occurring in >= 2 docs corpus-wide (boilerplate signal)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return dup_ngram_fraction(d, "doc_id", "text", DUPFRAC_NGRAM).orderBy(
        "doc_id"
    )


SUBSTR_WINDOW = 40
SUBSTR_STRIDE = 20

BM25_TERMS = ["table", "join", "query", "window"]
BM25_K = 10

SEMDECON_EVAL_MOD = 10
SEMDECON_T_CENTI = 90


def q_emb_decontaminate(spark, sf_dir):
    """Semantic test-set decontamination (functions/similarity.py
    semantic_decontaminate): eval set = every MODth vector, corpus = the
    whole table, so each eval vector's corpus copy is a guaranteed
    cosine-1.0 hit — the planted-oracle device. Integer-exact over
    int8-quantized vectors; the DuckDB oracle replays the quantization
    and the dot^2*10^4 >= t^2*|q|^2*|e|^2 test bit-for-bit."""
    from hudi_spark_plus_spark.functions.similarity import (
        semantic_decontaminate,
    )

    e = load_table(spark, sf_dir, "embeddings")
    ev = e.where(F.col("vec_id") % SEMDECON_EVAL_MOD == 0)
    return semantic_decontaminate(
        e, ev, "vec_id", "embedding", SEMDECON_T_CENTI
    ).orderBy("vec_id")


def q_doc_bm25(spark, sf_dir):
    """BM25 top-k lexical retrieval (functions/retrieval.py bm25_topk):
    integer-milli scoring — the one transcendental (idf) is floored to
    milli-units per DISTINCT term, everything after is exact integer
    arithmetic, so the ranking is a pure function of the data and the
    DuckDB oracle replays score values bit-for-bit."""
    from hudi_spark_plus_spark.functions.retrieval import bm25_topk

    d = spread(load_table(spark, sf_dir, "documents"))
    return bm25_topk(d, "doc_id", "text", BM25_TERMS, k=BM25_K).orderBy(
        "rank"
    )


def q_doc_substr_dedup(spark, sf_dir):
    """Character-window substring dedup (functions/ngrams.py
    substring_dedup — the ExactSubstr training-data dedup of Lee et al.
    2022 re-expressed as sliding windows + one group-by): windows whose
    text occurs at >= 2 sites corpus-wide keep their first occurrence
    and every other occurrence's span is excised from its document
    (overlapping spans merged first). The oracle replays the full
    pipeline — windows, global counts, survivor rank, interval merge,
    complement extraction, md5 of the cleaned text — in ANSI SQL."""
    from hudi_spark_plus_spark.functions.ngrams import substring_dedup

    d = spread(load_table(spark, sf_dir, "documents"))
    return substring_dedup(
        d, "doc_id", "text", window=SUBSTR_WINDOW, stride=SUBSTR_STRIDE
    ).orderBy("id")


def q_doc_repetition(spark, sf_dir):
    """Within-doc Gopher repetition signals: duplicate-word fraction and
    the char fraction covered by the most frequent word 2-gram."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return repetition_signals(d, "doc_id", "text").orderBy("doc_id")


def q_doc_pii(spark, sf_dir):
    """PII redaction, hash-checked: the fixtures contain no PII, so a
    deterministic email + phone is planted per row (same construction in
    the oracle) — redaction provably fires on every document and the
    redacted-text hash pins the replacement semantics."""
    d = spread(load_table(spark, sf_dir, "documents"))
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    return d.select("doc_id", planted.alias("_t")).select(
        "doc_id",
        pii_email_count(F.col("_t")).cast("long").alias("n_emails"),
        pii_phone_count(F.col("_t")).cast("long").alias("n_phones"),
        F.md5(redact_pii(F.col("_t"))).alias("red_hash"),
    ).orderBy("doc_id")


HASH_EMBED_DIM = 64


def q_doc_hash_embed(spark, sf_dir):
    """Feature-hashing embedder (hashing trick) as pure declarative SQL:
    sparse L2-normalized components per document, bit-reproduced by the
    oracle (md5 dimension hash + sign parity + integer accumulation —
    no model weights, no UDF)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return hash_embed_components(
        d, "doc_id", "text", dim=HASH_EMBED_DIM
    ).orderBy("doc_id", "dim_idx")


MIXTURE_BUDGETS = {"en": 6000, "zh": 1500}


def q_doc_mixture(spark, sf_dir):
    """Token-budget data mixture (domain reweighting): survivors after
    hash-sampling each budgeted language down to ~its token budget;
    unbudgeted languages pass whole. The per-language keep rate is
    COMPUTED FROM THE DATA (budget / total tokens) — the oracle
    recomputes the same rate, cutoff integer, and hash filter, so the
    two-pass rate derivation is hash-checked, not just the filter."""
    from hudi_spark_plus_spark.functions.sampling import (
        token_budget_mixture,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        token_count(F.col("text")).alias("n_tokens"),
    )
    return token_budget_mixture(
        d, "lang", "n_tokens", MIXTURE_BUDGETS, key_col="doc_id"
    ).orderBy("doc_id")


def q_doc_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch reshuffle: seed-salted md5 sort key + shard
    assignment per document — the distributed-safe global shuffle
    (shard + within-shard sort, no global row_number)."""
    from hudi_spark_plus_spark.functions.sampling import epoch_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(d, "doc_id", seed="epoch1", n_shards=16).orderBy(
        "shard", "sort_key"
    )


def q_doc_unigram_ppl(spark, sf_dir):
    """CCNet-shaped head/middle/tail quality bucketing from a REAL
    unigram LM: integer familiarity score (monotone in unigram-LM
    perplexity, no libm log parity hazard) + exact corpus percentiles
    for the split."""
    from hudi_spark_plus_spark.functions.ngrams import (
        unigram_familiarity_buckets,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    return unigram_familiarity_buckets(d, "doc_id", "text").orderBy(
        "doc_id"
    )


def q_doc_vocab(spark, sf_dir):
    """Corpus vocabulary induction (tokenizer-training step): term +
    corpus frequency + document frequency, one hash-agg over exploded
    tokens."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return corpus_vocab(d, "doc_id", "text").orderBy("word")


def q_doc_tfidf(spark, sf_dir):
    """Per-doc top-3 distinctive terms, ranked by a float-free tf-idf
    order (tf DESC, df ASC, term ASC) — monotone in tf·idf for any
    decreasing idf without transcendental parity risk."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return distinctive_terms(d, "doc_id", "text", top_k=3).orderBy(
        "doc_id", "rank"
    )


def q_emb_quantize(spark, sf_dir):
    """Symmetric int8 embedding quantization, hash-checked: per-vector
    scale plus the md5 of the quantized byte sequence."""
    e = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(e, "embedding")
    return q.select(
        "vec_id",
        "q_scale",
        F.size("qvec").cast("long").alias("n_dims"),
        F.md5(
            F.array_join(F.expr("transform(qvec, x -> cast(x as string))"), ",")
        ).alias("qhash"),
    ).orderBy("vec_id")


def q_media_features(spark, sf_dir):
    """Hash-checked end-to-end media decode: derive one media row per
    document (real PNG/JPEG/GIF container bytes encoded map-side), parse
    the container headers back with the pure-Python decoder, and return
    the DECODED dimensions. The oracle recomputes the dims from the
    deterministic generating formula — if the header parse is wrong for
    any format, the hashes diverge."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 64)
    media = encode_media_from_documents(docs).where(F.col("kind") != "audio")
    feats = decode_image_features(media)
    return feats.select("media_id", "width", "height").orderBy("media_id")


def q_media_audio(spark, sf_dir):
    """Hash-checked audio decode: one WAV row per eligible document id
    (real RIFF bytes encoded map-side), sample rate + duration parsed
    back from the fmt/data chunks. The oracle recomputes both from the
    deterministic generating formulas — a wrong fmt parse or a
    frames-to-duration rounding slip diverges the hash."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = encode_media_from_documents(docs).where(F.col("kind") == "audio")
    return (
        decode_audio_features(media)
        .select("media_id", "sample_rate", "duration_ms")
        .orderBy("media_id")
    )


def q_emb_ann_pq(spark, sf_dir):
    """Product-quantization ANN, hash-checkable via the planted-neighbor
    construction (same scheme as q-emb-ann-lsh/-ivf): 5 exact copies of
    every query vector join the corpus. An exact copy quantizes to the
    query's own code, the refine set includes every full-code match BY
    CONSTRUCTION, and the exact re-rank puts the copies (sim ~1.0) above
    every natural neighbor — top-5 per query is exactly the planted set
    ranked by n_id, or the hash diverges. The ADC scan, codebook fit,
    and refine union are the real pipeline; natural-corpus recall is
    asserted vs brute force in tests."""
    from hudi_spark_plus_spark.functions.similarity import pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    queries = e.where(F.col("vec_id") < 10)
    copies = (
        queries.withColumn(
            "j", F.explode(F.array([F.lit(i) for i in range(1, 6)]))
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("j") * F.lit(off))
        .drop("j")
    )
    corpus = e.unionByName(copies).localCheckpoint()
    return pq_topk(corpus, queries, k=5).orderBy("q_id", "rank")


def q_doc_corpus_stats(spark, sf_dir):
    """Corpus-composition report (the dataset-card numbers every
    curation run ends with): per (lang, source-class) document counts,
    exact token totals, char totals, and the exact median length — all
    JVM-side.

    The median deliberately avoids Spark's exact ``percentile``, whose
    aggregation state buffers every group value (an OOM hazard for a
    100-TB corpus with billions of rows per group). n_chars is a bounded
    int, so a value-histogram + cumulative-count lookup is exact,
    matches percentile/quantile_cont linear interpolation bit-for-bit,
    and keeps per-group state O(distinct values) — the at-scale recipe
    for exact quantiles (VERDICT r4 directive 4).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.expr("size(split(trim(text), '\\\\s+'))")
    src_class = F.substring("source", 1, 3).alias("src_class")
    base = (
        d.withColumn("_tok", toks)
        .groupBy("lang", src_class)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_tok").alias("tokens"),
            F.sum("n_chars").alias("chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
    # histogram: one row per (group, n_chars) value — bounded regardless
    # of corpus row count. NULL n_chars is excluded so the rank
    # arithmetic (n, cum) matches quantile_cont/percentile NULL
    # semantics, which ignore NULL inputs.
    hist = (
        d.where(F.col("n_chars").isNotNull())
        .groupBy("lang", src_class, "n_chars")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wp = Window.partitionBy("lang", "src_class")
    wo = wp.orderBy("n_chars")
    # 1-indexed interpolation ranks: median sits at rank (n+1)/2; a value
    # covering [cum-cnt+1, cum] holds that rank. Odd n => lo == hi.
    covers = lambda r: (F.col("cum") - F.col("cnt") < F.col(r)) & (
        F.col(r) <= F.col("cum")
    )
    med = (
        hist.withColumn("cum", F.sum("cnt").over(wo))
        .withColumn("n", F.sum("cnt").over(wp))
        .withColumn("lo", F.floor((F.col("n") + 1) / 2))
        .withColumn("hi", F.ceil((F.col("n") + 1) / 2))
        .groupBy("lang", "src_class")
        .agg(
            (
                (
                    F.max(F.when(covers("lo"), F.col("n_chars")))
                    + F.max(F.when(covers("hi"), F.col("n_chars")))
                )
                / 2.0
            ).alias("median_chars")
        )
    )
    return (
        base.join(F.broadcast(med), ["lang", "src_class"])
        .select(
            "lang",
            "src_class",
            "docs",
            "tokens",
            "chars",
            "min_chars",
            "median_chars",
            "max_chars",
        )
        .orderBy("lang", "src_class")
    )


def q_emb_ann_ivfpq(spark, sf_dir):
    """IVF-PQ composite ANN (the FAISS billion-scale layout) under the
    planted-copy hash oracle: an exact copy lands in the query's own
    nearest cell (which the probe always visits) carrying the query's
    own PQ code (which the code-match refine arm always admits), and
    the exact re-rank puts the copies on top — the coarse quantizer,
    codebooks, ADC scan, and refine union are all on the verified
    path."""
    from hudi_spark_plus_spark.functions.similarity import ivfpq_topk

    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    queries = e.where(F.col("vec_id") < 10)
    copies = (
        queries.withColumn(
            "j", F.explode(F.array([F.lit(i) for i in range(1, 6)]))
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("j") * F.lit(off))
        .drop("j")
    )
    corpus = e.unionByName(copies).localCheckpoint()
    return ivfpq_topk(corpus, queries, k=5).orderBy("q_id", "rank")


def q_doc_source_cap(spark, sf_dir):
    """Per-source document caps (the crawl-curation guard against a few
    domains dominating the corpus): keep at most 15 docs per source,
    preferring the longest (n_chars DESC, doc_id tiebreak)."""
    from hudi_spark_plus_spark.functions.sampling import cap_per_group

    d = load_table(spark, sf_dir, "documents").withColumn(
        "_neg_chars", -F.col("n_chars")
    )
    return (
        cap_per_group(d, "source", 15, ["_neg_chars", "doc_id"])
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


def q_media_pixels(spark, sf_dir):
    """END-TO-END raster decode: every PNG media row's bytes are REALLY
    inflated (zlib) and unfiltered to pixels, and the integer pixel
    sum/min/max per image must match the oracle's closed-form replay of
    the generator formula ((x*31 + y*17 + id) & 255) over the full
    w x h grid — a wrong IDAT reassembly, inflate, unfilter, or
    dimension parse diverges the hash."""
    from hudi_spark_plus_spark.functions.multimodal import (
        decode_pixel_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = encode_media_from_documents(docs).where(
        F.col("mime") == "image/png"
    )
    return decode_pixel_features(media).orderBy("media_id")


# Dict order = registry order. Oracle-checked queries first; the
# engine-specific no-oracle signatures (minhash/simhash) come last so a
# driver that bounds how many registry entries it checks still records
# every hash-checkable row.
def q_doc_line_dedup(spark, sf_dir):
    """CCNet-style cross-document line dedup: the corpus re-segmented
    into deterministic 8-word lines, every line appearing in >= 2
    distinct documents dropped as boilerplate, documents reassembled
    from surviving lines (md5-pinned so the full reassembly is in the
    hash). At sf0.01, 153 distinct lines are cross-document duplicates
    — the operator provably bites while most text survives."""
    from hudi_spark_plus_spark.functions.dedup import (
        dedup_lines,
        segment_words_expr,
    )

    d = spread(load_table(spark, sf_dir, "documents"))
    seg = d.select("doc_id", segment_words_expr("text", 8).alias("_lines"))
    out = dedup_lines(seg, "doc_id", "_lines", min_doc_freq=2)
    return (
        out.select(
            "doc_id",
            "lines_kept",
            F.md5("clean_text").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


def q_doc_dedup_incremental(spark, sf_dir):
    """Incremental new-batch-vs-corpus dedup: corpus = doc_id < 400;
    the new batch is docs 400..499 plus PLANTED exact copies of docs
    0..49 (re-keyed +10000). The bloom prefilter + exact-verify path
    must keep exactly the 100 genuinely new docs and drop all 50
    planted dups — identical to the oracle's plain SQL anti-join, with
    zero corpus shuffle on the engine side."""
    from hudi_spark_plus_spark.functions.dedup import incremental_dedup

    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") < 400)
    new_batch = d.where(F.col("doc_id") >= 400).unionByName(
        d.where(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    kept = incremental_dedup(new_batch, corpus, "doc_id", "text")
    return kept.select(
        "doc_id", F.md5("text").alias("text_md5")
    ).orderBy("doc_id")


def q_doc_neardup_incremental(spark, sf_dir):
    """Incremental NEAR-dup: a new ingest batch probed against the
    accumulated corpus's PERSISTED banded MinHash signatures
    (functions/dedup.py:incremental_neardup_pairs) — the corpus is
    never re-minhashed and its text is read only for verification
    candidates. Corpus = docs < 400 with doc_id % 4 != 0; the batch is
    docs 400..499 plus planted exact copies of corpus docs (%20==1 at
    +off, %40==1 again at +2·off — so the batch near-dups both AGAINST
    the corpus and WITHIN itself). Verified at jaccard = 1.0, making
    the outcome (pair ids + scope) an equal-shingle-set join DuckDB
    replays exactly (same planted-outcome device as the minhash
    family)."""
    from hudi_spark_plus_spark.functions.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = d.agg(F.max("doc_id")).first()[0]
    off = _plant_offset(max_id if max_id is not None else 0)
    corpus = d.where(
        (F.col("doc_id") < 400) & (F.col("doc_id") % 4 != 0)
    )
    delta = (
        d.where((F.col("doc_id") >= 400) & (F.col("doc_id") < 500))
        .unionByName(
            corpus.where(F.col("doc_id") % 20 == 1).withColumn(
                "doc_id", F.col("doc_id") + F.lit(off)
            )
        )
        .unionByName(
            corpus.where(F.col("doc_id") % 40 == 1).withColumn(
                "doc_id", F.col("doc_id") + F.lit(2 * off)
            )
        )
    )
    # the accumulated state a deployment would keep as a table: one
    # banded-signature row set per ingested batch, appended over time
    state = banded_signatures(corpus, "doc_id", "text")
    return incremental_neardup_pairs(
        delta, corpus, state, "doc_id", "text",
        verify_threshold=1.0, max_bucket_size=1_000_000,
    ).orderBy("scope", "new_id", "dup_id")


def q_doc_neardup_store(spark, sf_dir):
    """SignatureStore end-to-end (functions/signature_store.py): the
    near-dup signature state managed AS a lake table — multi-batch
    accumulation (two keyed ingests), EXACTLY-ONCE replay (the second
    batch is ingested twice under one batch_id; a doubled state would
    emit duplicate pair rows and hash-mismatch), and delta-sized GC
    (%5==0 docs pruned by synthesized key — O(dead × bands)
    tombstones, no state rewrite). The probe must then equal the
    lifecycle truth: batch plants copies of live (%10==1) and pruned
    (%10==5) corpus docs; only the live sources may pair. Same
    equal-shingle-set DuckDB replay as q-doc-neardup-lifecycle — one
    truth, two engine paths (raw functions vs the store)."""
    import tempfile as _tempfile
    import shutil as _shutil

    from hudi_spark_plus_spark.functions.signature_store import (
        SignatureStore,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = d.agg(F.max("doc_id")).first()[0]
    off = _plant_offset(max_id if max_id is not None else 0)
    corpus0 = d.where(
        (F.col("doc_id") < 400) & (F.col("doc_id") % 4 != 0)
    )
    work = _tempfile.mkdtemp(prefix="hsp_sigstore_")
    try:
        store = SignatureStore(spark, f"{work}/sig", buckets=4)
        store.ingest(
            corpus0.where(F.col("doc_id") % 2 == 1), "doc_id", "text", "b1"
        )
        b2 = corpus0.where(F.col("doc_id") % 2 == 0)
        store.ingest(b2, "doc_id", "text", "b2")
        store.ingest(b2, "doc_id", "text", "b2")  # crash replay: no-op
        store.prune(
            corpus0.where(F.col("doc_id") % 5 == 0).select(
                F.col("doc_id").alias("id")
            ),
            "gc1",
        )
        live = corpus0.where(F.col("doc_id") % 5 != 0)
        batch = corpus0.where(
            (F.col("doc_id") % 10 == 1) | (F.col("doc_id") % 10 == 5)
        ).withColumn("doc_id", F.col("doc_id") + F.lit(off))
        out = store.probe(
            batch, live, "doc_id", "text",
            verify_threshold=1.0, max_bucket_size=1_000_000,
        ).orderBy("scope", "new_id", "dup_id")
        rows = out.collect()
        return local_frame(spark, rows, out.schema)
    finally:
        _shutil.rmtree(work, ignore_errors=True)


def q_doc_neardup_lifecycle(spark, sf_dir):
    """Signature-state LIFECYCLE (VERDICT r9 #3,
    functions/dedup.py:prune_signature_state): documents DELETED from
    the corpus must stop matching as dup_id after the state GC — their
    ghost signatures would otherwise match forever with their text
    gone at verification time. Corpus = docs < 400 with %4 != 0; docs
    with %5 == 0 are then DELETED; the state built over the ORIGINAL
    corpus is pruned against the live ids (one band-partitioned
    left-semi pass). The batch plants +off copies of corpus docs with
    %10 in (1, 5): the %10==5 sources are deleted, so only the %10==1
    pairs may surface. Verified at jaccard 1.0 — the outcome is an
    equal-shingle-set join over the LIVE corpus that DuckDB replays
    exactly."""
    from hudi_spark_plus_spark.functions.dedup import (
        banded_signatures,
        incremental_neardup_pairs,
        prune_signature_state,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = d.agg(F.max("doc_id")).first()[0]
    off = _plant_offset(max_id if max_id is not None else 0)
    corpus0 = d.where(
        (F.col("doc_id") < 400) & (F.col("doc_id") % 4 != 0)
    )
    live = corpus0.where(F.col("doc_id") % 5 != 0)
    # state accumulated over the ORIGINAL corpus, then GC'd after the
    # deletion — the lifecycle contract's maintenance pass
    state = prune_signature_state(
        banded_signatures(corpus0, "doc_id", "text"), live, "doc_id"
    )
    batch = corpus0.where(
        (F.col("doc_id") % 10 == 1) | (F.col("doc_id") % 10 == 5)
    ).withColumn("doc_id", F.col("doc_id") + F.lit(off))
    return incremental_neardup_pairs(
        batch, live, state, "doc_id", "text",
        verify_threshold=1.0, max_bucket_size=1_000_000,
    ).orderBy("scope", "new_id", "dup_id")


SEMDEDUP_CLUSTERS, SEMDEDUP_THRESHOLD_CENTI = 8, 90


def q_emb_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    cluster the embedding space, prune within-cluster cosine pairs >=
    0.9 keeping the lowest id (functions/similarity.py:semdedup). The
    pipeline runs in EXACT integer arithmetic over int8-quantized
    vectors, so the oracle replays the WHOLE thing — seeding, cluster
    assignment, pair pruning — not just a planted outcome. Planted
    exact copies (vec_id % 10 == 0, re-keyed +off) are the recall
    check on top: an identical vector quantizes identically, lands in
    the same cluster at sim 1.0, and natural max cosine ~0.6 << 0.9,
    so exactly the planted ids must be the removals."""
    from hudi_spark_plus_spark.functions.similarity import semdedup

    e = load_table(spark, sf_dir, "embeddings")
    off = _id_offset(e, "vec_id")
    planted = e.where((F.col("vec_id") % 10) == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(off)
    )
    corpus = e.unionByName(planted).select("vec_id", "embedding")
    return semdedup(
        corpus,
        "vec_id",
        "embedding",
        SEMDEDUP_CLUSTERS,
        SEMDEDUP_THRESHOLD_CENTI,
    ).orderBy("vec_id")


DSIR_TOP_N, DSIR_BUCKETS = 100, 64


def q_doc_dsir(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    hashed-token importance reweighting of the raw corpus toward a
    target distribution (here: the English documents), then top-n by
    per-token importance. Exact-integer milli-ratio weights
    (functions/selection.py) make the full two-distribution
    derivation, per-document integration, and top-n cut replayable in
    ANSI SQL with zero float drift."""
    from hudi_spark_plus_spark.functions.selection import dsir_select

    d = load_table(spark, sf_dir, "documents")
    return dsir_select(
        d, F.col("lang") == "en", DSIR_TOP_N, n_buckets=DSIR_BUCKETS
    ).orderBy(F.col("per_token_milli").desc(), "doc_id")


LLM_QUERIES = {
    "q-emb-decontaminate": q_emb_decontaminate,
    "q-doc-bm25": q_doc_bm25,
    "q-doc-substr-dedup": q_doc_substr_dedup,
    "q-doc-corpus-stats": q_doc_corpus_stats,
    "q-doc-dsir": q_doc_dsir,
    "q-emb-semdedup": q_emb_semdedup,
    "q-emb-ann-ivfpq": q_emb_ann_ivfpq,
    "q-emb-ann-pq": q_emb_ann_pq,
    "q-doc-source-cap": q_doc_source_cap,
    "q-media-pixels": q_media_pixels,
    "q-doc-line-dedup": q_doc_line_dedup,
    "q-doc-dedup-incremental": q_doc_dedup_incremental,
    "q-doc-neardup-incremental": q_doc_neardup_incremental,
    "q-doc-neardup-lifecycle": q_doc_neardup_lifecycle,
    "q-doc-neardup-store": q_doc_neardup_store,
    "q-doc-dedup-exact": q_doc_dedup_exact,
    "q-doc-dedup-normalized": q_doc_dedup_normalized,
    "q-doc-token-stats": q_doc_token_stats,
    "q-doc-quality": q_doc_quality,
    "q-doc-langid": q_doc_langid,
    "q-doc-fingerprint": q_doc_fingerprint,
    "q-doc-neardup-jaccard": q_doc_neardup_jaccard,
    "q-doc-dup-clusters": q_doc_dup_clusters,
    "q-doc-split": q_doc_split,
    "q-doc-gopher": q_doc_gopher,
    "q-doc-pack": q_doc_pack,
    "q-doc-sample": q_doc_sample,
    "q-doc-chunks": q_doc_chunks,
    "q-doc-decontaminate": q_doc_decontaminate,
    "q-doc-pipeline-e2e": q_doc_pipeline_e2e,
    "q-doc-dupfrac": q_doc_dupfrac,
    "q-doc-repetition": q_doc_repetition,
    "q-doc-pii": q_doc_pii,
    "q-doc-vocab": q_doc_vocab,
    "q-doc-mixture": q_doc_mixture,
    "q-doc-epoch-shuffle": q_doc_epoch_shuffle,
    "q-doc-unigram-ppl": q_doc_unigram_ppl,
    "q-doc-hash-embed": q_doc_hash_embed,
    "q-doc-tfidf": q_doc_tfidf,
    "q-emb-quantize": q_emb_quantize,
    "q-emb-cosine-topk": q_emb_cosine_topk,
    "q-emb-neardup-exact": q_emb_neardup_exact,
    "q-emb-neardup-lsh": q_emb_neardup_lsh,
    "q-emb-dedup-e2e": q_emb_dedup_e2e,
    "q-doc-dedup-e2e": q_doc_dedup_e2e,
    "q-media-features": q_media_features,
    "q-media-audio": q_media_audio,
    "q-emb-ann-lsh": q_emb_ann_lsh,
    "q-emb-ann-ivf": q_emb_ann_ivf,
    "q-emb-ann-index": q_emb_ann_index,
    "q-emb-ann-index-pq": q_emb_ann_index_pq,
    "q-doc-minhash-lsh": q_doc_minhash_lsh,
    "q-doc-minhash-full": q_doc_minhash_full,
    "q-doc-simhash": q_doc_simhash,
}

_BPE_RE = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"
_EN = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'"
_DE = "'der', 'die', 'das', 'und', 'ist', 'nicht', 'ein', 'zu'"
_ES = "'el', 'la', 'de', 'que', 'y', 'en', 'un', 'es'"
_FR = "'le', 'la', 'et', 'les', 'des', 'est', 'un', 'une'"


def _ratio(words: str) -> str:
    return (
        rf"len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),"
        rf" t -> t IN ({words})))"
        rf" / CAST(greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)"
        rf" AS DOUBLE)"
    )


LLM_ORACLES = {
    # integer-exact semantic decontamination replay: int8 quantization,
    # then per corpus vector the count of eval vectors (every MODth)
    # passing dot > 0 AND dot^2*10^4 >= t^2*|q|^2*|e|^2
    "q-emb-decontaminate": f"""
        WITH c AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), s AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS sc
          FROM c
        ), q AS (
          SELECT vec_id,
                 CASE WHEN sc = 0
                      THEN list_transform(v, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(v,
                        x -> CAST(round(127.0 * x / sc) AS BIGINT))
                 END AS qv
          FROM s
        ), qn AS (
          SELECT vec_id, qv,
                 CAST(list_dot_product(qv, qv) AS BIGINT) AS n2
          FROM q
        ), ev AS (
          SELECT qv AS eqv, n2 AS en2 FROM qn
          WHERE vec_id % {SEMDECON_EVAL_MOD} = 0
        ), hits AS (
          SELECT qn.vec_id,
                 CAST(count(*) FILTER (
                   WHERE CAST(list_dot_product(qn.qv, ev.eqv) AS BIGINT)
                           > 0
                     AND CAST(list_dot_product(qn.qv, ev.eqv) AS BIGINT)
                         * CAST(list_dot_product(qn.qv, ev.eqv) AS BIGINT)
                         * 10000
                         >= {SEMDECON_T_CENTI * SEMDECON_T_CENTI}
                            * qn.n2 * ev.en2
                 ) AS BIGINT) AS n_hits
          FROM qn, ev
          GROUP BY qn.vec_id
        )
        SELECT vec_id, n_hits, n_hits > 0 AS contaminated
        FROM hits ORDER BY vec_id
    """,
    # integer-milli BM25 replay: idf floored to milli-units per distinct
    # term (same rational ln input both engines), avgdl in milli-tokens
    # by integer division, term scores by integer division, integer sum
    "q-doc-bm25": f"""
        WITH words AS (
          SELECT doc_id AS id, unnest(
            regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
          FROM documents
        ), w2 AS (
          SELECT id, word FROM words WHERE word <> ''
        ), dl AS (
          SELECT id, count(*) AS dl FROM w2 GROUP BY id
        ), corpus AS (
          SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl
        ), terms AS (
          SELECT id, word FROM w2
          WHERE word IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
        ), tf AS (
          SELECT id, word, count(*) AS tf FROM terms GROUP BY id, word
        ), dfreq AS (
          SELECT word, count(DISTINCT id) AS df_cnt FROM terms
          GROUP BY word
        ), idf AS (
          SELECT word,
                 CAST(floor(1000.0 * ln(
                   (c.n_docs - df_cnt + 0.5) / (df_cnt + 0.5) + 1.0
                 ) + 1e-9) AS BIGINT) AS idf_milli,
                 (1000 * c.total_tokens) // c.n_docs AS avgdl_milli
          FROM dfreq, corpus c
        ), scored AS (
          SELECT t.id,
                 CAST(sum((i.idf_milli * 22000 * t.tf) //
                     (10000 * t.tf + 3000 +
                      (9000000 * d.dl) // i.avgdl_milli)) AS BIGINT)
                   AS score_milli
          FROM tf t JOIN idf i USING (word) JOIN dl d ON d.id = t.id
          GROUP BY t.id
        )
        SELECT row_number() OVER (ORDER BY score_milli DESC, id ASC)
                 AS rank,
               id, score_milli
        FROM scored
        ORDER BY score_milli DESC, id ASC
        LIMIT {BM25_K}
    """,
    # full replay of substring_dedup: sliding windows, global duplicate
    # counts with first-occurrence survivors, merged removal intervals
    # (gaps-and-islands), complement segments, ordered concat, md5.
    # Interval arithmetic guarantees every segment length >= 0, so the
    # engines' differing negative-length substr semantics never engage.
    "q-doc-substr-dedup": f"""
        WITH wins AS (
          SELECT d.doc_id AS id, g.pos AS pos,
                 substr(d.text, g.pos, {SUBSTR_WINDOW}) AS sub
          FROM documents d,
               UNNEST(generate_series(
                 1, greatest(length(d.text) - {SUBSTR_WINDOW} + 1, 0),
                 {SUBSTR_STRIDE})) AS g(pos)
        ), occ AS (
          SELECT id, pos,
                 count(*) OVER (PARTITION BY sub) AS cnt,
                 row_number() OVER (PARTITION BY sub ORDER BY id, pos)
                   AS rn
          FROM wins
        ), dup AS (
          SELECT id, pos AS s, pos + {SUBSTR_WINDOW} - 1 AS e
          FROM occ WHERE cnt >= 2 AND rn >= 2
        ), marked AS (
          SELECT id, s, e,
                 max(e) OVER (PARTITION BY id ORDER BY s
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pme
          FROM dup
        ), isl_id AS (
          SELECT id, s, e,
                 sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
                   OVER (PARTITION BY id ORDER BY s
                         ROWS UNBOUNDED PRECEDING) AS isl
          FROM marked
        ), islands AS (
          SELECT id, isl, min(s) AS s, max(e) AS e
          FROM isl_id GROUP BY id, isl
        ), gaps AS (
          SELECT id,
                 coalesce(lag(e) OVER (PARTITION BY id ORDER BY s) + 1,
                          1) AS a,
                 s - 1 AS b
          FROM islands
          UNION ALL
          SELECT i.id, max(i.e) + 1 AS a,
                 any_value(length(d.text)) AS b
          FROM islands i JOIN documents d ON d.doc_id = i.id
          GROUP BY i.id
        ), segs AS (
          SELECT g.id, g.a, substr(d.text, g.a, g.b - g.a + 1) AS seg
          FROM gaps g JOIN documents d ON d.doc_id = g.id
        ), clean AS (
          SELECT id, string_agg(seg, '' ORDER BY a) AS ctext
          FROM segs GROUP BY id
        ), nw AS (
          SELECT id, count(*) AS n_windows FROM wins GROUP BY id
        ), nd AS (
          SELECT id, count(*) AS dup_windows FROM dup GROUP BY id
        ), rm AS (
          SELECT id, CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
          FROM islands GROUP BY id
        )
        SELECT d.doc_id AS id,
               coalesce(nw.n_windows, 0) AS n_windows,
               coalesce(nd.dup_windows, 0) AS dup_windows,
               coalesce(rm.removed_chars, 0) AS removed_chars,
               length(coalesce(c.ctext, d.text)) AS clean_len,
               md5(coalesce(c.ctext, d.text)) AS clean_md5
        FROM documents d
        LEFT JOIN nw ON nw.id = d.doc_id
        LEFT JOIN nd ON nd.id = d.doc_id
        LEFT JOIN rm ON rm.id = d.doc_id
        LEFT JOIN clean c ON c.id = d.doc_id
        ORDER BY id
    """,
    # exact aggregates; both engines linear-interpolate the exact median
    "q-doc-corpus-stats": r"""
        SELECT lang, substr(source, 1, 3) AS src_class,
               COUNT(*) AS docs,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                    AS BIGINT) AS tokens,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               MIN(n_chars) AS min_chars,
               quantile_cont(n_chars, 0.5) AS median_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY lang, substr(source, 1, 3)
        ORDER BY lang, src_class
    """,
    "q-doc-source-cap": """
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (
                     PARTITION BY source
                     ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents) t
        WHERE rn <= 15 ORDER BY doc_id
    """,
    # closed-form replay of the PNG pixel generator over the w x h grid
    # (media id is a PNG iff none of the jpeg/gif/mp4/wav id-classes hit)
    "q-media-pixels": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 16 + doc_id % 48 AS w, 16 + doc_id % 32 AS h
          FROM documents
          WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 3
            AND doc_id % 11 <> 5 AND doc_id % 13 <> 7
        ),
        px AS (
          SELECT media_id, w, h,
                 ((x.g * 31 + y.g * 17 + media_id) & 255) AS v
          FROM m, UNNEST(range(w)) AS x(g), UNNEST(range(h)) AS y(g)
        )
        SELECT media_id,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               COUNT(*) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum,
               CAST(MIN(v) AS INT) AS px_min, CAST(MAX(v) AS INT) AS px_max
        FROM px GROUP BY media_id, w, h ORDER BY media_id
    """,
    # identical 8-word segmentation, doc-freq >= 2 boilerplate removal,
    # ordered reassembly with '\n'
    "q-doc-line-dedup": r"""
        WITH lines AS (
          SELECT doc_id, i AS pos,
                 array_to_string(list_slice(string_split(text, ' '),
                                            i * 8 + 1, i * 8 + 8), ' ') AS line
          FROM documents,
               UNNEST(range(CAST(ceil(len(string_split(text, ' ')) / 8.0)
                                 AS BIGINT))) AS t(i)
        ),
        boiler AS (
          SELECT line FROM lines GROUP BY line
          HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        kept AS (
          SELECT * FROM lines WHERE line NOT IN (SELECT line FROM boiler)
        )
        SELECT doc_id, COUNT(*) AS lines_kept,
               md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_md5
        FROM kept GROUP BY doc_id ORDER BY doc_id
    """,
    # plain anti-join ground truth for the bloom + verify path
    "q-doc-dedup-incremental": """
        WITH corpus AS (SELECT text FROM documents WHERE doc_id < 400),
        newb AS (
          SELECT doc_id, text FROM documents WHERE doc_id >= 400
          UNION ALL
          SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50
        )
        SELECT n.doc_id, md5(n.text) AS text_md5
        FROM newb n
        WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = n.text)
        ORDER BY n.doc_id
    """,
    "q-doc-dedup-exact": """
        SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id,
               COUNT(*) AS dup_cnt
        FROM documents GROUP BY 1 ORDER BY text_hash
    """,
    # equal-shingle-set ground truth for the incremental LSH probe:
    # verified-at-1.0 pairs are exactly the identical-3-gram-set joins
    "q-doc-neardup-incremental": r"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents
        ),
        corpus AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id < 400 AND doc_id % 4 <> 0
        ),
        delta AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id >= 400 AND doc_id < 500
          UNION ALL
          SELECT doc_id + (SELECT o FROM off), text FROM corpus
          WHERE doc_id % 20 = 1
          UNION ALL
          SELECT doc_id + 2 * (SELECT o FROM off), text FROM corpus
          WHERE doc_id % 40 = 1
        ),
        shc AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM corpus
        ),
        shd AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM delta
        )
        SELECT * FROM (
          SELECT d.doc_id AS new_id, c.doc_id AS dup_id,
                 CAST(1.0 AS DOUBLE) AS jac, 'corpus' AS scope
          FROM shd d JOIN shc c ON d.g = c.g
          WHERE len(d.g) > 0
          UNION ALL
          SELECT a.doc_id AS new_id, b.doc_id AS dup_id,
                 CAST(1.0 AS DOUBLE) AS jac, 'delta' AS scope
          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id
          WHERE len(a.g) > 0
        )
        ORDER BY scope, new_id, dup_id
    """,
    # lifecycle replay: %5==0 corpus docs are DELETED and their
    # signatures GC'd, so only LIVE docs may surface as dup_id — the
    # batch's %10==5 plants must pair with nothing
    "q-doc-neardup-lifecycle": r"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents
        ),
        corpus0 AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id < 400 AND doc_id % 4 <> 0
        ),
        live AS (
          SELECT doc_id, text FROM corpus0 WHERE doc_id % 5 <> 0
        ),
        delta AS (
          SELECT doc_id + (SELECT o FROM off) AS doc_id, text
          FROM corpus0 WHERE doc_id % 10 IN (1, 5)
        ),
        shc AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM live
        ),
        shd AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM delta
        )
        SELECT * FROM (
          SELECT d.doc_id AS new_id, c.doc_id AS dup_id,
                 CAST(1.0 AS DOUBLE) AS jac, 'corpus' AS scope
          FROM shd d JOIN shc c ON d.g = c.g
          WHERE len(d.g) > 0
          UNION ALL
          SELECT a.doc_id AS new_id, b.doc_id AS dup_id,
                 CAST(1.0 AS DOUBLE) AS jac, 'delta' AS scope
          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id
          WHERE len(a.g) > 0
        )
        ORDER BY scope, new_id, dup_id
    """,
    # the SignatureStore path must land on the SAME truth as the raw
    # lifecycle functions — identical replay, different engine path
"q-doc-neardup-store": r"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents
        ),
        corpus0 AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id < 400 AND doc_id % 4 <> 0
        ),
        live AS (
          SELECT doc_id, text FROM corpus0 WHERE doc_id % 5 <> 0
        ),
        delta AS (
          SELECT doc_id + (SELECT o FROM off) AS doc_id, text
          FROM corpus0 WHERE doc_id % 10 IN (1, 5)
        ),
        shc AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM live
        ),
        shd AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM delta
        )
        SELECT * FROM (
          SELECT d.doc_id AS new_id, c.doc_id AS dup_id,
                 CAST(1.0 AS DOUBLE) AS jac, 'corpus' AS scope
          FROM shd d JOIN shc c ON d.g = c.g
          WHERE len(d.g) > 0
          UNION ALL
          SELECT a.doc_id AS new_id, b.doc_id AS dup_id,
                 CAST(1.0 AS DOUBLE) AS jac, 'delta' AS scope
          FROM shd a JOIN shd b ON a.g = b.g AND a.doc_id < b.doc_id
          WHERE len(a.g) > 0
        )
        ORDER BY scope, new_id, dup_id
    """,
    # normalized dedup replay: same planted perturbation (leading
    # spaces, upper, ' !!!') at the corpus-derived offset, then the
    # same lowercase / non-alnum->space / ws-collapse / trim pipeline
    "q-doc-dedup-normalized": rf"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT)
                 AS o FROM documents
        ), corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + (SELECT o FROM off) AS doc_id,
                 '  ' || upper(text) || ' !!!' AS text
          FROM documents WHERE doc_id % {NORMDUP_MOD} = 0
        ), normed AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   regexp_replace(lower(text), '[^\p{{L}}\p{{N}}\s]',
                                  ' ', 'g'),
                   '\s+', ' ', 'g')) AS norm
          FROM corpus
        )
        SELECT md5(norm) AS norm_hash, MIN(doc_id) AS keeper_id,
               COUNT(*) AS dup_cnt
        FROM normed GROUP BY 1 ORDER BY norm_hash
    """,
    "q-doc-token-stats": rf"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe,
               length(text) AS n_chars_m
        FROM documents ORDER BY doc_id
    """,
    "q-doc-quality": rf"""
        SELECT doc_id,
               ROUND(greatest(least(
                   least(length(text) / 500.0, 1.0) * 0.5
                 + least(({_ratio(_EN)}) * 4, 1.0) * 0.5
                 - length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g'))
                   / greatest(length(text), 1),
                 1.0), 0.0), 4) AS quality
        FROM documents ORDER BY doc_id
    """,
    "q-doc-langid": rf"""
        WITH s AS (
          SELECT doc_id,
                 {_ratio(_EN)} AS s_en, {_ratio(_DE)} AS s_de,
                 {_ratio(_ES)} AS s_es, {_ratio(_FR)} AS s_fr
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM s ORDER BY doc_id
    """,
    "q-doc-fingerprint": """
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS fp
        FROM documents ORDER BY doc_id
    """,
    "q-doc-neardup-jaccard": rf"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END) AS g
          FROM documents WHERE doc_id < {NEARDUP_SUBSET}
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(len(list_intersect(a.g, b.g))
                     / CAST(len(list_distinct(list_concat(a.g, b.g)))
                            AS DOUBLE), 4) AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.g, b.g))
              / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE)
              >= {NEARDUP_THRESHOLD}
        ORDER BY id_a, id_b
    """,
    # planted-outcome replays of the MinHash/SimHash pipelines: exact
    # copies guarantee candidacy (identical sketch), verify-at-equality
    # makes the output exactly the equal-content pairs — computable here
    # as equal sorted distinct shingle/token sets, no engine hash needed
    "q-doc-minhash-lsh": rf"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents WHERE doc_id < {NEARDUP_SUBSET}
        ),
        corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id < {NEARDUP_SUBSET}
          UNION ALL
          SELECT doc_id + (SELECT o FROM off), text FROM documents
          WHERE doc_id < {NEARDUP_SUBSET} AND doc_id % 10 = 0
        ),
        sh AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM corpus
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(1.0 AS DOUBLE) AS jac
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        WHERE len(a.g) > 0
        ORDER BY id_a, id_b
    """,
    "q-doc-minhash-full": r"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents
        ),
        corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + (SELECT o FROM off) * t.g, text
          FROM documents, UNNEST([1, 2]) AS t(g)
          WHERE doc_id % 50 = 0
        ),
        sh AS (
          SELECT doc_id,
                 list_sort(list_filter(list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\s+'))
                                - 1)]
                   END), x -> x <> '')) AS g
          FROM corpus
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(1.0 AS DOUBLE) AS jac
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        WHERE len(a.g) > 0
        ORDER BY id_a, id_b
    """,
    "q-doc-simhash": rf"""
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents WHERE doc_id < {NEARDUP_SUBSET}
        ),
        corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id < {NEARDUP_SUBSET}
          UNION ALL
          SELECT doc_id + (SELECT o FROM off), text FROM documents
          WHERE doc_id < {NEARDUP_SUBSET} AND doc_id % 10 = 3
        ),
        tk AS (
          SELECT doc_id,
                 list_sort(list_distinct(
                   regexp_split_to_array(trim(text), '\s+'))) AS t
          FROM corpus
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(0 AS INT) AS hamming,
               CAST(len(a.t) AS INT) AS n_tokens
        FROM tk a JOIN tk b ON a.t = b.t AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b
    """,
    # same min-reachable-id labeling the Spark label propagation
    # converges to, via transitive closure in a recursive CTE
    "q-doc-dup-clusters": f"""
        WITH RECURSIVE c AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < 200
        ), pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM c a JOIN c b ON a.vec_id < b.vec_id
          WHERE list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v)))
                >= {CLUSTER_SIM_THRESHOLD}
        ), edges AS (
          SELECT id_a AS u, id_b AS w FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ), reach(n, r) AS (
          SELECT u, u FROM edges
          UNION
          SELECT reach.n, e.w FROM reach JOIN edges e ON reach.r = e.u
        ), lab AS (
          SELECT n AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY n
        )
        SELECT vec_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
               vec_id = cluster_id AS is_keeper
        FROM lab ORDER BY vec_id
    """,
    "q-doc-split": """
        WITH h AS (
          SELECT doc_id,
                 substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                 AS bucket
          FROM documents
        )
        SELECT doc_id, bucket,
               CASE WHEN bucket < 'cc' THEN 'train'
                    WHEN bucket < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM h ORDER BY doc_id
    """,
    "q-doc-gopher": rf"""
        WITH t AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ), m AS (
          SELECT doc_id, text, len(toks) AS n_words,
                 CAST(list_sum(list_transform(toks, t -> length(t)))
                      AS DOUBLE) / greatest(len(toks), 1) AS mwl,
                 length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g'))
                 / CAST(greatest(length(text), 1) AS DOUBLE) AS sym,
                 {_ratio(_EN)} AS stop_r
          FROM t
        )
        SELECT doc_id,
               n_words >= 50 AND n_words <= 100000 AS gate_words,
               mwl >= 3.0 AND mwl <= 10.0 AS gate_mwl,
               sym < 0.1 AS gate_symbols,
               stop_r >= 0.02 AS gate_stopwords,
               (n_words >= 50 AND n_words <= 100000)
               AND (mwl >= 3.0 AND mwl <= 10.0)
               AND sym < 0.1 AND stop_r >= 0.02 AS keep
        FROM m ORDER BY doc_id
    """,
    # cutoffs = format(int(rate * 65536), '04x'): en 0.5 -> '8000',
    # zh 0.75 -> 'c000'
    "q-doc-sample": """
        SELECT doc_id, lang FROM documents
        WHERE CASE
          WHEN lang = 'en' THEN
            substr(md5('rebalance:' || CAST(doc_id AS VARCHAR)), 1, 4)
            < '8000'
          WHEN lang = 'zh' THEN
            substr(md5('rebalance:' || CAST(doc_id AS VARCHAR)), 1, 4)
            < 'c000'
          ELSE TRUE END
        ORDER BY doc_id
    """,
    "q-doc-pack": f"""
        WITH t AS (
          SELECT doc_id,
                 len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                 doc_id % {PACK_SHARDS} AS shard
          FROM documents
        ), s AS (
          SELECT doc_id, shard, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS start
          FROM t
        )
        SELECT doc_id, shard, n_tokens,
               CAST(start // {PACK_CAPACITY} AS BIGINT) AS seq_id,
               CAST(start % {PACK_CAPACITY} AS BIGINT) AS seq_off
        FROM s ORDER BY doc_id
    """,
    # step = CHUNK_SIZE - CHUNK_OVERLAP = 160; chunk_id from the start
    # offset via integer division (DuckDB `//` == Spark `DIV` — both
    # truncate; a double CAST would round in DuckDB and truncate in
    # Spark, diverging the hash)
    "q-doc-chunks": """
        SELECT doc_id,
               CAST((s - 1) // 160 AS INT) AS chunk_id,
               substr(text, CAST(s AS INT), 200) AS chunk,
               length(substr(text, CAST(s AS INT), 200)) AS chunk_len
        FROM documents,
             UNNEST(generate_series(1, greatest(length(text), 1), 160))
             AS t(s)
        ORDER BY doc_id, chunk_id
    """,
    # the standalone gopher / exact-dedup / decontamination oracle
    # fragments composed in the engine's stage order
    "q-doc-pipeline-e2e": rf"""
        WITH t AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents WHERE doc_id % {EVAL_MOD} <> 0
        ), m AS (
          SELECT doc_id, text, len(toks) AS n_words,
                 CAST(list_sum(list_transform(toks, t -> length(t)))
                      AS DOUBLE) / greatest(len(toks), 1) AS mwl,
                 length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g'))
                 / CAST(greatest(length(text), 1) AS DOUBLE) AS sym,
                 {_ratio(_EN)} AS stop_r
          FROM t
        ), gated AS (
          SELECT doc_id, text FROM m
          WHERE n_words >= 50 AND n_words <= 100000
            AND mwl >= 3.0 AND mwl <= 10.0
            AND sym < 0.1 AND stop_r >= 0.02
        ), keepers AS (
          SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
        ), kept AS (
          SELECT g.doc_id, g.text FROM gated g JOIN keepers USING (doc_id)
        ), kt AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
          FROM kept
        ), kg AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(tk) < {DECONTAM_NGRAM}
                 THEN [array_to_string(tk, ' ')]
                 ELSE [array_to_string(tk[i:i+{DECONTAM_NGRAM - 1}], ' ')
                       for i in range(1, len(tk) - {DECONTAM_NGRAM - 2})]
            END)) AS gram
          FROM kt
        ), et AS (
          SELECT regexp_split_to_array(trim(text), '\s+') AS tk
          FROM documents WHERE doc_id % {EVAL_MOD} = 0
        ), eg AS (
          SELECT DISTINCT unnest(list_distinct(
            CASE WHEN len(tk) < {DECONTAM_NGRAM}
                 THEN [array_to_string(tk, ' ')]
                 ELSE [array_to_string(tk[i:i+{DECONTAM_NGRAM - 1}], ' ')
                       for i in range(1, len(tk) - {DECONTAM_NGRAM - 2})]
            END)) AS gram
          FROM et
        ), bad AS (
          SELECT DISTINCT kg.doc_id FROM kg JOIN eg USING (gram)
        )
        SELECT doc_id FROM kept
        WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        ORDER BY doc_id
    """,
    # word 5-grams (distinct per doc, same <n fallback as word_shingles);
    # eval slice = doc_id % EVAL_MOD == 0; grams distinct per doc so the
    # join-then-count equals the engine's count over semi-joined grams
    "q-doc-decontaminate": rf"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents
        ), g AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(t) < {DECONTAM_NGRAM}
                 THEN [array_to_string(t, ' ')]
                 ELSE [array_to_string(t[i:i+{DECONTAM_NGRAM - 1}], ' ')
                       for i in range(1, len(t) - {DECONTAM_NGRAM - 2})]
            END)) AS gram
          FROM toks
        ), ev AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % {EVAL_MOD} = 0
        ), hits AS (
          SELECT g.doc_id, COUNT(*) AS n_hit_grams
          FROM g JOIN ev USING (gram)
          WHERE g.doc_id % {EVAL_MOD} <> 0
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
               COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % {EVAL_MOD} <> 0
        ORDER BY doc_id
    """,
    # distinct 3-grams per doc; document frequency = COUNT(*) per gram
    "q-doc-dupfrac": rf"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents
        ), g AS (
          SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(t) < {DUPFRAC_NGRAM}
                 THEN [array_to_string(t, ' ')]
                 ELSE [array_to_string(t[i:i+{DUPFRAC_NGRAM - 1}], ' ')
                       for i in range(1, len(t) - {DUPFRAC_NGRAM - 2})]
            END)) AS gram
          FROM toks
        ), freq AS (
          SELECT gram, COUNT(*) AS c FROM g GROUP BY gram
        ), per AS (
          SELECT g.doc_id, COUNT(*) AS n_grams,
                 COUNT(*) FILTER (WHERE freq.c >= 2) AS n_dup_grams
          FROM g JOIN freq USING (gram) GROUP BY g.doc_id
        )
        SELECT doc_id, n_grams, n_dup_grams,
               ROUND(n_dup_grams / CAST(n_grams AS DOUBLE), 4) AS dup_frac
        FROM per ORDER BY doc_id
    """,
    # ALL (non-distinct) 2-grams for occurrence counts; ties on the top
    # gram break lexicographically, exactly as the engine window does
    "q-doc-repetition": r"""
        WITH toks AS (
          SELECT doc_id, length(text) AS chars,
                 regexp_split_to_array(trim(text), '\s+') AS t
          FROM documents
        ), base AS (
          SELECT doc_id, chars,
                 ROUND(1 - len(list_distinct(t)) / CAST(len(t) AS DOUBLE),
                       4) AS dup_word_frac,
                 CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
                      ELSE [array_to_string(t[i:i+1], ' ')
                            for i in range(1, len(t))]
                 END AS g2
          FROM toks
        ), cnt AS (
          SELECT doc_id, gram, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(g2) AS gram FROM base)
          GROUP BY doc_id, gram
        ), top AS (
          SELECT doc_id, gram, c,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY c DESC, gram) AS rn
          FROM cnt
        )
        SELECT b.doc_id, b.dup_word_frac,
               COALESCE(t2.gram, '') AS top_2gram,
               COALESCE(t2.c, 0) AS top_2gram_cnt,
               COALESCE(ROUND(t2.c * length(t2.gram)
                              / CAST(b.chars AS DOUBLE), 4), 0.0)
               AS top_2gram_char_frac
        FROM base b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t2
          USING (doc_id)
        ORDER BY doc_id
    """,
    # identical planted construction + RE2/Java-portable patterns as
    # functions/text.py PII_EMAIL_RE / PII_PHONE_RE
    "q-doc-pii": r"""
        WITH p AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@mail.example.com or 555-123-'
                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 || ' now' AS t
          FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS n_emails,
               len(regexp_extract_all(t,
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
               md5(regexp_replace(regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'))
               AS red_hash
        FROM p ORDER BY doc_id
    """,
    # bit-identical recomputation of the hashing-trick embedder: same
    # md5 dim hash, sign parity, integer accumulation, L2 norm
    "q-doc-hash-embed": rf"""
        WITH w AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS w
          FROM documents
        ), wt AS (
          SELECT doc_id, md5(w) AS h FROM w WHERE w <> ''
        ), hx AS (
          SELECT doc_id,
                 CAST(CAST(concat('0x', substr(h, 1, 8)) AS UBIGINT)
                      % {HASH_EMBED_DIM} AS BIGINT) AS dim_idx,
                 CASE WHEN CAST(concat('0x', substr(h, 9, 2)) AS UBIGINT)
                           % 2 = 1
                      THEN 1 ELSE -1 END AS s
          FROM wt
        ), comp AS (
          SELECT doc_id, dim_idx, CAST(SUM(s) AS BIGINT) AS acc
          FROM hx GROUP BY doc_id, dim_idx
        ), nrm AS (
          SELECT doc_id, sqrt(CAST(SUM(acc * acc) AS DOUBLE)) AS n
          FROM comp GROUP BY doc_id
        )
        SELECT c.doc_id, c.dim_idx, ROUND(c.acc / n.n, 4) AS val
        FROM comp c JOIN nrm n USING (doc_id)
        WHERE n.n > 0
        ORDER BY doc_id, dim_idx
    """,
    # budgets mirror MIXTURE_BUDGETS; the rate, its 16-bit cutoff
    # integer (floor == Python int() for non-negatives), and the hex
    # compare are all recomputed from the data exactly as the engine's
    # two-pass derivation does
    "q-doc-mixture": r"""
        WITH tok AS (
          SELECT doc_id, lang,
                 len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
          FROM documents
        ), tot AS (
          SELECT lang, SUM(n_tokens) AS t FROM tok GROUP BY lang
        ), j AS (SELECT tok.*, tot.t FROM tok JOIN tot USING (lang))
        SELECT doc_id, lang, n_tokens FROM j
        WHERE CASE
          WHEN lang = 'en' THEN
            t <= 6000 OR
            substr(md5('mixture:' || CAST(doc_id AS VARCHAR)), 1, 4)
            < lpad(to_hex(CAST(floor(least(CAST(1.0 AS DOUBLE),
                    CAST(6000 AS DOUBLE) / t) * 65536) AS INT)), 4, '0')
          WHEN lang = 'zh' THEN
            t <= 1500 OR
            substr(md5('mixture:' || CAST(doc_id AS VARCHAR)), 1, 4)
            < lpad(to_hex(CAST(floor(least(CAST(1.0 AS DOUBLE),
                    CAST(1500 AS DOUBLE) / t) * 65536) AS INT)), 4, '0')
          ELSE TRUE END
        ORDER BY doc_id
    """,
    "q-doc-epoch-shuffle": """
        SELECT doc_id,
               md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS sort_key,
               CAST(CAST(concat('0x',
                      substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)),
                             1, 2)) AS UBIGINT) % 16 AS INT) AS shard
        FROM documents ORDER BY shard, sort_key
    """,
    # integer score (// truncates on both engines, HUGEINT collapsed by
    # the CAST); quantile_cont == Spark percentile (parity proven by
    # q-percentile); ties on a threshold fall to the same side (both <)
    "q-doc-unigram-ppl": r"""
        WITH w AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS word
          FROM documents
        ), wt AS (SELECT doc_id, word FROM w WHERE word <> ''),
        tf AS (SELECT word, COUNT(*) AS tf FROM wt GROUP BY word),
        per AS (
          SELECT doc_id,
                 CAST(1000 * SUM(tf) // COUNT(*) AS BIGINT)
                 AS familiarity_milli
          FROM wt JOIN tf USING (word) GROUP BY doc_id
        ), cuts AS (
          SELECT quantile_cont(familiarity_milli, 0.33) AS t1,
                 quantile_cont(familiarity_milli, 0.66) AS t2
          FROM per
        )
        SELECT doc_id, familiarity_milli,
               CASE WHEN familiarity_milli < t1 THEN 'tail'
                    WHEN familiarity_milli < t2 THEN 'middle'
                    ELSE 'head' END AS bucket
        FROM per, cuts ORDER BY doc_id
    """,
    "q-doc-vocab": r"""
        SELECT word, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df_cnt
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                     AS word
              FROM documents)
        WHERE word <> '' GROUP BY word ORDER BY word
    """,
    # float-free tf-idf ranking: tf DESC, corpus df ASC, term ASC
    "q-doc-tfidf": r"""
        WITH w AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS word
          FROM documents
        ), wt AS (SELECT * FROM w WHERE word <> ''),
        tf AS (
          SELECT doc_id, word, COUNT(*) AS tf FROM wt GROUP BY doc_id, word
        ), dfreq AS (
          SELECT word, COUNT(DISTINCT doc_id) AS df_cnt FROM wt GROUP BY word
        ), ranked AS (
          SELECT tf.doc_id, tf.word, tf.tf, dfreq.df_cnt,
                 ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, dfreq.df_cnt ASC, tf.word ASC)
                 AS rank
          FROM tf JOIN dfreq USING (word)
        )
        SELECT doc_id, rank, word, tf, df_cnt
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """,
    # scale = max |v_i| with no further arithmetic (bit-exact both
    # sides); round() is half-away-from-zero in DuckDB and HALF_UP in
    # Spark — identical for every sign
    "q-emb-quantize": """
        WITH c AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), s AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS q_scale
          FROM c
        )
        SELECT vec_id, q_scale, len(v) AS n_dims,
               md5(array_to_string(
                 CASE WHEN q_scale = 0
                      THEN list_transform(v, x -> 0)
                 ELSE list_transform(v,
                        x -> CAST(round(127.0 * x / q_scale) AS INTEGER))
                 END, ',')) AS qhash
        FROM s ORDER BY vec_id
    """,
    "q-emb-cosine-topk": """
        WITH c AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), q AS (SELECT * FROM c WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                 list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))) AS sim_raw
          FROM q, c WHERE c.vec_id <> q.vec_id
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY sim_raw DESC, n_id) AS rank
          FROM scored
        )
        SELECT q_id, n_id, ROUND(sim_raw, 4) AS sim, rank
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
    """,
    "q-emb-neardup-exact": """
        WITH c AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < 200
        ), scored AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))) AS sim_raw
          FROM c a JOIN c b ON a.vec_id < b.vec_id
        ), top AS (
          SELECT id_a, id_b, ROUND(sim_raw, 4) AS sim
          FROM scored ORDER BY sim_raw DESC, id_a, id_b LIMIT 20
        )
        -- final ordering on the ROUNDED sim (matching the engine's
        -- output ordering) so round-collisions inside the top 20 cannot
        -- reorder rows between the two sides
        SELECT id_a, id_b, sim FROM top ORDER BY sim DESC, id_a, id_b
    """,
    # Recall AND precision of the LSH pair path in one hash: planted
    # exact duplicates are the only pairs >= 0.9, and identical vectors
    # always share every LSH signature, so the output is exactly this
    # set (sim = 1.0) or the hash diverges.
    "q-emb-neardup-lsh": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT vec_id AS id_a, vec_id + (SELECT o FROM off) AS id_b,
               CAST(1.0 AS DOUBLE) AS sim
        FROM embeddings WHERE vec_id % 10 = 0 ORDER BY id_a
    """,
    # planted-neighbor ANN: 5 exact copies per query vector dominate the
    # top-5 (natural cosine tops out ~0.6), identical vectors always
    # collide in every LSH table, and the rank tie-break is n_id — so
    # the approximate path has one exact answer
    # same planted-duplicate construction as q-emb-ann-lsh: identical
    # vectors share the query's own KMeans cell, which the probe always
    # visits, so the approximate index MUST return the planted set
    # persistent-index replay: survivors are copies j=2..6 (j=1 was
    # tombstoned; the stale re-add must not resurrect it), rank = j-1
    "q-emb-ann-index": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT e.vec_id AS q_id,
               CAST(e.vec_id + (SELECT o FROM off) * j AS BIGINT) AS n_id,
               CAST(1.0 AS DOUBLE) AS sim,
               CAST(j - 1 AS INT) AS rank
        FROM embeddings e, UNNEST(generate_series(2, 6)) AS t(j)
        WHERE e.vec_id < 10
        ORDER BY q_id, rank
    """,
    # the PQ-resident index answers the SAME planted-copy construction:
    # exact duplicates encode to the query's own codes (code-match arm
    # guarantees candidacy) and exact re-rank restores sim 1.0
    "q-emb-ann-index-pq": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT e.vec_id AS q_id,
               CAST(e.vec_id + (SELECT o FROM off) * j AS BIGINT) AS n_id,
               CAST(1.0 AS DOUBLE) AS sim,
               CAST(j - 1 AS INT) AS rank
        FROM embeddings e, UNNEST(generate_series(2, 6)) AS t(j)
        WHERE e.vec_id < 10
        ORDER BY q_id, rank
    """,
    "q-emb-ann-ivf": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT e.vec_id AS q_id,
               CAST(e.vec_id + (SELECT o FROM off) * j AS BIGINT) AS n_id,
               CAST(1.0 AS DOUBLE) AS sim,
               CAST(j AS INT) AS rank
        FROM embeddings e, UNNEST(generate_series(1, 5)) AS t(j)
        WHERE e.vec_id < 10
        ORDER BY q_id, rank
    """,
    "q-emb-ann-lsh": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT e.vec_id AS q_id,
               CAST(e.vec_id + (SELECT o FROM off) * j AS BIGINT) AS n_id,
               CAST(1.0 AS DOUBLE) AS sim,
               CAST(j AS INT) AS rank
        FROM embeddings e, UNNEST(generate_series(1, 5)) AS t(j)
        WHERE e.vec_id < 10
        ORDER BY q_id, rank
    """,
    # planted copies land in the query's own probed cell with the
    # query's own code — deterministic through the composite index
    "q-emb-ann-ivfpq": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT e.vec_id AS q_id,
               CAST(e.vec_id + (SELECT o FROM off) * j AS BIGINT) AS n_id,
               CAST(1.0 AS DOUBLE) AS sim,
               CAST(j AS INT) AS rank
        FROM embeddings e, UNNEST(generate_series(1, 5)) AS t(j)
        WHERE e.vec_id < 10
        ORDER BY q_id, rank
    """,
    # same planted-copy construction through the PQ pipeline: exact
    # copies share the query's full code, the code-match refine arm
    # guarantees their presence, exact re-rank puts them on top
    "q-emb-ann-pq": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT) AS o
          FROM embeddings
        )
        SELECT e.vec_id AS q_id,
               CAST(e.vec_id + (SELECT o FROM off) * j AS BIGINT) AS n_id,
               CAST(1.0 AS DOUBLE) AS sim,
               CAST(j AS INT) AS rank
        FROM embeddings e, UNNEST(generate_series(1, 5)) AS t(j)
        WHERE e.vec_id < 10
        ORDER BY q_id, rank
    """,
    # the pipeline must remove exactly the planted copies: survivors ==
    # the original corpus, or the hash diverges (recall AND precision of
    # LSH + clustering + keeper selection in one check)
    "q-emb-dedup-e2e": """
        SELECT vec_id FROM embeddings ORDER BY vec_id
    """,
    # the declarative twin of the engine's LSH pipeline: exact all-pairs
    # Jaccard (>= 0.9) over the SAME planted corpus, transitive closure
    # by recursive CTE, min-id keeper per cluster — natural >= 0.9 pairs
    # participate identically on both sides
    "q-doc-dedup-e2e": f"""
        WITH RECURSIVE off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(doc_id) + 2))) AS BIGINT) AS o
          FROM documents
        ), corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + (SELECT o FROM off), text FROM documents
          WHERE doc_id % 10 = 0
        ), sh AS (
          SELECT doc_id,
                 list_distinct(
                   CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) < 3
                        THEN [array_to_string(
                               regexp_split_to_array(trim(text), '\\s+'), ' ')]
                        ELSE [array_to_string(
                               regexp_split_to_array(trim(text), '\\s+')[i:i+2],
                               ' ')
                              for i in range(1,
                                len(regexp_split_to_array(trim(text), '\\s+'))
                                - 1)]
                   END) AS g
          FROM corpus
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE ROUND(len(list_intersect(a.g, b.g))
                / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE),
                4) >= {DOC_DEDUP_THRESHOLD}
        ), edges AS (
          SELECT id_a AS u, id_b AS w FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ), reach(n, r) AS (
          SELECT u, u FROM edges
          UNION
          SELECT reach.n, e.w FROM reach JOIN edges e ON reach.r = e.u
        ), lab AS (
          SELECT n, MIN(r) AS cluster_id FROM reach GROUP BY n
        )
        SELECT doc_id FROM corpus
        WHERE doc_id NOT IN (SELECT n FROM lab WHERE n <> cluster_id)
        ORDER BY doc_id
    """,
    # The decoded dims must equal the generating formula for every
    # container format in the mix (PNG IHDR, JPEG SOF0, GIF screen
    # descriptor) — a real end-to-end decode check.
    # audio ids (fmt precedence: jpeg %5, gif %7=3, mp4 %11=5, wav %13=7)
    # are excluded from the image/video dims query
    "q-media-features": """
        SELECT doc_id AS media_id,
               CAST(16 + doc_id % 48 AS INT) AS width,
               CAST(16 + doc_id % 32 AS INT) AS height
        FROM documents
        WHERE doc_id < 64
          AND NOT (doc_id % 5 <> 0 AND doc_id % 7 <> 3
                   AND doc_id % 11 <> 5 AND doc_id % 13 = 7)
        ORDER BY media_id
    """,
    # the WAV generator uses rates that divide 1000 evenly, so
    # frames*1000/rate reconstructs the generating duration exactly
    "q-media-audio": """
        SELECT doc_id AS media_id,
               CAST(4000 + doc_id % 4 * 2000 AS INT) AS sample_rate,
               CAST(500 + doc_id % 20 * 125 AS INT) AS duration_ms
        FROM documents
        WHERE doc_id < 200
          AND doc_id % 5 <> 0 AND doc_id % 7 <> 3
          AND doc_id % 11 <> 5 AND doc_id % 13 = 7
        ORDER BY media_id
    """,
    # FULL replay of the exact-integer SemDeDup pipeline: int8
    # quantization (the q-emb-quantize parity device), lowest-8-id
    # non-zero seeds, sign-aware integer assignment key
    # (dot^2 * 10^6 // |c|^2, ties to the lowest centroid), and the
    # integer-form cosine >= 0.90 pair test (dot^2 * 10^4 >= 8100 *
    # |a|^2 * |b|^2) with greedy keep-lowest-id
    "q-emb-semdedup": """
        WITH off AS (
          SELECT CAST(POWER(10, CEIL(LOG10(MAX(vec_id) + 2))) AS BIGINT)
                 AS o
          FROM embeddings
        ), base AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + (SELECT o FROM off), embedding
          FROM embeddings WHERE vec_id % 10 = 0
        ), c AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM base
        ), s AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS sc
          FROM c
        ), q AS (
          SELECT vec_id,
                 CASE WHEN sc = 0
                      THEN list_transform(v, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(v,
                        x -> CAST(round(127.0 * x / sc) AS BIGINT))
                 END AS qv
          FROM s
        ), qn AS (
          SELECT vec_id, qv,
                 CAST(list_dot_product(qv, qv) AS BIGINT) AS n2
          FROM q
        ), cents AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                 qv AS cv, n2 AS cn2
          FROM (SELECT * FROM qn WHERE n2 > 0 ORDER BY vec_id LIMIT 8)
        ), dots AS (
          SELECT qn.vec_id, cents.cid, cents.cn2,
                 CAST(list_dot_product(qn.qv, cents.cv) AS BIGINT) AS dot
          FROM qn, cents
        ), keyed AS (
          SELECT vec_id, cid,
                 CASE WHEN dot >= 0
                      THEN (dot * dot * 1000000) // cn2
                      ELSE -((dot * dot * 1000000) // cn2)
                 END AS k
          FROM dots
        ), assign AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY k DESC, cid) AS rn
            FROM keyed) WHERE rn = 1
        ), m AS (
          SELECT a.vec_id, a.cid, qn.qv, qn.n2
          FROM assign a JOIN qn USING (vec_id)
        )
        SELECT m.vec_id, CAST(m.cid AS INT) AS cluster_id,
               NOT EXISTS (
                 SELECT 1 FROM m b
                 WHERE b.cid = m.cid AND b.vec_id < m.vec_id
                   AND CAST(list_dot_product(b.qv, m.qv) AS BIGINT) > 0
                   AND CAST(list_dot_product(b.qv, m.qv) AS BIGINT)
                       * CAST(list_dot_product(b.qv, m.qv) AS BIGINT)
                       * 10000
                       >= 8100 * b.n2 * m.n2
               ) AS is_kept
        FROM m ORDER BY vec_id
    """,
    # exact-integer DSIR replay: same md5 bucketing as q-doc-hash-embed,
    # add-one-smoothed milli-ratio weights, integer per-document
    # integration, per-token milli-average ranking
    "q-doc-dsir": r"""
        WITH w AS (
          SELECT doc_id, lang = 'en' AS tgt,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                 AS w
          FROM documents
        ), tok AS (
          SELECT doc_id, tgt,
                 CAST(CAST(concat('0x', substr(md5(w), 1, 8)) AS UBIGINT)
                      % 64 AS BIGINT) AS bucket
          FROM w WHERE w <> ''
        ), dc AS (
          SELECT doc_id, bucket, COUNT(*) AS cnt
          FROM tok GROUP BY doc_id, bucket
        ), raw AS (
          SELECT bucket, COUNT(*) AS rb FROM tok GROUP BY bucket
        ), tg AS (
          SELECT bucket, COUNT(*) AS tb FROM tok WHERE tgt GROUP BY bucket
        ), jt AS (
          SELECT raw.bucket, raw.rb, COALESCE(tg.tb, 0) AS tb
          FROM raw LEFT JOIN tg USING (bucket)
        ), tot AS (
          SELECT CAST(SUM(rb) AS BIGINT) AS rtot,
                 CAST(SUM(tb) AS BIGINT) AS ttot
          FROM jt
        ), wt AS (
          SELECT bucket,
                 CAST(((tb + 1) * (rtot + 64) * 1000)
                      // ((rb + 1) * (ttot + 64)) AS BIGINT) AS w_milli
          FROM jt, tot
        ), sc AS (
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                 CAST(SUM(cnt * w_milli) AS BIGINT) AS dsir_score
          FROM dc JOIN wt USING (bucket) GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, dsir_score,
               CAST((dsir_score * 1000) // n_tokens AS BIGINT)
               AS per_token_milli
        FROM sc WHERE n_tokens > 0
        ORDER BY per_token_milli DESC, doc_id
        LIMIT 100
    """,
}
