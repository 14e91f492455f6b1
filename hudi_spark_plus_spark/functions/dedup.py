"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
(SURVEY M6 — training-data pipeline surface).

Scale shapes (100 TB posture):

* exact         — one hash-groupBy shuffle on md5(text); map-side partial
                  aggregation applies.
* minhash_lsh   — the only all-pairs-safe route at scale: per-doc
                  signatures (narrow), explode to ``bands`` rows/doc, one
                  shuffle on (band, band_hash) to form candidate buckets,
                  self-join within buckets only. Never a cross join.
* simhash       — 64-bit signature via one Arrow-vectorized pandas_udf
                  over JVM-computed word hashes; near-dup = small hamming
                  distance on band-bucketed candidates.
* exact jaccard — verification primitive for candidate pairs (and the
                  oracle-checkable exact variant on bounded subsets).

MinHash/SimHash signatures use Spark's ``xxhash64`` — engine-specific by
nature, so their registry queries use PLANTED-OUTCOME hash oracles
(operators/llm_queries.py:_plant_copies): exact copies are planted at
known ids, which guarantees band candidacy independent of the hash
family, and the exact verify (jaccard = 1.0 / token-set equality)
restricts the output to equal-content pairs that DuckDB replays as
equal sorted distinct shingle/token sets. <1.0-threshold behavior is
pinned separately by recall tests against exact Jaccard ground truth
(tests/test_llm_ops.py) and the 0.9-threshold e2e pipeline query.

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
real type hints, and stringified ones break it.
"""

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

# Buckets larger than this are DROPPED from the within-bucket self-join
# (the join is quadratic in bucket size — a corpus with 10^6 identical
# boilerplate docs would otherwise concentrate one 10^12-pair bucket).
# A capped bucket is by definition a mass-duplicate cluster: its members
# still surface through the exact md5 dedup pass, so capping costs only
# *near*-dup recall among docs that are outright duplicates anyway.
DEFAULT_MAX_BUCKET = 500


def cap_bucket_size(
    banded: DataFrame,
    keys: list[str],
    cap: int,
    report: bool = False,
) -> DataFrame:
    """Drop rows in LSH buckets with more than ``cap`` members.

    Shape: groupBy-count on the bucket keys (map-side partial
    aggregation — a window count would force a per-partition sort), keep
    only OVERSIZED buckets (tiny by definition: they are pathological
    mass-duplicate clusters), anti-join them out. The aggregation and
    the anti-join shuffle on the same keys as the candidate self-join
    that follows, and AQE broadcasts the oversized side when it is as
    small as it should be. ``report=True`` runs a bounded count job and
    logs how many buckets were capped (skew-audit observability; off in
    query paths to avoid an extra action)."""
    oversized = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .where(F.col("_bsz") > cap)
        .select(*keys)
    )
    if report:
        n = oversized.count()
        if n:
            logger.warning(
                "LSH bucket cap: dropped %d bucket(s) larger than %d "
                "(mass-duplicate clusters; members still dedup via the "
                "exact pass)", n, cap,
            )
    return banded.join(oversized, keys, "left_anti")


# -- exact ------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per distinct text; report group size.
    One shuffle (hash aggregate on the 128-bit text digest)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


def normalize_text_expr(col: Column) -> Column:
    """CCNet-style near-exact normalization (lowercase, non-letter/
    digit runs to one space, trim): the canonical form under which
    "Hello,  World!" and "hello world" are the same document. Pure
    codegen expressions — lower + two regexp_replace passes — and
    deliberately ANSI-replayable: Java regex and RE2 agree on
    ``[^\\p{L}\\p{N}]`` and ``\\s+`` over the classes used here."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalized_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-exact dedup: ``exact_dedup`` over the NORMALIZED text —
    catches trivially-reformatted copies (case, punctuation,
    whitespace) that byte-exact hashing misses but MinHash is overkill
    for. Same single-shuffle shape: one hash aggregate on the 128-bit
    digest of the normalized form."""
    return (
        df.groupBy(
            F.md5(normalize_text_expr(F.col(text_col))).alias("norm_hash")
        )
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


# -- shingles / jaccard -----------------------------------------------------


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (JVM lambda ops)."""
    return F.expr(
        f"""
        array_distinct(
          CASE WHEN size(split(trim({text_col}), '\\\\s+')) < {n}
               THEN array(array_join(split(trim({text_col}), '\\\\s+'), ' '))
          ELSE transform(
            sequence(1, size(split(trim({text_col}), '\\\\s+')) - {n} + 1),
            i -> array_join(slice(split(trim({text_col}), '\\\\s+'), i, {n}), ' '))
          END)
        """
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b)).cast(
        "double"
    )


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    ngram: int = 3,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard >= threshold.

    O(n^2) candidate space — the ORACLE/verification variant for bounded
    inputs; production-scale near-dup goes through minhash_lsh_pairs.
    A cheap length-band prefilter (|len_a - len_b| constraint implied by
    the threshold) keeps the cross product from exploding.
    """
    s = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, ngram).alias("sh"),
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    # |A∩B|/|A∪B| >= t  =>  |B| >= t*|A| (size band prune, exact-safe)
    sa, sb = F.size(F.col("a.sh")), F.size(F.col("b.sh"))
    pairs = pairs.where(
        (F.least(sa, sb).cast("double") / F.greatest(sa, sb)) >= threshold
    )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 4).alias("jac"),
        )
        .where(F.col("jac") >= threshold)
    )


# -- minhash + LSH ----------------------------------------------------------


def with_minhash(
    df: DataFrame,
    text_col: str,
    k: int = 64,
    ngram: int = 3,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """k-permutation MinHash, codegen-friendly formulation.

    Naive nested lambdas (``transform(seq(k), j -> array_min(transform(
    shingles, s -> hash(s, j))))``) run interpreted — |docs| x |shingles|
    x k lambda evals dominate wall-clock. Instead: explode shingles to
    rows, hash each shingle ONCE, then one hash-aggregate with k
    whole-stage-codegen'd ``min(xxhash64(h, j))`` columns — a single
    shuffle on the doc id, ~10x faster at corpus scale, identical
    MinHash semantics (a fresh hash family per j).

    Docs whose text yields zero shingles (empty strings) drop out — they
    have no content to near-dup match.

    ``id_cols``: group the aggregate on these only (don't drag the full
    text through the shuffle as part of the grouping key).
    """
    other = id_cols if id_cols else [c for c in df.columns]
    exploded = (
        df.withColumn("_toks", F.expr(f"split(trim({text_col}), '\\\\s+')"))
        .withColumn(
            "_sh",
            F.explode(
                F.expr(
                    f"""array_distinct(
                      CASE WHEN size(_toks) < {ngram}
                           THEN array(array_join(_toks, ' '))
                      ELSE transform(sequence(1, size(_toks) - {ngram} + 1),
                                     i -> array_join(slice(_toks, i, {ngram}), ' '))
                      END)"""
                )
            ),
        )
        .where(F.col("_sh") != "")  # empty/whitespace-only text -> no shingles
        .select(*other, F.xxhash64("_sh").alias("_h"))
    )
    # ONE expression instead of k Column objects: building 64 separate
    # min(xxhash64(...)) columns plus the k-way F.array costs ~250 py4j
    # round trips of driver latency PER CALL (~0.4 s before any job
    # runs); array-of-aggregates is one expr string, same plan, same
    # codegen (guide §1.2 applies to the driver too: don't schedule
    # work — here, RPCs — proportional to k)
    mins = ",".join(f"min(xxhash64(_h, {j}))" for j in range(k))
    return exploded.groupBy(*other).agg(
        F.expr(f"array({mins})").alias("minhash")
    )


def banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """``(id, band, band_key)`` LSH band keys per document — the
    SIGNATURE STATE of MinHash dedup, factored out so it can be
    PERSISTED (e.g. appended to a lake table per ingest batch) and
    probed incrementally instead of recomputed corpus-wide. Identical
    banding to ``minhash_lsh_pairs`` (which now builds on this):
    k-permutation MinHash, ``bands`` keys of ``k/bands`` rows each."""
    rows = k // bands
    sig = with_minhash(
        df.select(F.col(id_col).alias("id"), text_col),
        text_col, k, ngram, id_cols=["id"],
    )
    return sig.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> xxhash64(array_join(slice(minhash, b * {rows} + 1, {rows}), '_'), b))"
            )
        ).alias("band", "band_key"),
    )


def incremental_neardup_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    state_banded: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    ngram: int = 3,
    verify_threshold: float | None = None,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """NEAR-dup detection of an ingest batch against an accumulated
    corpus WITHOUT re-minhashing the corpus — the scale companion of
    ``incremental_dedup`` (which is exact-only). At 100 TB the corpus's
    banded signatures are maintained as a table (append each batch's
    ``banded_signatures`` output, ~``bands`` small rows per doc);
    detecting the delta's near-dups then costs O(batch signatures) +
    one band-keyed join against the state + exact verification of the
    CANDIDATES only — the corpus's text is touched only for candidate
    ids (semi-join pruned), never scanned.

    Returns (new_id, dup_id, jac, scope): ``scope='corpus'`` pairs a
    batch doc with a pre-existing doc, ``scope='delta'`` with another
    doc of the same batch (id_a < id_b ordering within the batch).
    ``state_banded`` must carry (id, band, band_key) for the corpus
    (``banded_signatures`` output with the same k/bands/ngram);
    ``corpus_df`` provides candidate texts for verification.

    PRECONDITION — disjoint id spaces: ``new_df`` ids must not already
    exist in ``corpus_df``/``state_banded``. A shared id would yield
    duplicate rows in the verification text union (two texts for one
    vid → wrong/duplicated jac rows). Re-ingesting an id is an UPSERT,
    not an ingest: prune the old id from state first (see
    ``prune_signature_state``). As defense-in-depth, corpus-scope
    self-pairs (new_id == dup_id) are filtered below — mirroring the
    delta scope's id_a < id_b — so a violated precondition degrades to
    possibly-duplicated pairs, never a self-match."""
    new_banded = banded_signatures(
        new_df, id_col, text_col, k, bands, ngram
    ).localCheckpoint(eager=True)
    new_capped = cap_bucket_size(
        new_banded, ["band", "band_key"], max_bucket_size
    )
    state_capped = cap_bucket_size(
        state_banded, ["band", "band_key"], max_bucket_size
    )
    n, s = new_capped.alias("n"), state_capped.alias("s")
    vs_corpus = (
        n.join(
            s,
            (F.col("n.band") == F.col("s.band"))
            & (F.col("n.band_key") == F.col("s.band_key"))
            & (F.col("n.id") != F.col("s.id")),
        )
        .select(
            F.col("n.id").alias("new_id"),
            F.col("s.id").alias("dup_id"),
            F.lit("corpus").alias("scope"),
        )
        .distinct()
    )
    a, b = new_capped.alias("a"), new_capped.alias("b")
    vs_delta = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("new_id"),
            F.col("b.id").alias("dup_id"),
            F.lit("delta").alias("scope"),
        )
        .distinct()
    )
    cand = vs_corpus.unionByName(vs_delta)
    if verify_threshold is None:
        return cand
    cand = cand.localCheckpoint(eager=True)
    new_ids = cand.select(F.col("new_id").alias("vid")).distinct()
    dup_ids = cand.select(F.col("dup_id").alias("vid")).distinct()
    # candidate texts only: batch side from new_df, corpus side from
    # corpus_df ∪ new_df (a dup_id can be a same-batch doc)
    texts = new_df.select(
        F.col(id_col).alias("vid"), F.col(text_col)
    ).unionByName(
        corpus_df.select(F.col(id_col).alias("vid"), F.col(text_col))
    )
    sh = (
        texts.join(new_ids.unionByName(dup_ids).distinct(), "vid", "left_semi")
        .select("vid", word_shingles(text_col, ngram).alias("sh"))
    )
    return (
        cand.join(
            sh.withColumnRenamed("vid", "new_id")
            .withColumnRenamed("sh", "sh_a"),
            "new_id",
        )
        .join(
            sh.withColumnRenamed("vid", "dup_id")
            .withColumnRenamed("sh", "sh_b"),
            "dup_id",
        )
        .select(
            "new_id",
            "dup_id",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"),
            "scope",
        )
        .where(F.col("jac") >= verify_threshold)
    )


def prune_signature_state(
    state_banded: DataFrame,
    live_ids: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Signature-state LIFECYCLE: drop banded signatures whose document
    no longer exists in the corpus. The ``banded_signatures`` state
    table is append-only per ingest (DESIGN.md contract) — a document
    DELETED from the corpus would otherwise keep matching as ``dup_id``
    forever and, worse, its text would be missing at verification time.
    This is the GC half of the contract: one band-partitionable
    left-semi pass of the state against the live id set (at 100 TB, run
    it as a periodic maintenance compaction of the state table, or feed
    ``live_ids`` from the lake table's CDC delete feed to prune only
    tombstoned ids). ``live_ids`` may be the corpus itself or just its
    id column; any extra columns are ignored."""
    keep = live_ids.select(F.col(id_col).alias("id")).distinct()
    return state_banded.join(keep, "id", "left_semi")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 64,
    bands: int = 16,
    ngram: int = 3,
    verify_threshold: float | None = None,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    report_capped: bool = False,
) -> DataFrame:
    """Banded-LSH candidate pairs (optionally verified by exact Jaccard).

    signature -> ``bands`` band keys/doc -> shuffle on band key ->
    within-bucket self-join -> distinct pairs. With k=64, bands=16 (r=4),
    the S-curve crosses ~0.5 at j≈0.5; tune bands per threshold.

    ``max_bucket_size`` guards the quadratic self-join against
    pathological buckets (see ``cap_bucket_size``); the verify step only
    computes/shuffles shingles for CANDIDATE docs (semi-join pruned —
    candidates ≪ corpus after LSH).
    """
    banded = banded_signatures(df, id_col, text_col, k, bands, ngram)
    # materialize once: the self-join would otherwise recompute the whole
    # shingle->64-hash signature subtree for BOTH sides
    banded = banded.localCheckpoint(eager=True)
    banded = cap_bucket_size(
        banded, ["band", "band_key"], max_bucket_size, report_capped
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # checkpoint the (small) candidate set so the id semi-joins below
    # don't re-run the banded self-join twice
    cand = cand.localCheckpoint(eager=True)
    cand_ids = (
        cand.select(F.col("id_a").alias("vid"))
        .union(cand.select(F.col("id_b").alias("vid")))
        .distinct()
    )
    # semi-join prune BEFORE shingling: only candidate docs' shingle
    # arrays are computed and shuffled (candidates ≪ corpus after LSH) —
    # never the corpus-wide arrays
    sh = (
        df.select(F.col(id_col).alias("vid"), F.col(text_col))
        .join(cand_ids, "vid", "left_semi")
        .select("vid", word_shingles(text_col, ngram).alias("sh"))
    )
    return (
        cand.join(sh.withColumnRenamed("vid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("vid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"),
        )
        .where(F.col("jac") >= verify_threshold)
    )


# -- cross-document line dedup (CCNet-style) --------------------------------


def segment_words_expr(text_col: str, words_per_line: int = 8) -> Column:
    """Deterministic re-segmentation of running text into fixed
    ``words_per_line`` "lines" (array<string>) — the line unit for
    corpora whose documents carry no natural newlines. Pure JVM lambda
    expr; the same segmentation is expressible in ANSI SQL for oracles."""
    w = words_per_line
    return F.expr(
        f"""
        transform(
          sequence(0, cast(ceil(size(split({text_col}, ' ')) / {w}.0) as int) - 1),
          i -> array_join(slice(split({text_col}, ' '), i * {w} + 1, {w}), ' '))
        """
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    lines_col: Column | str,
    min_doc_freq: int = 2,
) -> DataFrame:
    """CCNet-style cross-document LINE dedup: drop every line that
    appears in >= ``min_doc_freq`` DISTINCT documents (boilerplate —
    headers, navigation, license blocks), reassemble each document from
    its surviving lines in order.

    Scale shape (100 TB): lines shuffle ONCE keyed by their 128-bit md5
    (never the line text as a join key), doc-frequency counting gets
    map-side partial aggregation, the boilerplate set is anti-joined
    (not collected), and reassembly is one groupBy(doc) with an
    in-group array_sort — no global window anywhere. Documents whose
    every line is boilerplate drop out (callers left-join the id
    universe if empty docs must be retained).

    Returns (id, lines_kept, clean_text)."""
    lc = F.col(lines_col) if isinstance(lines_col, str) else lines_col
    lines = df.select(
        F.col(id_col), F.posexplode(lc).alias("pos", "line")
    ).withColumn("_lh", F.md5("line"))
    boiler = (
        lines.groupBy("_lh")
        .agg(F.countDistinct(id_col).alias("doc_freq"))
        .where(F.col("doc_freq") >= min_doc_freq)
        .select("_lh")
    )
    kept = lines.join(boiler, "_lh", "left_anti")
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("lines_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, line))),"
            " x -> x.line), '\\n')"
        ).alias("clean_text"),
    )


# -- incremental dedup: new batch vs existing corpus ------------------------

_BLOOM_SEEDS = (101, 202, 303)


def corpus_text_bloom(
    corpus: DataFrame, text_col: str, m_bits: int = 1 << 17
) -> list[int]:
    """Bloom filter of the corpus's exact text digests as a packed
    int64 list (``m_bits / 64`` words).

    The corpus side is ONE narrow pass: md5 -> k=3 bit positions ->
    bit_or aggregation into at most m/64 groups. The driver collect is
    bounded METADATA (16 KiB at 2^20 bits), not row data — this is the
    piece that lets a 100-TB deployment dedup a new batch against the
    full corpus without ever shuffling the corpus: the bloom broadcasts
    to executors, only probable-dup candidates pay the exact
    verification join."""
    pos = corpus.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.md5(text_col), F.lit(s)), F.lit(m_bits)
                    ).cast("long")
                    for s in _BLOOM_SEEDS
                ]
            )
        ).alias("p")
    )
    rows = (
        pos.groupBy(F.expr("p div 64").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))"
            ).alias("bits")
        )
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in rows:
        arr[int(r["w"])] = int(r["bits"])
    return arr


def incremental_dedup(
    new_df: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """EXACT dedup of a new ingest batch against an existing corpus
    without shuffling the corpus: bloom prefilter (possible false
    positives, NO false negatives) -> exact md5 semi-join verification
    of the candidates only -> anti-join the verified dups out of the
    batch. The result is exactly ``new_df`` minus texts present in
    ``corpus`` — hash-checkable against a plain SQL anti-join."""
    bloom = corpus_text_bloom(corpus, text_col, m_bits)
    probed = new_df.withColumn("_th", F.md5(text_col)).withColumn(
        "_bloom", F.lit(bloom)
    )
    cond = None
    for s in _BLOOM_SEEDS:
        hit = F.expr(
            f"(element_at(_bloom, cast(shiftright(pmod(xxhash64(_th, {s}),"
            f" {m_bits}), 6) as int) + 1)"
            f" & shiftleft(cast(1 as bigint),"
            f" cast(pmod(xxhash64(_th, {s}), {m_bits}) % 64 as int))) != 0"
        )
        cond = hit if cond is None else (cond & hit)
    cand = probed.where(cond).select(id_col, "_th")
    verified_dups = cand.join(
        corpus.select(F.md5(text_col).alias("_th")).distinct(),
        "_th",
        "left_semi",
    ).select(id_col)
    return new_df.join(verified_dups, id_col, "left_anti")


# -- simhash ----------------------------------------------------------------


def with_simhash(df: DataFrame, text_col: str) -> DataFrame:
    """64-bit SimHash from JVM-computed token hashes; the bit-vote fold is
    an Arrow-vectorized pandas_udf (numpy), the engine's sanctioned
    Python path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def simhash_fold(hashes: pd.Series) -> pd.Series:
        # one vectorized pass over the WHOLE Arrow batch: flatten every
        # doc's token hashes, expand bits once, and segment-sum per doc
        # with add.reduceat — no per-document Python loop
        out = np.zeros(len(hashes), dtype=np.uint64)
        lens = np.fromiter(
            (0 if hs is None else len(hs) for hs in hashes),
            dtype=np.int64,
            count=len(hashes),
        )
        nz = np.nonzero(lens)[0]
        if len(nz):
            flat = np.concatenate(
                [np.asarray(hashes.iloc[i], dtype=np.uint64) for i in nz]
            )
            bits = (
                (flat[:, None] >> np.arange(64, dtype=np.uint64)) & 1
            ).astype(np.int64)  # (total_tokens, 64)
            offsets = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            sums = np.add.reduceat(bits, offsets, axis=0)  # (docs, 64)
            votes = sums * 2 - lens[nz][:, None]
            weights = np.left_shift(
                np.uint64(1), np.arange(64, dtype=np.uint64)
            )
            out[nz] = ((votes > 0).astype(np.uint64) * weights).sum(
                axis=1, dtype=np.uint64
            )
        return pd.Series(out.view(np.int64))

    toks = df.withColumn(
        "_tok_hashes",
        F.expr(
            f"transform(array_distinct(split(trim({text_col}), '\\\\s+')),"
            " t -> xxhash64(t))"
        ),
    )
    return toks.withColumn("simhash", simhash_fold("_tok_hashes")).drop(
        "_tok_hashes"
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    report_capped: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidate-bucketed on
    16-bit signature bands (4 bands -> any pair within hamming<=3*? is
    guaranteed in >=1 shared band when distance < 4; larger budgets trade
    recall, standard practice)."""
    sig = with_simhash(df.select(F.col(id_col).alias("id"), text_col), text_col)
    banded = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3),"
                " b -> cast(shiftright(simhash, b * 16) & 65535 as int))"
            )
        ).alias("band", "band_key"),
    )
    # materialize once — the self-join would re-run the pandas_udf fold
    banded = banded.localCheckpoint(eager=True)
    banded = cap_bucket_size(
        banded, ["band", "band_key"], max_bucket_size, report_capped
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
