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
nature, so their queries take the driver's rows-only check; their
CORRECTNESS comes from recall tests against exact Jaccard ground truth
(tests/test_llm_ops.py).

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

    One window count over the same keys the candidate self-join shuffles
    on (co-partitioned — no extra exchange under AQE). ``report=True``
    runs a bounded count job and logs how many buckets were capped
    (observability for skew audits; off in query paths to avoid an extra
    action)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys)
    sized = banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
    if report:
        n = (
            sized.where(F.col("_bsz") > cap)
            .select(*keys)
            .distinct()
            .count()
        )
        if n:
            logger.warning(
                "LSH bucket cap: dropped %d bucket(s) larger than %d "
                "(mass-duplicate clusters; members still dedup via the "
                "exact pass)", n, cap,
            )
    return sized.where(F.col("_bsz") <= cap).drop("_bsz")


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
    agg = exploded.groupBy(*other).agg(
        *[
            F.min(F.xxhash64(F.col("_h"), F.lit(j))).alias(f"_m{j}")
            for j in range(k)
        ]
    )
    return agg.select(
        *other, F.array(*[F.col(f"_m{j}") for j in range(k)]).alias("minhash")
    )


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
    rows = k // bands
    sig = with_minhash(
        df.select(F.col(id_col).alias("id"), text_col),
        text_col, k, ngram, id_cols=["id"],
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> xxhash64(array_join(slice(minhash, b * {rows} + 1, {rows}), '_'), b))"
            )
        ).alias("band", "band_key"),
    )
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
