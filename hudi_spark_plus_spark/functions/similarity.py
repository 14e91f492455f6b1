"""Similarity search over embedding columns (SURVEY M6).

* ``cosine_topk``      — exact brute-force top-k: broadcast the (small)
  query set against the corpus, dot product as a JVM lambda fold
  (``zip_with`` + ``aggregate`` in double), per-query top-k window.
  The baseline and the verifier for the approximate path.
* ``ivf_topk``         — IVF (inverted-file) ANN: KMeans coarse
  centroids partition the corpus; a query probes its ``nprobe`` nearest
  cells and exact-re-ranks only those candidates. Scan fraction ~
  nprobe / n_centroids. Centroid fit is a one-off (seeded, Spark ML).
* ``lsh_ann_topk``     — scale path: random-hyperplane sign-bit LSH.
  Bit signatures are computed by one Arrow-vectorized pandas_udf with a
  seeded hyperplane matrix (deterministic); candidates = same bucket
  (multi-probe: exact bucket + single-bit flips), then exact re-rank of
  candidates only. Recall is asserted against brute force in tests.

Scale shape: brute force is O(|Q| x |C|) — fine for |Q| small since the
corpus never shuffles (queries broadcast, dot computed map-side, then one
top-k exchange). The LSH path replaces the full scan with bucket joins:
one shuffle on bucket id, candidate lists ~ |C| / 2^bits.

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
real type hints, and stringified ones break it.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
NORM_EXPR = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " cast(0.0 as double), (acc, v) -> acc + v))"
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Output: q_id, n_id, sim, rank."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    dot = F.expr(DOT_EXPR.format(a="q_vec", b="n_vec"))
    nq = F.expr(NORM_EXPR.format(a="q_vec"))
    nc = F.expr(NORM_EXPR.format(a="n_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (dot / (nq * nc)).alias("sim_raw"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_raw").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "q_id", "n_id", F.round("sim_raw", 4).alias("sim"), "rank"
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    fit_sample_max: int = 100_000,
) -> DataFrame:
    """IVF approximate top-k: KMeans cells + multi-cell probe + exact
    cosine re-rank of the probed cells only.

    One KMeans fit (seeded — deterministic), one shuffle on the cell id
    for the candidate join. Above ``fit_sample_max`` corpus rows the fit
    runs on a uniform SAMPLE of about that many vectors — centroid
    quality saturates long before that, and fitting the full corpus
    would make the one-off model build the dominant job at 100x scale.
    Cell assignment still covers the full corpus (a narrow map); the
    probe join replaces the full scan with ~nprobe/n_centroids of it.
    """
    import numpy as np
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.types import ArrayType, IntegerType

    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("features", array_to_vector("n_vec"))
    fit_df = c
    n_corpus = c.count()
    if n_corpus > fit_sample_max:
        fit_df = c.sample(
            fraction=min(1.0, fit_sample_max / n_corpus), seed=seed
        )
    # a coarse quantizer only needs rough cells — centroid quality for
    # nprobe-probing saturates in a few Lloyd iterations, and the fit is
    # otherwise the dominant job of the whole query
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=8, featuresCol="features"
    ).fit(fit_df)
    assigned = model.transform(c).select(
        "n_id", "n_vec", F.col("prediction").alias("cell")
    )
    centers = np.stack(model.clusterCenters())  # (n_centroids, dim)

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy())  # (n, dim)
        d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q = (
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
        .withColumn("cell", F.explode(probe_cells("q_vec")))
    )
    cand = assigned.join(q, "cell").where(F.col("q_id") != F.col("n_id"))
    dot = F.expr(DOT_EXPR.format(a="q_vec", b="n_vec"))
    nq = F.expr(NORM_EXPR.format(a="q_vec"))
    nc = F.expr(NORM_EXPR.format(a="n_vec"))
    # no dedup needed: each corpus vector lives in exactly one cell and
    # probe cells per query are distinct, so (q, n) joins at most once
    scored = cand.select(
        "q_id", "n_id", (dot / (nq * nc)).alias("sim_raw")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_raw").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def cosine_pairs(
    corpus: DataFrame,
    top_n: int | None = None,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine similarity (id_a < id_b): the embedding
    analogue of ``exact_jaccard_pairs`` — the VERIFIER for the bucketed
    LSH pair path, O(n^2) by design, meant for bounded subsets. The
    smaller side broadcasts, the dot product is a JVM lambda fold, and
    ``top_n`` uses orderBy+limit (TakeOrderedAndProject — no global
    single-partition window)."""
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    dot = F.expr(DOT_EXPR.format(a="vec_a", b="vec_b"))
    na = F.expr(NORM_EXPR.format(a="vec_a"))
    nb = F.expr(NORM_EXPR.format(a="vec_b"))
    scored = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (dot / (na * nb)).alias("sim_raw"))
    )
    if threshold is not None:
        scored = scored.where(F.col("sim_raw") >= threshold)
    if top_n is not None:
        scored = scored.orderBy(
            F.col("sim_raw").desc(), "id_a", "id_b"
        ).limit(top_n)
    return scored.select(
        "id_a", "id_b", F.round("sim_raw", 4).alias("sim")
    )


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 12,
    dim: int = 64,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at scale: candidates =
    same sign-bit LSH bucket in ANY table, then exact cosine verify of
    candidates only (every emitted pair is exactly ``>= threshold``;
    only recall is approximate — asserted vs ``cosine_pairs`` in tests).

    Scale shape: never all-pairs. One signature pass (Arrow pandas_udf,
    localCheckpointed so the self-join does not recompute it), one
    shuffle on (table, bucket), within-bucket self-join with id_a <
    id_b, pair dedup across tables. Scan fraction per table ~ 1/2^bits
    of the corpus squared only WITHIN buckets; near-identical vectors
    collide with prob ~ (1 - theta/pi)^bits per table, so high
    thresholds (the near-dup regime) get recall from ``n_tables``
    independent chances."""
    sig = with_lsh_buckets(
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
        "vec", bits, dim, n_tables, seed,
    ).localCheckpoint()
    from hudi_spark_plus_spark.functions.dedup import cap_bucket_size

    exploded = sig.select(
        "id", "vec", F.posexplode("bucket").alias("table", "bucket")
    )
    # guard the quadratic within-bucket self-join against pathological
    # mass-duplicate buckets (same rationale as minhash_lsh_pairs — the
    # members of an over-cap bucket are outright dups, caught exactly)
    exploded = cap_bucket_size(exploded, ["table", "bucket"], max_bucket_size)
    a = exploded.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("vec_a"),
        "table",
        "bucket",
    )
    b = exploded.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vec_b"),
        "table",
        "bucket",
    )
    cand = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = F.expr(DOT_EXPR.format(a="vec_a", b="vec_b"))
    na = F.expr(NORM_EXPR.format(a="vec_a"))
    nb = F.expr(NORM_EXPR.format(a="vec_b"))
    return (
        cand.select("id_a", "id_b", (dot / (na * nb)).alias("sim_raw"))
        .where(F.col("sim_raw") >= threshold)
        .select("id_a", "id_b", F.round("sim_raw", 4).alias("sim"))
    )


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    bits: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Sign-bit LSH bucket ids for ``n_tables`` independent hash tables
    (array<int>, one bucket per table) — deterministic across
    runs/executors (seeded numpy hyperplanes, Arrow batches). Multiple
    tables are the standard recall lever: a true neighbor only needs to
    collide in ONE table."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    planes = np.random.RandomState(seed).randn(n_tables, bits, dim)

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets_of(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        mat = np.stack(vecs.to_numpy())  # (n, dim)
        weights = (1 << np.arange(bits)).astype(np.int32)
        outs = []
        for t in range(n_tables):
            signs = (mat @ planes[t].T) > 0  # (n, bits)
            outs.append(signs.dot(weights).astype(np.int32))
        stacked = np.stack(outs, axis=1)  # (n, n_tables)
        return pd.Series(list(stacked))

    return df.withColumn(out, buckets_of(vec_col))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int = 64,
    n_tables: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = same bucket in ANY table (plus
    1-bit-flip probes on the query side), exact cosine re-rank of
    candidates only. Scale shape: one shuffle on (table, bucket); scan
    fraction ~ n_tables * (1 + bits*multiprobe) / 2^bits of the corpus."""
    c = with_lsh_buckets(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")),
        "n_vec", bits, dim, n_tables,
    ).select(
        "n_id", "n_vec", F.posexplode("bucket").alias("table", "bucket")
    )
    q = with_lsh_buckets(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", bits, dim, n_tables,
    ).select(
        "q_id", "q_vec", F.posexplode("bucket").alias("table", "bucket")
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
        )
        q = q.select(
            "q_id", "q_vec", "table", F.explode(probes).alias("bucket")
        )
    cand = c.join(q, ["table", "bucket"]).where(F.col("q_id") != F.col("n_id"))
    dot = F.expr(DOT_EXPR.format(a="q_vec", b="n_vec"))
    nq = F.expr(NORM_EXPR.format(a="q_vec"))
    nc = F.expr(NORM_EXPR.format(a="n_vec"))
    scored = cand.select(
        "q_id", "n_id", (dot / (nq * nc)).alias("sim_raw")
    ).dropDuplicates(["q_id", "n_id"])
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("sim_raw").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("sim_raw", 4).alias("sim"), "rank")
    )


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization — the storage/transfer-compression
    step ANN indexes run before sharding (4x smaller than float32,
    recall loss ~0 for cosine ranking).

    Per vector: ``scale = max(|v_i|)``; ``q_i = round(127 * v_i /
    scale)`` (half away from zero — Spark ROUND and ANSI SQL agree).
    Zero vectors quantize to zeros with scale 0. Pure Column
    expressions, zero shuffle, runs inside whole-stage codegen.
    """
    scale = F.expr(
        f"array_max(transform({vec_col}, x -> abs(cast(x as double))))"
    )
    qvec = F.expr(
        f"""
        CASE WHEN array_max(transform({vec_col},
                            x -> abs(cast(x as double)))) = 0.0
             THEN transform({vec_col}, x -> 0)
        ELSE transform({vec_col},
               x -> cast(round(127.0 * cast(x as double)
                    / array_max(transform({vec_col},
                                x -> abs(cast(x as double))))) as int))
        END
        """
    )
    return df.withColumn("q_scale", scale).withColumn("qvec", qvec)
