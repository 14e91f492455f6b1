"""Feature-hashing text embedder — the hashing-trick baseline, as PURE
declarative Spark SQL (no UDF in the hot path).

A 100 TB pipeline often needs a cheap, deterministic text vectorizer
before the real (model-based) embedder exists: near-dup candidate
mining, clustering seeds, drift monitors. The hashing trick (Weinberger
et al., feature hashing) is the classic answer: each token hashes to a
dimension index and a ±1 sign; a document's vector is the L2-normalized
signed bag. Everything here is built from JVM expressions — md5 +
explode + two hash-aggregates — so it runs inside whole-stage codegen,
shuffles only (id, dim_idx, ±1) longs, and is bit-reproducible across
engines (the DuckDB oracle recomputes it exactly; no model weights, no
Python in the loop).

The real-model embedder slot stays what it is everywhere else in this
repo: embeddings.parquet as an opaque ``array<float>`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_embed_components(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """Sparse components of the hashed embedding: one row per (id,
    dim_idx) with the L2-normalized value (ROUND 4). Token -> dimension
    via the first 8 hex chars of md5, sign via the parity of the next
    byte — both exactly reproducible in ANSI-ish SQL."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("w"),
    ).where(F.col("w") != "")
    hashed = toks.select(
        id_col,
        (
            F.expr("CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)")
            % dim
        ).alias("dim_idx"),
        F.when(
            F.expr("CAST(conv(substring(md5(w), 9, 2), 16, 10) AS BIGINT)")
            % 2
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("s"),
    )
    comp = hashed.groupBy(id_col, "dim_idx").agg(
        F.sum("s").cast("long").alias("acc")
    )
    norm = comp.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("acc") * F.col("acc")).cast("double")).alias(
            "_norm"
        )
    )
    return (
        comp.join(norm, id_col)
        .where(F.col("_norm") > 0)
        .select(
            id_col,
            "dim_idx",
            F.round(F.col("acc") / F.col("_norm"), 4).alias("val"),
        )
    )


def hash_embed(
    df: DataFrame, id_col: str, text_col: str, dim: int = 64
) -> DataFrame:
    """Dense ``array<float>`` hashed embedding per document — the drop-in
    input for the similarity/ANN operators (cosine_topk, lsh_ann_topk,
    lsh_neardup_pairs). Identical texts embed identically (exact), so
    the planted-duplicate correctness constructions apply unchanged."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("w"),
    ).where(F.col("w") != "")
    hashed = toks.select(
        id_col,
        (
            F.expr("CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)")
            % dim
        ).alias("dim_idx"),
        F.when(
            F.expr("CAST(conv(substring(md5(w), 9, 2), 16, 10) AS BIGINT)")
            % 2
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("s"),
    )
    comp = hashed.groupBy(id_col, "dim_idx").agg(
        F.sum("s").cast("double").alias("acc")
    )
    dense = comp.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("dim_idx", "acc"))
        ).alias("_m")
    )
    # zero-norm guard (mirrors hash_embed_components): a doc whose signed
    # sums all cancel would divide 0/0 -> NaN array; emit zeros instead
    return dense.select(
        id_col,
        F.expr(
            f"""
            CASE WHEN aggregate(map_values(_m), CAST(0.0 AS DOUBLE),
                               (a, x) -> a + x * x) > 0
            THEN transform(sequence(0, {dim - 1}), i -> CAST(
              coalesce(_m[CAST(i AS BIGINT)], CAST(0.0 AS DOUBLE))
              / sqrt(aggregate(map_values(_m), CAST(0.0 AS DOUBLE),
                               (a, x) -> a + x * x))
              AS FLOAT))
            ELSE transform(sequence(0, {dim - 1}), i -> CAST(0.0 AS FLOAT))
            END
            """
        ).alias("embedding"),
    )
