"""Data selection by hashed importance reweighting — the DSIR recipe
(Xie et al. 2023, arXiv:2302.03169) re-expressed as exact-integer
declarative Spark SQL.

DSIR scores every raw document by how much its hashed n-gram feature
distribution looks like a TARGET corpus relative to the RAW corpus, then
keeps the highest-weight documents. The published formulation uses
log-ratio weights in float; this implementation swaps the per-bucket
log-ratio for a SCALED LINEAR RATIO in integer milli-units, which keeps
the whole pipeline exactly deterministic across engines and
partitionings (float log + nondeterministic summation order would drift
between runs, let alone between Spark and an oracle — the same hazard
class as the repo's integer-cents aggregate rule). Rank order under a
monotone per-bucket transform is not identical to log-space DSIR, but
the selection semantics — up-weight buckets the target over-represents,
integrated over each document's tokens — is the paper's.

Shape at 100 TB: the bucket tables are tiny (n_buckets rows — one
map-side-combined groupBy each over the token stream), broadcast back
onto the per-document token-bucket counts; the only wide shuffle is the
per-document count aggregation, which AQE-coalesces. No Python in the
hot path — md5 bucketing, counting, and the integer score are all JVM
expressions inside whole-stage codegen. The BIGINT ratio numerator
(T_b * R_total * scale) holds to ~10^18, i.e. corpora up to ~10^12
target tokens at the default scale; past that, widen to DECIMAL(38, 0)
at the marked site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tokens -> buckets via the same md5 device as the hashing-trick
#: embedder (functions/embedding.py): first 8 md5 hex chars as an int.
_BUCKET_EXPR = "CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % {b}"


def dsir_scores(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    ratio_scale: int = 1000,
) -> DataFrame:
    """Per-document DSIR importance score (BIGINT, exact).

    * feature: whitespace tokens of ``lower(text)``, hashed into
      ``n_buckets`` buckets (md5 — engine-neutral);
    * bucket weight: ``floor((T_b + 1) * (R + B) * ratio_scale
      / ((R_b + 1) * (T + B)))`` — the add-one-smoothed target/raw
      probability ratio in integer milli-units (B = n_buckets, R/T =
      total raw/target token counts);
    * document score: sum of its tokens' bucket weights — an integer,
      so summation order can never change the result.

    ``is_target`` marks the rows whose token distribution defines the
    target (e.g. ``F.col("lang") == "en"``); raw = ALL rows. Returns
    one row per input row: (id_col, dsir_score).
    """
    toks = df.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("w"),
    ).where(F.col("w") != "")
    b = toks.select(
        id_col,
        "_tgt",
        F.expr(_BUCKET_EXPR.format(b=n_buckets)).alias("bucket"),
    )
    # per-document bucket counts — the one wide shuffle over the token
    # stream. _tgt rides along (constant per document) so BOTH corpus
    # bucket tables derive from THIS aggregate: the expensive
    # tokenize+shuffle subtree is identical across all three consumers
    # and Spark exchange-reuses it instead of re-tokenizing the corpus
    doc_counts = b.groupBy(id_col, "_tgt", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # corpus-level bucket tables: n_buckets rows each, aggregated from
    # the (docs x buckets)-sized counts, not the token stream
    raw = doc_counts.groupBy("bucket").agg(F.sum("cnt").alias("rb"))
    tgt = (
        doc_counts.where(F.col("_tgt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("tb"))
    )
    joined = raw.join(tgt, "bucket", "left").na.fill({"tb": 0})
    totals = joined.agg(
        F.sum("rb").cast("long").alias("rtot"),
        F.sum("tb").cast("long").alias("ttot"),
    )
    weights = (
        # 1-row broadcast crossJoin (the repo's standing totals idiom —
        # no single-partition window, nothing on the driver)
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            # BIGINT throughout: exact in Spark and DuckDB alike; widen
            # to DECIMAL(38,0) here for corpora past ~10^12 target
            # tokens at the default scale
            F.expr(
                f"CAST(((tb + 1) * (rtot + {n_buckets}) * {ratio_scale})"
                f" DIV ((rb + 1) * (ttot + {n_buckets})) AS BIGINT)"
            ).alias("w_milli"),
        )
    )
    scored = (
        doc_counts.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("w_milli"))
            .cast("long")
            .alias("dsir_score"),
        )
    )
    # empty/whitespace-only documents have no tokens: score 0, kept in
    # the output so selection downstream sees every input id
    ids = df.select(id_col).distinct()
    return ids.join(scored, id_col, "left").na.fill(
        {"n_tokens": 0, "dsir_score": 0}
    )


def dsir_select(
    df: DataFrame,
    is_target: Column,
    top_n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """The selection step: top ``top_n`` documents by per-token
    importance (``(dsir_score * 1000) DIV n_tokens`` — the exact-integer
    milli-average, so long documents don't win on length alone), ties
    broken by id. Deterministic total order; Spark plans the top-n as
    TakeOrderedAndProject (no full sort materializes)."""
    s = dsir_scores(df, is_target, id_col, text_col, n_buckets)
    return (
        s.withColumn(
            "per_token_milli",
            F.expr("CAST((dsir_score * 1000) DIV n_tokens AS BIGINT)"),
        )
        .where(F.col("n_tokens") > 0)
        .orderBy(F.col("per_token_milli").desc(), F.col(id_col))
        .limit(top_n)
    )
