"""Lexical retrieval over the documents table — BM25 top-k, scored in
deterministic integer milli-units.

BM25 (Robertson/Okapi, k1=1.2, b=0.75) ranks documents for a bag of
query terms by sum over terms of

    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

The float version of that sum is shuffle-order-dependent at the ULP
level and not bit-replayable against a SQL oracle, so every factor here
is quantized to integers ONCE and combined with integer arithmetic
only (the SemDeDup/DSIR stance, DESIGN.md):

* ``idf_milli = floor(1000 * ln((N - df + 0.5) / (df + 0.5) + 1) +
  1e-9)`` — the one transcendental, evaluated per DISTINCT term (not
  per row) on identical rational inputs in both engines and floored to
  milli-units. Neither JVM ``Math.log`` nor DuckDB ``ln`` guarantees
  correctly-rounded results, so when the true scaled value sits within
  an ulp of an integer the two engines could floor to different sides;
  the 1e-9 nudge (applied in BOTH engines) is ~4 orders of magnitude
  wider than the ~1e-13 absolute ulp disagreement and ~5 orders below
  the quantization step, so it absorbs the platform noise without
  changing any honestly-non-boundary value;
* ``avgdl_milli = (1000 * total_tokens) div N`` — corpus average doc
  length in milli-tokens, exact integer division;
* per (doc, term):
  ``den = 10000*tf + 3000 + (9000000*dl) div avgdl_milli``
  (the BM25 denominator scaled by 10^4: 10000*(tf + 0.3 + 0.9*dl/avgdl)
  with k1*(1-b) = 3/10 and k1*b = 9/10 exact rationals), and
  ``term_milli = (idf_milli * 22000 * tf) div den``
  (22000 = 10^4 * (k1+1)/1 * 11/5 / 10 — i.e. the 2.2*tf numerator in
  the same 10^4 scale, emerging in milli-units after the division);
* ``score_milli = sum(term_milli)`` — an integer sum, so partitioning
  and summation order cannot change it.

Magnitudes stay bounded at ANY corpus size (the denominator uses
avgdl_milli, never raw total token counts), so no bigint overflow at
10^12-token corpora: numerator <= idf_milli * 22000 * tf ~ 10^13.

Scale shape: one explode + (doc, term) hash-agg for tf (map-side
partials), an N-terms-row df/idf table broadcast back, a per-doc dl
agg reusing the token exchange, and a TakeOrderedAndProject top-k —
no shuffle keyed on anything wider than the term list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BM25_SCALE_NOTE = "scores in integer milli-units; ties break by doc id"


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` by integer-milli BM25.
    Returns (rank, id, score_milli) — rank 1 = best; ties broken by
    ascending doc id so the ranking is a pure function of the data."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("word"),
    ).where(F.col("word") != "")
    dl = words.groupBy("id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    terms = words.where(F.col("word").isin(query_terms))
    tf = terms.groupBy("id", "word").agg(F.count("*").alias("tf"))
    dfreq = terms.groupBy("word").agg(
        F.countDistinct("id").alias("df_cnt")
    )
    idf = (
        dfreq.crossJoin(F.broadcast(corpus))  # 1-row corpus constants
        .withColumn(
            "idf_milli",
            F.floor(
                1000.0
                * F.log(
                    (F.col("n_docs") - F.col("df_cnt") + 0.5)
                    / (F.col("df_cnt") + 0.5)
                    + 1.0
                )
                + 1e-9  # cross-engine ulp guard — see module docstring
            ).cast("long"),
        )
        .withColumn(
            "avgdl_milli",
            F.expr("1000 * total_tokens div n_docs").cast("long"),
        )
        .select("word", "idf_milli", "avgdl_milli")
    )
    scored = (
        tf.join(F.broadcast(idf), "word")
        .join(dl, "id")
        .withColumn(
            "den",
            F.expr("10000 * tf + 3000 + (9000000 * dl) div avgdl_milli"),
        )
        .withColumn(
            "term_milli", F.expr("(idf_milli * 22000 * tf) div den")
        )
        .groupBy("id")
        .agg(F.sum("term_milli").alias("score_milli"))
    )
    from pyspark.sql.window import Window

    # limit-first: plans as TakeOrderedAndProject (per-partition top-k +
    # driver merge of k rows), never a global sort; the rank window then
    # runs over k rows only
    top = scored.orderBy(F.desc("score_milli"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("score_milli"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "id", "score_milli"
    )
