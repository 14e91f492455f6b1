"""Corpus-level n-gram analysis: decontamination, cross-document
duplicated-text fraction, within-document repetition signals.

Training-data hygiene operators a 100 TB pipeline runs corpus-wide
(reference has no equivalent — engine extensions alongside
functions/dedup.py, same SURVEY M6 surface):

- ``ngram_decontaminate`` — flag training documents sharing any word
  n-gram with an evaluation/benchmark set (the standard 8-to-13-gram
  test-set-overlap scrub, done here at a parameterized ``n``).
- ``dup_ngram_fraction`` — per-document fraction of its distinct
  n-grams that also occur in at least one OTHER document (the
  cross-doc repetition signal used for boilerplate detection).
- ``repetition_signals`` — within-document Gopher-style repetition:
  duplicate-word fraction and the character fraction covered by the
  most frequent word 2-gram.

Scale posture: decontamination broadcasts the eval-set gram list
(benchmark suites are tiny next to the corpus — thousands of docs →
at most a few million grams), so the corpus side is a map-side
broadcast semi-join with zero corpus shuffle. ``dup_ngram_fraction``
is explode → hash-aggregate on the gram (map-side combine) → hash join
back — two gram-keyed shuffles, both linear in corpus gram count, no
all-pairs anywhere. ``repetition_signals`` shuffles (doc, gram) once
with map-side combine; its window partitions by document, never
globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hudi_spark_plus_spark.functions.dedup import word_shingles


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Per training document: how many of its distinct word ``n``-grams
    appear anywhere in ``eval_df``, and the keep/drop verdict.

    Returns (id, n_hit_grams, contaminated) for every training row —
    including clean ones, so the output is a complete decision table.
    """
    eval_grams = (
        eval_df.select(
            F.explode(word_shingles(text_col, n)).alias("gram")
        ).distinct()
    )
    hits = (
        train.select(
            F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
        )
        .join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))  # grams distinct per doc
    )
    return train.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
        (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
    )


def dup_ngram_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per document: fraction of its distinct word ``n``-grams that occur
    in >= 2 documents corpus-wide. Returns (id, n_grams, n_dup_grams,
    dup_frac)."""
    grams = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    )
    # grams are distinct within a doc, so count(*) = document frequency
    shared = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("df_cnt"))
        .where(F.col("df_cnt") >= 2)
        .select("gram")
    )
    per_doc = (
        grams.join(shared, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_grams"))
    )
    totals = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        F.round(
            F.coalesce("n_dup_grams", F.lit(0))
            / F.col("n_grams").cast("double"),
            4,
        ).alias("dup_frac"),
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Within-document repetition (Gopher repetition filters):

    - ``dup_word_frac`` — 1 - distinct_words/words (zero-shuffle array
      expression)
    - ``top_2gram`` / ``top_2gram_cnt`` / ``top_2gram_char_frac`` — the
      most frequent word 2-gram (ties broken lexicographically) and the
      character fraction its occurrences cover

    Returns one row per input document.
    """
    # tokenize ONCE into a column; 2-grams via zip_with over two shifted
    # slices (no per-index lambda re-slicing — measurably faster than a
    # transform(sequence...) formulation)
    base = df.select(
        F.col(id_col),
        F.length(text_col).alias("_chars"),
        F.expr(f"split(trim({text_col}), '\\\\s+')").alias("_t"),
    )
    stats = base.select(
        id_col,
        "_chars",
        F.round(
            1
            - F.expr("size(array_distinct(_t))")
            / F.expr("size(_t)").cast("double"),
            4,
        ).alias("dup_word_frac"),
    )
    # the exploded branch carries ONLY (id, gram) — narrow shuffle rows
    grams = base.select(
        id_col,
        F.explode(
            F.expr(
                """
                CASE WHEN size(_t) < 2 THEN array()
                ELSE zip_with(slice(_t, 1, size(_t) - 1),
                              slice(_t, 2, size(_t) - 1),
                              (a, b) -> concat(a, ' ', b))
                END
                """
            )
        ).alias("gram"),
    )
    counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("gram").alias("top_2gram"),
            F.col("cnt").alias("top_2gram_cnt"),
        )
    )
    return stats.join(top, id_col, "left").select(
        id_col,
        "dup_word_frac",
        F.coalesce("top_2gram", F.lit("")).alias("top_2gram"),
        F.coalesce("top_2gram_cnt", F.lit(0)).alias("top_2gram_cnt"),
        F.coalesce(
            F.round(
                F.col("top_2gram_cnt")
                * F.length("top_2gram")
                / F.col("_chars").cast("double"),
                4,
            ),
            F.lit(0.0),
        ).alias("top_2gram_char_frac"),
    )


def corpus_vocab(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus vocabulary induction: (word, tf, df_cnt) — total term
    frequency and document frequency per lowercased whitespace token.
    One explode + one hash-aggregate (map-side combine); the classic
    first step of tokenizer training. Scales as O(corpus tokens)."""
    words = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("word"),
    ).where(F.col("word") != "")
    return words.groupBy("word").agg(
        F.count("*").alias("tf"),
        F.countDistinct(id_col).alias("df_cnt"),
    )


def distinctive_terms(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 3
) -> DataFrame:
    """Per-document top-k distinctive terms — tf-idf RANKING with a
    float-free order: (term frequency in doc DESC, corpus document
    frequency ASC, term ASC). Monotone in tf-idf for any decreasing idf,
    so the ranking matches tf·idf without computing a transcendental the
    oracle engine might round differently (ln parity between libm
    implementations is not guaranteed at the ULP level).

    Shape: explode → (doc, word) hash-agg → broadcast-join the corpus df
    table is NOT assumed small, so it joins on word (shuffle) → per-doc
    top-k window (partitions by document, never global)."""
    words = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("word"),
    ).where(F.col("word") != "")
    tf = words.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    dfreq = words.groupBy("word").agg(
        F.countDistinct(id_col).alias("df_cnt")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df_cnt"), F.asc("word")
    )
    return (
        tf.join(dfreq, "word")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "rank", "word", "tf", "df_cnt")
    )


def unigram_familiarity_buckets(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """CCNet-shaped corpus quality bucketing with a REAL (if minimal)
    language model: the unigram corpus-frequency familiarity score.

    ``familiarity_milli`` = (1000 * sum of each token's corpus term
    frequency) DIV token count — an exact integer (integer division on
    both engines), monotone in the doc's average unigram probability,
    so it orders documents exactly as a unigram-LM perplexity would
    (without the cross-engine libm log() parity hazard). Documents are
    then bucketed head / middle / tail by the corpus's exact 33rd/66th
    percentile of the score — CCNet's head-middle-tail split, with the
    unigram LM standing in for the Wikipedia LM (the model-quality knob
    a deployment swaps in; the Spark shape is identical).

    Shape: explode -> corpus-tf hash-agg -> join back on the token ->
    per-doc agg; the two percentile thresholds are a 1-row aggregate
    broadcast into the final projection. No driver-side row data.
    """
    words = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
        ).alias("word"),
    ).where(F.col("word") != "")
    tf = words.groupBy("word").agg(F.count("*").alias("tf"))
    per_doc = (
        words.join(tf, "word")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("_s"),
            F.count("*").alias("_n"),
        )
        .select(
            id_col,
            F.expr("1000 * _s div _n").alias("familiarity_milli"),
        )
    )
    cuts = per_doc.agg(
        F.expr("percentile(familiarity_milli, 0.33)").alias("_t1"),
        F.expr("percentile(familiarity_milli, 0.66)").alias("_t2"),
    )
    return per_doc.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "familiarity_milli",
        F.when(F.col("familiarity_milli") < F.col("_t1"), "tail")
        .when(F.col("familiarity_milli") < F.col("_t2"), "middle")
        .otherwise("head")
        .alias("bucket"),
    )
