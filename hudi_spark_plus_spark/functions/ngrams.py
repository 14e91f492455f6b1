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


def substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 40,
    stride: int = 20,
) -> DataFrame:
    """Character-window substring dedup — the practical approximation of
    exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499):
    slide a ``window``-char window at ``stride`` over every document,
    find windows whose text occurs at >= 2 sites corpus-wide, keep the
    FIRST occurrence (by (id, pos) — the canonical survivor, as the
    paper keeps one copy) and remove every other occurrence's span from
    its document. Overlapping/adjacent removed spans merge before
    excision, so the surviving text is the complement of their union.

    Returns one row per input document:
    (id, n_windows, dup_windows, removed_chars, clean_len, clean_md5) —
    the cleaned text itself is reduced to length + md5 so the result
    stays hash-comparable at any document size.

    Scale shape — a SINGLE chain, no recomputed subtrees (Spark does not
    dedupe common subplans, so every branch point would re-run the wide
    shuffle): ``n_windows`` is the closed form ``(len - W) div S + 1``
    (no data pass), the one content-keyed shuffle is the window-text
    group (the paper's suffix-array step re-expressed as a group-by; at
    very large corpora group on ``xxhash64(window)`` instead — same
    spans, 1/5th the shuffle width, collision odds ~n^2/2^64), span
    merging + per-island counts ride one doc-id-partitioned window
    pass, and the cleaned text is rebuilt by a codegen ``aggregate``
    lambda over each doc's sorted island array — no further shuffle.
    Every step is whole-stage-codegen Spark SQL, no UDFs, and the whole
    pipeline replays in ANSI SQL (the oracle's gaps-and-islands form —
    same semantics, engine-appropriate shape).
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    )
    wins = (
        base.where(F.length("txt") >= window)
        .select(
            "id",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.length("txt") - window + 1,
                    F.lit(stride),
                )
            ).alias("pos"),
            F.col("txt"),
        )
        .select(
            "id", "pos", F.expr(f"substring(txt, pos, {window})").alias("sub")
        )
    )
    w_sub = Window.partitionBy("sub")
    dup = (
        wins.withColumn("cnt", F.count("*").over(w_sub))
        .withColumn("rn", F.row_number().over(w_sub.orderBy("id", "pos")))
        .where((F.col("cnt") >= 2) & (F.col("rn") >= 2))
        .select(
            "id",
            F.col("pos").alias("s"),
            (F.col("pos") + window - 1).alias("e"),
        )
    )
    w_id = Window.partitionBy("id").orderBy("s")
    islands = (
        dup.withColumn(
            "pme",
            F.max("e").over(
                w_id.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "isl",
            F.sum(
                F.when(
                    F.col("pme").isNull() | (F.col("s") > F.col("pme")), 1
                ).otherwise(0)
            ).over(w_id.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("id", "isl")
        .agg(
            F.min("s").alias("s"),
            F.max("e").alias("e"),
            F.count("*").alias("n_in_isl"),
        )
    )
    # one row per doc WITH dups: sorted island array + the two counters
    # (groupBy(id) reuses the id partitioning of the window pass above)
    per_doc = islands.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("isl_arr"),
        F.sum("n_in_isl").alias("dup_windows"),
        F.sum(F.col("e") - F.col("s") + 1).alias("removed_chars"),
    )
    # rebuild the cleaned text as the complement of the island union —
    # a codegen fold over the (few) islands of each doc, no shuffle
    clean_expr = F.expr(
        "aggregate(isl_arr, "
        "struct(cast(1 as int) as cur, cast('' as string) as acc), "
        "(st, x) -> struct(cast(x.e + 1 as int) as cur, "
        "concat(st.acc, substring(txt, st.cur, x.s - st.cur)) as acc), "
        "st -> concat(st.acc, "
        "substring(txt, st.cur, length(txt) - st.cur + 1)))"
    )
    n_windows = F.when(
        F.length("txt") >= window,
        F.expr(f"(length(txt) - {window}) div {stride} + 1").cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return base.join(per_doc, "id", "left").select(
        "id",
        n_windows.alias("n_windows"),
        F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
        F.coalesce("removed_chars", F.lit(0)).alias("removed_chars"),
        F.length(
            F.when(F.col("isl_arr").isNotNull(), clean_expr).otherwise(
                F.col("txt")
            )
        ).alias("clean_len"),
        F.md5(
            F.when(F.col("isl_arr").isNotNull(), clean_expr).otherwise(
                F.col("txt")
            )
        ).alias("clean_md5"),
    )
