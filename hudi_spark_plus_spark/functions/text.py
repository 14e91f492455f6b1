"""Text-analysis operators for training-data pipelines (SURVEY M6).

All pure Column expressions — JVM-side, whole-stage-codegen'd, no Python
in the hot path. Each has an exact DuckDB-oracle formulation (see
operators/llm_queries.py), so the semantics are pinned, not vibes.

Design note (100 TB): these are narrow per-row transforms — they pipeline
inside the parquet scan stage with zero shuffles; any aggregation the
caller adds (e.g. language histograms) is the only exchange.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword marker sets — deterministic heuristic
# language ID (the classic n-gram/stopword approach, sized for an exact
# SQL oracle rather than a model dependency).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
}

# BPE-ish token pattern: letter runs, digit runs, or single non-space
# symbols — a cheap proxy for subword tokenizer counts.
BPE_TOKEN_PATTERN = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (regex \\s+, trimmed — no empty tokens)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish token matches (regexp_count, JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-letter/digit/space characters."""
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio_expr(
    text_col: str, lang: str = "en", toks_lower_col: str | None = None
) -> Column:
    """stopword tokens / all tokens, as a SQL expression (lambda-based
    ``filter`` keeps it JVM-side). Pass ``toks_lower_col`` (a precomputed
    ``split(trim(lower(text)), '\\s+')`` column) when evaluating several
    ratios over the same text — tokenizing once instead of per-language
    is a ~5x win on wide scans."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    toks = toks_lower_col or f"split(trim(lower({text_col})), '\\\\s+')"
    return F.expr(
        f"size(filter({toks}, t -> t IN ({words})))"
        f" / CAST(greatest(size({toks}), 1) AS DOUBLE)"
    )


def quality_score_expr(text_col: str, toks_lower_col: str | None = None) -> Column:
    """Composite quality score in [0, 1]: length factor + stopword factor
    - punctuation penalty. Deterministic, oracle-checkable."""
    length_f = F.least(F.length(F.col(text_col)) / F.lit(500.0), F.lit(1.0))
    stop_f = F.least(
        stopword_ratio_expr(text_col, "en", toks_lower_col) * 4, F.lit(1.0)
    )
    punct_p = punct_ratio(F.col(text_col))
    return F.round(
        F.greatest(
            F.least(
                length_f * 0.5 + stop_f * 0.5 - punct_p, F.lit(1.0)
            ),
            F.lit(0.0),
        ),
        4,
    )


def lang_scores(
    text_col: str, toks_lower_col: str | None = None
) -> list[tuple[str, Column]]:
    return [
        (lang, stopword_ratio_expr(text_col, lang, toks_lower_col))
        for lang in STOPWORDS
    ]


def lang_id_expr(text_col: str, toks_lower_col: str | None = None) -> Column:
    """argmax language by stopword ratio; 'und' (undetermined) when no
    stopwords hit; ties broken by language-code order (deterministic)."""
    scores = lang_scores(text_col, toks_lower_col)
    best = None
    best_lang = F.lit("und")
    zero = F.lit(0.0)
    # fold left in fixed language order: strictly-greater keeps earlier
    # languages on ties
    for lang, s in scores:
        if best is None:
            best, best_lang = s, F.when(s > zero, F.lit(lang)).otherwise(F.lit("und"))
        else:
            gt = s > best
            best_lang = F.when(gt & (s > zero), F.lit(lang)).otherwise(best_lang)
            best = F.when(gt, s).otherwise(best)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    space-split tokens — the cheap canonical-form hash used for shuffling
    -resistant dup detection."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(text, " "))), " ")
    )


# -- PII redaction -----------------------------------------------------------
# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): char classes, bounded repetition, \b.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_email_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0)))


def pii_phone_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), F.lit(0)))


def redact_pii(text: Column) -> Column:
    """Replace emails/phone numbers with typed placeholder tokens —
    map-side regexp_replace chain, zero shuffle. Emails first so a
    phone-shaped digit run inside a local-part can't be clipped out of
    an address before the email pattern sees it."""
    return F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
