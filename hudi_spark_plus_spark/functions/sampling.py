"""Deterministic sampling for training-data curation (SURVEY M6).

Both operators decide membership from the md5 of a salted record key —
never from ``rand()`` or partition order — so the selection is stable
across runs, engines, partitionings, and cluster sizes: re-running a
100 TB curation job selects byte-identically the same documents, and a
DuckDB oracle can recompute the exact same choice.

* ``stratified_sample`` — per-stratum keep rates (the corpus-rebalancing
  step: e.g. downsample the dominant language while keeping the tail).
  Thresholds are precomputed hex-prefix cutoffs, so the filter is one
  whole-stage-codegen'd CASE over the scan — zero shuffles, fully
  pushdown-friendly.
* ``hash_fraction_keep`` — the underlying primitive: keep a record iff
  the first 4 hex chars of ``md5(salt:key)`` fall below the rate's
  cutoff (16-bit resolution, ±1/65536 of exactness per stratum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_hash_prefix(key: Column, salt: str, nchars: int = 4) -> Column:
    """First ``nchars`` hex chars of ``md5(salt:key)`` — THE deterministic
    selection primitive shared by sampling and the train/val/test split
    (one definition, so the key-encoding convention cannot drift)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, nchars
    )


def _hash4(key: Column, salt: str) -> Column:
    return salted_hash_prefix(key, salt, 4)


def _cutoff(rate: float) -> str:
    """Lowercase hex cutoff such that P(hash4 < cutoff) ~= rate."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(int(rate * 65536), "04x")


def hash_fraction_keep(key: Column, rate: float, salt: str = "sample") -> Column:
    """Boolean keep-column selecting ~``rate`` of records, deterministic
    in the key (16-bit hash resolution)."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    return _hash4(key, salt) < _cutoff(rate)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    salt: str = "sample",
    default_rate: float = 1.0,
) -> DataFrame:
    """Filter to a deterministic per-stratum sample.

    ``rates`` maps stratum value -> keep rate; unlisted strata use
    ``default_rate``. Selection is per record key, so adding or removing
    OTHER records never changes a record's fate (stable under
    incremental corpus growth)."""
    h = _hash4(F.col(key_col), salt)

    def keep_for(rate: float) -> Column:
        if rate >= 1.0:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return h < _cutoff(rate)

    keep = keep_for(default_rate)
    for stratum, rate in sorted(rates.items()):
        keep = F.when(F.col(strata_col) == stratum, keep_for(rate)).otherwise(
            keep
        )
    return df.where(keep)


def token_budget_mixture(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    budgets: dict[str, int],
    key_col: str,
    salt: str = "mixture",
) -> DataFrame:
    """Data-mixture curation by TOKEN budget (domain reweighting): for
    each stratum with a budget, keep a deterministic hash-fraction of
    documents ~= budget_tokens / total_tokens, so the surviving token
    mass approximates the requested mixture; unlisted strata pass
    through whole. Two passes: one bounded aggregate (one row per
    stratum — sources number in the dozens, never data-scaled) to learn
    totals, then the zero-shuffle hash filter. Selection is per record
    key: growing the corpus never flips an existing record's fate
    within the same totals."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(strata_col)
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    rates = {
        s: min(1.0, float(b) / float(totals[s]))
        for s, b in budgets.items()
        if s in totals and totals[s]
    }
    return stratified_sample(df, strata_col, rates, key_col, salt=salt)


def epoch_shuffle(
    df: DataFrame, key_col: str, seed: str, n_shards: int = 16
) -> DataFrame:
    """Deterministic epoch reshuffle for training-data loading: every
    record gets a seed-salted md5 ``sort_key`` and a ``shard`` (first
    hash byte mod ``n_shards``). Readers stream shards in shard order,
    each shard sorted by ``sort_key`` — a different permutation per
    seed, reproducible across runs and engines, with NO global
    row_number (a global rank would funnel the corpus through one
    partition; shard + within-shard sort is the distributed-safe
    equivalent, and the uniform hash balances shard sizes)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % n_shards
    )
    return df.withColumn("sort_key", h).withColumn("shard", shard)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_cols: list[str],
) -> DataFrame:
    """Keep at most ``n`` records per group (domain/source caps — the
    standard crawl-curation guard against a handful of domains dominating
    the corpus). Selection is the FIRST ``n`` by ``order_cols`` — a
    deterministic total order (e.g. a quality score with the doc id as
    tiebreak), never partition order.

    Scale shape: one hash-partitioned window shuffle on the group key;
    rank + filter happen within each group's partition, no global sort.
    Skewed groups (one domain with 10^8 docs) are exactly the rows this
    operator discards, and Spark's rank-based window short-circuits
    nothing — for pathological skew pre-filter with a per-group count
    and only window the groups above the cap (same pattern as the LSH
    bucket cap)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
