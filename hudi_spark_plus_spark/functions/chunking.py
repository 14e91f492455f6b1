"""Document chunking for training-data pipelines (SURVEY M6 extension).

Splits each document into fixed-size, fixed-overlap character chunks —
the standard pre-tokenization step before embedding or packing. Pure
Column expressions (`sequence` + `explode` + `substring`), so the whole
transform pipelines inside the parquet scan stage: zero shuffles, zero
Python, and at 100 TB the explode fans out map-side without ever
materializing a document's chunk list off-heap.

Chunk starts are 1, 1+step, 1+2*step, ... while start <= length(text)
(step = size - overlap), so every character is covered and consecutive
chunks share exactly `overlap` characters (the final chunk may be
shorter). Empty/whitespace docs yield one empty chunk — deterministic,
matching the DuckDB oracle's generate_series formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_starts(text: Column, size: int, overlap: int) -> Column:
    """Array of 1-based chunk start offsets for ``text``."""
    step = _step(size, overlap)
    return F.sequence(
        F.lit(1), F.greatest(F.length(text), F.lit(1)), F.lit(step)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    size: int = 200,
    overlap: int = 40,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """One row per (document, chunk): id cols + chunk_id + chunk +
    chunk_len. ``chunk_id`` is derived from the start offset (integer
    DIV), not the explode position, so it is stable under any
    repartitioning."""
    step = _step(size, overlap)
    exploded = df.select(
        *id_cols,
        F.col(text_col).alias("_text"),
        F.explode(chunk_starts(F.col(text_col), size, overlap)).alias("_start"),
    )
    return exploded.select(
        *id_cols,
        F.expr(f"CAST((_start - 1) DIV {step} AS INT)").alias("chunk_id"),
        F.expr(f"substring(_text, _start, {size})").alias("chunk"),
        F.expr(f"length(substring(_text, _start, {size}))").alias("chunk_len"),
    )


def _step(size: int, overlap: int) -> int:
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    return size - overlap
