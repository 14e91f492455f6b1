"""Training-sequence packing (SURVEY M6): assign documents/chunks to
fixed-capacity token sequences by concatenation order — the "concat then
slice into context-length windows" construction LLM training pipelines
use between tokenization and batch assembly.

Each item (document or chunk) gets the running token OFFSET of its shard,
and its sequence id is ``offset div capacity`` — items may straddle a
sequence boundary, exactly like document text straddles context windows
in concat-and-chunk training data. All integer arithmetic: exact,
engine-neutral, oracle-checkable.

100 TB shape: a single global running sum would funnel the corpus
through one task (the Z-order mistake this engine already fixed once) —
so packing is SHARDED: the window partitions by a caller-chosen shard
key and packs within each shard independently. Sequences never cross
shards; with ~thousands of shards the construction is embarrassingly
parallel and each task holds one shard's items. The only exchange is
the window's hash partition on the shard key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_col: str | Column,
    capacity: int,
    shard_col: str | Column,
    order_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Add ``seq_id`` / ``seq_off`` / ``shard`` columns.

    ``seq_id`` is the (shard-local) index of the fixed-``capacity``
    token sequence in which this item STARTS; ``seq_off`` its token
    offset within that sequence. ``order_cols`` must be a deterministic
    total order within a shard (e.g. the doc id).

    ``shard``, ``seq_id`` and ``seq_off`` are RESERVED output names:
    an input already carrying one would be silently replaced by
    ``withColumn``, so collisions raise instead."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    reserved = {"shard", "seq_id", "seq_off"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input already has reserved pack_sequences column(s) "
            f"{sorted(reserved)}; rename them before packing"
        )
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_col = "_pack_start_7c1e"  # private temp, collision-proof
    start = (F.sum(tok).over(w) - tok).cast("long")
    return (
        out.withColumn(start_col, start)
        .withColumn("seq_id", F.expr(f"{start_col} div {capacity}"))
        .withColumn("seq_off", F.col(start_col) % capacity)
        .drop(start_col)
    )
