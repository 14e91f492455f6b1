"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's streaming surface is stateless across batches (SURVEY
§2.5: within-batch LWW dedup, N9, then merge-time `_ts` conflict
resolution, H1). These engine extensions add *cross-batch* state the
reference cannot express:

- ``stateful_dedup_stream`` — emit each key's first-seen row exactly
  once for the lifetime of the stream (training-data dedup at ingest:
  a document seen in batch 7 is suppressed in every later batch).
- ``stateful_running_agg_stream`` — per-key running count/sum emitted
  every batch the key appears in (continuous per-source quality
  counters).

Scale posture (100 TB): state lives in Spark's state store, hash
-partitioned by the grouping key across ``spark.sql.shuffle.partitions``
tasks — it scales horizontally and never concentrates on one executor.
Arrow moves each group's rows to Python in batches. For unbounded key
domains, pass ``timeout_ms`` so idle keys are evicted (processing-time
timeout); key on a fingerprint/md5 (functions/text.py) rather than raw
text so state rows stay ~tens of bytes. For very large state, deploy
with the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) — a runtime conf,
no engine change needed.
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_SEEN_STATE = StructType([StructField("seen", LongType())])


def stateful_dedup_stream(
    df: DataFrame,
    key_col: str,
    order_cols: tuple,
    timeout_ms: int = 0,
) -> DataFrame:
    """First-seen dedup across micro-batches.

    For each ``key_col`` value, emits exactly one row — the first row by
    ``order_cols`` (must be a deterministic total order within a batch's
    group, e.g. ``("ts", "event_id")``) of the first micro-batch in
    which the key appears. Later batches emit nothing for that key.

    ``timeout_ms > 0`` evicts a key's state after that much processing
    time without new data — the key would then be re-emitted if seen
    again, trading exactness for bounded state (the standard windowed
    -dedup compromise; leave 0 for exact dedup).
    """
    out_schema = df.schema
    order = list(order_cols)
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdfs, state):
        if timeout_ms > 0 and state.hasTimedOut:
            state.remove()
            return
            yield  # pragma: no cover — makes fn a generator on this path
        chunks = [c for c in pdfs if len(c)]
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame()
        )
        fresh = not state.exists
        if fresh:
            state.update((1,))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        if fresh and len(batch):
            yield batch.sort_values(order, kind="mergesort").head(1)

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, _SEEN_STATE, "append", timeout_conf
    )


def stateful_running_agg_stream(
    df: DataFrame, key_col: str, val_col: str, scale: int = 6
) -> DataFrame:
    """Per-key running aggregate: each batch where a key has rows emits
    one update row ``(key, batch_rows, total_rows, total_sum,
    total_sum_scaled)`` with the lifetime-running totals. State is two
    scalars per key.

    The sum is accumulated in FIXED POINT: each value is rounded
    (half-to-even, matching IEEE/numpy) to ``scale`` decimals and summed
    as a 64-bit integer (``total_sum_scaled = sum * 10**scale``);
    ``total_sum`` is the derived double. A floating accumulator's result
    depends on summation order — across micro-batch boundaries, state
    restarts, and shuffle nondeterminism that drifts by ULPs and makes
    running totals irreproducible. Integer accumulation is associative
    and exact (headroom: ~9.2e18 / 10^6 ≈ 9.2e12 in value units at the
    default scale), so a restarted or re-sharded stream reproduces
    byte-identical totals. Cost: values are quantized to ``scale``
    decimals at ingest — raise ``scale`` if the domain needs more.
    """
    factor = 10**scale
    out_schema = StructType(
        [
            df.schema[key_col],
            StructField("batch_rows", LongType()),
            StructField("total_rows", LongType()),
            StructField("total_sum", DoubleType()),
            StructField("total_sum_scaled", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("total_rows", LongType()),
            StructField("total_sum_scaled", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        chunks = [c for c in pdfs if len(c)]
        rows = sum(len(c) for c in chunks)
        if rows == 0:
            return
            yield  # pragma: no cover
        batch = (
            chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        )
        # per-row half-even rounding on the double product, then exact
        # int64 summation — order-independent by construction
        s = int((batch[val_col] * factor).round().astype("int64").sum())
        tot_rows, tot_scaled = state.get if state.exists else (0, 0)
        tot_rows += rows
        tot_scaled += s
        state.update((tot_rows, tot_scaled))
        yield pd.DataFrame(
            [[key[0], rows, tot_rows, tot_scaled / factor, tot_scaled]],
            columns=[
                key_col,
                "batch_rows",
                "total_rows",
                "total_sum",
                "total_sum_scaled",
            ],
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
