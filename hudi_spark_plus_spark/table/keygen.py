"""Record-key generation strategies (SURVEY N8, H4).

The reference derives the record key itself, independent of the configured
Hudi keygen class: ``md5("{db}_{table}_{v1}_..._{vn}")`` joining the
configured key columns with ``_`` (BinlogSyncHoodieCommand.scala:251-259,
Md5Util.scala:6-12). We reproduce that recipe as the default ("composite")
and map the Hudi keygen class names the reference's README documents onto
it; "simple" (raw single column, no hash) is an engine extension for
tables whose key is already a compact unique string.

Null key-column values render as the string "null" (string interpolation
of a Java null in the reference) — ``concat_ws`` would silently drop
nulls, so each column is coalesced explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KEY_COL = "_key"
TS_COL = "_ts"
OP_COL = "_op"
BUCKET_COL = "_bucket"
PARTITION_COL = "_part"
META_COLS = (KEY_COL, TS_COL, OP_COL, BUCKET_COL, PARTITION_COL)


def _null_safe_str(field: str) -> Column:
    return F.coalesce(F.col(field).cast("string"), F.lit("null"))


def composite_key(db: str, table: str, key_fields: list[str]) -> Column:
    """The reference's md5 recipe — uniform 32-hex-char keys (hash-bucket
    friendly: key-space is uniform, so bucket skew is impossible)."""
    return F.md5(
        F.concat_ws(
            "_", F.lit(db), F.lit(table), *[_null_safe_str(f) for f in key_fields]
        )
    )


def simple_key(db: str, table: str, key_fields: list[str]) -> Column:
    if len(key_fields) != 1:
        raise ValueError("simple keygen requires exactly one key field")
    return _null_safe_str(key_fields[0])


_REGISTRY = {
    "composite": composite_key,
    "simple": simple_key,
    # Hudi class names from the reference's documented API (README.md:59,65)
    "org.apache.hudi.keygen.NonpartitionedKeyGenerator": composite_key,
    "org.apache.hudi.keygen.SimpleKeyGenerator": composite_key,
    "org.apache.hudi.keygen.ComplexKeyGenerator": composite_key,
}


def record_key_expr(
    db: str, table: str, key_fields: list[str], keygenerator: str = "composite"
) -> Column:
    """Resolve a keygen by registry name, Hudi class name, or a
    ``"module:function"`` plugin spec (K9 — the reference loads keygens
    reflectively by FQCN; our spec form is the importlib equivalent)."""
    fn = _REGISTRY.get(keygenerator)
    if fn is None and ":" in keygenerator:
        from hudi_spark_plus_spark.plans.plugins import load_object

        fn = load_object(keygenerator)
    return (fn or composite_key)(db, table, key_fields)


# Day-or-coarser date patterns only for the epoch transforms: rendering
# goes through tz-free DATE arithmetic (UTC day index), so a pattern
# with time-of-day fields would silently render 00:00 — reject it.
_EPOCH_FMT_CHARS = set("yMd-/.")
_US_PER_DAY = 86_400_000_000
_MS_PER_DAY = 86_400_000


def _epoch_day_date(col: Column, per_day: int) -> Column:
    """UTC calendar date of an integer epoch value — exact integer
    arithmetic (floor division via pmod, correct for pre-1970 too), then
    DATE rendering, which is time-zone free. Deliberately NOT
    ``timestamp_seconds``/``cast(timestamp)``: those render through the
    session time zone, and a partition value that shifts with session
    config would split one logical day across two directories."""
    v = col.cast("long")
    # decimal division keeps the quotient exact over the FULL long
    # range: `/` on longs is double division, whose 2^53 mantissa would
    # mis-bucket epochmicros values past ~year 2255 into an adjacent
    # day; the numerator is an exact multiple of per_day, so the
    # decimal quotient is integral by construction
    day = (
        (v - F.pmod(v, F.lit(per_day))).cast("decimal(38,0)")
        / F.lit(per_day)
    ).cast("int")
    return F.date_add(F.to_date(F.lit("1970-01-01")), day)


def _partition_part(spec: str) -> Column:
    """One partition-path component from a ``col[:transform[:fmt]]``
    spec (Hudi CustomKeyGenerator's ``field:type`` grammar,
    ``hoodie.datasource.write.partitionpath.field``; the timestamp
    transform is the TimestampBasedKeyGenerator analogue):

    - ``col`` — raw null-safe string render (dates/strings as-is);
    - ``col:timestamp[:fmt]`` — ``date_format(col, fmt)`` for
      timestamp/date columns, fmt default ``yyyy-MM-dd`` (plain
      TIMESTAMP renders through the session time zone — engine sessions
      pin UTC; DATE/TIMESTAMP_NTZ render tz-free);
    - ``col:epochmillis[:fmt]`` / ``col:epochmicros[:fmt]`` — UTC day
      from an integer epoch column via exact tz-free arithmetic; fmt
      must be day-or-coarser (``yyyy-MM-dd``, ``yyyy/MM``, ...)."""
    parts = spec.split(":", 2)
    col, transform = parts[0], (parts[1] if len(parts) > 1 else None)
    fmt = parts[2] if len(parts) > 2 else "yyyy-MM-dd"
    if transform is None:
        return F.coalesce(F.col(col).cast("string"), F.lit("default"))
    if transform == "timestamp":
        rendered = F.date_format(F.col(col), fmt)
    elif transform in ("epochmillis", "epochmicros"):
        bad = set(fmt) - _EPOCH_FMT_CHARS
        if bad:
            raise ValueError(
                f"partition spec {spec!r}: epoch transforms render via "
                f"tz-free day arithmetic; format must be day-or-coarser "
                f"(offending chars: {sorted(bad)})"
            )
        per_day = _MS_PER_DAY if transform == "epochmillis" else _US_PER_DAY
        rendered = F.date_format(_epoch_day_date(F.col(col), per_day), fmt)
    else:
        raise ValueError(
            f"unknown partition-path transform {transform!r} in spec "
            f"{spec!r}; supported: timestamp, epochmillis, epochmicros"
        )
    return F.coalesce(rendered, F.lit("default"))


def partition_path_expr(fields: list[str]) -> Column:
    """Partition-path rendering — the OTHER half of Hudi's Simple/Complex
    key generators (paired with ``record_key_expr``, H4): each configured
    partition component is string-rendered null-safely (nulls take Hudi's
    "default" partition name) and multi-field paths join with "/"
    (ComplexKeyGenerator's nested layout; the slash is directory-escaped
    by the writer and unescaped when manifests are built). Components are
    ``col[:transform[:fmt]]`` specs (see ``_partition_part``); plain
    dates and strings render as themselves — partition values compare as
    strings for range pruning, so pick render formats that sort
    chronologically (the defaults do)."""
    parts = [_partition_part(f) for f in fields]
    return parts[0] if len(parts) == 1 else F.concat_ws("/", *parts)


def partition_source_cols(fields: list[str]) -> list[str]:
    """Payload column names a partition-path spec list reads — what a
    batch must carry, and what schema evolution must refuse to touch."""
    return [f.split(":", 1)[0] for f in fields]


def validate_partition_specs(fields: list[str]) -> None:
    """Pure-string spec validation, for failing fast at table
    construction instead of at the first write (a bad spec is caller
    error, not data error)."""
    for spec in fields:
        parts = spec.split(":", 2)
        if not parts[0]:
            raise ValueError(f"partition spec {spec!r}: empty column name")
        if len(parts) == 1:
            continue
        transform = parts[1]
        fmt = parts[2] if len(parts) > 2 else "yyyy-MM-dd"
        if transform == "timestamp":
            continue
        if transform in ("epochmillis", "epochmicros"):
            bad = set(fmt) - _EPOCH_FMT_CHARS
            if bad:
                raise ValueError(
                    f"partition spec {spec!r}: epoch transforms render "
                    f"via tz-free day arithmetic; format must be "
                    f"day-or-coarser (offending chars: {sorted(bad)})"
                )
            continue
        raise ValueError(
            f"unknown partition-path transform {transform!r} in spec "
            f"{spec!r}; supported: timestamp, epochmillis, epochmicros"
        )


def bucket_expr(key: Column, buckets: int) -> Column:
    """Deterministic key -> bucket assignment; derivable from _key alone,
    so bucket ids never need to be stored in data files."""
    return F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int")
