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


def partition_path_expr(fields: list[str]) -> Column:
    """Partition-path rendering — the OTHER half of Hudi's Simple/Complex
    key generators (paired with ``record_key_expr``, H4): each configured
    partition column is string-rendered null-safely (nulls take Hudi's
    "default" partition name) and multi-field paths join with "/"
    (ComplexKeyGenerator's nested layout; the slash is directory-escaped
    by the writer and unescaped when manifests are built). Dates and
    strings render as themselves — the recommended partition types, since
    partition values compare as strings for range pruning."""
    parts = [
        F.coalesce(F.col(f).cast("string"), F.lit("default")) for f in fields
    ]
    return parts[0] if len(parts) == 1 else F.concat_ws("/", *parts)


def bucket_expr(key: Column, buckets: int) -> Column:
    """Deterministic key -> bucket assignment; derivable from _key alone,
    so bucket ids never need to be stored in data files."""
    return F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int")
