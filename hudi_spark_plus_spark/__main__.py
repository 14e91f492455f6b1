"""spark-submit entry point — the deployment face of the engine.

The reference ships as a spark-submit application (SURVEY §3 entry
point 1: ``spark-submit --class ...BinlogSyncHoodie`` with a properties
file of namespaced sync options). The PySpark equivalent:

    spark-submit /path/to/hudi_spark_plus_spark/__main__.py \
        --options sync_options.json \
        --source-path /data/binlog-envelopes \
        --checkpoint /ckpt/binlog-sync \
        [--max-files-per-trigger 16] \
        [--once] [--timeout 3600]

``sync_options.json`` holds the same option map every other sync entry
uses (per-table namespacing N12, path templating N14, parallelism N15,
write mode cow|mor) — one config surface for the CLI, foreachBatch
helper, and ``format("binlog-hudi")`` registration alike.

``--once`` drains the source with an availableNow trigger and exits
(batch/backfill mode, the Q4-fixed retention path included); without it
the query runs continuously at the reference's default 10-second
processing-time trigger. Exactly-once across restarts comes from the
checkpoint + the commit log's per-(table, batch) idempotence (H5).
"""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hudi_spark_plus_spark",
        description="Streaming binlog-envelope -> lake-table sync",
    )
    p.add_argument(
        "--options",
        required=True,
        help="JSON file with the namespaced sync option map",
    )
    p.add_argument(
        "--source-path",
        required=True,
        help="directory of JSON-lines envelope files (file stream source)",
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument(
        "--once",
        action="store_true",
        help="drain available input (availableNow) and exit",
    )
    p.add_argument(
        "--trigger-seconds",
        type=int,
        default=10,  # the reference's default processing-time trigger
        help="continuous-mode trigger interval",
    )
    p.add_argument(
        "--timeout",
        type=float,
        default=None,
        help="max seconds to await the query (default: forever)",
    )
    return p


def run(spark, args: argparse.Namespace) -> bool:
    """Start the sync against an existing session; returns the
    awaitTermination result (True when the query terminated)."""
    from hudi_spark_plus_spark.streaming.sink import (
        envelope_file_stream,
        start_binlog_sync,
    )

    with open(args.options) as fh:
        options = json.load(fh)
    stream = envelope_file_stream(
        spark, args.source_path, args.max_files_per_trigger
    )
    trigger = (
        {"availableNow": True}
        if args.once
        else {"processingTime": f"{args.trigger_seconds} seconds"}
    )
    query = start_binlog_sync(
        stream,
        options,
        checkpoint_location=args.checkpoint,
        trigger=trigger,
    )
    try:
        if args.timeout is not None:
            return query.awaitTermination(args.timeout)
        query.awaitTermination()
        return True
    finally:
        if args.once:
            query.stop()


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    from hudi_spark_plus_spark.session import get_spark

    spark = get_spark("binlog-sync")
    try:
        run(spark, args)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
