"""Command-line surface mirroring the reference's command set
(/root/reference/core/src/main/java/com/instaclustr/esop/cli/Esop.java:35-48:
backup, restore, commitlog-backup, commitlog-restore, list, remove-backup).

Usage: ``python -m esop_spark <command> [options]``. Storage locations are
directories (file paths here; any Hadoop-FS URI at deployment). Every command
is a thin shell over the DataFrame operators — parsing and printing live
here, computation lives in ``esop_spark.operators``.
"""

from __future__ import annotations

import argparse
import re
import sys

from esop_spark.session import get_spark

_RATE_UNITS = {"BPS": 1, "KBPS": 1000, "MBPS": 1000_000, "GBPS": 1000_000_000}


def parse_data_rate_bps(measure: str) -> int:
    """F13 data-rate measure: ``"10MBPS"`` → bytes/sec
    (/root/reference/core/src/main/java/com/instaclustr/measure/DataRate.java)."""
    m = re.fullmatch(r"\s*(\d+)\s*(BPS|KBPS|MBPS|GBPS)\s*", measure.upper())
    if not m:
        raise ValueError(f"invalid data rate: {measure!r}")
    return int(m.group(1)) * _RATE_UNITS[m.group(2)]


def _add_retry_args(p) -> None:
    """Per-file transfer retry knobs (RetrySpec.java:17-55)."""
    p.add_argument("--retry-enabled", action="store_true")
    p.add_argument(
        "--retry-strategy", default="linear", choices=["linear", "exponential"]
    )
    p.add_argument("--retry-interval", type=int, default=10, help="seconds")
    p.add_argument("--retry-max-attempts", type=int, default=3)


def _retry_spec(args):
    from esop_spark.functions.retry import RetrySpec

    if not args.retry_enabled:
        return None
    return RetrySpec(
        interval=args.retry_interval,
        strategy=args.retry_strategy,
        max_attempts=args.retry_max_attempts,
        enabled=True,
    )


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="esop-spark")
    sub = p.add_subparsers(dest="command", required=True)

    b = sub.add_parser("backup", help="snapshot scan → incremental upload → manifest")
    b.add_argument("--data-dirs", required=True, help="comma-separated data dirs")
    b.add_argument("--tag", required=True, help="snapshot tag to back up")
    b.add_argument("--storage-location", required=True, help="bucket directory")
    b.add_argument("--schema-version", default="00000000")
    # default None → "now" at run time; an explicit value keeps tests
    # deterministic. A constant default would make every backup of a tag
    # share one backup_name and silently overwrite the previous manifest.
    b.add_argument("--ts-millis", type=int, default=None)
    b.add_argument("--bandwidth", default=None, help="e.g. 10MBPS (per task)")
    # --kmsKeyId in the reference (AbstractOperationRequest.java:57-59)
    b.add_argument("--kms-key-id", default=None, help="KMS key to encrypt uploads with")
    b.add_argument(
        "--skip-refreshing", action="store_true",
        help="presence alone freshens remote objects; never touch their mtime "
        "(BaseBackupOperationRequest.java:50-54)",
    )
    # bucket lifecycle gate (BucketService.checkBucket, BucketService.java:30-45):
    # a missing bucket fails the backup unless created or the check is skipped
    b.add_argument("--create-missing-bucket", action="store_true")
    b.add_argument("--skip-bucket-verification", action="store_true")
    _add_retry_args(b)

    r = sub.add_parser("restore", help="manifest diff → download/delete/heal")
    r.add_argument("--storage-location", required=True)
    r.add_argument("--target-dir", required=True)
    r.add_argument("--backup-name", default=None, help="default: latest")
    r.add_argument("--keep-extras", action="store_true")
    # in-place = node down (InPlaceRestorationStrategy); hardlinks / import =
    # phased restore against a running node (RestorationStrategyResolverImpl)
    r.add_argument(
        "--restoration-strategy-type", default="in-place",
        choices=["in-place", "hardlinks", "import"],
    )
    # --update-cassandra-yaml (InPlaceRestorationStrategy.java:125-160):
    # finish the restore by pointing the node at its old ring position
    r.add_argument(
        "--update-cassandra-yaml", action="store_true",
        help="rewrite cassandra.yaml (auto_bootstrap false + initial_token "
        "from the manifest) after the restore",
    )
    r.add_argument(
        "--cassandra-config-directory", default="/etc/cassandra",
        help="directory holding cassandra.yaml (default /etc/cassandra)",
    )
    _add_retry_args(r)

    ls = sub.add_parser("list", help="per-backup files/size/reclaimable report")
    ls.add_argument("--storage-location", required=True)
    ls.add_argument("--json", action="store_true")
    ls.add_argument("--human-units", action="store_true")
    ls.add_argument("--from-timestamp", type=int, default=None)
    ls.add_argument("--last-n", type=int, default=None)
    ls.add_argument("--to-file", default=None)
    # manifest cache (ListOperationRequest.java:50-57): listings read from a
    # local cache dir, refreshed from the store unless --skip-download
    ls.add_argument("--cache-dir", default=None)
    ls.add_argument(
        "--skip-download", action="store_true",
        help="serve the listing from --cache-dir without touching the store",
    )
    ls.add_argument("--global-request", action="store_true")
    ls.add_argument(
        "--dcs", action="append", default=None,
        help="restrict a global listing to these dcs (repeatable)",
    )

    rm = sub.add_parser("remove-backup", help="delete only victim-unique objects")
    rm.add_argument("--storage-location", required=True)
    g = rm.add_mutually_exclusive_group(required=True)
    g.add_argument("--backup-name", default=None)
    g.add_argument("--oldest", action="store_true")
    g.add_argument("--older-than", default=None, help='e.g. "14day"')
    rm.add_argument("--dry-run", action="store_true")
    # --global-request: storage-location names ONE node
    # (<base>/<cluster>/<dc>/<node>); every sibling dc/node is resolved and
    # the victim rule runs per node (README.adoc "Global removal of backups")
    rm.add_argument("--global-request", action="store_true")
    rm.add_argument(
        "--dcs", action="append", default=None,
        help="restrict a global request to these dcs (repeatable)",
    )

    cb = sub.add_parser("commitlog-backup", help="archive commit-log segments")
    cb.add_argument("--archive-dir", required=True)
    cb.add_argument("--storage-location", required=True)
    cb.add_argument("--checkpoint-dir", required=True)
    cb.add_argument("--kms-key-id", default=None)

    cr = sub.add_parser("commitlog-restore", help="point-in-time segment download")
    cr.add_argument("--storage-location", required=True)
    cr.add_argument("--target-dir", required=True)
    cr.add_argument("--timestamp-start", type=int, required=True)
    cr.add_argument("--timestamp-end", type=int, required=True)
    cr.add_argument("--kms-key-id", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    try:
        return _run(_build_parser().parse_args(argv))
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


def _run(args: argparse.Namespace) -> int:
    spark = get_spark("esop-spark-cli")

    if args.command == "backup":
        from esop_spark.operators.pipelines import backup
        from esop_spark.operators.strategies import BucketServiceException, check_bucket

        import time

        if not args.skip_bucket_verification:
            try:
                check_bucket(args.storage_location, args.create_missing_bucket)
            except BucketServiceException as e:
                raise ValueError(str(e)) from e
        rate = parse_data_rate_bps(args.bandwidth) if args.bandwidth else None
        ts_millis = (
            args.ts_millis if args.ts_millis is not None else int(time.time() * 1000)
        )
        uploaded = backup(
            spark,
            args.data_dirs.split(","),
            args.tag,
            args.storage_location,
            schema_version=args.schema_version,
            ts_millis=ts_millis,
            max_bytes_per_sec=rate,
            kms_key_id=args.kms_key_id,
            skip_refreshing=args.skip_refreshing,
            retry=_retry_spec(args),
        )
        print(f"uploaded {uploaded.count()} objects")
        return 0

    if args.command == "restore":
        if args.restoration_strategy_type != "in-place":
            from esop_spark.operators.strategies import restore_phased

            stats = restore_phased(
                spark,
                args.storage_location,
                args.target_dir,
                strategy=args.restoration_strategy_type,
                backup_name=args.backup_name,
                cassandra_config_dir=(
                    args.cassandra_config_directory
                    if args.update_cassandra_yaml
                    else None
                ),
            )
            print(
                f"downloaded {stats['downloaded']}, linked {stats['linked']}, "
                f"skipped {stats['skipped']}; "
                f"jmx phase: {len(stats['jmx_calls'])} calls"
            )
            return 0
        from esop_spark.operators.pipelines import restore

        stats = restore(
            spark,
            args.storage_location,
            args.target_dir,
            backup_name=args.backup_name,
            delete_extras=not args.keep_extras,
            cassandra_config_dir=(
                args.cassandra_config_directory
                if args.update_cassandra_yaml
                else None
            ),
            retry=_retry_spec(args),
        )
        print(f"downloaded {stats['downloaded']}, deleted {stats['deleted']}")
        return 0

    if args.command == "list":
        import os

        from esop_spark.operators.manifest import render_report
        from esop_spark.sources.manifest_json import read_manifests

        if args.global_request:
            from pyspark.sql import functions as F

            from esop_spark.functions.render import render_table
            from esop_spark.operators.fleet import (
                global_list_backups,
                read_fleet_manifests,
                split_node_location,
            )

            base, cluster, _dc, _node = split_node_location(args.storage_location)
            report = global_list_backups(
                read_fleet_manifests(spark, base, cluster, args.dcs)
            ).orderBy("dc", "node", F.col("backup_ts").desc())
            table = [["dc", "node", "name", "files", "size", "reclaimable"]]
            for r in report.collect():
                table.append(
                    [
                        r["dc"], r["node"], r["backup_name"], str(r["files"]),
                        str(r["size_bytes"]), str(r["reclaimable_bytes"]),
                    ]
                )
            out = render_table(table)
            if args.to_file:
                with open(args.to_file, "w") as f:
                    f.write(out)
            else:
                print(out, end="")
            return 0

        manifests_dir = os.path.join(args.storage_location, "manifests")
        if args.cache_dir:
            # refresh-then-read-local, mirroring ListOperation.run0's
            # cacheDir dance (ListOperation.java:117-140): --skip-download
            # serves a prior sync (and requires one to exist)
            if not args.skip_download:
                import shutil

                if os.path.isdir(args.cache_dir):
                    shutil.rmtree(args.cache_dir)
                shutil.copytree(manifests_dir, args.cache_dir)
            elif not os.path.isdir(args.cache_dir):
                raise ValueError(
                    f"--skip-download with no cached listing at {args.cache_dir!r}"
                )
            manifests_dir = args.cache_dir
        entries = read_manifests(spark, manifests_dir)
        out = render_report(
            entries,
            fmt="json" if args.json else "table",
            human_units=args.human_units,
            from_timestamp=args.from_timestamp,
            last_n=args.last_n,
        )
        if args.to_file:
            with open(args.to_file, "w") as f:
                f.write(out)
        else:
            print(out, end="")
        return 0

    if args.command == "remove-backup":
        from esop_spark.operators.pipelines import remove_backup
        from esop_spark.operators.retention import parse_duration_ms

        older_than_ms = None
        if args.older_than:
            import time

            older_than_ms = int(time.time() * 1000) - parse_duration_ms(args.older_than)
        if args.global_request:
            from esop_spark.operators.fleet import global_remove_backup

            stats = global_remove_backup(
                spark,
                args.storage_location,
                backup_name=args.backup_name,
                oldest=args.oldest,
                older_than_ms=older_than_ms,
                dcs=args.dcs,
                dry_run=args.dry_run,
            )
        else:
            stats = remove_backup(
                spark,
                args.storage_location,
                backup_name=args.backup_name,
                oldest=args.oldest,
                older_than_ms=older_than_ms,
                dry_run=args.dry_run,
            )
        print(
            f"removed {stats['backups_removed']} backups, "
            f"{stats['objects_removed']} objects"
            + (" (dry run)" if args.dry_run else "")
        )
        return 0

    if args.command == "commitlog-backup":
        from esop_spark.streaming.commitlog_stream import archive_commitlogs

        q = archive_commitlogs(
            spark,
            args.archive_dir,
            args.storage_location,
            args.checkpoint_dir,
            available_now=True,
            kms_key_id=args.kms_key_id,
        )
        q.awaitTermination()
        print("commit logs archived")
        return 0

    if args.command == "commitlog-restore":
        from esop_spark.operators.pipelines import restore_commitlogs

        n = restore_commitlogs(
            spark,
            args.storage_location,
            args.target_dir,
            args.timestamp_start,
            args.timestamp_end,
            kms_key_id=args.kms_key_id,
        )
        print(f"restored {n} commit log segments")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
