"""Continuous commit-log archiving (SURVEY.md §2.9 ST1/ST2).

The reference archives each closed commit-log segment by invoking esop from
Cassandra's ``archive_command`` (README.adoc "Backup and Restore of Commit
Logs"; /root/reference/core/src/main/java/com/instaclustr/esop/impl/backup/BackupCommitLogsOperation.java:59-130).
The Spark-native form is a Structured Streaming file source on the archive
directory: new segments are discovered incrementally, archived under
``commitlog/<name>.<mtimeMillis>`` keys, and exactly-once delivery follows
from checkpointing + idempotent content-keyed object names (same guarantee
the reference relies on).

ST2 (daemon-mode periodic retention) maps to a ProcessingTime trigger
re-running the retention query per interval — see ``retention_trigger``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, content binary"
)


def commitlog_stream(spark: SparkSession, archive_dir: str) -> DataFrame:
    """ST1 source: stream of newly-closed commit-log segments."""
    return (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "CommitLog-*.log")
        .load(archive_dir)
        .select(
            F.regexp_replace("path", "^file:", "").alias("local_path"),
            F.element_at(F.split("path", "/"), -1).alias("name"),
            # millisecond precision: the reference keys segments by ms
            # (RestoreCommitLogsOperation parses ms); unix_timestamp would
            # truncate to seconds and can collide same-second re-archives
            F.unix_millis(F.col("modificationTime")).alias("mtime_ms"),
            F.col("length").alias("size"),
        )
    )


def archive_commitlogs(
    spark: SparkSession,
    archive_dir: str,
    bucket_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    kms_key_id: str | None = None,
) -> StreamingQuery:
    """ST1 pipeline: archive dir → object store under mtime-keyed names.

    ``available_now=True`` drains the current backlog and stops (test/batch
    catch-up mode); ``False`` runs continuously. ``kms_key_id`` encrypts
    archived segments with the same payload leg as backup uploads
    (commitlogs route through the same Backuper in the reference)."""

    def archive_batch(batch_df: DataFrame, batch_id: int) -> None:
        from esop_spark.functions import crypto

        dest_root = os.path.join(bucket_dir, "commitlog")
        os.makedirs(dest_root, exist_ok=True)
        for row in batch_df.select("local_path", "name", "mtime_ms").collect():
            # idempotent content-keyed object name → replayed batches rewrite
            # the same object (exactly-once effect)
            dst = os.path.join(dest_root, f"{row['name']}.{row['mtime_ms']}")
            if kms_key_id is not None:
                crypto.encrypt_file(row["local_path"], dst, kms_key_id)
            else:
                shutil.copyfile(row["local_path"], dst)

    writer = (
        commitlog_stream(spark, archive_dir)
        .writeStream.foreachBatch(archive_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()


def archived_commitlogs(spark: SparkSession, bucket_dir: str) -> DataFrame:
    """Read back the archived segment inventory as the `commitlogs` relation
    (name, ts, size) used by the PIT window query (Q7)."""
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(os.path.join(bucket_dir, "commitlog"))
    )
    fname = F.element_at(F.split("path", "/"), -1)
    return listing.select(
        F.regexp_extract(fname, r"(.*\.log)\.(\d+)$", 1).alias("name"),
        F.regexp_extract(fname, r"(.*\.log)\.(\d+)$", 2).cast("bigint").alias("ts"),
        F.col("length").alias("size"),
    )
