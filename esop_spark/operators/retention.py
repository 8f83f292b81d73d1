"""Manifest resolution + retention selection.

Reference semantics:
- W1/P13 latest-manifest: among manifests sharing a (snapshot, schema_version)
  prefix, the one with the max embedded timestamp wins
  (/root/reference/core/src/main/java/com/instaclustr/esop/impl/Manifest.java:254-283).
- P10 removal selection: --oldest → min-timestamp manifest; --backup-name →
  exact match; --older-than → unixtimestamp < now − Δ
  (/root/reference/core/src/main/java/com/instaclustr/esop/impl/remove/RemoveBackupOperation.java:177-190).
- P9/W4 listing filters: --from-timestamp upper bound, --last-n oldest N
  (/root/reference/core/src/main/java/com/instaclustr/esop/impl/list/ListOperation.java:167-198).

Scale notes: `manifests` is a small dimension (one row per backup); the
window partitions by prefix so even a pathological number of backups
parallelizes across prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_manifest_per_prefix(manifests: DataFrame) -> DataFrame:
    """Q5: latest-wins resolution per (snapshot, schema_version) prefix."""
    w = Window.partitionBy("snapshot", "schema_version").orderBy(
        F.col("ts").desc(), F.col("backup_name").desc()
    )
    return (
        manifests.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def retention_older_than(manifests: DataFrame, cutoff_ts_millis: int) -> DataFrame:
    """Q6: backups eligible for removal under --older-than."""
    return manifests.filter(F.col("ts") < F.lit(cutoff_ts_millis)).select(
        "backup_name", "ts"
    )


def oldest_backup(manifests: DataFrame) -> DataFrame:
    """--oldest victim selection (deterministic tiebreak on name)."""
    return manifests.orderBy(F.col("ts").asc(), F.col("backup_name").asc()).limit(1)


def last_n(manifests: DataFrame, n: int) -> DataFrame:
    """W4 --last-n: the oldest N backups of the newest-first listing."""
    return manifests.orderBy(F.col("ts").asc(), F.col("backup_name").asc()).limit(n)
