"""Snapshot merge + schema comparison.

Reference semantics:
- A6 snapshot merge: union of per-data-dir scans, merging keyspace→table→
  sstable maps (/root/reference/core/src/main/java/com/instaclustr/esop/impl/Snapshots.java:129-151,732-750).
- J8 schema diff: tables present in both snapshots whose (simplified) CQL
  schema differs; a table missing on either side counts as equal
  (Snapshots.java:330-341,463-491; simplification regex :643-656).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_merge(*entry_frames: DataFrame) -> DataFrame:
    """Q11: merge snapshot scans → per-(keyspace, table) object/file stats.

    Distinct-object semantics mirror the name-keyed map merge: an sstable
    appearing in several scans is counted once.
    """
    merged = entry_frames[0]
    for other in entry_frames[1:]:
        merged = merged.unionByName(other)
    distinct_objects = merged.select("keyspace", "table_name", "object_key", "size").distinct()
    return distinct_objects.groupBy("keyspace", "table_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("objects"),
        F.sum("size").cast("bigint").alias("total_size"),
    )


def schema_diff(schemas_a: DataFrame, schemas_b: DataFrame) -> DataFrame:
    """Q12/J8: (keyspace, table) in both snapshots with differing schema."""
    a = schemas_a.select("keyspace", "table_name", F.col("schema_content").alias("schema_a"))
    b = schemas_b.select("keyspace", "table_name", F.col("schema_content").alias("schema_b"))
    return a.join(b, ["keyspace", "table_name"]).filter(
        F.col("schema_a") != F.col("schema_b")
    )
