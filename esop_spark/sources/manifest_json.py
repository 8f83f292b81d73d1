"""Manifest JSON source/sink (SURVEY.md §2.1 S6/S7/S14).

Reads esop manifest JSON files (nested snapshot→keyspace→table→sstable→entry
maps, README.adoc "Manifest" example) into the flat ``manifest_entries``
relation, and writes it back out in the same nested shape.

- Ingestion is ``spark.read.json`` with an EXPLICIT schema (never inferred)
  + higher-order-function explosion of the nested maps — one narrow pipeline,
  no shuffle until the caller aggregates.
- The pre-2.0 legacy shim: old manifests stored a flat ``entries`` list per
  table which the reference reclassifies into the ``sstables`` map on read
  (/root/reference/core/src/main/java/com/instaclustr/esop/impl/Snapshots.java:537-552);
  here that's a ``coalesce`` of the two shapes at explode time.
- Cloud prefixes (s3a://…/manifests/) work unchanged — the path is just a
  Hadoop FS URI, which subsumes the reference's local cache dance
  (s3/.../BaseS3Restorer.java:296-306).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from esop_spark.functions.scalars import SSTABLE_RE

ENTRY_SCHEMA = StructType(
    [
        StructField("objectKey", StringType()),
        StructField("type", StringType()),
        StructField("size", LongType()),
        StructField("hash", StringType()),
        # KMS key the object was encrypted with (ManifestEntry.kmsKeyId,
        # impl/ManifestEntry.java:48-49). The reference keeps it off-JSON
        # (@JsonIgnore) because S3 object tags carry it; this engine has no
        # tag store, so the manifest — our only durable metadata — carries it
        # as an OPTIONAL field: to_json drops nulls, so unencrypted backups
        # serialize byte-identically to the reference shape.
        StructField("kmsKeyId", StringType()),
    ]
)

TABLE_SCHEMA = StructType(
    [
        StructField("sstables", MapType(StringType(), ArrayType(ENTRY_SCHEMA))),
        # legacy pre-2.0 flat list (Snapshots.java:537-552)
        StructField("entries", ArrayType(ENTRY_SCHEMA)),
        StructField("id", StringType()),
        StructField("schemaContent", StringType()),
    ]
)

MANIFEST_SCHEMA = StructType(
    [
        StructField(
            "snapshot",
            StructType(
                [
                    StructField("name", StringType()),
                    StructField(
                        "keyspaces",
                        MapType(
                            StringType(),
                            StructType(
                                [StructField("tables", MapType(StringType(), TABLE_SCHEMA))]
                            ),
                        ),
                    ),
                ]
            ),
        ),
        StructField("tokens", ArrayType(StringType())),
        StructField("schemaVersion", StringType()),
        StructField("manifest", ENTRY_SCHEMA),
    ]
)


def read_manifests(
    spark: SparkSession, path: str, include_path: bool = False
) -> DataFrame:
    """S6/S7: manifest JSON dir → flat ``manifest_entries`` DataFrame.

    Output: (backup_name, backup_ts, keyspace, table_name, table_id,
    schema_content, sstable_base, object_key, type, size, hash)
    [+ manifest_path when ``include_path`` — used by the fleet reader to
    recover the <dc>/<node> storage-location components from a glob read].
    """
    raw = (
        spark.read.schema(MANIFEST_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .withColumn("manifest_path", F.input_file_name())
        .withColumn(
            "backup_name",
            F.regexp_replace(
                F.element_at(F.split(F.col("manifest_path"), "/"), -1), r"\.json$", ""
            ),
        )
        .withColumn(
            "backup_ts",
            F.substring_index(F.col("backup_name"), "-", -1).cast("bigint"),
        )
    )
    path_cols = ["manifest_path"] if include_path else []
    ks = raw.select(
        "backup_name",
        "backup_ts",
        F.col("schemaVersion").alias("schema_version"),
        F.explode("snapshot.keyspaces").alias("keyspace", "ksdata"),
        *path_cols,
    )
    tbl = ks.select(
        "backup_name",
        "backup_ts",
        "schema_version",
        "keyspace",
        F.explode("ksdata.tables").alias("table_name", "t"),
        *path_cols,
    )
    # modern shape: sstables map; legacy shape: flat entries keyed by the
    # sstable base extracted from each entry's file name (the shim).
    modern = F.flatten(
        F.transform(
            F.map_entries("t.sstables"),
            lambda kv: F.transform(
                kv["value"], lambda e: F.struct(kv["key"].alias("base"), e.alias("e"))
            ),
        )
    )
    legacy = F.transform(
        F.col("t.entries"),
        lambda e: F.struct(
            F.regexp_extract(
                F.element_at(F.split(e["objectKey"], "/"), -1), SSTABLE_RE, 1
            ).alias("base"),
            e.alias("e"),
        ),
    )
    return tbl.select(
        "backup_name",
        "backup_ts",
        "schema_version",
        "keyspace",
        "table_name",
        F.col("t.id").alias("table_id"),
        F.col("t.schemaContent").alias("schema_content"),
        F.explode(F.coalesce(modern, legacy)).alias("se"),
        *path_cols,
    ).select(
        "backup_name",
        "backup_ts",
        "schema_version",
        "keyspace",
        "table_name",
        "table_id",
        "schema_content",
        F.col("se.base").alias("sstable_base"),
        F.col("se.e.objectKey").alias("object_key"),
        F.col("se.e.type").alias("type"),
        F.col("se.e.size").alias("size"),
        F.col("se.e.hash").alias("hash"),
        F.col("se.e.kmsKeyId").alias("kms_key_id"),
        *path_cols,
    )


def read_backup_tokens(
    spark: SparkSession, manifests_dir: str, backup_name: str
) -> list[str]:
    """Ring tokens recorded in one backup's manifest (impl/Manifest.java
    tokens field) — the input to the in-place restore's ``initial_token``
    yaml fragment. One manifest document, driver-tiny."""
    raw = (
        spark.read.schema(MANIFEST_SCHEMA)
        .option("multiLine", "true")
        .json(os.path.join(manifests_dir, f"{backup_name}.json"))
        .select("tokens")
        .collect()
    )
    if not raw or raw[0]["tokens"] is None:
        return []
    return list(raw[0]["tokens"])


def manifest_json_rows(
    entries: DataFrame, tokens: list[str] | None = None
) -> DataFrame:
    """S14: flat entries → one (backup_name, json) row per backup, nested in
    the reference's manifest shape. Aggregation is distributed (three
    map_from_entries rollups); only the final per-backup JSON string comes
    back to the caller. ``tokens`` (the backing node's ring tokens,
    impl/Manifest.java tokens field) are embedded verbatim in each doc —
    they feed the in-place restore's ``initial_token`` rewrite."""
    per_sstable = entries.groupBy(
        "backup_name", "schema_version", "keyspace", "table_name", "table_id",
        "schema_content", "sstable_base",
    ).agg(
        F.collect_list(
            F.struct(
                F.col("object_key").alias("objectKey"),
                F.col("type"),
                F.col("size"),
                F.col("hash"),
                (
                    F.col("kms_key_id")
                    if "kms_key_id" in entries.columns
                    else F.lit(None).cast("string")
                ).alias("kmsKeyId"),
            )
        ).alias("entry_list")
    )
    per_table = per_sstable.groupBy(
        "backup_name", "schema_version", "keyspace", "table_name"
    ).agg(
        F.map_from_entries(
            F.collect_list(F.struct("sstable_base", "entry_list"))
        ).alias("sstables"),
        F.first("table_id").alias("id"),
        F.first("schema_content").alias("schemaContent"),
    )
    per_ks = per_table.groupBy("backup_name", "schema_version", "keyspace").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    "table_name",
                    F.struct("sstables", "id", "schemaContent").alias("t"),
                )
            )
        ).alias("tables")
    )
    per_backup = per_ks.groupBy("backup_name", "schema_version").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct("keyspace", F.struct("tables").alias("k"))
            )
        ).alias("keyspaces")
    )
    doc_fields = [
        F.struct(
            F.col("backup_name").alias("name"), F.col("keyspaces")
        ).alias("snapshot"),
        F.col("schema_version").alias("schemaVersion"),
    ]
    if tokens is not None:
        doc_fields.append(
            F.array(*[F.lit(t) for t in tokens]).alias("tokens")
        )
    return per_backup.select("backup_name", F.to_json(F.struct(*doc_fields)).alias("json"))


def write_manifests(
    entries: DataFrame, out_dir: str, tokens: list[str] | None = None
) -> list[str]:
    """Write one ``<backup_name>.json`` per backup under ``out_dir``.

    Manifests are a per-backup singleton (small) — written driver-side after
    the distributed nesting aggregation, mirroring the reference's
    manifest-uploaded-last ordering (BaseBackupOperationCoordinator.java:151-153).
    Driver memory bound: the largest single manifest document (one node's
    sstable list — the same in-heap bound the reference's Jackson writer has,
    impl/Manifest.java). For a node with 10^7+ sstables, switch to
    ``manifest_json_rows(...).write.text`` partitioned by backup_name to
    stream each document from executors instead.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for row in manifest_json_rows(entries, tokens=tokens).collect():
        p = os.path.join(out_dir, f"{row['backup_name']}.json")
        with open(p, "w") as f:
            # round-trip through json for stable pretty formatting
            json.dump(json.loads(row["json"]), f, indent=2)
        paths.append(p)
    return paths
