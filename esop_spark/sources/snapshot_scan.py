"""Snapshot directory scan (SURVEY.md §2.1 S1–S4).

Walks Cassandra-style data directories
(``<dataDir>/<keyspace>/<table>-<tableId>/snapshots/<tag>/<component>``,
optionally with 2.2-style secondary-index subdirs ``.idxName``) into the
``manifest_entries`` relation — the Spark-native form of
``Snapshots.parse`` + ``SSTableUtils.getSSTables``
(/root/reference/core/src/main/java/com/instaclustr/esop/impl/Snapshots.java:715-831,
/root/reference/core/src/main/java/com/instaclustr/esop/impl/SSTableUtils.java:104-168).

Design:
- ``binaryFile`` source with ``recursiveFileLookup`` does the distributed
  walk; Catalyst prunes the ``content`` column away for listing-only uses,
  so hashing is the only pass that actually reads bytes.
- Content hash = lowercase SHA-256 (the reference default, HashSpec.java).
- SSTable id = ``<generation>-<digest>`` with reference digest parity
  (SSTableUtils.java:48-102): the first existing ``-Digest.{crc32,adler32,
  sha1}`` sibling's leading alnum token wins (tried in that order; content
  with a newline fails Java's full-string matcher and falls through), else
  Adler32 over the last 10 MB of ``-Data.db`` (C* 2.0 ``jb`` format ships
  no digest file). A backup taken here and one taken by the reference over
  the same snapshot therefore produce identical object keys and dedup
  against each other.
- ``truncated-``/``dropped-`` snapshot dirs are skipped (Snapshots.java:761-765).
- Non-sstable snapshot files (``schema.cql``, Cassandra's own
  ``manifest.json``) are excluded, matching getSSTables' post-group filter
  (SSTableUtils.java:122,134).

Scale notes: listing parallelizes over files; per-row digest candidates
(sibling token, Adler32 tail) are computed BEFORE the per-sstable window so
the binary content column never crosses the shuffle — the window moves only
small scalars over (ks, table_id, sstable_base) keys (cardinality = number
of sstables, uniformly distributed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esop_spark.functions.scalars import (
    SSTABLE_RE,
    adler32_tail,
    content_hash,
    digest_file_token,
    digest_file_type,
)

# .../<keyspace>/<table>-<32hex>/snapshots/<tag>/[.index/]<component>
_SNAPSHOT_PATH_RE = (
    r"^.*/([^/]+)/([^/]+)-([0-9a-f]{32})/snapshots/([^/]+)/(?:(\.[^/]+)/)?([^/]+)$"
)


def _walk_files(roots: list[str]) -> list[tuple[str, int]]:
    """Driver-side recursive walk → [(abs_path, size)].

    Spark's FileIndex silently skips dot-prefixed path components — which is
    exactly where Cassandra 2.2 secondary-index dirs (``.idxName``) live — so
    the listing itself is done with os.walk (parity with the reference's
    node-local Files.walk, Snapshots.java:715-831) and the resulting EXPLICIT
    file list is handed to Spark (explicit paths bypass the hidden filter).
    At object-store scale the listing source is the store inventory instead.
    """
    import os

    out = []
    for root in roots:
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                out.append((os.path.abspath(p), os.path.getsize(p)))
    return out


def load_binary_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed binaryFile read of an exact file set, without the
    per-file listing job.

    Passing N explicit file paths to ``load`` makes Spark's FileIndex run a
    listing job with one task PER PATH (observed: 2000 files → 2000 listing
    tasks dominating wall-clock). Instead the N files' parent DIRECTORIES are
    the load roots — root paths are exempt from the hidden-name filter (so
    ``.idx`` dirs work) and their direct children are bin-packed normally —
    then an inner join against the walked file set drops anything the walk
    didn't see. Root count ∝ directories, not files.
    """
    dirs = sorted({os.path.dirname(p) for p in paths})
    wanted = spark.createDataFrame([(p,) for p in paths], "local_path string")
    return load_binary_files_for(spark, dirs, wanted)


def load_binary_files_for(
    spark: SparkSession, dirs: list[str], wanted: DataFrame
) -> DataFrame:
    """DataFrame-native variant of :func:`load_binary_files`: read exactly the
    files named in ``wanted`` (a DataFrame with a ``local_path`` column),
    given their parent DIRECTORIES as load roots.

    Nothing proportional to file count touches the driver — roots ∝
    directories. The wanted side is broadcast so the content-bearing listing
    never shuffles (shuffling the ``content`` column would move every byte).
    """
    listing = spark.read.format("binaryFile").load(sorted(set(dirs)))
    return listing.withColumn(
        "local_path", F.regexp_replace(F.col("path"), "^file:", "")
    ).join(F.broadcast(wanted.select("local_path")), "local_path")


def scan_snapshot_tree(
    spark: SparkSession, data_dirs: list[str], snapshot_tag: str
) -> DataFrame:
    """S1+S2: scan data dirs for one snapshot tag → manifest entries.

    Output: (keyspace, table_name, table_id, sstable_base, object_key,
    size, hash, type, local_path, index_dir). Listing is driver-side
    (see _walk_files); hashing is distributed over the walked file set.
    """
    needle = f"/snapshots/{snapshot_tag}/"
    paths = [p for p, _ in _walk_files(data_dirs) if needle in p]
    if not paths:
        return spark.createDataFrame(
            [],
            "keyspace string, table_name string, table_id string, "
            "sstable_base string, object_key string, size long, hash string, "
            "type string, local_path string, index_dir string",
        )
    listing = load_binary_files(spark, paths)
    p = F.col("local_path")
    fn = F.regexp_extract(p, _SNAPSHOT_PATH_RE, 6)
    parsed = listing.select(
        p.alias("local_path"),
        F.col("length").alias("size"),
        content_hash(F.col("content")).alias("hash"),
        F.regexp_extract(p, _SNAPSHOT_PATH_RE, 1).alias("keyspace"),
        F.regexp_extract(p, _SNAPSHOT_PATH_RE, 2).alias("table_name"),
        F.regexp_extract(p, _SNAPSHOT_PATH_RE, 3).alias("table_id"),
        F.regexp_extract(p, _SNAPSHOT_PATH_RE, 4).alias("snapshot_tag"),
        F.regexp_extract(p, _SNAPSHOT_PATH_RE, 5).alias("index_dir"),
        fn.alias("file_name"),
        # per-row digest candidates, evaluated while the content is still in
        # hand (pre-shuffle): the sibling-file token and the Data.db-tail
        # Adler32 fallback (null input for every non-Data.db row, so the
        # vectorized UDF does no work there)
        digest_file_type(fn).alias("digest_file_type"),
        digest_file_token(F.col("content")).alias("digest_token"),
        adler32_tail(
            F.when(fn.endswith("-Data.db"), F.col("content")), F.col("length")
        ).alias("data_adler32"),
    ).filter(
        (F.col("snapshot_tag") == snapshot_tag)
        & ~F.col("snapshot_tag").startswith("truncated-")
        & ~F.col("snapshot_tag").startswith("dropped-")
        & (F.col("keyspace") != "")
    )
    with_base = (
        parsed.withColumn(
            "sstable_base", F.regexp_extract("file_name", SSTABLE_RE, 1)
        )
        .withColumn("generation", F.regexp_extract("file_name", SSTABLE_RE, 2))
        # getSSTables drops files that don't parse as sstable components
        # (schema.cql, Cassandra's own manifest.json — SSTableUtils.java:122,134)
        .filter(F.col("sstable_base") != "")
    )

    # reference-parity sstable digest (SSTableUtils.java:48-74), propagated
    # to every component of the sstable: first existing Digest sibling's
    # token in crc32 → adler32 → sha1 order (a sibling whose content fails
    # the matcher yields null and falls through), else the Data.db tail
    # Adler32, else "nodata" for a component-less group.
    w = Window.partitionBy("keyspace", "table_id", "index_dir", "sstable_base")

    def _sibling(kind: str):
        return F.max(
            F.when(F.col("digest_file_type") == kind, F.col("digest_token"))
        ).over(w)

    digest = F.coalesce(
        _sibling("crc32"),
        _sibling("adler32"),
        _sibling("sha1"),
        F.max("data_adler32").over(w),
        F.lit("nodata"),
    )
    enriched = with_base.withColumn("digest", digest)

    object_key = F.concat_ws(
        "/",
        F.lit("data"),
        F.col("keyspace"),
        F.concat_ws("-", F.col("table_name"), F.col("table_id")),
        *[],
    )
    # secondary-index components keep the .idx dir as an extra path component
    # (6-component form, SSTableUtils.java:183-187)
    object_key = F.when(
        F.col("index_dir") != "",
        F.concat_ws(
            "/",
            object_key,
            F.col("index_dir"),
            F.concat_ws("-", F.col("generation"), F.col("digest")),
            F.col("file_name"),
        ),
    ).otherwise(
        F.concat_ws(
            "/",
            object_key,
            F.concat_ws("-", F.col("generation"), F.col("digest")),
            F.col("file_name"),
        )
    )
    return enriched.select(
        "keyspace",
        "table_name",
        "table_id",
        "sstable_base",
        object_key.alias("object_key"),
        "size",
        "hash",
        F.lit("FILE").alias("type"),
        "local_path",
        "index_dir",
    )


def list_local_files(spark: SparkSession, data_dirs: list[str]) -> DataFrame:
    """S3: live (non-snapshot) data files — the local side of restore diffs.

    Metadata-only: built from the driver walk, no file contents touched
    (and dot-dir secondary-index files are NOT silently dropped, unlike a
    Spark FileIndex listing).
    """
    rows = [
        (p, size)
        for p, size in _walk_files(data_dirs)
        if "/snapshots/" not in p and "/backups/" not in p
    ]
    return spark.createDataFrame(rows or [], "local_path string, size long")


def list_remote_objects(spark: SparkSession, bucket_dir: str) -> DataFrame:
    """S8: bucket listing → (object_key, size).

    For the local-FS simulated bucket the walk is driver-side (object keys
    may contain dot components — secondary-index keys — which Spark's
    FileIndex would skip). Against a real object store this becomes a
    server-side prefix listing / inventory read.
    """
    import os

    root = os.path.abspath(bucket_dir.rstrip("/"))
    rows = [(p[len(root) + 1 :], size) for p, size in _walk_files([bucket_dir])]
    return spark.createDataFrame(rows or [], "object_key string, size long")
