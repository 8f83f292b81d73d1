"""Deterministic esop-style fixture relations derived from the driver's
TPC-H-ish parquet tables.

The reference engine (instaclustr/esop) computes over file-inventory metadata:
``manifest_entries`` (one row per file referenced by a backup manifest —
/root/reference/core/src/main/java/com/instaclustr/esop/impl/ManifestEntry.java:35-52),
``manifests``, remote bucket listings, local data files, cluster topology and
archived commit logs. We derive all of those relations *deterministically* from
the shared TPC-H parquet so that the PySpark engine and the DuckDB oracle see
byte-identical inputs without materializing extra files.

Every SQL string in ``FIXTURE_SQL`` is written in the dialect intersection of
Spark SQL and DuckDB (``||`` concat, ``CAST .. AS STRING``, ``md5``, integer
arithmetic) and is used verbatim by both engines:

- Spark: ``register_fixture_views(spark)`` creates temp views.
- DuckDB: ``oracle_with_clause(...)`` builds a ``WITH`` prefix for oracle SQL.

Fixture-design requirements mirror FIXTURES.md: object_keys overlap across
backups (immutable-SSTable reuse → reclaimable != sum(size)); remote listings
hold a strict subset of one backup plus orphans; local files include a hash
mismatch (corruption) and extras (delete case); manifests have prefix
collisions for latest-wins resolution; commit-log timestamps straddle the PIT
window with >=2 segments past the end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# -- manifest_entries: the fact table (ManifestEntry.java:35-52) -------------
# backup = f(l_suppkey), object_key = f(l_partkey, l_orderkey) so the same
# immutable object appears in several backups; size/hash are functions of the
# object_key alone so every reference to an object agrees on its metadata.
_MANIFEST_ENTRIES = """
SELECT DISTINCT
  'backup-' || CAST(l_suppkey % 4 AS STRING) AS backup_name,
  1600000000000 + (l_suppkey % 4) * 86400000 AS backup_ts,
  CASE
    WHEN l_partkey % 31 = 0 THEN 'system'
    WHEN l_partkey % 31 = 1 THEN 'system_schema'
    WHEN l_partkey % 31 = 2 THEN 'system_auth'
    ELSE 'ks' || CAST(l_partkey % 3 AS STRING)
  END AS keyspace,
  't' || CAST(l_partkey % 7 AS STRING) AS table_name,
  'obj-' || CAST(l_partkey AS STRING) || '-' || CAST(l_orderkey % 10 AS STRING) AS object_key,
  (l_partkey % 997) * 100 + (l_orderkey % 10) + 13 AS size,
  md5('obj-' || CAST(l_partkey AS STRING) || '-' || CAST(l_orderkey % 10 AS STRING)) AS hash
FROM lineitem
"""

# -- manifests: one row per backup with prefix collisions (Manifest.java:254-283)
_MANIFESTS = """
SELECT
  'snap-' || CAST(o_orderkey % 5 AS STRING) || '-sv' || CAST(o_orderkey % 2 AS STRING)
    || '-' || CAST(1600000000000 + o_orderkey * 3600000 AS STRING) AS backup_name,
  'snap-' || CAST(o_orderkey % 5 AS STRING) AS snapshot,
  'sv' || CAST(o_orderkey % 2 AS STRING) AS schema_version,
  1600000000000 + o_orderkey * 3600000 AS ts,
  o_orderkey * 1000 + 512 AS size
FROM orders
WHERE o_orderkey % 100 = 0
"""

# -- remote_objects: simulated bucket listing (UploadTracker.java:106-124) ---
# ~75% of backup-2's objects are already remote (hash-prefix predicate, same
# md5 in both engines) plus orphan keys in no manifest.
_REMOTE_OBJECTS = """
SELECT object_key, size
FROM (
  SELECT DISTINCT object_key, size, hash
  FROM manifest_entries
  WHERE backup_name = 'backup-2'
) t
WHERE substr(hash, 1, 1) <= 'b'
UNION ALL
SELECT 'orphan-' || CAST(p_partkey AS STRING) AS object_key,
       p_partkey * 17 + 5 AS size
FROM part
WHERE p_partkey % 10 = 0
"""

# -- local_files: simulated node data dir (DataSynchronizator.java:41-94) ----
# present ⊂ backup-1 manifest; some corrupted (hash mismatch); extras to delete.
_LOCAL_FILES = """
SELECT object_key AS rel_file,
       size,
       CASE WHEN substr(hash, 1, 1) = 'a' THEN 'corrupted' ELSE hash END AS hash
FROM (
  SELECT DISTINCT object_key, size, hash
  FROM manifest_entries
  WHERE backup_name = 'backup-1'
) t
WHERE substr(hash, 1, 1) <= 'c'
UNION ALL
SELECT 'extra-' || CAST(p_partkey AS STRING) AS rel_file,
       p_partkey * 11 + 3 AS size,
       md5('x' || CAST(p_partkey AS STRING)) AS hash
FROM part
WHERE p_partkey % 7 = 0
"""

# -- topology: cluster topology rows (CassandraClusterTopology.java:118-210) -
_TOPOLOGY = """
SELECT
  'node-' || lower(n_name) || '-' || CAST(n_nationkey AS STRING) AS hostname,
  'cluster1' AS cluster,
  r_name AS dc,
  'rack' || CAST(n_nationkey % 3 AS STRING) AS rack,
  md5('node' || CAST(n_nationkey AS STRING)) AS node_id
FROM nation
JOIN region ON n_regionkey = r_regionkey
"""

# -- commitlogs: archived segments (RestoreCommitLogsOperation.java:106-146) -
_COMMITLOGS = """
SELECT
  'CommitLog-7-' || CAST(1000 + event_id AS STRING) || '.log' AS name,
  1704067200000 + event_id * 60000 AS ts,
  (event_id % 503) * 1024 + 37 AS size
FROM events
"""

# -- local_tables: live table catalog (CassandraData.java:38-44) -------------
# One row per (ks, table) present locally; table t5 is "recreated" (different
# id than manifests would carry) to exercise enrichment id-rewrite; t6 is
# absent to exercise the missing-entity / dropped-join path.
_LOCAL_TABLES = """
SELECT keyspace, table_name,
       md5('local' || keyspace || table_name) AS table_id,
       '/var/lib/cassandra/data/' || keyspace || '/' || table_name AS path,
       1700000000000 + length(keyspace || table_name) * 1000 AS mtime
FROM (SELECT DISTINCT keyspace, table_name FROM manifest_entries) t
WHERE table_name <> 't6'
"""

# -- fleet_manifest_entries: multi-node bucket layout (<cluster>/<dc>/<node>)
# for --global-request listing/removal (LocalFileRestorer.java:279-313,
# RemoveBackupOperation.java:100-190). 2 dcs × 3 nodes each; object keys are
# shared across backups AND across nodes (replica copies of the same
# immutable sstable); backup_ts jitters per node so per-node --oldest is a
# real per-node decision; size is a function of object_key alone.
_FLEET_MANIFEST_ENTRIES = """
SELECT DISTINCT
  'cluster1' AS cluster,
  'dc' || CAST(l_suppkey % 2 AS STRING) AS dc,
  'node-' || CAST(l_suppkey % 6 AS STRING) AS node,
  'backup-' || CAST(l_orderkey % 3 AS STRING) AS backup_name,
  1600000000000 + (l_orderkey % 3) * 86400000 + (l_suppkey % 6) * 1000 AS backup_ts,
  'obj-' || CAST(l_partkey AS STRING) || '-' || CAST(l_orderkey % 10 AS STRING) AS object_key,
  (l_partkey % 997) * 100 + (l_orderkey % 10) + 13 AS size
FROM lineitem
"""

# -- snapshot_schemas: per-backup table schema digests (Snapshots.java:643-656)
# backup-3 drifts on t1/t3 to exercise the schema-diff join (J8).
_SNAPSHOT_SCHEMAS = """
SELECT backup_name, keyspace, table_name,
       md5(keyspace || '.' || table_name ||
           CASE WHEN backup_name = 'backup-3' AND table_name IN ('t1', 't3')
                THEN 'v2' ELSE 'v1' END) AS schema_content
FROM (SELECT DISTINCT backup_name, keyspace, table_name FROM manifest_entries) t
"""

FIXTURE_SQL: dict[str, str] = {
    "manifest_entries": _MANIFEST_ENTRIES,
    "manifests": _MANIFESTS,
    "remote_objects": _REMOTE_OBJECTS,
    "local_files": _LOCAL_FILES,
    "topology": _TOPOLOGY,
    "commitlogs": _COMMITLOGS,
    "local_tables": _LOCAL_TABLES,
    "snapshot_schemas": _SNAPSHOT_SCHEMAS,
    "fleet_manifest_entries": _FLEET_MANIFEST_ENTRIES,
}

# Derivation order matters: later fixtures reference manifest_entries.
_FIXTURE_ORDER = [
    "manifest_entries",
    "manifests",
    "remote_objects",
    "local_files",
    "topology",
    "commitlogs",
    "local_tables",
    "snapshot_schemas",
    "fleet_manifest_entries",
]


def load_base_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register the driver parquet tables as temp views and return them.

    ``events.ts`` has been written by the driver as either parquet
    TIMESTAMP(NANOS) (which Spark cannot read natively — read it as long
    via the legacy conf and truncate to micros; integer division because
    ns values exceed double's 53-bit mantissa) or plain TIMESTAMP(MICROS)
    (read natively). Sniff the footer with pyarrow and handle both.

    Memoized per (session, sf_dir): every ``spark.read.parquet`` here costs
    a JVM round-trip plus a footer read, and the query entry points call
    this once per TABLE ARGUMENT — a 6-table join paid ~4 s of pure
    driver-side re-registration per build before this cache (measured at
    sf0.1: q209 build 4.5 s → execute 0.65 s). Registration is idempotent,
    so caching only skips redundant work; an sf_dir switch re-registers.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    # keyed on the SparkSession object (temp views are per-session, not
    # per-context); the session is pinned in the value so its id() cannot
    # be recycled by a later allocation
    key = str(id(spark))
    cached = _BASE_LOADED.get(key)
    if cached is not None and cached[0] == sf_dir and cached[1] is spark:
        return cached[2]

    out: dict[str, DataFrame] = {}
    for name in BASE_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if name == "events":
            # path may be a single file (driver testdata) or a parquet
            # directory (generated scale-rehearsal data) — sniff one footer
            foot = path
            if os.path.isdir(path):
                foot = next(
                    os.path.join(path, f)
                    for f in sorted(os.listdir(path))
                    if f.endswith(".parquet")
                )
            ts_type = str(pq.read_schema(foot).field("ts").type)
            if ts_type == "timestamp[ns]":
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                df = spark.read.parquet(path).withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            else:
                # micros without isAdjustedToUTC reads as TIMESTAMP_NTZ;
                # cast to TIMESTAMP (session tz is pinned UTC, so the digits
                # are unchanged) — downstream unix_millis/window functions
                # require the LTZ type, and DuckDB reads the same file as a
                # naive timestamp, so both engines see identical instants
                df = spark.read.parquet(path).withColumn(
                    "ts", F.col("ts").cast("timestamp")
                )
        else:
            df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    _BASE_LOADED[key] = (sf_dir, spark, out)
    return out


# per-session memo of the last load_base_tables registration:
# id(session) -> (sf_dir, pinned session, table dict)
_BASE_LOADED: dict[str, tuple[str, SparkSession, dict[str, DataFrame]]] = {}

# sf_dir most recently registered per session — registration is idempotent
# and re-running it per query would re-read parquet footers and re-plan the
# DISTINCT derivation every time.
_REGISTERED: dict[str, str] = {}


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    """Register base tables + derived esop-style fixture views (cached).

    ``manifest_entries`` (the only expensive derivation — a DISTINCT shuffle
    over lineitem) is Spark-cached so every downstream query in the session
    reuses one materialization.
    """
    key = id(spark.sparkContext)
    cache_key = f"{key}:{sf_dir}"
    if _REGISTERED.get(str(key)) == cache_key:
        return
    if str(key) in _REGISTERED:  # sf_dir switch: drop the stale cache
        try:
            spark.catalog.uncacheTable("manifest_entries")
        except Exception:
            pass
    load_base_tables(spark, sf_dir)
    for name in _FIXTURE_ORDER:
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {FIXTURE_SQL[name]}")
    spark.catalog.cacheTable("manifest_entries")
    _REGISTERED[str(key)] = cache_key


def reset_registration_cache() -> None:
    """Forget the per-session registration memo. Bench reset mode calls
    ``spark.catalog.clearCache()`` between queries, which silently drops
    the ``manifest_entries`` cache; without clearing the memo the next
    ``register_fixture_views`` would be skipped and every esop-family
    query would run uncached for the rest of the session."""
    _REGISTERED.clear()


def fixture_df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    register_fixture_views(spark, sf_dir)
    return spark.table(name)


def oracle_with_clause(*names: str) -> str:
    """Build a DuckDB ``WITH`` prefix defining the requested fixtures (plus
    their dependencies) for oracle SQL. Base tables are pre-registered views
    in the driver's DuckDB session."""
    needed: list[str] = []
    for n in _FIXTURE_ORDER:
        if n in names or (
            n == "manifest_entries"
            and any(
                x in names
                for x in ("remote_objects", "local_files", "snapshot_schemas", "local_tables")
            )
        ):
            needed.append(n)
    parts = [f"{n} AS ({FIXTURE_SQL[n]})" for n in needed]
    return "WITH " + ",\n".join(parts) + "\n"
