"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL evaluated over the same
parquet tables. The esop-style relations (manifest_entries, manifests,
remote_objects, local_files, topology, commitlogs, snapshot_schemas) are
derived deterministically from the shared TPC-H parquet by
``esop_spark.sources.fixtures`` with SQL text valid in BOTH dialects, so the
two engines compute over identical inputs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esop_spark.sources import fixtures as fx
from esop_spark.operators import (
    analytics,
    commitlog,
    diff,
    entities,
    manifest,
    retention,
    snapshots,
    topology,
)

# --- fixture parameters shared by Spark queries and oracle SQL --------------
RETENTION_CUTOFF_MS = 1600000000000 + 7000 * 3600000
CL_START_MS = 1704067200000 + 1000 * 60000
CL_END_MS = 1704067200000 + 5000 * 60000
ENTITY_EXPR = "ks0.t1,ks1.t3"
RENAME_PAIRS = [("ks0", "t1", "ks9", "t9")]
DIFF_BACKUP = "backup-1"
UPLOAD_BACKUP = "backup-2"


def _fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    fx.register_fixture_views(spark, sf_dir)
    return spark.table(name)


# --- query implementations (Spark side) -------------------------------------

def q01_list_backups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return manifest.list_backups(_fixture(spark, sf_dir, "manifest_entries"))


def q02_removable_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return manifest.removable_entries(
        _fixture(spark, sf_dir, "manifest_entries"), DIFF_BACKUP
    )


def q03_upload_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx.register_fixture_views(spark, sf_dir)
    return diff.upload_diff(
        spark.table("manifest_entries"), spark.table("remote_objects"), UPLOAD_BACKUP
    )


def q04_restore_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx.register_fixture_views(spark, sf_dir)
    manifest_files = (
        spark.table("manifest_entries")
        .filter(F.col("backup_name") == DIFF_BACKUP)
        .select("object_key", "size", "hash")
    )
    return diff.restore_diff(manifest_files, spark.table("local_files"))


def q05_latest_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention.latest_manifest_per_prefix(
        _fixture(spark, sf_dir, "manifests")
    ).select("backup_name", "snapshot", "schema_version", "ts")


def q06_retention_older_than(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention.retention_older_than(
        _fixture(spark, sf_dir, "manifests"), RETENTION_CUTOFF_MS
    )


def q07_commitlog_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return commitlog.commitlog_window(
        _fixture(spark, sf_dir, "commitlogs"), CL_START_MS, CL_END_MS
    )


def q08_entity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    filtered = entities.entity_filter(
        _fixture(spark, sf_dir, "manifest_entries"), ENTITY_EXPR
    )
    return filtered.groupBy("keyspace", "table_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("files"),
        F.sum("size").cast("bigint").alias("size_bytes"),
    )


def q09_rename_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    remapped = entities.rename_remap(
        _fixture(spark, sf_dir, "manifest_entries"), RENAME_PAIRS
    )
    return remapped.groupBy("keyspace", "table_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("files")
    )


def q10_topology_dc_racks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topology.dc_rack_counts(
        _fixture(spark, sf_dir, "topology"), ["ASIA", "EUROPE"]
    )


def q11_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _fixture(spark, sf_dir, "manifest_entries")
    return snapshots.snapshot_merge(
        e.filter(F.col("backup_name") == "backup-0"),
        e.filter(F.col("backup_name") == "backup-1"),
    )


def q12_schema_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _fixture(spark, sf_dir, "snapshot_schemas")
    return snapshots.schema_diff(
        s.filter(F.col("backup_name") == "backup-0"),
        s.filter(F.col("backup_name") == "backup-3"),
    )


# --- general analytics surface (Q13-Q20 on the TPC-H-ish tables) ------------
SHIP_START_S = 820454400   # 1996-01-01 UTC
SHIP_END_S = 852076800     # 1997-01-01 UTC


def _base(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    fx.load_base_tables(spark, sf_dir)
    return spark.table(name)


def q13_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.filter_project(
        _base(spark, sf_dir, "lineitem"), SHIP_START_S, SHIP_END_S
    )


def q14_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx.load_base_tables(spark, sf_dir)
    return analytics.join_agg(
        spark.table("orders"), spark.table("customer"), spark.table("nation")
    )


def q15_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.group_agg(_base(spark, sf_dir, "lineitem"))


def q16_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.window_rank(_base(spark, sf_dir, "orders"), k=3)


def q17_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.rollup_agg(_base(spark, sf_dir, "lineitem"))


def q18_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.top_k(_base(spark, sf_dir, "customer"), k=10)


def q19_anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx.load_base_tables(spark, sf_dir)
    return analytics.anti_semi_counts(
        spark.table("customer"), spark.table("orders"), spark.table("nation")
    )


def q20_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.tumbling_window_agg(_base(spark, sf_dir, "events"), width_s=3600)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the backup-listing report."""
    return q01_list_backups(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_list_backups": q01_list_backups,
        "q02_removable_entries": q02_removable_entries,
        "q03_upload_diff": q03_upload_diff,
        "q04_restore_diff": q04_restore_diff,
        "q05_latest_manifest": q05_latest_manifest,
        "q06_retention_older_than": q06_retention_older_than,
        "q07_commitlog_window": q07_commitlog_window,
        "q08_entity_filter": q08_entity_filter,
        "q09_rename_remap": q09_rename_remap,
        "q10_topology_dc_racks": q10_topology_dc_racks,
        "q11_snapshot_merge": q11_snapshot_merge,
        "q12_schema_diff": q12_schema_diff,
        "q13_filter_project": q13_filter_project,
        "q14_join_agg": q14_join_agg,
        "q15_group_agg": q15_group_agg,
        "q16_window_rank": q16_window_rank,
        "q17_rollup": q17_rollup,
        "q18_topk": q18_topk,
        "q19_anti_semi_join": q19_anti_semi_join,
        "q20_events_windows": q20_events_windows,
    }


# --- DuckDB oracle ----------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    W = fx.oracle_with_clause
    return {
        "q01_list_backups": W("manifest_entries") + """
            , refcounts AS (
                SELECT object_key, COUNT(DISTINCT backup_name) AS n_backups
                FROM manifest_entries GROUP BY 1
            )
            SELECT e.backup_name, e.backup_ts,
                   CAST(COUNT(*) AS BIGINT) AS files,
                   CAST(SUM(e.size) AS BIGINT) AS size_bytes,
                   CAST(SUM(CASE WHEN r.n_backups = 1 THEN e.size ELSE 0 END) AS BIGINT)
                       AS reclaimable_bytes
            FROM manifest_entries e JOIN refcounts r USING (object_key)
            GROUP BY 1, 2
        """,
        "q02_removable_entries": W("manifest_entries") + f"""
            SELECT object_key, size FROM (
                SELECT DISTINCT object_key, size FROM manifest_entries
                WHERE backup_name = '{DIFF_BACKUP}'
            ) b
            WHERE object_key IN (
                SELECT object_key FROM manifest_entries
                GROUP BY 1 HAVING COUNT(DISTINCT backup_name) = 1
            )
        """,
        "q03_upload_diff": W("manifest_entries", "remote_objects") + f"""
            SELECT DISTINCT e.object_key, e.size
            FROM manifest_entries e
            WHERE e.backup_name = '{UPLOAD_BACKUP}'
              AND e.object_key NOT IN (SELECT object_key FROM remote_objects)
        """,
        "q04_restore_diff": W("manifest_entries", "local_files") + f"""
            , mf AS (
                SELECT DISTINCT object_key AS rel_file, size, hash
                FROM manifest_entries WHERE backup_name = '{DIFF_BACKUP}'
            )
            SELECT 'download' AS action, rel_file, size FROM mf
            WHERE rel_file NOT IN (SELECT rel_file FROM local_files)
            UNION ALL
            SELECT 'delete' AS action, rel_file, size FROM local_files
            WHERE rel_file NOT IN (SELECT rel_file FROM mf)
            UNION ALL
            SELECT 'mismatch' AS action, mf.rel_file, mf.size
            FROM mf JOIN local_files l USING (rel_file)
            WHERE mf.hash <> l.hash
        """,
        "q05_latest_manifest": W("manifests") + """
            SELECT backup_name, snapshot, schema_version, ts FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY snapshot, schema_version
                    ORDER BY ts DESC, backup_name DESC) AS rn
                FROM manifests
            ) t WHERE rn = 1
        """,
        "q06_retention_older_than": W("manifests") + f"""
            SELECT backup_name, ts FROM manifests WHERE ts < {RETENTION_CUTOFF_MS}
        """,
        "q07_commitlog_window": W("commitlogs") + f"""
            SELECT name, ts, size FROM commitlogs
            WHERE ts >= {CL_START_MS} AND ts <= {CL_END_MS}
            UNION ALL
            SELECT name, ts, size FROM commitlogs
            WHERE ts = (SELECT MIN(ts) FROM commitlogs WHERE ts > {CL_END_MS})
        """,
        "q08_entity_filter": W("manifest_entries") + """
            SELECT keyspace, table_name,
                   CAST(COUNT(*) AS BIGINT) AS files,
                   CAST(SUM(size) AS BIGINT) AS size_bytes
            FROM manifest_entries
            WHERE ((keyspace = 'ks0' AND table_name = 't1')
                   OR (keyspace = 'ks1' AND table_name = 't3'))
              AND keyspace NOT IN
                  ('system', 'system_schema', 'system_auth',
                   'system_distributed', 'system_traces')
            GROUP BY 1, 2
        """,
        "q09_rename_remap": W("manifest_entries") + """
            SELECT
              CASE WHEN keyspace = 'ks0' AND table_name = 't1' THEN 'ks9'
                   ELSE keyspace END AS keyspace,
              CASE WHEN keyspace = 'ks0' AND table_name = 't1' THEN 't9'
                   ELSE table_name END AS table_name,
              CAST(COUNT(*) AS BIGINT) AS files
            FROM manifest_entries
            GROUP BY 1, 2
        """,
        "q10_topology_dc_racks": W("topology") + """
            SELECT dc, rack, CAST(COUNT(*) AS BIGINT) AS nodes
            FROM topology WHERE dc IN ('ASIA', 'EUROPE')
            GROUP BY 1, 2
        """,
        "q11_snapshot_merge": W("manifest_entries") + """
            SELECT keyspace, table_name,
                   CAST(COUNT(*) AS BIGINT) AS objects,
                   CAST(SUM(size) AS BIGINT) AS total_size
            FROM (
                SELECT DISTINCT keyspace, table_name, object_key, size
                FROM manifest_entries
                WHERE backup_name IN ('backup-0', 'backup-1')
            ) t
            GROUP BY 1, 2
        """,
        "q12_schema_diff": W("snapshot_schemas") + """
            SELECT a.keyspace, a.table_name,
                   a.schema_content AS schema_a, b.schema_content AS schema_b
            FROM snapshot_schemas a
            JOIN snapshot_schemas b
              ON a.keyspace = b.keyspace AND a.table_name = b.table_name
            WHERE a.backup_name = 'backup-0' AND b.backup_name = 'backup-3'
              AND a.schema_content <> b.schema_content
        """,
        "q13_filter_project": f"""
            SELECT l_orderkey, l_linenumber,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                       AS revenue_cents
            FROM lineitem
            WHERE epoch(l_shipdate) >= {SHIP_START_S}
              AND epoch(l_shipdate) < {SHIP_END_S}
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q14_join_agg": """
            SELECT n_name, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS order_count,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        """,
        "q15_group_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS sum_qty_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS sum_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS count_rows,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS distinct_orders,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                       / COUNT(*) / 100.0 AS avg_qty
            FROM lineitem
            GROUP BY 1, 2
        """,
        "q16_window_rank": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
                FROM orders
            ) t WHERE rn <= 3
        """,
        "q17_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS sum_qty_cents,
                   CAST(COUNT(*) AS BIGINT) AS count_rows
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "q18_topk": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer
            ORDER BY c_acctbal DESC, c_custkey ASC
            LIMIT 10
        """,
        "q19_anti_semi_join": """
            SELECT n_name,
                   CAST(COUNT(*) FILTER (WHERE o.o_custkey IS NOT NULL) AS BIGINT)
                       AS with_orders,
                   CAST(COUNT(*) FILTER (
                       WHERE c_custkey IS NOT NULL AND o.o_custkey IS NULL) AS BIGINT)
                       AS without_orders
            FROM nation
            LEFT JOIN customer ON c_nationkey = n_nationkey
            LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
                   ON c_custkey = o.o_custkey
            GROUP BY 1
        """,
        "q20_events_windows": """
            SELECT (epoch_ms(ts) // 1000 // 3600) * 3600 AS window_start_epoch,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM events
            GROUP BY 1, 2
        """,
    }
