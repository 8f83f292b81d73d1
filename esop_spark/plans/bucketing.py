"""Bucketed materialization: pre-shuffle once, join/aggregate shuffle-free
forever after.

At 100 TB the manifest fact table is joined on ``object_key`` by every
listing/dedup/removal query (J1–J5). Materializing it bucketed by the join
key trades ONE write-time shuffle for ZERO shuffles in every subsequent
join/aggregation on that key — the Spark-native analog of the reference's
content-addressed object layout (keys ARE uniformly distributed, so buckets
are balanced by construction).

`spark.sql.sources.bucketing.enabled` (default true) lets Catalyst use the
bucket spec; `bucketing.autoBucketedScan.enabled` prunes it when not useful.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> DataFrame:
    """Write df as a bucketed managed table and return the bucketed relation.

    Joins/aggregations keyed on ``bucket_col`` between two tables bucketed
    the same way run with NO Exchange on either side (verified by
    tests/test_bucketing.py inspecting the physical plan).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a previous session may have left the managed location behind (fresh
    # catalog, stale directory → LOCATION_ALREADY_EXISTS)
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith(("file:", "/")):
        import shutil

        shutil.rmtree(
            os.path.join(warehouse.removeprefix("file:"), table_name.lower()),
            ignore_errors=True,
        )
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
    return spark.table(table_name)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — a
    SortMergeJoin with no shuffle exchange on either input.

    The merge hint pins the sort-merge strategy so the property being
    demonstrated is bucket co-location, not a broadcast that would hide it
    (at 100 TB neither side broadcasts anyway)."""
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), key
    )
