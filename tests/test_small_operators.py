"""W6/W7/F13/U5/salting operator tests."""

import os
import time

import pytest
from pyspark.sql import functions as F

from esop_spark.operators import pipelines, retention
from esop_spark.operators.analytics import salted_agg
from tests.test_pipelines import TABLE_ID, make_tree


def test_parse_duration_ms():
    assert retention.parse_duration_ms("14day") == 14 * 86400000
    assert retention.parse_duration_ms("1minute") == 60000
    assert retention.parse_duration_ms("2 hours") == 7200000
    with pytest.raises(ValueError):
        retention.parse_duration_ms("fortnight")


def test_latest_table_dir_winner(spark):
    dirs = spark.createDataFrame(
        [
            ("ks1", "t1", "id-old", "/d0/ks1/t1-old", 100),
            ("ks1", "t1", "id-new", "/d1/ks1/t1-new", 200),
            ("ks1", "t2", "id-x", "/d0/ks1/t2-x", 50),
        ],
        "keyspace string, table_name string, table_id string, path string, mtime long",
    )
    got = {r["table_name"]: r["table_id"] for r in retention.latest_table_dir(dirs).collect()}
    assert got == {"t1": "id-new", "t2": "id-x"}


def test_round_robin_assign(spark):
    df = spark.createDataFrame([(f"g{i}",) for i in range(7)], "grp string")
    got = {r["grp"]: r["target_idx"] for r in
           retention.round_robin_assign(df, 3, ["grp"]).collect()}
    # deterministic: sorted order g0..g6 → 0,1,2,0,1,2,0
    assert got == {f"g{i}": i % 3 for i in range(7)}


def test_salted_agg_matches_direct(spark):
    df = spark.createDataFrame(
        [("hot", i % 5) for i in range(1000)] + [("cold", 7)],
        "k string, v long",
    )
    direct = {
        (r["k"]): (r["c"], r["s"])
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")).collect()
    }
    salted = {
        (r["k"]): (r["count_rows"], r["sum_v"])
        for r in salted_agg(df, ["k"], ["v"], salt_buckets=8).collect()
    }
    assert salted == direct


def test_backup_rate_limit_throttles(spark, tmp_path):
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    files = {("ks1", "t1", "me-1-big-Data.db"): "x" * 50_000}
    make_tree(data, "s1", files)
    t0 = time.monotonic()
    pipelines.backup(
        spark, [data], "s1", bucket, ts_millis=1, max_bytes_per_sec=100_000
    )
    elapsed = time.monotonic() - t0
    # 50 kB at 100 kB/s → ≥ 0.5 s spent inside the token bucket
    assert elapsed >= 0.5


def test_sketch_distinct_within_tolerance(spark):
    from esop_spark.operators.analytics import sketch_distinct
    import pyspark.sql.functions as F

    df = spark.range(0, 20000).selectExpr("id % 4 as g", "concat('v', id % 3000) as v")
    got = {r["g"]: r["approx_distinct"] for r in sketch_distinct(df, ["g"], "v", rsd=0.02).collect()}
    exact = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    for g, d in exact.items():
        assert abs(got[g] - d) / d < 0.06, (g, got[g], d)


def test_range_join_matches_theta(spark):
    from esop_spark.operators.analytics import range_join

    ranges = spark.createDataFrame(
        [(1, 100, 200), (2, 150, 160), (3, 900, 1000)], "rid long, s long, e long"
    )
    points = spark.createDataFrame(
        [(i,) for i in range(0, 1100, 25)], "p long"
    )
    got = {(r["rid"], r["p"]) for r in range_join(ranges, points, "s", "e", "p", 50).collect()}
    expected = {
        (rid, p)
        for rid, s, e in [(1, 100, 200), (2, 150, 160), (3, 900, 1000)]
        for p in range(0, 1100, 25)
        if s <= p <= e
    }
    assert got == expected


def test_backup_secondary_index_dirs(spark, tmp_path):
    """2.2-style secondary index: components under a .idx subdir produce
    6-component object keys and restore back into the .idx subdir (P14/F16)."""
    data, bucket = str(tmp_path / "data"), str(tmp_path / "bucket")
    d = os.path.join(data, "ks1", f"t1-{TABLE_ID}", "snapshots", "s1")
    os.makedirs(os.path.join(d, ".myidx"))
    with open(os.path.join(d, "me-1-big-Data.db"), "w") as f:
        f.write("base-data")
    with open(os.path.join(d, ".myidx", "me-1-big-Data.db"), "w") as f:
        f.write("idx-data")
    up = pipelines.backup(spark, [data], "s1", bucket, ts_millis=1)
    keys = sorted(r["object_key"] for r in up.collect())
    assert len(keys) == 2
    idx_key = [k for k in keys if "/.myidx/" in k][0]
    assert len(idx_key.split("/")) == 6  # data/ks/table-id/.idx/gen-digest/file
    target = str(tmp_path / "restored")
    stats = pipelines.restore(spark, bucket, target)
    assert stats["downloaded"] == 2
    with open(os.path.join(target, "ks1", f"t1-{TABLE_ID}", ".myidx", "me-1-big-Data.db")) as f:
        assert f.read() == "idx-data"
