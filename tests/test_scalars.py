"""Unit tests for scalar parsing functions against the reference's accept
vectors (FIXTURES.md §10, SSTableUtilsTest.java:9-16)."""

import pytest
from pyspark.sql import functions as F

from esop_spark.functions import scalars
from esop_spark.operators.entities import classify_keyspace, parse_entities

SSTABLE_ACCEPT = [
    ("instaclustr-recovery_codes-jb-1-Data.db", "1"),
    ("lb-1-big-Data.db", "1"),
    ("mc-1-big-Data.db", "1"),
    ("da-3gy0_111j_2u8ka1z4k2vcw67ubc-bti-Data.db", "3gy0_111j_2u8ka1z4k2vcw67ubc"),
    ("da-1-bti-Data.db", "1"),
]


def test_sstable_name_parse(spark):
    df = spark.createDataFrame([(n,) for n, _ in SSTABLE_ACCEPT], "fn string")
    rows = df.select(
        "fn",
        scalars.sstable_base("fn").alias("base"),
        scalars.sstable_generation("fn").alias("gen"),
    ).collect()
    expected = dict(SSTABLE_ACCEPT)
    for r in rows:
        assert r["base"] != "", r["fn"]
        assert r["gen"] == expected[r["fn"]], r["fn"]


def test_manifest_name_parse(spark):
    name = "snap1-f1159959-1600645216000"
    df = spark.createDataFrame([(name,)], "n string")
    r = df.select(
        scalars.manifest_name_timestamp("n").alias("ts"),
        scalars.manifest_name_schema_version("n").alias("sv"),
        scalars.manifest_name_snapshot("n").alias("snap"),
    ).collect()[0]
    assert r["ts"] == 1600645216000
    assert r["sv"] == "f1159959"
    assert r["snap"] == "snap1"


def test_storage_location_parse(spark):
    df = spark.createDataFrame(
        [("s3://bucket/cluster1/dc1/node-abc",)], "loc string"
    )
    r = df.select(scalars.storage_location_parts("loc").alias("p")).collect()[0]["p"]
    assert (r["protocol"], r["bucket"], r["cluster"], r["dc"], r["node"]) == (
        "s3", "bucket", "cluster1", "dc1", "node-abc",
    )


def test_secondary_index_key(spark):
    df = spark.createDataFrame(
        [
            ("data/ks/table-id/.idx_name/gen-digest/file.db", True),
            ("data/ks/table-id/gen-digest/file.db", False),
        ],
        "k string, expected boolean",
    )
    for r in df.select("expected", scalars.is_secondary_index_key("k").alias("got")).collect():
        assert r["got"] == r["expected"]


def test_table_dir_parse(spark):
    df = spark.createDataFrame(
        [("recovery_codes-5f2fbdad025f1b45a6cd84e52b42a1d4",)], "d string"
    )
    r = df.select(
        scalars.table_dir_name("d").alias("t"), scalars.table_dir_id("d").alias("i")
    ).collect()[0]
    assert r["t"] == "recovery_codes"
    assert r["i"] == "5f2fbdad025f1b45a6cd84e52b42a1d4"


def test_parse_entities_vectors():
    assert parse_entities("") == ([], [])
    assert parse_entities("ks1") == (["ks1"], [])
    assert parse_entities("ks1,ks2") == (["ks1", "ks2"], [])
    assert parse_entities("ks1.t1,ks2.t2") == ([], [("ks1", "t1"), ("ks2", "t2")])
    assert parse_entities(" ks1 . t1 , ks2 . t2 ") == ([], [("ks1", "t1"), ("ks2", "t2")])
    with pytest.raises(ValueError):
        parse_entities("ks1,ks2.t2")  # mixed forms rejected


def test_classify_keyspace(spark):
    df = spark.createDataFrame(
        [("system",), ("system_schema",), ("system_auth",),
         ("system_distributed",), ("system_traces",), ("userks",)],
        "ks string",
    )
    got = {r["ks"]: r["t"] for r in df.select("ks", classify_keyspace("ks").alias("t")).collect()}
    assert got == {
        "system": "SYSTEM",
        "system_schema": "SCHEMA",
        "system_auth": "SYSTEM_AUTH",
        "system_distributed": "SYSTEM",
        "system_traces": "SYSTEM",
        "userks": "OTHER",
    }
