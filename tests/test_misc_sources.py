"""Topology JSON source (S10), prefix filter (P7), commit-log restore."""

import json
import os

from esop_spark.operators import pipelines, retention, topology
from esop_spark.streaming import commitlog_stream
from tests.test_streaming import _write_segment


def test_read_topology_json(spark, tmp_path):
    doc = {
        "timestamp": 1700000000000,
        "clusterName": "c1",
        "schemaVersion": "sv-1",
        "topology": [
            {"hostname": "cassandra-dc1-0", "cluster": "c1", "dc": "dc1",
             "rack": "r1", "nodeId": "11111111-aaaa", "ipAddress": "10.0.0.1"},
            {"hostname": "cassandra-dc2-0", "cluster": "c1", "dc": "dc2",
             "rack": "r1", "nodeId": "22222222-bbbb", "ipAddress": "10.0.0.2"},
        ],
    }
    p = tmp_path / "topology.json"
    p.write_text(json.dumps(doc))
    t = topology.read_topology_json(spark, str(p))
    assert t.count() == 2
    assert topology.resolve_node(t, "cassandra-dc2") == "22222222-bbbb"
    assert topology.schema_consensus(t) is True
    got = {r["dc"] for r in topology.filter_dcs(t, ["dc1"]).collect()}
    assert got == {"dc1"}


def test_filter_manifests_prefix(spark):
    m = spark.createDataFrame(
        [("snap-1-sv1-100", "snap-1", "sv1", 100, 1),
         ("snap-10-sv1-200", "snap-10", "sv1", 200, 1),
         ("snap-1-sv2-300", "snap-1", "sv2", 300, 1)],
        "backup_name string, snapshot string, schema_version string, ts long, size long",
    )
    got = {r["backup_name"] for r in
           retention.filter_manifests_prefix(m, "snap-1-sv1").collect()}
    assert got == {"snap-1-sv1-100"}
    got = {r["backup_name"] for r in
           retention.filter_manifests_prefix(m, "snap-1", schema_version="sv2").collect()}
    assert got == {"snap-1-sv2-300"}


def test_restore_commitlogs_pit(spark, tmp_path):
    src, bucket, ckpt = str(tmp_path / "cl"), str(tmp_path / "b"), str(tmp_path / "ck")
    os.makedirs(src)
    for i in range(6):
        _write_segment(src, f"CommitLog-7-{i}.log", f"s{i}", 2000 + i)
    q = commitlog_stream.archive_commitlogs(spark, src, bucket, ckpt, available_now=True)
    assert q.awaitTermination(120), "stream did not terminate"
    target = str(tmp_path / "recovery")
    n = pipelines.restore_commitlogs(spark, bucket, target, 2001000, 2003000)
    # segments 1..3 in window + overhang 4
    assert n == 4
    assert sorted(os.listdir(target)) == [f"CommitLog-7-{i}.log" for i in range(1, 5)]
