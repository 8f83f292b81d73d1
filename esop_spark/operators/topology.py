"""Cluster-topology queries.

Reference semantics:
- P15 DC filter with invalid-DC validation
  (/root/reference/core/src/main/java/com/instaclustr/esop/topology/CassandraClusterTopology.java:74-78,241-250).
- P16 hostname→nodeId resolution: exactly one row with nodeId == x or
  hostname startswith x; 0 or >1 rows → error
  (CassandraClusterTopology.java:191-209).
- A12 per-DC / per-rack counts (CassandraClusterTopology.java:150-188).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


TOPOLOGY_SCHEMA = (
    "timestamp bigint, clusterName string, schemaVersion string, "
    "topology array<struct<hostname:string, cluster:string, dc:string, "
    "rack:string, nodeId:string, ipAddress:string>>"
)


def read_topology_json(spark, path: str):
    """S10: topology JSON file(s) → flat topology DataFrame (header fields
    denormalized onto each node row), explicit schema, no inference
    (InPlaceRestorationStrategy.java:171-182; README 'Topology File')."""
    from pyspark.sql import functions as FF

    raw = spark.read.schema(TOPOLOGY_SCHEMA).option("multiLine", "true").json(path)
    return raw.select(
        FF.col("timestamp").alias("ts"),
        FF.col("clusterName").alias("cluster"),
        FF.col("schemaVersion").alias("schema_version"),
        FF.explode("topology").alias("n"),
    ).select(
        "ts",
        "cluster",
        "schema_version",
        FF.col("n.hostname").alias("hostname"),
        FF.col("n.dc").alias("dc"),
        FF.col("n.rack").alias("rack"),
        FF.col("n.nodeId").alias("node_id"),
        FF.col("n.ipAddress").alias("ip_address"),
    )


def filter_dcs(topology: DataFrame, dcs: list[str]) -> DataFrame:
    """P15: restrict topology to the given datacenters."""
    return topology.filter(F.col("dc").isin(dcs))


def dc_rack_counts(topology: DataFrame, dcs: list[str] | None = None) -> DataFrame:
    """A12/Q10: node counts per (dc, rack)."""
    t = filter_dcs(topology, dcs) if dcs else topology
    return t.groupBy("dc", "rack").agg(F.count(F.lit(1)).cast("bigint").alias("nodes"))


def schema_consensus(topology: DataFrame, schema_col: str = "schema_version") -> bool:
    """A10: cluster-wide schema agreement — exactly one distinct schema
    version across nodes (RestorationPhase.java:229-233)."""
    n = topology.agg(
        F.countDistinct(F.col(schema_col)).alias("n")
    ).collect()[0]["n"]
    return n == 1


def resolve_node(topology: DataFrame, node: str) -> str:
    """P16: resolve a hostname prefix or node id to exactly one nodeId."""
    rows = (
        topology.filter(
            (F.col("node_id") == node) | F.col("hostname").startswith(node)
        )
        .select("node_id")
        .limit(2)
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(f"node {node!r} resolves to {len(rows)} topology rows, expected 1")
    return rows[0]["node_id"]
