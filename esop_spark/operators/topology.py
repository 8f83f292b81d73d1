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
