"""Wave-28 operators: partition advisor, degree assortativity, YoY
revenue growth. Oracle-checked by q232–q234."""

import datetime as dt

from esop_spark.operators import analytics, graph


def test_partition_advisor_exact_bytes(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "de")], ["id", "s"]
    )
    out = analytics.partition_advisor(
        {"t": df}, target_bytes=100, min_partitions=4
    ).collect()
    r = out[0]
    # 2 rows * 8 bytes (id) + 5 string bytes = 21
    assert r["n_rows"] == 2
    assert r["est_bytes"] == 21
    assert r["scan_partitions"] == 1
    assert r["shuffle_partitions"] == 4  # floor at min_partitions


def test_partition_advisor_scan_ceil(spark):
    df = spark.createDataFrame([(i, "x" * 10) for i in range(10)], ["id", "s"])
    r = analytics.partition_advisor(
        {"t": df}, target_bytes=50, min_partitions=1
    ).collect()[0]
    # bytes = 10*8 + 100 = 180 -> ceil(180/50) = 4
    assert r["est_bytes"] == 180
    assert r["scan_partitions"] == 4
    assert r["shuffle_partitions"] == 4


def test_assortativity_star_is_negative(spark):
    # star graph: hub connects to leaves -> high-degree pairs with
    # degree-1 nodes on every edge -> strongly disassortative
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)],
        ["src", "dst"],
    )
    r = graph.degree_assortativity(edges).collect()[0]
    assert r["n_edges"] == 10
    assert r["n_nodes"] == 6
    assert r["assortativity"] == -1.0


def test_assortativity_regular_graph_undefined(spark):
    # 4-cycle: every node degree 2 -> zero variance -> NULL
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 0), (0, 3)],
        ["src", "dst"],
    )
    r = graph.degree_assortativity(edges).collect()[0]
    assert r["assortativity"] is None


def test_yoy_growth_exact(spark):
    orders = spark.createDataFrame(
        [
            (1, 100, "F", 100.0, dt.datetime(1995, 6, 1), "1-URGENT"),
            (2, 100, "F", 150.0, dt.datetime(1996, 6, 1), "1-URGENT"),
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    customer = spark.createDataFrame(
        [(100, 10)], ["c_custkey", "c_nationkey"]
    )
    nation = spark.createDataFrame(
        [(10, "JAPAN", 1)], ["n_nationkey", "n_name", "n_regionkey"]
    )
    out = sorted(
        analytics.yoy_revenue_growth(orders, customer, nation).collect(),
        key=lambda r: r["year"],
    )
    assert out[0]["growth_ppm"] is None
    assert out[1]["growth_ppm"] == 500_000  # +50%
