"""Wave-31 operators: full TPC-H Q1 pricing summary, Q4/Q16/Q20 adaptations,
and the Z-order layout advisor. Oracle-checked by q256-q260; these tests pin
the non-oracle invariants (exact-cents identities, semi-join semantics, and
Morton-envelope geometry)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from esop_spark.operators import analytics
from esop_spark.plans import layout


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )


def test_pricing_summary_exact_cents(spark):
    d = datetime(1996, 6, 1)
    li = _li(
        spark,
        [
            (1, 2.0, 100.0, 0.10, 0.05, "A", "F", d),
            (2, 3.0, 200.0, 0.00, 0.10, "A", "F", d),
            (3, 1.0, 50.0, 0.50, 0.00, "N", "O", d),
        ],
    )
    rows = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in analytics.pricing_summary(li).collect()
    }
    af = rows[("A", "F")]
    assert af["sum_qty_cents"] == 500
    assert af["sum_base_cents"] == 30000
    # disc price: 100*0.9 + 200*1.0 = 290.00
    assert af["sum_disc_cents"] == 29000
    # charge: 90*1.05 + 200*1.1 = 94.50 + 220.00
    assert af["sum_charge_cents"] == 31450
    assert af["count_order"] == 2
    assert abs(af["avg_disc"] - 0.05) < 1e-9
    no = rows[("N", "O")]
    assert no["sum_disc_cents"] == 2500
    assert no["count_order"] == 1


def test_pricing_summary_cutoff_excludes(spark):
    li = _li(
        spark,
        [
            (1, 1.0, 10.0, 0.0, 0.0, "A", "F", datetime(1996, 1, 1)),
            (2, 1.0, 10.0, 0.0, 0.0, "A", "F", datetime(1999, 1, 1)),
        ],
    )
    out = analytics.pricing_summary(li, cutoff_epoch_s=904608000).collect()
    assert len(out) == 1 and out[0]["count_order"] == 1


def test_late_order_priority_semi_join_counts_orders_once(spark):
    od = datetime(1996, 7, 10)
    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", od),
            (2, "1-URGENT", od),
            (3, "5-LOW", od),
        ],
        "o_orderkey bigint, o_orderpriority string, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            # order 1: TWO late lines -> still counts once (semi join)
            (1, od + timedelta(days=40)),
            (1, od + timedelta(days=50)),
            # order 2: on-time only
            (2, od + timedelta(days=5)),
            # order 3: one late line
            (3, od + timedelta(days=31)),
        ],
        "l_orderkey bigint, l_shipdate timestamp",
    )
    out = {
        r["o_orderpriority"]: r["order_count"]
        for r in analytics.late_order_priority(
            orders, li, start_epoch_s=836179200, end_epoch_s=844128000
        ).collect()
    }
    assert out == {"1-URGENT": 1, "5-LOW": 1}


def test_excess_shippers_dominance_boundary(spark):
    d = datetime(1996, 3, 1)
    li = spark.createDataFrame(
        [
            # part 1: supplier 10 ships 60%, supplier 20 ships 40%
            (1, 10, 6.0, d),
            (1, 20, 4.0, d),
            # part 2: exactly 50/50 -> strict > excludes both
            (2, 10, 5.0, d),
            (2, 20, 5.0, d),
        ],
        "l_partkey bigint, l_suppkey bigint, l_quantity double, "
        "l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(10, "S10", 1), (20, "S20", 1)],
        "s_suppkey bigint, s_name string, s_nationkey int",
    )
    nation = spark.createDataFrame(
        [(1, "N1")], "n_nationkey int, n_name string"
    )
    out = analytics.excess_shippers(
        li, supplier, nation, frac=0.5
    ).collect()
    assert len(out) == 1
    assert out[0]["suppkey"] == 10 and out[0]["dominated_parts"] == 1


def test_morton_key_interleaves_exactly(spark):
    df = spark.createDataFrame(
        [(5, 3)], "ux bigint, uy bigint"
    )  # x=101, y=011 -> z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27? compute:
    # bit i of x goes to 2i, of y to 2i+1:
    # x=101: bits 0,2 -> z bits 0,4 ; y=011: bits 0,1 -> z bits 1,3
    # z = 1 + 2 + 8 + 16 = 27
    z = df.select(
        layout.morton_key(F.col("ux"), F.col("uy"), 3).alias("z")
    ).collect()[0]["z"]
    assert z == 27


def test_zorder_cell_stats_envelopes_and_skip(spark):
    # a grid of points; query box covering the low-left quadrant
    pts = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)],
        "x bigint, y bigint",
    )
    stats = layout.zorder_cell_stats(
        pts, "x", "y", bits=4, cell_bits=2, box=(0, 3, 0, 3)
    ).collect()
    assert len(stats) == 16  # 4**cell_bits buckets
    assert sum(r["n"] for r in stats) == 256
    # envelopes are tight axis-aligned rectangles for a full grid:
    for r in stats:
        assert r["min_x"] <= r["max_x"] and r["min_y"] <= r["max_y"]
    # the box covers exactly one 4x4 cell -> 1 bucket read, 15 skipped
    read = [r for r in stats if r["must_read"] == 1]
    assert len(read) == 1 and read[0]["n"] == 16
