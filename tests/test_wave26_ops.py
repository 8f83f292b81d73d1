"""Wave-26 operators: sole-late-supplier (TPC-H Q21 shape), l-diversity,
source-cap sweep. Oracle-checked by q226–q228."""

import datetime as dt

from esop_spark.operators import analytics, privacy
from esop_spark.operators import text as text_ops


DOC_COLS = ["doc_id", "text", "lang", "source"]


def test_sole_late_supplier_rules(spark):
    t0 = dt.datetime(2024, 1, 1)
    late = t0 + dt.timedelta(days=120)
    ontime = t0 + dt.timedelta(days=10)
    orders = spark.createDataFrame(
        [(1, t0), (2, t0), (3, t0)], ["o_orderkey", "o_orderdate"]
    )
    lineitem = spark.createDataFrame(
        [
            # order 1: two suppliers, only s10 late -> s10 counted
            (1, 10, late), (1, 11, ontime),
            # order 2: two suppliers BOTH late -> nobody counted
            (2, 10, late), (2, 12, late),
            # order 3: single supplier late -> not counted (no coblame)
            (3, 10, late),
        ],
        ["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    out = analytics.sole_late_supplier(lineitem, orders, late_days=90).collect()
    assert len(out) == 1
    assert out[0]["suppkey"] == 10 and out[0]["numwait"] == 1


def test_l_diversity_homogeneous_group_flagged(spark):
    # group (en, A): all same n_chars -> diversity 1;
    # group (fr, B): two distinct -> bucket 2+
    docs = spark.createDataFrame(
        [(1, "t", "en", "A", 5), (2, "t", "en", "A", 5),
         (3, "t", "fr", "B", 5), (4, "t", "fr", "B", 9)],
        DOC_COLS + ["n_chars"],
    )
    out = {r["bucket"]: r for r in privacy.l_diversity_audit(
        docs, ["lang", "source"], "n_chars", l=2).collect()}
    assert out["1"]["n_groups"] == 1 and out["1"]["n_rows"] == 2
    assert out["2+"]["n_groups"] == 1 and out["2+"]["n_rows"] == 2
    assert out["1"]["rows_ppm"] == 500_000


def test_cap_sweep_exact_survival(spark):
    docs = spark.createDataFrame(
        [(i, "w x y z", "en", "big") for i in range(8)]
        + [(100, "a b", "en", "small")],
        DOC_COLS,
    )
    out = {(r["source"], r["cap"]): r
           for r in text_ops.cap_sweep(docs, caps=(5, 10)).collect()}
    assert out[("big", 5)]["kept_docs"] == 5
    assert out[("big", 5)]["kept_tokens_est"] == 32 * 5 // 8  # 20
    assert out[("big", 10)]["kept_docs"] == 8
    assert out[("small", 5)]["kept_docs"] == 1
    assert out[("small", 5)]["kept_tokens_est"] == 2
