"""Wave-21 operators: TPC-H Q5 regional revenue, A/B z-test sanity,
time-spine gap fill, conditional char-bigram entropy.
Oracle-checked by q209–q212."""

import datetime as dt
import math

from esop_spark.operators import analytics
from esop_spark.operators import text as text_ops


DOC_COLS = ["doc_id", "text", "lang", "source"]
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ev(eid, uid, days, etype="click"):
    return (
        eid,
        dt.datetime(2024, 1, 1) + dt.timedelta(days=days),
        uid,
        etype,
        1.0,
        "{}",
    )


# --- regional revenue --------------------------------------------------------

def test_regional_revenue_same_nation_rule(spark):
    region = spark.createDataFrame(
        [(1, "ASIA"), (2, "EUROPE")], ["r_regionkey", "r_name"]
    )
    nation = spark.createDataFrame(
        [(10, "JAPAN", 1), (11, "FRANCE", 2)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    customer = spark.createDataFrame(
        [(100, 10), (101, 11)], ["c_custkey", "c_nationkey"]
    )
    supplier = spark.createDataFrame(
        [(200, 10), (201, 11)], ["s_suppkey", "s_nationkey"]
    )
    t = dt.datetime(1996, 6, 1)
    orders = spark.createDataFrame(
        [(1000, 100, t), (1001, 101, t)],
        ["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lineitem = spark.createDataFrame(
        [
            # qualifying: ASIA customer, supplier in SAME nation
            (1000, 200, 100.0, 0.1),
            # dropped: supplier nation != customer nation
            (1000, 201, 50.0, 0.0),
            # dropped: EUROPE customer
            (1001, 201, 70.0, 0.0),
        ],
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    out = analytics.regional_revenue(
        lineitem, orders, customer, supplier, nation, region,
        region_name="ASIA",
    ).collect()
    assert len(out) == 1
    assert out[0]["n_name"] == "JAPAN"
    assert out[0]["revenue_cents"] == 9000  # 100 * 0.9 * 100


# --- ab ----------------------------------------------------------------------

def test_ab_z_zero_when_arms_identical(spark):
    # construct users so both md5 arms get the same conversion rate by
    # checking output invariants rather than forcing the hash
    rows = []
    eid = 0
    for u in range(40):
        eid += 1
        rows.append(_ev(eid, f"u{u}", 0, "purchase"))
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.ab_conversion_z(events).collect()[0]
    assert r["n_a"] + r["n_b"] == 40
    # everyone converts in both arms -> pooled p = 1 -> se = 0 -> NULL z
    assert r["conv_a"] == r["n_a"] and r["conv_b"] == r["n_b"]
    assert r["z_score"] is None


def test_ab_counts_partition_users(spark):
    rows = [_ev(i, f"u{i}", 0, "purchase" if i % 2 else "view")
            for i in range(30)]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.ab_conversion_z(events).collect()[0]
    assert r["n_a"] + r["n_b"] == 30
    assert r["conv_a"] + r["conv_b"] == 15


# --- time spine --------------------------------------------------------------

def test_time_spine_fills_gaps(spark):
    rows = [_ev(1, "u1", 0), _ev(2, "u2", 0), _ev(3, "u1", 3)]
    events = spark.createDataFrame(rows, EV_COLS)
    out = sorted(
        analytics.time_spine_fill(events).collect(), key=lambda r: r["day"]
    )
    assert len(out) == 4  # days 0..3 inclusive
    assert out[0]["n_events"] == 2 and out[0]["is_gap"] == 0
    assert out[1]["n_events"] == 0 and out[1]["is_gap"] == 1
    assert out[2]["n_events"] == 0 and out[2]["is_gap"] == 1
    assert out[3]["n_events"] == 1 and out[3]["is_gap"] == 0


# --- char bigram entropy -----------------------------------------------------

def test_char_entropy_deterministic_text_is_zero(spark):
    # 'ababab': pairs ab, ba, ab, ba, ab -> each c1 has ONE successor
    docs = spark.createDataFrame([(1, "ababab", "en", "s")], DOC_COLS)
    r = text_ops.char_bigram_entropy(docs).collect()[0]
    assert r["n_pairs"] == 5
    assert r["cond_entropy_nats"] == 0.0
    assert r["perplexity"] == 1.0


def test_char_entropy_uniform_branching_is_ln2(spark):
    # from 'a', successors are b and c equally often; strings 'ab' and
    # 'ac' contribute one pair each
    docs = spark.createDataFrame(
        [(1, "ab", "en", "s"), (2, "ac", "en", "s")], DOC_COLS
    )
    r = text_ops.char_bigram_entropy(docs).collect()[0]
    assert r["n_pairs"] == 2
    assert abs(r["cond_entropy_nats"] - math.log(2)) < 1e-6


def test_char_entropy_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en", "s"), (2, "ab", "en", "s")], DOC_COLS
    )
    r = text_ops.char_bigram_entropy(docs).collect()[0]
    assert r["n_pairs"] == 1
