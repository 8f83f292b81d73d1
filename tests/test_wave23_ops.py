"""Wave-23 operators: UCB source ranking, daily JSD mix drift.
Oracle-checked by q218–q219 (streaming CUSUM in test_cusum_stream.py)."""

import datetime as dt
import math

from esop_spark.operators import analytics
from esop_spark.operators import text as text_ops


DOC_COLS = ["doc_id", "text", "lang", "source"]
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ev(eid, uid, days, etype):
    return (
        eid,
        dt.datetime(2024, 1, 1) + dt.timedelta(days=days),
        uid,
        etype,
        1.0,
        "{}",
    )


def test_ucb_small_source_gets_bigger_bonus(spark):
    good = " ".join(["a the"] * 20 + ["w%d" % i for i in range(20)])
    docs = spark.createDataFrame(
        [(i, good, "en", "big") for i in range(20)]
        + [(100, good, "en", "small")],
        DOC_COLS,
    )
    out = {r["source"]: r for r in text_ops.ucb_source_rank(docs).collect()}
    assert out["small"]["bonus"] > out["big"]["bonus"]
    # equal rates -> small source outranks on the exploration term
    assert out["small"]["ucb_score"] > out["big"]["ucb_score"]
    n_total = 21
    expected = math.sqrt(2 * math.log(n_total) / 1)
    assert abs(out["small"]["bonus"] - expected) < 1e-6


def test_jsd_identical_days_zero_disjoint_ln2(spark):
    rows = (
        # day0 & day1 same mix -> jsd 0
        [_ev(1, "u1", 0, "view"), _ev(2, "u2", 0, "click"),
         _ev(3, "u1", 1, "view"), _ev(4, "u2", 1, "click")]
        # day2 disjoint type -> jsd = ln 2
        + [_ev(5, "u1", 2, "error"), _ev(6, "u2", 2, "error")]
    )
    events = spark.createDataFrame(rows, EV_COLS)
    out = {r["day"]: r for r in analytics.daily_type_jsd(events).collect()}
    days = sorted(out)
    assert len(days) == 2
    assert out[days[0]]["jsd_nats"] == 0.0
    assert abs(out[days[1]]["jsd_nats"] - math.log(2)) < 1e-6


def test_jsd_skips_missing_days(spark):
    rows = [_ev(1, "u1", 0, "view"), _ev(2, "u1", 5, "view")]
    events = spark.createDataFrame(rows, EV_COLS)
    # days 0 and 5 are not adjacent: no pair rows
    assert analytics.daily_type_jsd(events).count() == 0
