"""Wave-30 operators: per-source stump evaluation, seasonal strength,
user-entropy census. Oracle-checked by q236–q238."""

import datetime as dt

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


def test_stump_eval_perfect_source(spark):
    # high-TTR doc with few stopwords: score ~93 (> 50) and passes gopher
    good = " ".join(["a the"] * 2 + ["w%d" % i for i in range(40)])
    bad = "a a a a"
    docs = spark.createDataFrame(
        [(i, good, "en", "s") for i in range(3)]
        + [(10 + i, bad, "en", "s") for i in range(3)],
        DOC_COLS,
    )
    r = text_ops.stump_eval_by_source(docs, threshold=50).collect()[0]
    assert r["tp"] == 3 and r["fp"] == 0 and r["fn"] == 0
    assert r["precision_milli"] == 1000
    assert r["recall_milli"] == 1000
    assert r["f1_milli"] == 1000


def test_stump_eval_undefined_metrics_are_null(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a", "en", "s")], DOC_COLS  # no positives either way
    )
    r = text_ops.stump_eval_by_source(docs, threshold=50).collect()[0]
    assert r["tp"] == 0
    assert r["precision_milli"] is None
    assert r["recall_milli"] is None


def test_seasonal_strength_pure_weekly_pattern(spark):
    # 2 weeks, dow pattern exactly repeats -> dow model explains all
    rows = []
    eid = 0
    for wk in range(2):
        for d in range(7):
            for i in range(d + 1):
                eid += 1
                rows.append(_ev(eid, f"u{i}", wk * 7 + d))
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.seasonal_strength(events).collect()[0]
    assert r["n_days"] == 14
    assert abs(r["strength"] - 1.0) < 1e-6


def test_seasonal_strength_flat_is_zero(spark):
    rows = [_ev(d * 10 + i, f"u{i}", d) for d in range(7) for i in range(2)]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.seasonal_strength(events).collect()[0]
    # constant series: SST = 0 -> strength NULL
    assert r["strength"] is None


def test_user_entropy_census_buckets(spark):
    rows = (
        # u1: one event type only -> normalized entropy 0 -> bin 0
        [_ev(i, "u1", 0, "click") for i in range(4)]
        # u2: uniform over the 2 global types -> entropy 1 -> top bin
        + [_ev(10, "u2", 0, "click"), _ev(11, "u2", 0, "view")]
    )
    events = spark.createDataFrame(rows, EV_COLS)
    out = {r["bin"]: r for r in
           analytics.user_entropy_census(events, bins=10).collect()}
    assert out[0]["n_users"] == 1
    assert out[0]["min_entropy_milli"] == 0
    assert out[9]["n_users"] == 1
    assert out[9]["max_entropy_milli"] == 1000
