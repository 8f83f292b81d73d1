"""Wave-25 operators: negative-sampling table, sample-size planner,
event idempotency audit. Oracle-checked by q223–q225."""

import datetime as dt
import math

from esop_spark.operators import analytics
from esop_spark.operators import text as text_ops


DOC_COLS = ["doc_id", "text", "lang", "source"]
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_negative_sampling_alpha_flattens(spark):
    # counts 16 vs 1: raw ratio 16x, alpha=0.75 ratio 16^0.75 = 8x
    docs = spark.createDataFrame(
        [(1, " ".join(["big"] * 16 + ["small"]), "en", "s")], DOC_COLS
    )
    out = {r["term"]: r for r in
           text_ops.negative_sampling_table(docs, k=5).collect()}
    assert abs(sum(r["prob"] for r in out.values()) - 1.0) < 1e-5
    ratio = out["big"]["prob"] / out["small"]["prob"]
    assert abs(ratio - 16 ** 0.75) < 1e-3


def test_sample_size_planner_deficit(spark):
    # p=0.5 maximizes variance: n_req = 1.96^2*0.25/0.0004 = 2401
    good = " ".join(["a the"] * 20 + ["w%d" % i for i in range(20)])
    docs = spark.createDataFrame(
        [(0, good, "en", "s"), (1, "x y", "en", "s")], DOC_COLS
    )
    r = text_ops.sample_size_planner(docs).collect()[0]
    assert r["pass_rate"] == 0.5
    assert r["n_required"] == math.ceil(1.96 ** 2 * 0.25 / 0.0004)
    assert r["deficit"] == r["n_required"] - 2


def test_event_dedup_audit_counts(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, t, "u1", "click", 1.0, "{}"),
        (1, t + dt.timedelta(hours=1), "u2", "view", 1.0, "{}"),  # dup id
        (3, t, "u3", "click", 1.0, "{}"),
        (4, t, "u3", "click", 1.0, "{}"),  # logical dup of row 3
        (5, t, "u4", "click", 1.0, "{}"),
    ]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.event_dedup_audit(events).collect()[0]
    assert r["n_events"] == 5
    assert r["dup_id_groups"] == 1 and r["dup_id_events"] == 2
    assert r["dup_logical_groups"] == 1 and r["dup_logical_events"] == 2


def test_event_dedup_audit_clean_stream_zeroes(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [(i, t + dt.timedelta(minutes=i), f"u{i}", "click", 1.0, "{}")
            for i in range(4)]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.event_dedup_audit(events).collect()[0]
    assert r["dup_id_groups"] == 0 and r["dup_logical_events"] == 0
