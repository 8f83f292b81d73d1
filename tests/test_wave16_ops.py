"""Wave-16 operators: last-touch attribution, transition drift,
context-length sweep. Oracle-checked by q188–q190."""

import datetime as dt

from esop_spark.operators import analytics
from esop_spark.operators import text as text_ops


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )


# --- last_touch_attribution ------------------------------------------------------

def test_attribution_credits_most_recent_touch(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 0, "view"),
        (1, base + dt.timedelta(minutes=1), 1, "click"),
        (1, base + dt.timedelta(minutes=2), 2, "purchase"),  # credit: click
        (2, base, 3, "view"),
        (2, base + dt.timedelta(minutes=5), 4, "purchase"),  # credit: view
        (3, base, 5, "purchase"),  # no touch -> none
    ]
    out = {r["channel"]: r for r in
           analytics.last_touch_attribution(_ev(spark, rows)).collect()}
    assert out["click"]["n_conversions"] == 1
    assert out["view"]["n_conversions"] == 1
    assert out["none"]["n_conversions"] == 1
    assert sum(r["share_ppm"] for r in out.values()) >= 999_998


def test_attribution_skips_prior_conversions_as_touch(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 0, "view"),
        (1, base + dt.timedelta(minutes=1), 1, "purchase"),
        (1, base + dt.timedelta(minutes=2), 2, "purchase"),  # touch is view
    ]
    out = {r["channel"]: r["n_conversions"] for r in
           analytics.last_touch_attribution(_ev(spark, rows)).collect()}
    assert out == {"view": 2}  # a purchase never credits itself


# --- transition_drift --------------------------------------------------------------

def test_transition_drift_zero_for_stationary(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # same A->B pattern repeated in both halves, one user per pair so no
    # cross-pair transitions
    for u in range(4):
        for h in (0, 10):
            rows.append((u * 100 + h, base + dt.timedelta(days=h), eid, "A")); eid += 1
            rows.append((u * 100 + h, base + dt.timedelta(days=h, minutes=1), eid, "B")); eid += 1
    out = analytics.transition_drift(_ev(spark, rows)).collect()[0]
    assert out["l1_drift_ppm"] == 0
    assert out["n_first"] == 4 and out["n_second"] == 4


def test_transition_drift_detects_flip(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # first half: all A->B; second half: all A->C
    for u in range(4):
        rows.append((u, base, eid, "A")); eid += 1
        rows.append((u, base + dt.timedelta(minutes=1), eid, "B")); eid += 1
    for u in range(4, 8):
        rows.append((u, base + dt.timedelta(days=20), eid, "A")); eid += 1
        rows.append((u, base + dt.timedelta(days=20, minutes=1), eid, "C")); eid += 1
    out = analytics.transition_drift(_ev(spark, rows)).collect()[0]
    assert out["l1_drift_ppm"] == 2_000_000  # total variation x2 in ppm
    assert {out["worst_t1"], out["worst_t2"]} <= {"A", "B", "C"}


# --- ctx_length_sweep ---------------------------------------------------------------

def test_ctx_sweep_accounting(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 10)), (2, " ".join(["w"] * 100))],
        ["doc_id", "text"],
    )
    out = {r["ctx"]: r for r in
           text_ops.ctx_length_sweep(docs, contexts=(64, 128)).collect()}
    c64 = out[64]
    assert c64["total_tokens"] == 110
    assert c64["kept_tokens"] == 10 + 64
    assert c64["truncated_tokens"] == 36
    assert c64["padding_tokens"] == (64 - 10) + 0
    c128 = out[128]
    assert c128["kept_tokens"] == 110
    assert c128["truncated_tokens"] == 0
    assert c128["kept_ppm"] == 1_000_000
