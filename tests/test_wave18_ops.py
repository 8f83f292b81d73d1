"""Wave-18 operators: ECE calibration, KS drift, RFM segmentation, Markov
removal-effect attribution, survival hazard, TwoNN intrinsic dimension.
Oracle-checked by q193–q198."""

import datetime as dt

import math

from pyspark.sql import functions as F

from esop_spark.operators import analytics, similarity
from esop_spark.operators import text as text_ops


def _doc(doc_id, text, lang="en", source="s"):
    return (doc_id, text, lang, source)


DOC_COLS = ["doc_id", "text", "lang", "source"]


# --- ECE ---------------------------------------------------------------------

def test_ece_telescoped_identity(spark):
    # one bin: ECE must equal |100*pass - sum_score| / (100*N)
    good = " ".join(["a the"] * 20 + ["w%d" % i for i in range(20)])
    docs = spark.createDataFrame(
        [_doc(1, good), _doc(2, good), _doc(3, "x y z")], DOC_COLS
    )
    rows = text_ops.ece_calibration(docs, n_bins=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 3
    expected = r["gap_units"] / (100.0 * 3)
    assert abs(r["ece"] - expected) < 1e-9


def test_ece_perfectly_calibrated_when_conf_matches(spark):
    # all docs fail gopher (too short) and have score ~0 conf -> small gap
    docs = spark.createDataFrame(
        [_doc(i, "a a a a") for i in range(5)], DOC_COLS
    )
    r = text_ops.ece_calibration(docs, n_bins=10).collect()
    # all docs identical -> one bin; none pass gopher (too short), so the
    # gap is the whole summed confidence and ece = gap/(100*N)
    assert len(r) == 1
    assert r[0]["pass_docs"] == 0
    assert r[0]["gap_units"] == round(
        r[0]["mean_conf"] * 100 * r[0]["n_docs"]
    )
    assert abs(r[0]["ece"] - r[0]["gap_units"] / (100.0 * 5)) < 1e-9


# --- KS ----------------------------------------------------------------------

def test_ks_identical_distributions_zero(spark):
    docs = spark.createDataFrame(
        [_doc(1, "a b c", "en"), _doc(2, "a b c", "fr")], DOC_COLS
    )
    r = text_ops.ks_score_drift(docs).collect()[0]
    assert r["n_a"] == 1 and r["n_b"] == 1
    assert r["d_stat"] == 0.0


def test_ks_disjoint_distributions_one(spark):
    # en docs score low (all stopwords), fr docs score high (all distinct)
    low = "a a a a a a"
    high = " ".join("w%d" % i for i in range(10))
    docs = spark.createDataFrame(
        [_doc(1, low, "en"), _doc(2, low, "en"),
         _doc(3, high, "fr"), _doc(4, high, "fr")],
        DOC_COLS,
    )
    r = text_ops.ks_score_drift(docs).collect()[0]
    assert r["d_stat"] == 1.0
    # max gap first reached at the lower score
    assert r["at_score"] < 100


# --- RFM ---------------------------------------------------------------------

def _ev(eid, uid, t, etype="click", value=10.0):
    return (eid, dt.datetime(2024, 1, 1) + dt.timedelta(days=t), uid, etype, value, "{}")


EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_rfm_segments_exact_terciles(spark):
    # 3 users: u1 recent+frequent+big, u2 mid, u3 stale+rare+small
    rows = (
        [_ev(i, "u1", 30, value=100.0) for i in range(9)]
        + [_ev(100 + i, "u2", 15, value=10.0) for i in range(3)]
        + [_ev(200, "u3", 0, value=1.0)]
    )
    events = spark.createDataFrame(rows, EV_COLS)
    out = {
        (r["r_score"], r["f_score"], r["m_score"]): r["n_users"]
        for r in analytics.rfm_segments(events).collect()
    }
    assert sum(out.values()) == 3
    assert out[(3, 3, 3)] == 1  # u1 best on all axes
    assert out[(1, 1, 1)] == 1  # u3 worst on all axes


def test_rfm_monetary_sum_is_exact_cents(spark):
    events = spark.createDataFrame(
        [_ev(1, "u1", 0, value=0.1), _ev(2, "u1", 0, value=0.2)], EV_COLS
    )
    r = analytics.rfm_segments(events).collect()
    assert sum(x["sum_monetary_cents"] for x in r) == 30


# --- survival ----------------------------------------------------------------

def test_survival_hazard_exact(spark):
    # lifespans: u1 0w, u2 0w, u3 1w, u4 3w
    rows = [
        _ev(1, "u1", 0), _ev(2, "u2", 0), _ev(3, "u2", 3),
        _ev(4, "u3", 0), _ev(5, "u3", 8),
        _ev(6, "u4", 0), _ev(7, "u4", 25),
    ]
    events = spark.createDataFrame(rows, EV_COLS)
    out = {r["week"]: r for r in analytics.survival_hazard(events).collect()}
    assert out[0]["at_risk"] == 4 and out[0]["churned"] == 2
    assert out[1]["at_risk"] == 2 and out[1]["churned"] == 1
    assert out[3]["at_risk"] == 1 and out[3]["churned"] == 1
    assert abs(out[0]["hazard"] - 0.5) < 1e-9
    assert abs(out[0]["survival_after"] - 0.5) < 1e-9
    assert abs(out[3]["survival_after"] - 0.0) < 1e-9


# --- markov ------------------------------------------------------------------

def test_markov_removal_effect_linear_chain(spark):
    # every user: view -> click -> purchase. Removing either channel kills
    # all conversion; baseline converts with p=1.
    rows = []
    for u in range(4):
        rows += [
            _ev(u * 10 + 1, f"u{u}", 0, "view"),
            _ev(u * 10 + 2, f"u{u}", 1, "click"),
            _ev(u * 10 + 3, f"u{u}", 2, "purchase"),
        ]
    events = spark.createDataFrame(rows, EV_COLS)
    out = {
        r["removed"]: r
        for r in analytics.markov_removal_effect(events, steps=8).collect()
    }
    assert abs(out["NONE"]["p_conv"] - 1.0) < 1e-9
    assert abs(out["view"]["removal_effect"] - 1.0) < 1e-9
    assert abs(out["click"]["removal_effect"] - 1.0) < 1e-9


def test_markov_no_outflow_from_conversion(spark):
    # journey continues past purchase in raw events but must be truncated
    rows = [
        _ev(1, "u1", 0, "view"),
        _ev(2, "u1", 1, "purchase"),
        _ev(3, "u1", 2, "error"),  # after conversion: ignored
        _ev(4, "u2", 0, "view"),
        _ev(5, "u2", 1, "error"),
    ]
    events = spark.createDataFrame(rows, EV_COLS)
    out = {
        r["removed"]: r
        for r in analytics.markov_removal_effect(events, steps=8).collect()
    }
    # 'error' only reachable on the non-converting branch; removing it
    # cannot reduce conversion
    assert abs(out["NONE"]["p_conv"] - 0.5) < 1e-9
    assert abs(out["error"]["removal_effect"] - 0.0) < 1e-9
    # removing view kills everything
    assert abs(out["view"]["removal_effect"] - 1.0) < 1e-9


# --- TwoNN -------------------------------------------------------------------

def test_twonn_line_is_one_dimensional(spark):
    # points on a 1-D line embedded in 64-D: mu = d2/d1 = 2 for interior
    # geometry; the MLE should land near 1
    rows = [
        (i, [float(2 ** i)] + [0.0] * 63, "l") for i in range(8)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = similarity.twonn_intrinsic_dim(emb, max_docs=8).collect()[0]
    assert r["n_used"] == 8
    assert 0.3 < r["intrinsic_dim"] < 3.0


def test_twonn_excludes_zero_distance_duplicates(spark):
    rows = [
        (1, [0.0] * 64, "l"),
        (2, [0.0] * 64, "l"),  # exact duplicate -> d1 == 0, excluded
        (3, [1.0] + [0.0] * 63, "l"),
        (4, [3.0] + [0.0] * 63, "l"),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = similarity.twonn_intrinsic_dim(emb, max_docs=4).collect()[0]
    assert r["n_used"] == 2  # the two duplicate points are excluded
    assert r["sum_log_mu"] is not None and r["sum_log_mu"] > 0
