"""Wave-22 operators: cross-split LM gap, Wilson pass CI, daily ACF,
revenue concentration, kNN hubness. Oracle-checked by q213–q217."""

import datetime as dt

from esop_spark.operators import analytics, similarity
from esop_spark.operators import text as text_ops


DOC_COLS = ["doc_id", "text", "lang", "source"]
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ev(eid, uid, days, value=1.0):
    return (
        eid,
        dt.datetime(2024, 1, 1) + dt.timedelta(days=days),
        uid,
        "click",
        value,
        "{}",
    )


# --- crossplit nll -----------------------------------------------------------

def test_crossplit_nll_reports_every_split(spark):
    docs = spark.createDataFrame(
        [(i, "tok%d common" % (i % 7), "en", "s") for i in range(60)],
        DOC_COLS,
    )
    out = {r["split"]: r for r in text_ops.crossplit_nll(docs).collect()}
    assert set(out) <= {"train", "val", "test"}
    assert "train" in out
    total = sum(r["n_tokens"] for r in out.values())
    assert total == 120  # 2 tokens per doc
    for r in out.values():
        assert r["mean_nll"] > 0


def test_crossplit_oov_gets_floor_probability(spark):
    # force a val-only token: with the shared seed, specific ids land in
    # val; instead check invariant — a token absent from train cannot
    # make mean_nll undefined
    docs = spark.createDataFrame(
        [(i, "x y z", "en", "s") for i in range(20)]
        + [(100 + i, "rareword%d" % i, "en", "s") for i in range(10)],
        DOC_COLS,
    )
    out = text_ops.crossplit_nll(docs).collect()
    assert all(r["mean_nll"] is not None for r in out)


# --- wilson ------------------------------------------------------------------

def test_wilson_bounds_bracket_rate_and_shrink(spark):
    good = " ".join(["a the"] * 20 + ["w%d" % i for i in range(20)])
    docs = spark.createDataFrame(
        [(i, good, "en", "s") for i in range(10)]
        + [(100, "x y", "en", "s")],
        DOC_COLS,
    )
    r = text_ops.wilson_pass_ci(docs).collect()[0]
    assert r["n_docs"] == 11 and r["n_pass"] == 10
    assert r["ci_lo"] < r["pass_rate"] < r["ci_hi"]
    assert 0.0 <= r["ci_lo"] and r["ci_hi"] <= 1.0


def test_wilson_zero_pass_has_zero_lower(spark):
    docs = spark.createDataFrame(
        [(i, "x y", "en", "s") for i in range(5)], DOC_COLS
    )
    r = text_ops.wilson_pass_ci(docs).collect()[0]
    assert r["pass_rate"] == 0.0
    assert r["ci_lo"] == 0.0
    assert r["ci_hi"] > 0.0  # uncertainty survives a zero numerator


# --- acf ---------------------------------------------------------------------

def test_acf_period2_series_alternates_sign(spark):
    # counts 4,1,4,1,... -> lag-1 acf = -1, lag-2 acf = +1
    rows = []
    eid = 0
    for d in range(8):
        n = 4 if d % 2 == 0 else 1
        for i in range(n):
            eid += 1
            rows.append(_ev(eid, f"u{i}", d))
    events = spark.createDataFrame(rows, EV_COLS)
    out = {r["lag"]: r for r in analytics.daily_acf(events, max_lag=2).collect()}
    # biased estimator: lag-1 = -(n-1)/n = -7/8, lag-2 = +(n-2)/n = 6/8
    assert abs(out[1]["acf"] + 0.875) < 1e-9
    assert abs(out[2]["acf"] - 0.75) < 1e-9
    assert out[1]["n_pairs"] == 7 and out[2]["n_pairs"] == 6


# --- concentration -----------------------------------------------------------

def test_revenue_concentration_exact(spark):
    # 10 users: one whale with 91, nine with 1 -> top 10% = whale,
    # share = 91/100
    rows = [_ev(1, "whale", 0, value=91.0)] + [
        _ev(10 + i, f"u{i}", 0, value=1.0) for i in range(9)
    ]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.revenue_concentration(events, top_ppm=100_000).collect()[0]
    assert r["n_users"] == 10
    assert r["top_users"] == 1
    assert abs(r["top_share"] - 0.91) < 1e-9


# --- hubness -----------------------------------------------------------------

def test_hubness_star_geometry(spark):
    # one center point near everyone, satellites far apart: the center
    # shows up in every satellite's k=1 list -> max in-degree = n-1
    rows = [(0, [0.0] * 64, "l")]
    for i in range(1, 7):
        v = [0.0] * 64
        v[i] = 10.0
        rows.append((i, v, "l"))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = similarity.hubness_audit(emb, k=1, max_docs=10).collect()[0]
    assert r["n_docs"] == 7
    assert r["max_in_degree"] == 6
    assert r["skew"] == 6.0


def test_hubness_uniform_ring_no_hub(spark):
    # pairs of mutually-nearest points: every point has in-degree 1 at k=1
    rows = []
    for p in range(4):
        base = [0.0] * 64
        base[p] = 100.0
        v2 = list(base)
        v2[p] = 101.0
        rows += [(2 * p, base, "l"), (2 * p + 1, v2, "l")]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = similarity.hubness_audit(emb, k=1, max_docs=10).collect()[0]
    assert r["max_in_degree"] == 1
    assert r["zero_in_degree"] == 0
