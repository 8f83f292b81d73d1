"""Wave-34 operators: TPC-H Q12 ship-mode priority, brand-basket
association rules, the join-skew salt advisor, lead-lag cross-correlation,
and deflated top-2 power iteration. Oracle-checked by q271-q275; these
tests pin the non-oracle invariants (priority partition, lift direction,
salt arithmetic, lead detection, and eigen ordering)."""

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from esop_spark.operators import analytics, similarity


def _ts(epoch_s):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None)


# --- Q12 ----------------------------------------------------------------------

def test_shipmode_priority_partitions_lines(spark):
    base = 820454400 + 86400  # inside the 1996 window
    orders = spark.createDataFrame(
        [(1, "1-URGENT"), (2, "5-LOW"), (3, "2-HIGH")],
        "o_orderkey bigint, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, "A", _ts(base)),
            (2, "A", _ts(base)),
            (3, "R", _ts(base)),
            (1, "N", _ts(base)),            # excluded mode
            (2, "A", _ts(820454400 - 10)),  # outside the window
        ],
        "l_orderkey bigint, l_returnflag string, l_shipdate timestamp",
    )
    out = {r["mode"]: r for r in
           analytics.shipmode_priority(orders, li).collect()}
    assert out["A"]["high_line_count"] == 1   # order 1 urgent
    assert out["A"]["low_line_count"] == 1    # order 2 low
    assert out["R"]["high_line_count"] == 1   # order 3 high
    assert "N" not in out


# --- association rules ---------------------------------------------------------

def test_brand_rules_lift_direction(spark):
    # brands X and Y always co-occur; Z co-occurs with X only half the time
    rows = []
    for ok in range(20):
        rows.append((ok, 100 + ok))       # part -> brand X
        rows.append((ok, 200 + ok))       # part -> brand Y
        if ok % 2 == 0:
            rows.append((ok, 300 + ok))   # part -> brand Z
    li = spark.createDataFrame(
        [(ok, pk) for ok, pk in rows], "l_orderkey bigint, l_partkey bigint"
    )
    part = spark.createDataFrame(
        [(100 + i, "X") for i in range(20)]
        + [(200 + i, "Y") for i in range(20)]
        + [(300 + i, "Z") for i in range(20)],
        "p_partkey bigint, p_brand string",
    )
    out = {(r["brand_a"], r["brand_b"]): r for r in
           analytics.brand_basket_rules(li, part, min_pair_orders=5, k=10)
           .collect()}
    xy = out[("X", "Y")]
    assert xy["n_ab"] == 20 and abs(xy["lift"] - 1.0) < 1e-6
    assert abs(xy["conf_a_to_b"] - 1.0) < 1e-6
    xz = out[("X", "Z")]
    assert xz["n_ab"] == 10 and abs(xz["conf_a_to_b"] - 0.5) < 1e-6


def test_brand_rules_min_support_filters(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 20)], "l_orderkey bigint, l_partkey bigint"
    )
    part = spark.createDataFrame(
        [(10, "A"), (20, "B")], "p_partkey bigint, p_brand string"
    )
    assert analytics.brand_basket_rules(li, part, min_pair_orders=2).count() == 0


# --- salt advisor --------------------------------------------------------------

def test_salt_advisor_census(spark):
    # key "a": one hot key with 6 rows of 10; key "b": uniform
    rows = [(1 if i < 6 else i, i % 3) for i in range(10)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    out = {r["key_col"]: r for r in
           analytics.salt_advisor(
               li, key_cols=("l_orderkey", "l_partkey"),
               target_rows_per_task=2,
           ).collect()}
    a = out["l_orderkey"]
    assert a["n_rows"] == 10 and a["max_key_rows"] == 6
    assert a["max_key_ppm"] == 600000
    assert a["salt_factor"] == 3  # ceil(6/2)
    b = out["l_partkey"]
    assert b["max_key_rows"] == 4 and b["salt_factor"] == 2


# --- lead-lag cross-correlation -------------------------------------------------

def test_xcorr_detects_lead(spark):
    # purchases mirror views exactly 2 days later: r(lag=2) == 1
    rows = []
    series = [10, 30, 20, 50, 40, 60, 25, 45, 35, 55]
    for day, v in enumerate(series):
        for i in range(v):
            rows.append((_ts(day * 86400 + i), "view"))
        for i in range(v):
            rows.append((_ts((day + 2) * 86400 + i), "purchase"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r["lag"]: r for r in
           analytics.xcorr_leadlag(ev, max_lag=3).collect()}
    assert abs(out[2]["r"] - 1.0) < 1e-6
    assert out[2]["n_days"] == 10
    # other lags correlate strictly less
    assert out[0]["r"] is None or out[0]["r"] < 0.999


def test_xcorr_constant_series_null(spark):
    rows = []
    for day in range(6):
        for i in range(5):
            rows.append((_ts(day * 86400 + i), "view"))
            rows.append((_ts(day * 86400 + 500 + i), "purchase"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = analytics.xcorr_leadlag(ev, max_lag=1).collect()
    assert all(r["r"] is None for r in out)


# --- top-2 eigen ----------------------------------------------------------------

def test_top2_eigen_plane(spark):
    # variance concentrated on two axes: var(x0)=4ish, var(x1)=1ish, rest 0
    rows = []
    for i in range(40):
        s0 = 2.0 if i % 2 == 0 else -2.0
        s1 = 1.0 if i % 4 < 2 else -1.0
        rows.append((i, [s0, s1, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    r = similarity.top2_eigen_share(emb, iters=8).collect()[0]
    assert r["eigen1"] >= r["eigen2"] >= 0.0
    assert abs(r["eigen1"] - 4.0) < 0.01
    assert abs(r["eigen2"] - 1.0) < 0.01
    assert abs(r["top2_share"] - 1.0) < 0.01


def test_top2_eigen_line_collapse(spark):
    # all variance on one axis: eigen2 ~ 0, share1 ~ 1
    rows = [(i, [3.0 if i % 2 == 0 else -3.0, 0.0, 0.0]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    r = similarity.top2_eigen_share(emb, iters=8).collect()[0]
    assert abs(r["share1"] - 1.0) < 0.01
    assert abs(r["eigen2"]) < 0.01
