"""Wave-12 operators: generic connected components (string keys), Benford
audit, conversion-time quantiles, day-of-week profile. Oracle-checked by
q176–q179."""

import datetime as dt

from pyspark.sql import functions as F

from esop_spark.operators import analytics, graph


# --- connected_components (generic, string keys) -----------------------------

def test_cc_string_keys_two_components(spark):
    edges = spark.createDataFrame(
        [("apple", "banana"), ("banana", "cherry"), ("x", "y")],
        ["src", "dst"],
    )
    out = {r["node"]: r for r in graph.connected_components(edges).collect()}
    assert out["apple"]["cluster_id"] == "apple"
    assert out["cherry"]["cluster_id"] == "apple"
    assert out["cherry"]["cluster_size"] == 3
    assert out["y"]["cluster_id"] == "x"
    assert out["y"]["cluster_size"] == 2


def test_cc_chain_converges(spark):
    # long path graph exercises multi-round propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], ["src", "dst"]
    )
    out = graph.connected_components(edges).collect()
    assert {r["cluster_id"] for r in out} == {0}
    assert all(r["cluster_size"] == 21 for r in out)


# --- benford_audit ------------------------------------------------------------

def test_benford_digits_and_expected(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [1.0, 1.5, 19.9, 2.0, 29.0, 3.0, 0.42]],
        ["amount"],
    )
    out = {r["digit"]: r for r in analytics.benford_audit(df, F.col("amount")).collect()}
    # 0.42 -> 42 cents -> digit 4
    assert out[1]["n_rows"] == 3
    assert out[2]["n_rows"] == 2
    assert out[3]["n_rows"] == 1
    assert out[4]["n_rows"] == 1
    assert out[1]["expected_ppm"] == 301030
    assert out[9] if 9 in out else True


def test_benford_perfect_fit_zero_chi2(spark):
    # synthesize exact Benford counts scaled by 1e6 rows is overkill;
    # instead: a single digit with e_ppm == observed share impossible, so
    # check chi2 is 0 only when observed == expected exactly: use digit 1
    # at 301030 of 1000000? too big. Instead verify chi2 positivity and
    # monotonicity: all-1s data has a large chi2 on digits 2..9 absent.
    df = spark.createDataFrame([(1.0,)] * 50, ["amount"])
    out = analytics.benford_audit(df, F.col("amount")).collect()
    assert len(out) == 1  # only digit 1 observed
    r = out[0]
    assert r["observed_ppm"] == 1_000_000
    assert r["chi2_milli"] > 0  # 100% of mass at digit 1 is not Benford


# --- conversion_time_quantiles --------------------------------------------------

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )


def test_conversion_time_median(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # users 1..5 convert in 100,200,300,400,500 seconds
    for u in range(1, 6):
        rows.append((u, base, "view"))
        rows.append((u, base + dt.timedelta(seconds=100 * u), "purchase"))
    # user 6 purchases BEFORE viewing -> excluded
    rows.append((6, base + dt.timedelta(seconds=50), "view"))
    rows.append((6, base, "purchase"))
    # user 7 never converts
    rows.append((7, base, "view"))
    out = {r["q_ppm"]: r for r in
           analytics.conversion_time_quantiles(_ev(spark, rows)).collect()}
    assert out[500_000]["n_rows"] == 5
    med = out[500_000]
    assert abs(med["approx_value"] - 300) <= med["error_bound"]
    p90 = out[900_000]
    assert abs(p90["approx_value"] - 500) <= p90["error_bound"]


def test_conversion_uses_first_occurrences(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "view"),
        (1, base + dt.timedelta(seconds=10), "view"),  # later view ignored
        (1, base + dt.timedelta(seconds=60), "purchase"),
        (1, base + dt.timedelta(seconds=999), "purchase"),  # ignored
    ]
    out = {r["q_ppm"]: r for r in
           analytics.conversion_time_quantiles(_ev(spark, rows)).collect()}
    assert out[500_000]["approx_value"] == 60
    assert out[500_000]["error_bound"] == 1  # single value -> width-1 bins


# --- dow_profile ----------------------------------------------------------------

def test_dow_profile_counts(spark):
    rows = []
    # epoch day 0 is a known dow-0; put 2 events on day 0, 3 on day 7
    # (same dow), 1 on day 1
    for day, n in [(0, 2), (7, 3), (1, 1)]:
        for i in range(n):
            rows.append(
                (1, dt.datetime(1970, 1, 1) + dt.timedelta(days=day, minutes=i))
            )
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {r["dow"]: r for r in analytics.dow_profile(ev).collect()}
    # NOTE: unix_timestamp uses the session timezone; epoch-day keys are
    # what the operator contracts on, not calendar weekday names
    dows = sorted(out)
    assert len(dows) == 2
    big = out[dows[0]] if out[dows[0]]["n_days"] == 2 else out[dows[1]]
    small = out[dows[1]] if big is out[dows[0]] else out[dows[0]]
    assert big["n_days"] == 2
    assert big["min_daily"] == 2 and big["max_daily"] == 3
    assert big["mean_daily_milli"] == 2500
    assert small["n_days"] == 1 and small["min_daily"] == 1
