"""Wave-38 operators: deletion-impact report, order-statistic median CI,
delete-batch packing, the dataset card, and backup growth forecast.
Oracle-checked by q291-q295; these tests pin the non-oracle invariants
(purge determinism, CI bracketing, batch conservation, card arithmetic,
and exact-fit forecasting)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from esop_spark.operators import analytics, privacy, retention, sampling


def _ts(epoch_s):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None)


# --- deletion impact ------------------------------------------------------------

def test_deletion_impact_deterministic_and_bounded(spark):
    rows = [(_ts(i * 100), i % 200, 1.0) for i in range(1000)]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id bigint, value double")
    out1 = sorted(map(tuple, privacy.deletion_impact(ev, purge_ppm=100_000).collect()))
    out2 = sorted(map(tuple, privacy.deletion_impact(ev, purge_ppm=100_000).collect()))
    assert out1 == out2  # hash-deterministic
    r = out1[0]
    assert r[2] <= r[1]  # n_purged <= n_events
    assert 0 <= r[3] <= 1_000_000


def test_deletion_impact_zero_and_full(spark):
    rows = [(_ts(i), i, 2.0) for i in range(100)]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id bigint, value double")
    z = privacy.deletion_impact(ev, purge_ppm=0).collect()[0]
    assert z["n_purged"] == 0 and z["purged_value_cents"] == 0
    f = privacy.deletion_impact(ev, purge_ppm=1_000_000).collect()[0]
    assert f["n_purged"] == 100 and f["purged_ppm"] == 1_000_000
    assert f["purged_value_cents"] == 100 * 200


# --- median CI -------------------------------------------------------------------

def _orders(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "o_orderkey bigint, o_totalprice double",
    )


def test_median_ci_brackets_median(spark):
    vals = [(i * 37) % 500 + 1 for i in range(401)]
    r = sampling.median_ci(_orders(spark, vals)).collect()[0]
    assert r["n"] == 401
    assert r["ci_lo_cents"] <= r["median_cents"] <= r["ci_hi_cents"]
    assert r["lo_rank"] >= 1 and r["hi_rank"] <= 401
    assert r["lo_rank"] + r["hi_rank"] == 402  # symmetric ranks


def test_median_ci_exact_small(spark):
    # n=9, z=1.96: lo = floor((9 - 5.88)/2) = 1, hi = 9 → full range
    vals = [10, 20, 30, 40, 50, 60, 70, 80, 90]
    r = sampling.median_ci(_orders(spark, vals)).collect()[0]
    assert r["median_cents"] == 5000.0
    assert r["ci_lo_cents"] == 1000 and r["ci_hi_cents"] == 9000


# --- delete batches ---------------------------------------------------------------

def test_delete_batches_pack_and_conserve(spark):
    rm = spark.createDataFrame(
        [(f"k{i:03d}", 10) for i in range(250)], "object_key string, size long"
    )
    out = {r["batch"]: r for r in
           retention.delete_batches(rm, batch_size=100).collect()}
    assert [out[b]["n_keys"] for b in sorted(out)] == [100, 100, 50]
    assert sum(r["batch_bytes"] for r in out.values()) == 2500
    assert out[0]["first_key"] == "k000"
    assert out[2]["first_key"] == "k200"


# --- dataset card -----------------------------------------------------------------

def test_dataset_card_bytes_and_nulls(spark):
    t1 = spark.createDataFrame(
        [(1, "abc"), (2, None)], "k long, s string"
    )
    t2 = spark.createDataFrame(
        [(1, [1.0, 2.0])], "k long, e array<double>"
    )
    out = {r["table"]: r for r in
           analytics.dataset_card({"t1": t1, "t2": t2}).collect()}
    # t1: 8*2 rows fixed = 16 + len("abc") = 19; one NULL cell
    assert out["t1"]["est_bytes"] == 19
    assert out["t1"]["null_cells"] == 1
    assert out["t1"]["n_cols"] == 2
    # t2: 8 fixed + 8*2 array = 24
    assert out["t2"]["est_bytes"] == 24 and out["t2"]["null_cells"] == 0


# --- backup growth -----------------------------------------------------------------

def test_backup_growth_exact_linear_fit(spark):
    # perfectly linear sizes: slope recovered exactly, forecast on-line
    m = spark.createDataFrame(
        [(i * 3600000, 1000 + 50 * i) for i in range(10)],
        "ts long, size long",
    )
    r = retention.backup_growth_forecast(m).collect()[0]
    assert r["n"] == 10
    assert abs(r["slope_bytes_per_hour"] - 50.0) < 1e-6
    assert r["next_ts_ms"] == 10 * 3600000
    assert abs(r["forecast_bytes"] - 1500.0) < 1e-6
