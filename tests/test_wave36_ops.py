"""Wave-36 operators: shuffle-balance simulator, partial correlation,
Theil decomposition, object-lifetime census, and the ROLLUP census.
Oracle-checked by q281-q285; these tests pin the non-oracle invariants
(imbalance bounds, confound removal, decomposition identity and edge
cases, lifetime arithmetic, and grouping-set consistency)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from esop_spark.operators import analytics, retention
from esop_spark.operators import text as text_ops


def _ts(epoch_s):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None)


# --- shuffle balance -----------------------------------------------------------

def test_shuffle_balance_uniform_keys(spark):
    li = spark.createDataFrame(
        [(i,) for i in range(4000)], "l_partkey bigint"
    )
    out = {r["n_partitions"]: r for r in
           analytics.shuffle_balance(li, partition_counts=(8, 32)).collect()}
    # 4000 uniform keys over 8 buckets: near-even
    assert out[8]["imbalance"] < 1.2
    assert abs(out[8]["mean_rows"] - 500.0) < 1e-6
    # imbalance never below 1
    assert all(r["imbalance"] >= 1.0 for r in out.values())


def test_shuffle_balance_hot_key_dominates(spark):
    # one key holds 90% of rows: max partition >= 90% of total at any P
    rows = [(1,)] * 900 + [(i,) for i in range(2, 102)]
    li = spark.createDataFrame(rows, "l_partkey bigint")
    out = analytics.shuffle_balance(li, partition_counts=(32,)).collect()[0]
    assert out["max_rows"] >= 900
    assert out["imbalance"] > 20


# --- partial correlation --------------------------------------------------------

def test_partial_corr_removes_group_confound(spark):
    # within each type value is CONSTANT, but types differ in both value
    # and hour: raw r is strongly positive, partial r is NULL/0 (no
    # within-group variance in x)
    rows = []
    for i in range(100):
        rows.append((_ts(2 * 3600 + i), "a", 10.0))   # early, cheap
        rows.append((_ts(20 * 3600 + i), "b", 99.0))  # late, expensive
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    r = analytics.partial_corr_value_hour(ev).collect()[0]
    assert r["raw_r"] is not None and r["raw_r"] > 0.99
    assert r["partial_r"] is None  # zero within-group variance


def test_partial_corr_within_group_signal_survives(spark):
    # value tracks hour INSIDE each type: partial r stays high
    rows = []
    for h in range(24):
        rows.append((_ts(h * 3600), "a", float(h)))
        rows.append((_ts(h * 3600 + 60), "b", float(h) + 100.0))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    r = analytics.partial_corr_value_hour(ev).collect()[0]
    assert r["partial_r"] > 0.99


# --- theil ---------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_chars long, lang string, text string"
    )


def test_theil_equal_values_zero(spark):
    rows = [(f"d{i}", f"s{i % 3}", 100, "en", "") for i in range(30)]
    r = text_ops.theil_decomposition(_docs(spark, rows)).collect()[0]
    assert abs(r["theil_total"]) < 1e-9
    assert abs(r["theil_between"]) < 1e-9


def test_theil_between_only(spark):
    # constant within each source, different across: all inequality is
    # between-source
    rows = [(f"a{i}", "sa", 100, "en", "") for i in range(10)] + [
        (f"b{i}", "sb", 900, "en", "") for i in range(10)
    ]
    r = text_ops.theil_decomposition(_docs(spark, rows)).collect()[0]
    assert r["theil_total"] > 0.1
    assert abs(r["theil_total"] - r["theil_between"]) < 1e-6
    assert abs(r["theil_within"]) < 1e-6


def test_theil_zeros_excluded_and_counted(spark):
    rows = [("z", "s", 0, "en", ""), ("a", "s", 100, "en", ""),
            ("b", "s", 100, "en", "")]
    r = text_ops.theil_decomposition(_docs(spark, rows)).collect()[0]
    assert r["n_zero"] == 1 and r["n_rows"] == 2


# --- object lifetimes ------------------------------------------------------------

def test_object_lifetimes_census(spark):
    entries = spark.createDataFrame(
        [
            ("ks", "o1", "b1", 1000, 10),
            ("ks", "o1", "b2", 5000, 10),   # o1 lives 4000ms over 2 backups
            ("ks", "o1", "b2", 5000, 10),   # duplicate row: ignored
            ("ks", "o2", "b1", 1000, 30),   # single-backup object
        ],
        "keyspace string, object_key string, backup_name string, "
        "backup_ts long, size long",
    )
    out = {r["n_backups"]: r for r in
           retention.object_lifetimes(entries).collect()}
    assert out[2]["n_objects"] == 1
    assert out[2]["mean_lifetime_ms"] == 4000.0
    assert out[1]["n_objects"] == 1 and out[1]["total_bytes"] == 30


# --- rollup census ---------------------------------------------------------------

def test_rollup_census_grains_consistent(spark):
    rows = [
        (_ts(0), "a", 1), (_ts(10), "a", 2), (_ts(20), "b", 1),
        (_ts(86400), "a", 3),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, user_id bigint")
    out = analytics.rollup_census(ev).collect()
    total = [r for r in out if r["gid"] == 3]
    assert len(total) == 1
    assert total[0]["n_events"] == 4 and total[0]["n_users"] == 3
    day0 = [r for r in out if r["gid"] == 1 and r["day"] == 0][0]
    assert day0["n_events"] == 3 and day0["n_users"] == 2
    fine = {(r["day"], r["event_type"]): r for r in out if r["gid"] == 0}
    assert fine[(0, "a")]["n_events"] == 2
    # grains must reconcile: sum of gid-0 events == total
    assert sum(r["n_events"] for r in out if r["gid"] == 0) == 4
