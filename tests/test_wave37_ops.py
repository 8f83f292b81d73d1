"""Wave-37 operators: per-source robust profile, HLL window merge, KMV
Jaccard, RPO gap audit, and merged-histogram window percentiles.
Oracle-checked by q286-q290; these tests pin the non-oracle invariants
(median/MAD exactness, merge-vs-rebuild equivalence, sketch accuracy on
known overlap, gap arithmetic, and percentile monotonicity)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from esop_spark.operators import analytics, retention, sampling
from esop_spark.operators import text as text_ops


def _ts(epoch_s):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_chars long, lang string, text string"
    )


# --- robust profile -------------------------------------------------------------

def test_robust_profile_exact_median_mad(spark):
    # values 1..9 plus outlier 1000: median 5.5 over 10 values, the
    # outlier flags
    rows = [(f"d{i}", "s", v, "en", "")
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    r = sampling.robust_profile(_docs(spark, rows)).collect()[0]
    assert r["n"] == 10
    assert r["median_val"] == 5.5
    # deviations ×2 from med 5.5: 9,7,5,3,1,1,3,5,7,1989 → sorted middle
    # two are 5 and 5 → MAD = 2.5
    assert r["mad"] == 2.5
    assert r["n_outliers"] == 1


def test_robust_profile_odd_n(spark):
    rows = [(f"d{i}", "s", v, "en", "") for i, v in enumerate([10, 20, 90])]
    r = sampling.robust_profile(_docs(spark, rows)).collect()[0]
    assert r["median_val"] == 20.0
    assert r["mad"] == 10.0  # |10-20|, |0|, |70| → median 10


def test_robust_profile_per_stratum(spark):
    rows = [("a1", "sa", 10, "en", ""), ("a2", "sa", 30, "en", ""),
            ("b1", "sb", 100, "en", "")]
    out = {r["stratum"]: r for r in
           sampling.robust_profile(_docs(spark, rows)).collect()}
    assert out["sa"]["median_val"] == 20.0
    assert out["sb"]["median_val"] == 100.0 and out["sb"]["mad"] == 0.0


# --- hll window merge ------------------------------------------------------------

def test_hll_window_matches_single_day_hll(spark):
    # one active day: the 7d-window estimate for that day equals the
    # daily estimate, and exact counts match
    rows = [(_ts(100 + i), i % 50) for i in range(500)]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id bigint")
    out = {r["day"]: r for r in
           analytics.hll_window_merge(ev, window_days=7).collect()}
    assert list(out) == [0]
    assert out[0]["n_exact"] == 50
    assert abs(out[0]["err_ppm"]) < 200_000


def test_hll_window_merges_across_days(spark):
    # disjoint user sets on consecutive days: the later window covers both
    rows = [(_ts(i), i % 20) for i in range(100)] + [
        (_ts(86400 + i), 1000 + i % 20) for i in range(100)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id bigint")
    out = {r["day"]: r for r in
           analytics.hll_window_merge(ev, window_days=7).collect()}
    assert out[0]["n_exact"] == 20
    assert out[1]["n_exact"] == 40  # day-1 window spans day 0 and 1


# --- kmv ------------------------------------------------------------------------

def test_kmv_identical_and_disjoint_vocab(spark):
    shared = " ".join(f"w{i}" for i in range(300))
    other = " ".join(f"z{i}" for i in range(300))
    rows = [("a1", "sa", 0, "en", shared), ("b1", "sb", 0, "en", shared),
            ("c1", "sc", 0, "en", other)]
    out = {(r["src_a"], r["src_b"]): r for r in
           text_ops.kmv_jaccard(_docs(spark, rows), k=64).collect()}
    ab = out[("sa", "sb")]
    assert ab["exact_j"] == 1.0 and ab["kmv_j"] == 1.0
    ac = out[("sa", "sc")]
    assert ac["exact_j"] == 0.0 and ac["kmv_j"] == 0.0


def test_kmv_partial_overlap_estimate(spark):
    # 50% overlap: estimate within ~3/sqrt(k) of truth
    a = " ".join(f"w{i}" for i in range(400))
    b = " ".join(f"w{i}" for i in range(200, 600))
    rows = [("a1", "sa", 0, "en", a), ("b1", "sb", 0, "en", b)]
    r = text_ops.kmv_jaccard(_docs(spark, rows), k=128).collect()[0]
    assert abs(r["exact_j"] - 1 / 3) < 1e-6  # 200 / 600
    assert abs(r["kmv_j"] - r["exact_j"]) < 0.27


# --- rpo gaps --------------------------------------------------------------------

def test_rpo_gaps_arithmetic(spark):
    m = spark.createDataFrame(
        [("s1", 0, "b0"), ("s1", 1000, "b1"), ("s1", 5000, "b2"),
         ("s2", 0, "c0")],
        "snapshot string, ts long, backup_name string",
    )
    out = {r["snapshot"]: r for r in
           retention.rpo_gaps(m, rpo_ms=2000).collect()}
    s1 = out["s1"]
    assert s1["n_backups"] == 3
    assert s1["max_gap_ms"] == 4000
    assert s1["mean_gap_ms"] == 2500.0
    assert s1["rpo_violations"] == 1
    assert out["s2"]["max_gap_ms"] is None


# --- histogram window pctile -------------------------------------------------------

def test_histogram_pctile_exact_buckets(spark):
    # 100 events of value 1.00 and 100 of value 9.00 on one day,
    # bucket=100 cents: p50 -> bucket 1 (100 cents), p95 -> bucket 9
    rows = [(_ts(i), 1.0) for i in range(100)] + [
        (_ts(200 + i), 9.0) for i in range(100)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {(r["day"], r["q_milli"]): r for r in
           analytics.histogram_window_pctile(
               ev, window_days=7, bucket_cents=100, q_millis=(500, 950)
           ).collect()}
    assert out[(0, 500)]["pctile_cents"] == 100
    assert out[(0, 950)]["pctile_cents"] == 900
    assert out[(0, 500)]["n_rows"] == 200


def test_histogram_pctile_monotone_in_q(spark):
    rows = [(_ts(i * 40), float(i)) for i in range(100)]
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["q_milli"]: r["pctile_cents"] for r in
           analytics.histogram_window_pctile(
               ev, window_days=7, bucket_cents=100, q_millis=(250, 500, 950)
           ).collect()}
    assert out[250] <= out[500] <= out[950]
