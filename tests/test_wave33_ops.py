"""Wave-33 operators: k-core peeling, Hampel outlier days, size-tiered
compaction planning, split-conformal calibration, and leave-one-source-out
influence. Oracle-checked by q266-q270; these tests pin the non-oracle
invariants (peel fixpoint, local-vs-global robustness, bin packing
conservation, finite-sample coverage, and redundancy ordering)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from esop_spark.operators import analytics, graph, retention, sampling
from esop_spark.operators import text as text_ops


# --- k-core ------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_kcore_peels_pendant_chain(spark):
    # triangle {1,2,3} with a pendant path 3-4-5: at k=2 the path peels
    # (5 first, then 4), the triangle survives with degree 2 everywhere
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["degree"] for r in
           graph.kcore_peel(e, k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_extra_rounds_idempotent(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    a = sorted(map(tuple, graph.kcore_peel(e, k=2, rounds=3).collect()))
    b = sorted(map(tuple, graph.kcore_peel(e, k=2, rounds=9).collect()))
    assert a == b


def test_kcore_everything_peels(spark):
    # a path graph has no 2-core
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert graph.kcore_peel(e, k=2, rounds=4).count() == 0


# --- hampel ------------------------------------------------------------------

def _events_from_daily(spark, counts):
    rows = []
    for day, c in enumerate(counts):
        for i in range(c):
            rows.append(
                (datetime.fromtimestamp(day * 86400 + i, tz=timezone.utc)
                 .replace(tzinfo=None),)
            )
    return spark.createDataFrame(rows, "ts timestamp")


def test_hampel_flags_local_spike(spark):
    counts = [10, 12, 11, 10, 12, 60, 11, 10, 12, 11, 10]
    ev = _events_from_daily(spark, counts)
    out = {r["day"]: r for r in
           analytics.hampel_outlier_days(ev, half_window=3, k_sigma=3.0)
           .collect()}
    assert out[5]["is_outlier"] == 1
    flagged = [d for d, r in out.items() if r["is_outlier"] == 1]
    assert flagged == [5]


def test_hampel_survives_trend_where_global_fence_would_not(spark):
    # steadily ramping series: every day is "normal" locally even though
    # the last days are far from the global median
    counts = [10 + 5 * d for d in range(12)]
    ev = _events_from_daily(spark, counts)
    out = analytics.hampel_outlier_days(ev, half_window=3, k_sigma=3.0)
    assert [r["is_outlier"] for r in out.collect()].count(1) == 0


def test_hampel_mad_zero_fallback(spark):
    # constant neighborhood => MAD 0 => any deviation flags, score NULL
    counts = [10] * 6 + [11] + [10] * 6
    ev = _events_from_daily(spark, counts)
    out = {r["day"]: r for r in
           analytics.hampel_outlier_days(ev, half_window=2).collect()}
    assert out[6]["is_outlier"] == 1
    assert out[6]["score"] is None
    assert out[0]["is_outlier"] == 0


# --- compaction plan ---------------------------------------------------------

def _entries(spark, rows):
    return spark.createDataFrame(
        rows, "keyspace string, table_name string, object_key string, size long"
    )


def test_compaction_bins_pack_to_target(spark):
    rows = [("ks", "t", f"k{i:02d}", 50_000) for i in range(10)]
    out = retention.compaction_plan(
        _entries(spark, rows), target_bytes=200_000
    ).collect()
    bins = {r["bin"]: r for r in out}
    # exclusive-prefix packing: 4 + 4 + 2 files
    assert [bins[b]["n_files"] for b in sorted(bins)] == [4, 4, 2]
    assert sum(r["bin_bytes"] for r in out) == 500_000
    assert abs(bins[0]["fill_ratio"] - 1.0) < 1e-6


def test_compaction_plan_per_table_and_dedup(spark):
    rows = [
        ("ks", "a", "x", 100_000),
        ("ks", "a", "x", 100_000),  # duplicate object: counted once
        ("ks", "b", "y", 100_000),
    ]
    out = retention.compaction_plan(
        _entries(spark, rows), target_bytes=200_000
    ).collect()
    per_tbl = {(r["keyspace"], r["table_name"]): r for r in out}
    assert per_tbl[("ks", "a")]["n_files"] == 1
    assert per_tbl[("ks", "b")]["n_files"] == 1
    # each table starts its own bin 0
    assert all(r["bin"] == 0 for r in out)


def test_compaction_size_tiered_order(spark):
    # sizes sort ascending within the table, so the small files share the
    # first bin and the big file (exclusive prefix 120k >= target) starts
    # the next bin alone
    rows = [("ks", "t", "small1", 60_000), ("ks", "t", "small2", 60_000),
            ("ks", "t", "big", 500_000)]
    out = retention.compaction_plan(
        _entries(spark, rows), target_bytes=100_000
    ).collect()
    by_bin = {r["bin"]: r for r in out}
    assert by_bin[0]["n_files"] == 2 and by_bin[0]["bin_bytes"] == 120_000
    assert by_bin[1]["n_files"] == 1 and by_bin[1]["bin_bytes"] == 500_000


# --- conformal ---------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_chars long, text string"
    )


def test_conformal_degenerate_full_coverage(spark):
    # every value identical: all scores 0, q_hat = 0, coverage 1.0
    rows = [(f"d{i}", "s", 100, "") for i in range(40)]
    out = sampling.conformal_calibration(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["q_hat"] == 0.0 and r["coverage"] == 1.0
    assert r["n_cal"] + r["n_test"] == 40
    assert abs(r["target"] - 0.9) < 1e-9


def test_conformal_iid_coverage_near_target(spark):
    # iid-ish values: finite-sample guarantee says coverage >= 1 - alpha
    # in expectation; with 400 rows per stratum it should not collapse
    rows = [(f"d{i}", "s", 100 + (i * 37) % 50, "") for i in range(400)]
    r = sampling.conformal_calibration(
        _docs(spark, rows), alpha_milli=200
    ).collect()[0]
    assert r["coverage"] >= 0.6
    assert r["q_hat"] >= 0.0


def test_conformal_rejects_bad_alpha(spark):
    import pytest

    with pytest.raises(ValueError):
        sampling.conformal_calibration(_docs(spark, []), alpha_milli=0)


# --- leave-one-source-out influence -----------------------------------------

def test_loso_unique_source_has_higher_delta(spark):
    # sources a and b share a vocabulary; source c is disjoint — removing
    # c's counts makes it unpredictable, so its delta_nll dominates
    rows = (
        [(f"a{i}", "a", 0, "alpha beta gamma delta") for i in range(6)]
        + [(f"b{i}", "b", 0, "alpha beta gamma delta") for i in range(6)]
        + [(f"c{i}", "c", 0, "zeta eta theta iota") for i in range(6)]
    )
    out = {r["source"]: r for r in
           text_ops.loso_source_influence(_docs(spark, rows)).collect()}
    assert out["c"]["delta_nll"] > out["a"]["delta_nll"]
    assert out["c"]["delta_nll"] > out["b"]["delta_nll"]
    # redundant sources: the LOO model still predicts them well
    assert out["a"]["mean_nll_loo"] >= out["a"]["mean_nll_full"] - 1e-6
    assert out["a"]["n_tokens"] == 24
