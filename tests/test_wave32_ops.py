"""Wave-32 operators: centroid silhouette, Adamic-Adar link prediction,
Theil-Sen robust trend, the sort-key layout advisor, and binary-segmentation
changepoint. Oracle-checked by q261-q265; these tests pin the non-oracle
invariants (separation geometry, hub capping, outlier robustness, skip-ratio
ordering, and shift localization)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from esop_spark.operators import analytics, graph, similarity
from esop_spark.plans import layout


# --- centroid silhouette -----------------------------------------------------

def test_silhouette_separated_clusters_near_one(spark):
    # two tight clusters far apart: every point sits on its centroid, so
    # a = 0, b = inter-centroid distance, s = 1 exactly
    rows = [(i, [0.0, 0.0], 0) for i in range(5)] + [
        (i + 5, [10.0, 10.0], 1) for i in range(5)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["label"]: r for r in similarity.centroid_silhouette(emb).collect()}
    assert out[0]["n_members"] == 5
    assert abs(out[0]["mean_silhouette"] - 1.0) < 1e-6
    assert abs(out[1]["mean_silhouette"] - 1.0) < 1e-6
    assert out[0]["mean_intra"] == 0.0


def test_silhouette_interleaved_clusters_low(spark):
    # identical distributions for both labels: centroids coincide, a == b
    rows = []
    for i in range(10):
        rows.append((2 * i, [float(i), 0.0], 0))
        rows.append((2 * i + 1, [float(i), 0.0], 1))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.centroid_silhouette(emb).collect()
    for r in out:
        assert abs(r["mean_silhouette"]) < 1e-6


# --- adamic-adar -------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_adamic_adar_path_graph(spark):
    import math

    # a-b-c path: only candidate is (a, c) through apex b with deg 2
    e = _edges(spark, [(1, 2), (2, 3)])
    out = graph.adamic_adar_topk(e, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src"], r["dst"]) == (1, 3)
    assert r["common_neighbors"] == 1
    assert abs(r["aa_score"] - 1.0 / math.log(2)) < 1e-6


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle: every 2-hop pair is already an edge -> no candidates
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    assert graph.adamic_adar_topk(e, k=10).count() == 0


def test_adamic_adar_hub_cap_drops_hub_apex(spark):
    # star with hub 0 over 6 leaves: capping apex degree at 5 removes the
    # only apex, so no candidate pairs survive
    e = _edges(spark, [(0, i) for i in range(1, 7)])
    assert graph.adamic_adar_topk(e, k=100, max_apex_degree=5).count() == 0
    # uncapped, all 15 leaf pairs appear with score 1/ln(6)
    out = graph.adamic_adar_topk(e, k=100, max_apex_degree=64).collect()
    assert len(out) == 15


# --- theil-sen ---------------------------------------------------------------

def _orders(spark, day_rev):
    base = datetime(2024, 1, 1)
    rows = [
        (i, 1, "O", rev, base + timedelta(days=d), "1-URGENT")
        for i, (d, rev) in enumerate(day_rev)
    ]
    return spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_theil_sen_exact_linear(spark):
    # revenue = 100 + 10*day dollars -> slope 1000 cents/day
    o = _orders(spark, [(d, 100.0 + 10.0 * d) for d in range(10)])
    r = analytics.theil_sen_daily_revenue(o).collect()[0]
    assert r["n_days"] == 10
    assert r["n_pairs"] == 45
    assert abs(r["slope_cents_per_day"] - 1000.0) < 1e-6


def test_theil_sen_ignores_outlier(spark):
    # one flash-sale day cannot move the median slope
    series = [(d, 100.0 + 10.0 * d) for d in range(11)]
    series[5] = (5, 100000.0)
    r = analytics.theil_sen_daily_revenue(_orders(spark, series)).collect()[0]
    assert abs(r["slope_cents_per_day"] - 1000.0) < 1e-6


# --- layout advisor ----------------------------------------------------------

def test_layout_advisor_skip_ordering(spark):
    # uniform grid; query box = a thin x-slice covering all y: linear-x
    # isolates it to ~1/8 of files, linear-y must read everything, z-order
    # lands in between
    pts = [(x * 8 + 4, y * 8 + 4) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "ts_ms bigint, user_id bigint")
    out = layout.layout_skip_compare(
        df, "ts_ms", "user_id", bits=8, cell_bits=3, box=(0, 16, 0, 300)
    ).collect()
    read = {}
    tot = {}
    for r in out:
        read[r["layout"]] = read.get(r["layout"], 0) + r["n"] * r["must_read"]
        tot[r["layout"]] = tot.get(r["layout"], 0) + r["n"]
    assert tot["linear_x"] == tot["linear_y"] == tot["zorder"] == 1024
    assert read["linear_x"] < read["zorder"] < read["linear_y"]
    assert read["linear_y"] == 1024


def test_layout_advisor_bucket_counts(spark):
    pts = [(i, i) for i in range(256)]
    df = spark.createDataFrame(pts, "ts_ms bigint, user_id bigint")
    out = layout.layout_skip_compare(
        df, "ts_ms", "user_id", bits=8, cell_bits=3, box=(0, 0, 0, 0)
    )
    per_layout = (
        out.groupBy("layout").agg(F.sum("n").alias("s")).collect()
    )
    assert {r["s"] for r in per_layout} == {256}


# --- changepoint -------------------------------------------------------------

def _events(spark, day_counts):
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d, c in day_counts:
        for _ in range(c):
            rows.append((eid, base + timedelta(days=d), 1, "click", 1.0, "{}"))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_changepoint_finds_level_shift(spark):
    # 10 days at 5/day then 10 days at 50/day: split at the last low day
    ev = _events(
        spark, [(d, 5) for d in range(10)] + [(d, 50) for d in range(10, 20)]
    )
    r = analytics.changepoint_split_day(ev).collect()[0]
    assert r["n_left"] == 10 and r["n_right"] == 10
    assert abs(r["mean_left"] - 5.0) < 1e-6
    assert abs(r["mean_right"] - 50.0) < 1e-6
    assert r["gain"] > 0


def test_changepoint_flat_series_zero_gain(spark):
    ev = _events(spark, [(d, 7) for d in range(12)])
    r = analytics.changepoint_split_day(ev).collect()[0]
    assert abs(r["gain"]) < 1e-6
