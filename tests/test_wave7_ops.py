"""Wave-7 operators: burst detection, prototypicality deciles, dedup
threshold curve. Oracle-checked by q148–q150; these pin planted-signal
behavior."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from esop_spark.operators import analytics, dedup, similarity


def _ts(ms):
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).replace(tzinfo=None)


# --- burst_detection --------------------------------------------------------

def test_burst_flags_scripted_user(spark):
    base = 1_700_000_000_000
    rows = []
    # bot: 30 events in 10 seconds
    rows += [(i, _ts(base + i * 300), 1, "click", 0.0) for i in range(30)]
    # human: 30 events one per hour
    rows += [(100 + i, _ts(base + i * 3_600_000), 2, "click", 0.0) for i in range(30)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    out = {r["user_id"]: r for r in analytics.burst_detection(
        ev, window_ms=60_000, burst_threshold=20).collect()}
    assert out[1]["max_burst"] == 30 and out[1]["is_burst"]
    assert out[2]["max_burst"] == 1 and not out[2]["is_burst"]
    assert out[1]["n_events"] == out[2]["n_events"] == 30


def test_burst_window_is_sliding_not_tumbling(spark):
    base = 1_700_000_000_000
    # 3 events at t=0s, 35s, 59s -> all inside one 60s window anchored at 59s
    # but a tumbling [0,60) vs [35,95) ambiguity would undercount
    rows = [(i, _ts(base + off), 7, "x", 0.0) for i, off in enumerate([0, 35_000, 59_000])]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    out = analytics.burst_detection(ev, window_ms=60_000).collect()[0]
    assert out["max_burst"] == 3


# --- prototypicality --------------------------------------------------------

def test_prototypicality_outlier_lands_in_last_decile(spark):
    import random

    rnd = random.Random(3)
    rows = []
    for i in range(39):
        rows.append((i, [1.0 + rnd.random() * 0.01 for _ in range(8)], 0))
    rows.append((99, [-1.0] * 8, 0))  # anti-centroid outlier
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.prototypicality(emb, deciles=10).collect()
    last = [r for r in out if r["decile"] == 10][0]
    # the outlier drags the last decile's min far below every other decile
    assert last["min_cos"] < 0
    others = [r["min_cos"] for r in out if r["decile"] < 10]
    assert all(m > 0.9 for m in others)


def test_prototypicality_deciles_partition_label(spark):
    rows = [(i, [float((i * 13 + j) % 7 + 1) for j in range(4)], i % 2)
            for i in range(60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.prototypicality(emb, deciles=10).collect()
    for lbl in (0, 1):
        per = [r for r in out if r["label"] == lbl]
        assert sum(r["n_vecs"] for r in per) == 30
        # monotone: decile d's max_cos >= decile d+1's max_cos
        per.sort(key=lambda r: r["decile"])
        for a, b in zip(per, per[1:]):
            assert a["max_cos"] >= b["max_cos"]


# --- dedup_threshold_curve --------------------------------------------------

def test_threshold_curve_is_monotone_decreasing(spark):
    texts = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i x"),   # j~0.8 vs 0
        (2, "a b c d e f x y z w"),   # j~0.45 vs 0
        (3, "p q r s t u v w1 w2 w3"),
    ] + [(10 + i, f"u{i} v{i} w{i} x{i} y{i} z{i} q{i} r{i} s{i} t{i}") for i in range(20)]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {r["threshold_pct"]: r for r in dedup.dedup_threshold_curve(
        docs, thresholds_pct=(50, 70, 90)).collect()}
    # pairs at 50 >= pairs at 70 >= pairs at 90 (monotone by construction)
    present = [out.get(t) for t in (50, 70, 90)]
    counts = [p["n_pairs"] if p else 0 for p in present]
    assert counts == sorted(counts, reverse=True)
    docs_touched = [p["n_docs_touched"] if p else 0 for p in present]
    assert docs_touched == sorted(docs_touched, reverse=True)
    # the 0-1 pair (8 shared 3-grams of 8 each -> j = 8/8 = 1.0? no:
    # 3-gram shingles differ at the tail) must survive at 50
    assert counts[0] >= 1


def test_threshold_curve_drop_bound_bounds_docs(spark):
    texts = [(i, "m n o p q r s t u v") for i in range(5)]  # 5 identical docs
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    out = dedup.dedup_threshold_curve(docs, thresholds_pct=(90,)).collect()[0]
    assert out["n_pairs"] == 10  # C(5,2), all jaccard 1.0
    assert out["n_docs_touched"] == 5
    # dropping ids 1..4 (every higher-id partner) disconnects everything
    assert out["drop_upper_bound"] == 4
