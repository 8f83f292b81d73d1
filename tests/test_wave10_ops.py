"""Wave-10 operators: graph primitives (PageRank, triangle census), EWMA
anomaly monitor, association rules, readability, winsorization, diversity
indices, Pareto frontier, epoch allocation, normalization audit, decayed
engagement. Oracle-checked by q159–q169."""

from pyspark.sql import functions as F

from esop_spark.operators import analytics, graph, sampling
from esop_spark.operators import text as text_ops


# --- pagerank ----------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_pagerank_star_center_wins(spark):
    # star: 1..4 <-> 0 (symmetric) — center collects all mass
    pairs = [(i, 0) for i in range(1, 5)] + [(0, i) for i in range(1, 5)]
    out = {r["node"]: r["rank_nano"] for r in graph.pagerank(_edges(spark, pairs)).collect()}
    assert out[0] > out[1]
    assert out[1] == out[2] == out[3] == out[4]


def test_pagerank_ring_is_uniform(spark):
    # symmetric 4-ring: perfectly regular -> rank stays at 1.0 (1e9 nanos)
    ring = []
    for i in range(4):
        j = (i + 1) % 4
        ring += [(i, j), (j, i)]
    out = graph.pagerank(_edges(spark, ring), iterations=3).collect()
    assert {r["rank_nano"] for r in out} == {1_000_000_000}
    assert {r["out_deg"] for r in out} == {2}


def test_pagerank_integer_determinism(spark):
    pairs = [(a, b) for a in range(6) for b in range(6) if a != b and (a + b) % 3]
    a = sorted(map(tuple, graph.pagerank(_edges(spark, pairs)).collect()))
    b = sorted(
        map(tuple, graph.pagerank(_edges(spark, pairs).repartition(7)).collect())
    )
    assert a == b


# --- triangle_count ----------------------------------------------------------

def test_triangle_k3(spark):
    out = graph.triangle_count(_edges(spark, [(1, 2), (1, 3), (2, 3)])).collect()[0]
    assert out["n_triangles"] == 1
    assert out["n_wedges"] == 3
    assert out["global_clustering_ppm"] == 1_000_000


def test_triangle_path_has_none(spark):
    out = graph.triangle_count(_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()[0]
    assert out["n_triangles"] == 0
    assert out["n_edges"] == 3


def test_triangle_k4_counts_each_once(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = graph.triangle_count(_edges(spark, edges)).collect()[0]
    assert out["n_triangles"] == 4  # C(4,3)
    assert out["n_wedges"] == 12  # 4 nodes x C(3,2)


# --- ewma_deviation ----------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )


def test_ewma_constant_series_no_anomaly(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, i), i, 10.0) for i in range(12)
    ]
    out = analytics.ewma_deviation(
        _events(spark, rows), threshold_micros=1_000_000
    ).collect()
    assert out == []  # dev == 0 everywhere (10 - 2550//255*... == exact)


def test_ewma_spike_detected_exactly(spark):
    import datetime as dt

    rows = [(1, dt.datetime(2024, 1, 1, 0, i), i, 10.0) for i in range(8)]
    rows.append((1, dt.datetime(2024, 1, 1, 0, 8), 8, 110.0))
    out = analytics.ewma_deviation(
        _events(spark, rows), threshold_micros=50_000_000
    ).collect()
    assert len(out) == 1
    r = out[0]
    # prediction over 8 constant 10.0s is exactly 10.0 -> dev = 100.0
    assert r["n_anomalies"] == 1
    assert r["max_abs_dev_micros"] == 100_000_000


def test_ewma_needs_full_lookback(spark):
    import datetime as dt

    rows = [(1, dt.datetime(2024, 1, 1, 0, i), i, 999.0) for i in range(8)]
    out = analytics.ewma_deviation(_events(spark, rows)).collect()
    assert out == []  # only 8 events -> nothing has 8 predecessors


# --- association_rules -------------------------------------------------------

def test_association_rules_math(spark):
    import datetime as dt

    rows = []
    eid = 0
    # users 0..9: all have A; users 0..4 also have B
    for u in range(10):
        rows.append((u, dt.datetime(2024, 1, 1), eid, "A")); eid += 1
    for u in range(5):
        rows.append((u, dt.datetime(2024, 1, 1), eid, "B")); eid += 1
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in analytics.association_rules(ev, min_support=1).collect()
    }
    ab = out[("A", "B")]
    assert ab["sup_ab"] == 5
    assert ab["confidence_ppm"] == 500_000  # 5/10
    assert ab["lift_milli"] == 1000  # conf 0.5 / P(B)=0.5
    ba = out[("B", "A")]
    assert ba["confidence_ppm"] == 1_000_000  # B always implies A


# --- readability -------------------------------------------------------------

def test_readability_bands(spark):
    docs = spark.createDataFrame(
        [
            ("s", "go to it. we do so. it is ok."),  # short words, short sents
            ("s", "extraordinarily sophisticated considerations notwithstanding unquestionably"),
        ],
        ["source", "text"],
    )
    out = text_ops.readability_report(docs).collect()[0]
    assert out["n_docs"] == 2
    assert out["n_easy"] == 1
    assert out["n_hard"] == 1


# --- winsorize_scores --------------------------------------------------------

def test_winsorize_clamps_tails(spark):
    # 18 mid-quality docs + 2 extremes within one source
    rows = [(i, "s", "the a the a w%d" % (i % 3)) for i in range(18)]
    rows.append((98, "s", "the the the the the the the the"))  # score 6 (low)
    rows.append((99, "s", "q w e r t y u i o p"))  # score 100 (high)
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = text_ops.winsorize_scores(docs).collect()[0]
    assert out["n_clamped"] >= 1
    assert out["lo_score"] <= out["hi_score"]
    assert out["mean_after_milli"] != out["mean_before_milli"]


def test_winsorize_noop_on_uniform_scores(spark):
    docs = spark.createDataFrame(
        [(i, "s", "x y z") for i in range(10)], ["doc_id", "source", "text"]
    )
    out = text_ops.winsorize_scores(docs).collect()[0]
    assert out["n_clamped"] == 0
    assert out["mean_after_milli"] == out["mean_before_milli"]


# --- diversity_indices -------------------------------------------------------

def test_diversity_single_class(spark):
    docs = spark.createDataFrame(
        [(i, "s", "en") for i in range(5)], ["doc_id", "source", "lang"]
    )
    out = text_ops.diversity_indices(docs).collect()[0]
    assert out["richness"] == 1
    assert out["gini_simpson_ppm"] == 0
    assert out["berger_parker_ppm"] == 1_000_000


def test_diversity_two_even_classes(spark):
    rows = [(i, "s", "en" if i % 2 else "fr") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "lang"])
    out = text_ops.diversity_indices(docs).collect()[0]
    assert out["richness"] == 2
    assert out["gini_simpson_ppm"] == 500_000
    assert out["berger_parker_ppm"] == 500_000


# --- pareto_frontier ---------------------------------------------------------

def test_pareto_excludes_dominated(spark):
    # scores: "q w e" -> 100 (all distinct, no stopwords); "the the" -> low
    docs = spark.createDataFrame(
        [
            (1, "q w e r", 50),  # high score, short
            (2, "q w e r", 500),  # high score, long  -> frontier
            (3, "the the the", 400),  # low score, shorter than 500 -> dominated
            (4, "the the the", 900),  # low score, longest -> frontier
        ],
        ["doc_id", "text", "n_chars"],
    )
    out = text_ops.pareto_frontier(docs).collect()
    lens = sorted(r["frontier_len"] for r in out)
    assert lens == [500, 900]


# --- epoch_allocation --------------------------------------------------------

def test_epoch_allocation_caps_and_redistributes(spark):
    # tiny source (2 tokens) is capped at max_epochs; big sources absorb
    rows = [(i, "big", "w " * 99 + "w") for i in range(4)]  # 100 tokens each
    rows.append((9, "tiny", "a b"))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["stratum"]: r
        for r in sampling.epoch_allocation(
            docs, budget_num=3, budget_den=1, max_epochs=4
        ).collect()
    }
    tiny = out["tiny"]
    assert tiny["capped"] and tiny["allocated_tokens"] == 8  # 2 * 4 epochs
    big = out["big"]
    assert not big["capped"]
    total = sum(r["allocated_tokens"] for r in out.values())
    budget = 3 * (4 * 100 + 2)
    assert total <= budget
    assert budget - total <= 2  # at most |strata| remainder tokens
    assert big["epochs_milli"] <= 4000


def test_epoch_allocation_budget_below_capacity(spark):
    docs = spark.createDataFrame(
        [(1, "a", "x y z w"), (2, "b", "x y z w")], ["doc_id", "source", "text"]
    )
    out = sampling.epoch_allocation(
        docs, budget_num=1, budget_den=2, max_epochs=4
    ).collect()
    for r in out:
        assert r["allocated_tokens"] == 2  # half of each source's 4
        assert not r["capped"]


# --- normalization_audit -----------------------------------------------------

def test_normalization_audit_flags_changes(spark):
    docs = spark.createDataFrame(
        [
            (1, "s", "Hello  World"),  # case + double space
            (2, "s", "already clean"),
        ],
        ["doc_id", "source", "text"],
    )
    out = text_ops.normalization_audit(docs).collect()[0]
    assert out["n_changed"] == 1
    assert out["changed_ppm"] == 500_000
    assert out["chars_removed"] == 1  # one collapsed space


# --- decayed_engagement ------------------------------------------------------

def test_decayed_engagement_recency_wins(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 30)
    ev = spark.createDataFrame(
        [
            (1, base, 1, 10.0),  # recent small
            (2, base - dt.timedelta(days=10), 2, 1000.0),  # old big: /1024
        ],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    out = analytics.decayed_engagement(ev, k=2).collect()
    assert out[0]["user_id"] == 1
    assert out[0]["engagement_micros"] == 10_000_000
    assert out[1]["engagement_micros"] == 1_000_000_000 // 1024
