"""Wave-11 operators: path trigrams, gap regularity, per-doc keywords,
chi-square independence, MMR diversification, stratified histogram
quantiles. Oracle-checked by q170–q175."""

import datetime as dt

from pyspark.sql import functions as F

from esop_spark.operators import analytics, similarity
from esop_spark.operators import text as text_ops


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )


# --- path_trigrams -------------------------------------------------------------

def test_path_trigrams_counts_sequences(spark):
    rows = []
    eid = 0
    for u in range(3):  # three users all do A->B->C->B
        for i, t in enumerate(["A", "B", "C", "B"]):
            rows.append((u, dt.datetime(2024, 1, 1, 0, i), eid, t))
            eid += 1
    out = {(r["step1"], r["step2"], r["step3"]): r["n_paths"]
           for r in analytics.path_trigrams(_events(spark, rows)).collect()}
    assert out[("A", "B", "C")] == 3
    assert out[("B", "C", "B")] == 3
    assert len(out) == 2  # no cross-user trigrams


def test_path_trigrams_respects_user_boundary(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 0, "A"),
        (1, dt.datetime(2024, 1, 1, 0, 1), 1, "B"),
        (2, dt.datetime(2024, 1, 1, 0, 2), 2, "C"),
    ]
    assert analytics.path_trigrams(_events(spark, rows)).collect() == []


# --- gap_regularity ------------------------------------------------------------

def _tev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint"
    )


def test_gap_regularity_flags_metronome(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(seconds=60 * i), i)
            for i in range(10)]  # perfectly regular
    out = analytics.gap_regularity(_tev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cv2_micro"] == 0
    assert r["mean_gap_s"] == 60
    assert r["n_gaps"] == 9


def test_gap_regularity_ignores_bursty_user(spark):
    gaps = [1, 1, 1, 1, 3600, 1, 1, 7200, 1]  # wildly irregular
    t = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for g in [0] + gaps:
        t += dt.timedelta(seconds=g)
        rows.append((1, t, eid)); eid += 1
    out = analytics.gap_regularity(_tev(spark, rows)).collect()
    assert out == []


def test_gap_regularity_min_gaps(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 0, i), i) for i in range(4)]
    assert analytics.gap_regularity(_tev(spark, rows), min_gaps=5).collect() == []


# --- doc_keywords --------------------------------------------------------------

def test_doc_keywords_picks_distinctive_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common zebra zebra zebra"),
            (2, "common common yak"),
            (3, "common common common"),
        ],
        ["doc_id", "text"],
    )
    out = text_ops.doc_keywords(docs, top_k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    assert top[1] == "zebra"
    assert top[2] == "yak"
    assert top[3] == "common"  # only term present


def test_doc_keywords_rank_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc")], ["doc_id", "text"]
    )
    out = [r for r in text_ops.doc_keywords(docs, top_k=3).collect()
           if r["doc_id"] == 1]
    # aa and bb tie on tf*idf -> term-asc tiebreak
    assert [(r["rank"], r["term"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, "aa"), (2, "bb")
    ]


# --- chi2_independence ---------------------------------------------------------

def test_chi2_zero_when_independent(spark):
    # two sources with identical band composition -> chi2 == 0
    rows = []
    i = 0
    for src in ("a", "b"):
        for _ in range(5):
            rows.append((i, src, "q w e r t y u")); i += 1  # high score
            rows.append((i, src, "the the the the a a a")); i += 1  # low
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = text_ops.chi2_independence(docs).collect()[0]
    assert out["chi2_milli"] == 0
    assert out["dof"] == 2
    assert out["n_rows"] == 20


def test_chi2_positive_when_dependent(spark):
    rows = []
    i = 0
    for _ in range(10):
        rows.append((i, "good", "q w e r t y u")); i += 1
        rows.append((i, "bad", "the the the the a a a")); i += 1
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = text_ops.chi2_independence(docs).collect()[0]
    # perfect separation of 2x2-effective table: chi2 == n
    assert out["chi2_milli"] >= 19_000


# --- mmr_select ----------------------------------------------------------------

def test_mmr_penalizes_near_duplicates(spark):
    # query q; a1/a2 nearly identical high-relevance; b orthogonal-ish
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),       # query
            (1, [0.99, 0.1, 0.0]),      # a1: most relevant
            (2, [0.99, 0.11, 0.0]),     # a2: near-dup of a1
            (3, [0.6, 0.0, 0.8]),       # b: less relevant, diverse
            (4, [0.5, 0.0, 0.86]),      # b2
        ],
        ["vec_id", "embedding"],
    )
    # lam=50: the near-dup's ~1.0 similarity penalty outweighs its
    # relevance edge, so the diverse vector is picked second
    out = similarity.mmr_select(emb, query_id=0, k=3, pool=4, lam_pct=50)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["vec_id"] == 1  # pure relevance first
    assert rows[1]["vec_id"] == 3  # diversity beats the near-dup
    assert {r["vec_id"] for r in rows} <= {1, 2, 3, 4}
    assert len(rows) == 3


def test_mmr_pure_relevance_at_lam_100(spark):
    emb = spark.createDataFrame(
        [(i, [1.0 - 0.01 * i, 0.01 * i, 0.0]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    out = similarity.mmr_select(emb, query_id=0, k=3, pool=5, lam_pct=100)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    # with lambda=1 the selection is just relevance order: 1, 2, 3
    assert [r["vec_id"] for r in rows] == [1, 2, 3]


# --- stratified_histogram_quantiles ---------------------------------------------

def test_stratified_quantiles_exact_small_domain(spark):
    rows = [("a", v) for v in range(1, 11)] + [("b", v) for v in (100, 200, 300)]
    df = spark.createDataFrame(rows, ["source", "n"])
    out = {
        (r["stratum"], r["q_ppm"]): r
        for r in analytics.stratified_histogram_quantiles(
            df, F.col("n"), strata_col="source", bins=64
        ).collect()
    }
    # stratum a: width 1 -> exact; p50 of 1..10 = 5, p90 = 9
    assert out[("a", 500_000)]["approx_value"] == 5
    assert out[("a", 900_000)]["approx_value"] == 9
    assert out[("a", 500_000)]["error_bound"] == 1
    # stratum b has its own min/max
    assert out[("b", 500_000)]["n_rows"] == 3


def test_stratified_quantiles_within_error_bound(spark):
    rows = [("s", v) for v in range(1000)]
    df = spark.createDataFrame(rows, ["source", "n"])
    out = {
        r["q_ppm"]: r
        for r in analytics.stratified_histogram_quantiles(
            df, F.col("n"), strata_col="source", bins=64
        ).collect()
    }
    assert abs(out[500_000]["approx_value"] - 500) <= out[500_000]["error_bound"]
    assert abs(out[900_000]["approx_value"] - 900) <= out[900_000]["error_bound"]
