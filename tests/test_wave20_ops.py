"""Wave-20 operators: Spearman rank correlation, engagement half-life,
Chao1 richness, lang×source mutual information.
Oracle-checked by q205–q208."""

import datetime as dt
import math

from esop_spark.operators import analytics
from esop_spark.operators import text as text_ops


DOC_COLS = ["doc_id", "text", "lang", "source"]
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ev(eid, uid, days):
    return (
        eid,
        dt.datetime(2024, 1, 1) + dt.timedelta(days=days),
        uid,
        "click",
        1.0,
        "{}",
    )


# --- spearman ----------------------------------------------------------------

def test_spearman_perfect_monotone_is_one(spark):
    # longer docs (all-distinct words) monotonically raise both token
    # count and quality score
    docs = spark.createDataFrame(
        [
            (k, " ".join("w%d_%d" % (k, i) for i in range(5 + 5 * k)), "en", "s")
            for k in range(5)
        ],
        DOC_COLS,
    )
    r = text_ops.spearman_quality_length(docs).collect()[0]
    assert r["n_docs"] == 5
    # all-distinct docs share score 100: the score signal is constant,
    # so the correlation is undefined and must surface as NULL, not a
    # divide-by-zero error
    assert r["rho"] is None


def test_spearman_exact_inverse(spark):
    # token count up, score down: more stopword copies dilute TTR
    docs = spark.createDataFrame(
        [
            (k, " ".join(["a"] * (2 + 3 * k) + ["u%d" % k]), "en", "s")
            for k in range(4)
        ],
        DOC_COLS,
    )
    r = text_ops.spearman_quality_length(docs).collect()[0]
    assert r["rho"] is not None
    assert r["rho"] < -0.99  # strictly decreasing -> -1


def test_spearman_midranks_handle_ties(spark):
    # two identical docs + two distinct: ties get mid-ranks, result finite
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s"),
            (2, "a b c", "en", "s"),
            (3, "a a a a", "en", "s"),
            (4, " ".join("w%d" % i for i in range(8)), "en", "s"),
        ],
        DOC_COLS,
    )
    r = text_ops.spearman_quality_length(docs).collect()[0]
    assert r["n_docs"] == 4
    assert -1.0 <= r["rho"] <= 1.0


# --- halflife ----------------------------------------------------------------

def test_halflife_exact_geometric_decay(spark):
    # daily counts 16, 8, 4, 2: slope = -ln2, halflife = 1 day
    rows = []
    eid = 0
    for d, n in enumerate([16, 8, 4, 2]):
        for i in range(n):
            eid += 1
            rows.append(_ev(eid, f"u{i}", d))
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.engagement_halflife(events).collect()[0]
    assert r["n_days"] == 4
    assert abs(r["slope"] + math.log(2)) < 1e-6
    assert abs(r["halflife_days"] - 1.0) < 1e-6


def test_halflife_null_when_growing(spark):
    rows = []
    eid = 0
    for d, n in enumerate([2, 4, 8]):
        for i in range(n):
            eid += 1
            rows.append(_ev(eid, f"u{i}", d))
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.engagement_halflife(events).collect()[0]
    assert r["slope"] > 0
    assert r["halflife_days"] is None


# --- chao1 -------------------------------------------------------------------

def test_chao1_exact(spark):
    # 3 singletons, 1 doubleton, 1 tripleton:
    # D=5, f1=3, f2=1 -> chao1 = 5 + 3*2/(2*2) = 6.5
    texts = ["s1", "s2", "s3", "d", "d", "t", "t", "t"]
    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in enumerate(texts)], DOC_COLS
    )
    r = text_ops.chao1_richness(docs).collect()[0]
    assert r["n_docs"] == 8
    assert r["distinct_docs"] == 5
    assert r["f1"] == 3 and r["f2"] == 1
    assert abs(r["chao1"] - 6.5) < 1e-9


def test_chao1_no_duplicates_defined(spark):
    docs = spark.createDataFrame(
        [(i, "u%d" % i, "en", "s") for i in range(4)], DOC_COLS
    )
    r = text_ops.chao1_richness(docs).collect()[0]
    # f2=0: bias-corrected form stays finite: 4 + 4*3/2 = 10
    assert abs(r["chao1"] - 10.0) < 1e-9


# --- MI ----------------------------------------------------------------------

def test_mi_independent_grid_is_zero(spark):
    # lang and source independent: every combination equally likely
    rows = []
    i = 0
    for lang in ("en", "fr"):
        for src in ("A", "B"):
            for _ in range(3):
                rows.append((i, "t", lang, src))
                i += 1
    docs = spark.createDataFrame(rows, DOC_COLS)
    r = text_ops.lang_source_mi(docs).collect()[0]
    assert r["n_cells"] == 4
    assert abs(r["mi_nats"]) < 1e-9


def test_mi_perfectly_dependent_is_ln_k(spark):
    # lang determines source: MI = H(lang) = ln 2 for a 50/50 split
    rows = [(i, "t", "en", "A") for i in range(5)] + [
        (10 + i, "t", "fr", "B") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, DOC_COLS)
    r = text_ops.lang_source_mi(docs).collect()[0]
    assert abs(r["mi_nats"] - math.log(2)) < 1e-6
