"""Wave-24 operators: Cramér's V cross-table audit, DoW quantile bands,
vocabulary head churn. Oracle-checked by q220–q222."""

import datetime as dt

from esop_spark.operators import analytics, similarity
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


def _emb(vid, label):
    return (vid, [0.0] * 64, label)


# --- cramers v ---------------------------------------------------------------

def test_cramers_v_perfect_association_is_one(spark):
    emb = spark.createDataFrame(
        [_emb(i, i % 2) for i in range(20)],
        ["vec_id", "embedding", "label"],
    )
    docs = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "fr", "s") for i in range(20)],
        DOC_COLS,
    )
    r = similarity.label_lang_cramers_v(emb, docs).collect()[0]
    assert r["n_pairs"] == 20
    assert abs(r["cramers_v"] - 1.0) < 1e-6


def test_cramers_v_independence_is_zero(spark):
    # label and lang fully crossed with equal counts
    rows, docs = [], []
    i = 0
    for lab in (0, 1):
        for lang in ("en", "fr"):
            for _ in range(5):
                rows.append(_emb(i, lab))
                docs.append((i, "t", lang, "s"))
                i += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    d = spark.createDataFrame(docs, DOC_COLS)
    r = similarity.label_lang_cramers_v(emb, d).collect()[0]
    assert abs(r["chi2"]) < 1e-9
    assert abs(r["cramers_v"]) < 1e-6


def test_cramers_v_counts_empty_cells(spark):
    # 3 labels × 2 langs with one empty cell: chi2 must include its
    # expected mass (the Σn²/e − n identity); verify against the direct
    # computation
    emb = spark.createDataFrame(
        [_emb(0, 0), _emb(1, 0), _emb(2, 1), _emb(3, 1), _emb(4, 2)],
        ["vec_id", "embedding", "label"],
    )
    docs = spark.createDataFrame(
        [(0, "t", "en", "s"), (1, "t", "fr", "s"), (2, "t", "en", "s"),
         (3, "t", "en", "s"), (4, "t", "fr", "s")],
        DOC_COLS,
    )
    r = similarity.label_lang_cramers_v(emb, docs).collect()[0]
    # direct chi²: observed grid {(0:en1,fr1),(1:en2,fr0),(2:en0,fr1)}
    n = 5
    n_l = {0: 2, 1: 2, 2: 1}
    n_c = {"en": 3, "fr": 2}
    obs = {(0, "en"): 1, (0, "fr"): 1, (1, "en"): 2, (1, "fr"): 0,
           (2, "en"): 0, (2, "fr"): 1}
    chi2 = sum(
        (o - n_l[l] * n_c[c] / n) ** 2 / (n_l[l] * n_c[c] / n)
        for (l, c), o in obs.items()
    )
    assert abs(r["chi2"] - chi2) < 1e-6


# --- dow bands ---------------------------------------------------------------

def test_dow_bands_exact_quartiles(spark):
    # same dow observed 4 times with counts 1,2,3,4:
    # type-1 quartiles: q25=1, q50=2, q75=3
    rows = []
    eid = 0
    for wk in range(4):
        for i in range(wk + 1):
            eid += 1
            rows.append(_ev(eid, f"u{i}", wk * 7))
    events = spark.createDataFrame(rows, EV_COLS)
    out = {r["dow"]: r for r in analytics.dow_quantile_bands(events).collect()}
    assert len(out) == 1
    r = list(out.values())[0]
    assert r["n_days"] == 4
    assert (r["q25"], r["q50"], r["q75"]) == (1, 2, 3)


# --- head churn --------------------------------------------------------------

def test_head_churn_identical_halves(spark):
    docs = spark.createDataFrame(
        [(i, "x y z", "en", "s") for i in range(10)], DOC_COLS
    )
    r = text_ops.head_churn(docs, k=3).collect()[0]
    assert r["n_common"] == 3
    assert r["jaccard"] == 1.0


def test_head_churn_disjoint_halves(spark):
    docs = spark.createDataFrame(
        [(i, "a b c" if i % 2 == 0 else "p q r", "en", "s")
         for i in range(10)],
        DOC_COLS,
    )
    r = text_ops.head_churn(docs, k=3).collect()[0]
    assert r["n_common"] == 0
    assert r["jaccard"] == 0.0
