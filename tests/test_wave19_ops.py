"""Wave-19 operators: DoReMi mixture weights, term burstiness, Markov
entropy rate, Hill tail index, distributed top-eigen share, CUSUM.
Oracle-checked by q199–q204."""

import datetime as dt
import math

from esop_spark.operators import analytics, similarity
from esop_spark.operators import text as text_ops


DOC_COLS = ["doc_id", "text", "lang", "source"]
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ev(eid, uid, minutes, etype="click", value=1.0):
    return (
        eid,
        dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes),
        uid,
        etype,
        value,
        "{}",
    )


# --- DoReMi ------------------------------------------------------------------

def test_doremi_weights_sum_to_one_and_hard_source_upweighted(spark):
    # source A: repetitive (low NLL). source B: all-distinct (high NLL).
    docs = spark.createDataFrame(
        [
            (1, " ".join(["a"] * 50), "en", "A"),
            (2, " ".join("w%d" % i for i in range(50)), "en", "B"),
        ],
        DOC_COLS,
    )
    rows = {r["source"]: r for r in text_ops.doremi_weights(docs).collect()}
    assert abs(sum(r["weight"] for r in rows.values()) - 1.0) < 1e-5
    assert rows["B"]["mean_nll"] > rows["A"]["mean_nll"]
    assert rows["B"]["weight"] > rows["A"]["weight"]
    # excess is signed and centered: token-weighted mean excess ~ 0
    tw = sum(r["excess"] * r["n_tokens"] for r in rows.values())
    assert abs(tw) < 1e-3 * sum(r["n_tokens"] for r in rows.values())


# --- burstiness --------------------------------------------------------------

def test_burstiness_concentrated_term_beats_even_term(spark):
    # 'even' appears once in each of 4 docs (VMR low);
    # 'burst' appears 4 times in one doc (VMR high)
    docs = spark.createDataFrame(
        [
            (1, "even burst burst burst burst", "en", "s"),
            (2, "even x", "en", "s"),
            (3, "even y", "en", "s"),
            (4, "even z", "en", "s"),
        ],
        DOC_COLS,
    )
    rows = {
        r["term"]: r
        for r in text_ops.term_burstiness(docs, k=10, min_df=1).collect()
    }
    # even: x=1 four times, N=4: VMR = (4*4 - 16)/(4*4) = 0
    assert rows["even"]["vmr"] == 0.0
    # burst: one doc x=4, N=4: VMR = (4*16 - 16)/(4*4) = 3
    assert rows["burst"]["vmr"] == 3.0


def test_burstiness_min_df_filter(spark):
    docs = spark.createDataFrame(
        [(1, "rare common", "en", "s"), (2, "common", "en", "s")], DOC_COLS
    )
    terms = {
        r["term"]
        for r in text_ops.term_burstiness(docs, k=10, min_df=2).collect()
    }
    assert terms == {"common"}


# --- markov entropy ----------------------------------------------------------

def test_markov_entropy_deterministic_chain_is_zero(spark):
    rows = []
    for u in range(3):
        rows += [
            _ev(u * 10 + 1, f"u{u}", 0, "view"),
            _ev(u * 10 + 2, f"u{u}", 1, "click"),
            _ev(u * 10 + 3, f"u{u}", 2, "purchase"),
        ]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.markov_entropy(events).collect()[0]
    assert r["n_transitions"] == 6
    assert r["entropy_rate"] == 0.0
    assert r["perplexity"] == 1.0


def test_markov_entropy_uniform_branching(spark):
    # from 'view', half go to 'click', half to 'error' -> H(view)=ln 2;
    # outflow is all from view, so rate = ln 2
    rows = [
        _ev(1, "u1", 0, "view"), _ev(2, "u1", 1, "click"),
        _ev(3, "u2", 0, "view"), _ev(4, "u2", 1, "error"),
    ]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.markov_entropy(events).collect()[0]
    assert abs(r["entropy_rate"] - math.log(2)) < 1e-6
    assert abs(r["perplexity"] - 2.0) < 1e-5


# --- hill --------------------------------------------------------------------

def test_hill_tail_exact_on_geometric_lengths(spark):
    # x_i = 2^i: with k=3 top lengths 8,4,2 over x_{k+1}=1:
    # sum ln = ln8+ln4+ln2 = 6 ln2; alpha = 3/(6 ln2)
    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 2 ** i) for i in range(4)],
        DOC_COLS + ["n_chars"],
    )
    r = text_ops.hill_tail_index(docs, k=3).collect()[0]
    assert r["x_k1"] == 1
    assert abs(r["sum_log_ratio"] - 6 * math.log(2)) < 1e-6
    assert abs(r["tail_alpha"] - 3 / (6 * math.log(2))) < 1e-6


# --- eigen -------------------------------------------------------------------

def test_top_eigen_share_detects_dominant_axis(spark):
    # variance concentrated on dim 0: share should be near 1
    rows = [(i, [float(i % 7 - 3)] + [0.01 * ((i * 13) % 5 - 2)] * 63, "l")
            for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = similarity.top_eigen_share(emb, iters=8).collect()[0]
    assert r["top_eigen"] > 0
    assert 0.5 < r["explained_share"] <= 1.0


# --- cusum -------------------------------------------------------------------

def test_cusum_flat_series_is_zero(spark):
    rows = [_ev(d * 10 + i, f"u{i}", d * 1440, "click") for d in range(5)
            for i in range(4)]
    events = spark.createDataFrame(rows, EV_COLS)
    out = analytics.cusum_changepoints(events).collect()
    assert all(r["cusum_milli"] == 0 for r in out)
    assert all(r["flagged"] == 0 for r in out)


def test_cusum_accumulates_after_level_shift(spark):
    # 4 quiet days of 2 events, then 4 loud days of 10 -> mean 6;
    # loud days add (10-6)=4k milli each, cumulatively
    rows = []
    eid = 0
    for d in range(8):
        n = 2 if d < 4 else 10
        for i in range(n):
            eid += 1
            rows.append(_ev(eid, f"u{i}", d * 1440, "click"))
    events = spark.createDataFrame(rows, EV_COLS)
    out = {r["day"]: r for r in analytics.cusum_changepoints(events).collect()}
    days = sorted(out)
    # quiet days: prefix negative, cusum clamps at 0
    assert out[days[0]]["cusum_milli"] == 0
    assert out[days[3]]["cusum_milli"] == 0
    # loud days accumulate 4000 per day
    assert out[days[4]]["cusum_milli"] == 4000
    assert out[days[7]]["cusum_milli"] == 16000
    # threshold = 3 * mean_milli = 18000 -> not yet flagged
    assert out[days[7]]["flagged"] == 0
