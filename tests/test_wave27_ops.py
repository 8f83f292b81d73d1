"""Wave-27 operators: feature-hash collision audit, Mann–Kendall trend,
sparse-cosine top-k. Oracle-checked by q229–q231."""

import datetime as dt
import math

from esop_spark.operators import analytics, dedup
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


def test_feature_hash_no_collisions_at_wide_bits(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s")], DOC_COLS
    )
    r = text_ops.feature_hash_collisions(docs, bits=20).collect()[0]
    assert r["n_terms"] == 3
    assert r["collided_buckets"] == 0
    assert r["collided_mass_ppm"] == 0


def test_feature_hash_one_bit_forces_collisions(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h", "en", "s")], DOC_COLS
    )
    r = text_ops.feature_hash_collisions(docs, bits=1).collect()[0]
    # 8 terms into 2 buckets: at least one bucket must collide
    assert r["collided_buckets"] >= 1
    assert r["collided_terms"] >= 2


def test_mann_kendall_strict_increase(spark):
    # counts 1,2,3,4 strictly increasing: S = 6 pairs all +1
    rows = []
    eid = 0
    for d in range(4):
        for i in range(d + 1):
            eid += 1
            rows.append(_ev(eid, f"u{i}", d))
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.mann_kendall_trend(events).collect()[0]
    assert r["n_days"] == 4
    assert r["s_stat"] == 6
    # no ties: var = 4*3*13/18
    assert abs(r["var_s"] - 4 * 3 * 13 / 18.0) < 1e-5
    assert abs(r["z"] - 5 / math.sqrt(4 * 3 * 13 / 18.0)) < 1e-6


def test_mann_kendall_flat_is_zero(spark):
    rows = [_ev(d * 10 + i, f"u{i}", d) for d in range(4) for i in range(2)]
    events = spark.createDataFrame(rows, EV_COLS)
    r = analytics.mann_kendall_trend(events).collect()[0]
    assert r["s_stat"] == 0
    assert r["z"] == 0.0


def test_sparse_cosine_identical_docs_score_one(spark):
    docs = spark.createDataFrame(
        [(1, "x y z", "en", "s"), (2, "x y z", "en", "s"),
         (3, "p q r s t u", "en", "s")],
        DOC_COLS,
    )
    out = dedup.sparse_cosine_topk(docs, k=5, max_docs=10).collect()
    top = out[0]
    assert (top["id_a"], top["id_b"]) == (1, 2)
    assert top["cosine"] == 1.0
    # disjoint-vocab pairs produce no dot row at all
    assert all({r["id_a"], r["id_b"]} != {1, 3} for r in out)
