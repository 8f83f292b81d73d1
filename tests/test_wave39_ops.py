"""Wave-39 operators: readability profile, PIT feature snapshot, linear
attribution, linear MMD, and the composed curation funnel. Oracle-checked
by q296-q300; these tests pin the non-oracle invariants (readability
ordering, leakage-freedom, credit conservation, separation geometry, and
funnel monotonicity)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from esop_spark.operators import analytics, similarity
from esop_spark.operators import text as text_ops


def _ts(epoch_s):
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_chars long, lang string, text string"
    )


# --- readability -----------------------------------------------------------------

def test_readability_orders_simple_before_dense(spark):
    simple = "the cat sat. the dog ran. a boy ate. " * 5
    dense = "epistemological heterogeneity notwithstanding onomatopoeia " * 10
    rows = [("s1", "easy", 0, "en", simple), ("d1", "dense", 0, "en", dense)]
    out = {r["source"]: r for r in
           text_ops.readability_profile(_docs(spark, rows)).collect()}
    assert out["easy"]["mean_flesch"] > out["dense"]["mean_flesch"]
    assert out["easy"]["n_docs"] == 1


def _flesch_milli_exact(w, s, syl):
    """Round-half-away-from-zero of the exact rational milli score —
    the reference the integer-exact operator must reproduce bit-for-bit."""
    p = 206835 * s * w - 1015 * w * w - 84600 * syl * s
    q = s * w
    if p >= 0:
        return (2 * p + q) // (2 * q)
    return -((2 * (-p) + q) // (2 * q))


def _doc_text(w, s, syl):
    """Text with exactly w space-split tokens, s sentence-mark runs and
    syl vowel-group runs: 'ba' words carry one vowel run each, 'bcd'
    words none, and s of the words end in '.'."""
    assert syl <= w and s <= w
    words = ["ba"] * syl + ["bcd"] * (w - syl)
    for i in range(s):
        words[i] = words[i] + "."
    return " ".join(words)


def test_readability_milli_score_is_integer_exact(spark):
    """The per-doc fm must equal round-half-away(p/q) computed in exact
    integer arithmetic — including a doc constructed to land EXACTLY on
    a .5 milli boundary, where the former float form was one double
    rounding error away from flipping (the round-11 sf0.001 oracle
    divergence)."""
    shapes = [(7, 2, 3), (25, 5, 11), (40, 1, 40), (3, 3, 1)]
    # brute-force a shape whose exact milli score is k + 1/2
    boundary = None
    for w in range(2, 60):
        for s in range(1, w + 1):
            for syl in range(1, w + 1):
                p = 206835 * s * w - 1015 * w * w - 84600 * syl * s
                q = s * w
                if (2 * p) % (2 * q) == q:  # p/q == k + 0.5 exactly
                    boundary = (w, s, syl)
                    break
            if boundary:
                break
        if boundary:
            break
    assert boundary is not None
    shapes.append(boundary)
    rows = [
        (f"d{i}", f"src{i}", 0, "en", _doc_text(w, s, syl))
        for i, (w, s, syl) in enumerate(shapes)
    ]
    out = {r["source"]: r for r in
           text_ops.readability_profile(_docs(spark, rows)).collect()}
    for i, (w, s, syl) in enumerate(shapes):
        fm = _flesch_milli_exact(w, s, syl)
        # n_docs == 1 per source, so mean_flesch == round(fm/1000, 6)
        assert out[f"src{i}"]["mean_flesch"] == round(fm / 1000.0, 6), (
            (w, s, syl), fm, out[f"src{i}"]["mean_flesch"]
        )


# --- PIT features -----------------------------------------------------------------

def test_pit_no_leakage_from_label_window(spark):
    # user 1 active only BEFORE cutoff; user 2 active only AFTER.
    # user 2 must NOT appear (no pre-cutoff features — the leakage guard),
    # user 1 must carry label 0.
    rows = [(_ts(0), 1), (_ts(86400), 1), (_ts(86400 * 11), 2)]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id bigint")
    out = analytics.pit_feature_snapshot(ev, cutoff_day=10, label_days=7).collect()
    assert len(out) == 1
    r = out[0]
    assert r["is_active_label"] == 0 and r["n_users"] == 1
    assert r["mean_recency_days"] == 9.0  # cutoff 10 − last day 1


def test_pit_label_window_bounded(spark):
    # activity AFTER the label window does not set the label
    rows = [(_ts(0), 1), (_ts(86400 * 30), 1)]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id bigint")
    r = analytics.pit_feature_snapshot(ev, cutoff_day=10, label_days=7).collect()[0]
    assert r["is_active_label"] == 0


# --- linear attribution ------------------------------------------------------------

def test_linear_attribution_splits_credit(spark):
    # one user: view, click, purchase → each touch gets 0.5
    rows = [
        (1, _ts(100), 10, "view"),
        (1, _ts(200), 11, "click"),
        (1, _ts(300), 12, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    out = {r["channel"]: r for r in
           analytics.linear_attribution(ev).collect()}
    assert abs(out["view"]["credit"] - 0.5) < 1e-9
    assert abs(out["click"]["credit"] - 0.5) < 1e-9


def test_linear_attribution_credit_conserved_and_none(spark):
    rows = [
        (1, _ts(100), 1, "view"),
        (1, _ts(300), 2, "purchase"),
        (2, _ts(50), 3, "purchase"),   # no preceding touch → 'none'
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )
    out = {r["channel"]: r for r in
           analytics.linear_attribution(ev).collect()}
    total_credit = sum(r["credit"] for r in out.values())
    assert abs(total_credit - 2.0) < 1e-9  # one unit per conversion
    assert out["none"]["n_conversions"] == 1


# --- linear MMD -------------------------------------------------------------------

def test_linear_mmd_separated_vs_identical(spark):
    rows = (
        [(i, [0.0, 0.0], 0) for i in range(10)]
        + [(i + 10, [3.0, 4.0], 1) for i in range(10)]
        + [(i + 20, [0.0, 0.0], 2) for i in range(10)]
    )
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = {(r["label_a"], r["label_b"]): r for r in
           similarity.linear_mmd(emb).collect()}
    assert abs(out[(0, 1)]["mmd2"] - 25.0) < 1e-6  # 3² + 4²
    assert out[(0, 2)]["mmd2"] == 0.0
    assert out[(0, 1)]["n_a"] == 10


# --- curation funnel ---------------------------------------------------------------

def test_curation_funnel_monotone(spark):
    good = " ".join(["the quick brown fox jumps over a lazy dog now"] * 5)
    rows = (
        [(f"g{i}", "s", 0, "en", good + f" tail{i}") for i in range(8)]
        + [(f"dup{i}", "s", 0, "en", good + " tail0") for i in range(4)]
        + [("short", "s", 0, "en", "too short")]
    )
    out = {r["stage"]: r for r in
           text_ops.curation_pipeline_funnel(
               _docs(spark, rows), sample_ppm=1_000_000,
               shard_budget_tokens=100,
           ).collect()}
    assert out["raw"]["n_docs"] == 13
    assert out["gopher"]["n_docs"] == 12          # 'short' fails
    # dup docs share g0's tokenset (same words) → collapse to 8 keepers
    assert out["dedup"]["n_docs"] == 8
    assert out["sample"]["n_docs"] == 8           # ppm = 100%
    assert (out["raw"]["n_tokens"] >= out["gopher"]["n_tokens"]
            >= out["dedup"]["n_tokens"] >= out["sample"]["n_tokens"])
    assert out["sample"]["n_shards"] >= 1
