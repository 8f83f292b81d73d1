"""Wave-13 operators: greedy coverage selection, Cohen's kappa,
pseudonymization audit, k-anonymity audit. Oracle-checked by q180–q183."""

from pyspark.sql import functions as F

from esop_spark.operators import privacy, sampling
from esop_spark.operators import text as text_ops


# --- coverage_select -----------------------------------------------------------

def test_coverage_greedy_is_marginal_not_absolute(spark):
    # doc 1 covers shingles A,B; doc 2 covers A,B,C (superset); doc 3
    # covers D,E. Greedy: pick 2 (gain 3), then 3 (gain 2), then 1 (gain 0
    # -> stops).
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # shingles: "a b c", "b c d"
            (2, "a b c d e"),        # adds "c d e" -> superset of doc 1
            (3, "x y z w v"),        # disjoint: 3 shingles
        ],
        ["doc_id", "text"],
    )
    out = sorted(
        sampling.coverage_select(docs, k=3).collect(), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in out] == [2, 3]  # doc 1 adds nothing -> stop
    assert out[0]["gain"] == 3
    assert out[1]["gain"] == 3
    assert out[1]["covered_total"] == 6


def test_coverage_tiebreak_lowest_id(spark):
    docs = spark.createDataFrame(
        [(5, "a b c"), (2, "x y z")], ["doc_id", "text"]
    )
    out = sorted(
        sampling.coverage_select(docs, k=1).collect(), key=lambda r: r["rank"]
    )
    assert out[0]["doc_id"] == 2  # equal gain 1 -> lower id wins


def test_coverage_lazy_greedy_prunes_full_passes(spark):
    # Four mutually-disjoint docs with strictly decreasing shingle counts:
    # cached bounds stay exact across steps, so after the single up-front
    # gains aggregation each later step needs only one single-doc recompute
    # (which immediately beats the runner-up bound) — never another full
    # corpus pass. This is the lazy-greedy (Minoux) contract.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),    # 4 shingles
            (2, "p q r s t"),      # 3 shingles
            (3, "x y z w"),        # 2 shingles
            (4, "m n o"),          # 1 shingle
        ],
        ["doc_id", "text"],
    )
    stats: dict = {}
    out = sorted(
        sampling.coverage_select(docs, k=3, stats=stats).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    assert [r["gain"] for r in out] == [4, 3, 2]
    assert stats["full_gain_passes"] == 1  # < k: lazy evaluation pruned
    assert stats["single_doc_recomputes"] == 2  # one per later step


def test_coverage_lazy_stale_bound_requeues(spark):
    # doc 2 overlaps doc 1 heavily: after picking doc 1, doc 2's cached
    # bound (3) is stale (true gain 1), so the lazy loop must demote it and
    # pick doc 3 (true gain 2) — same answer eager greedy gives.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),    # shingles: abc bcd cde def (4)
            (2, "a b c d e"),      # abc bcd cde (3) -> all but none new... overlaps
            (3, "x y z w"),        # xyz yzw (2) disjoint
        ],
        ["doc_id", "text"],
    )
    stats: dict = {}
    out = sorted(
        sampling.coverage_select(docs, k=2, stats=stats).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in out] == [1, 3]
    assert [r["gain"] for r in out] == [4, 2]
    assert stats["full_gain_passes"] == 1
    # step 2: recompute doc 2 (stale, demoted to 0), then doc 3 confirmed
    assert stats["single_doc_recomputes"] == 2


# --- cohen_kappa ----------------------------------------------------------------

def test_kappa_perfect_agreement(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "the a of and is"),
            (2, "de", "und der die das nicht"),
            (3, "fr", "le la et les une"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = text_ops.cohen_kappa(docs).collect()[0]
    assert out["n_agree"] == 3
    assert out["agreement_ppm"] == 1_000_000
    assert out["kappa_ppm"] == 1_000_000


def test_kappa_zero_for_constant_prediction(spark):
    # predictor always says 'en'; gold is 50/50 en/de -> kappa == 0
    rows = [(i, "en" if i % 2 else "de", "the a of") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = text_ops.cohen_kappa(docs).collect()[0]
    assert out["agreement_ppm"] == 500_000
    assert out["kappa_ppm"] == 0


# --- pseudonymize / audit --------------------------------------------------------

def test_pseudonymize_is_deterministic_and_salted(spark):
    df = spark.createDataFrame([(1,), (2,)], ["uid"])
    a = {r["uid"]: r["uid_pseudo"] for r in privacy.pseudonymize(df, "uid").collect()}
    b = {r["uid"]: r["uid_pseudo"] for r in privacy.pseudonymize(df, "uid").collect()}
    c = {r["uid"]: r["uid_pseudo"] for r in privacy.pseudonymize(df, "uid", salt="s2").collect()}
    assert a == b
    assert a[1] != c[1]  # different salt -> unlinkable


def test_pseudonymize_audit_no_collisions(spark):
    df = spark.createDataFrame([(i,) for i in range(100)] * 2, ["uid"])
    out = privacy.pseudonymize_audit(df, "uid").collect()[0]
    assert out["n_rows"] == 200
    assert out["n_pseudonyms"] == 100
    assert out["n_keys"] == 100
    assert out["n_collisions"] == 0


# --- k_anonymity_audit ------------------------------------------------------------

def test_k_anonymity_buckets(spark):
    rows = (
        [("a", "x")] * 1       # singleton -> bucket "1"
        + [("b", "x")] * 3     # 2-4
        + [("c", "x")] * 7     # 5-9
        + [("d", "x")] * 20    # 10+
    )
    df = spark.createDataFrame(rows, ["q1", "q2"])
    out = {r["bucket"]: r for r in privacy.k_anonymity_audit(df, ["q1", "q2"], k=5).collect()}
    assert out["1"]["n_groups"] == 1 and out["1"]["n_rows"] == 1
    assert out["2-4"]["n_rows"] == 3
    assert out["5-9"]["n_rows"] == 7
    assert out["10+"]["n_rows"] == 20
    assert out["10+"]["rows_ppm"] == 20 * 1_000_000 // 31
    assert out["1"]["min_group"] == 1
