"""Wave-8 operators: Kneser-Ney bigram LM, cross-source quantile
normalization, retrieval metrics. Oracle-checked by q151–q153."""

import math

from pyspark.sql import functions as F

from esop_spark.operators import similarity
from esop_spark.operators import text as text_ops


# --- kn_bigram_logprob ------------------------------------------------------

def test_kn_repetitive_doc_scores_lower_nll(spark):
    rows = [(0, "x y x y x y x y x y")] + [
        (1 + i, f"a{i} b{i} c{i} d{i} e{i} f{i} g{i}") for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text_ops.kn_bigram_logprob(docs).collect()}
    # 'x y' repeats 5x and 'y x' 4x -> high bigram probability -> low NLL;
    # the singleton-bigram docs sit near ln(nbig) ≈ uniform surprise
    assert out[0]["mean_nll"] < out[1]["mean_nll"]
    assert out[0]["n_bigrams"] == 9


def test_kn_probabilities_sum_to_one_per_context(spark):
    # KN is a proper conditional distribution: for a context w1 whose
    # continuations are all observed, sum_w2 P(w2|w1) == 1 when every w2
    # type is a continuation of w1 (single-context corpus)
    rows = [(0, "s a s b s a s c")]  # contexts: s->a,b,c ; a->s ; b->s ; c(end)
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text_ops.kn_bigram_logprob(docs).collect()[0]
    assert out["n_bigrams"] == 7
    assert out["mean_nll"] > 0


def test_kn_short_docs_drop(spark):
    docs = spark.createDataFrame(
        [(0, "one"), (1, "two words here")], ["doc_id", "text"]
    )
    out = text_ops.kn_bigram_logprob(docs).collect()
    assert {r["doc_id"] for r in out} == {1}


# --- quantile_normalize_scores ----------------------------------------------

def test_quantile_normalize_same_score_different_sources(spark):
    # source A: scores cluster low; source B: scores cluster high. The
    # shared mid score is a HIGH quantile in A and a LOW quantile in B.
    lo = [(i, "the the the a a the the a the a", "en", "A") for i in range(20)]
    hi = [(100 + i, f"q{i} w{i} e{i} r{i} t{i} y{i} u{i} i{i}", "en", "B")
          for i in range(20)]
    mid = [(200, "the a alpha beta gamma delta epsilon zeta", "en", "A"),
           (201, "the a alpha beta gamma delta epsilon zeta", "en", "B")]
    docs = spark.createDataFrame(lo + hi + mid,
                                 ["doc_id", "text", "lang", "source"])
    out = text_ops.quantile_normalize_scores(docs).collect()
    mid_rows = {r["source"]: r for r in out if r["n_docs"] == 1}
    assert mid_rows["A"]["src_quantile_ppm"] > 900_000  # top of source A
    assert mid_rows["B"]["src_quantile_ppm"] < 100_000  # bottom of source B
    # same raw score -> same GLOBAL quantile regardless of source
    assert (mid_rows["A"]["global_quantile_ppm"]
            == mid_rows["B"]["global_quantile_ppm"])


def test_quantile_normalize_is_midrank(spark):
    docs = spark.createDataFrame(
        [(i, "u v w x y z alpha beta", "en", "S") for i in range(10)],
        ["doc_id", "text", "lang", "source"],
    )
    out = text_ops.quantile_normalize_scores(docs).collect()
    # all 10 docs share one score -> mid-rank quantile = 500000 exactly
    assert len(out) == 1
    assert out[0]["src_quantile_ppm"] == 500_000
    assert out[0]["global_quantile_ppm"] == 500_000


# --- retrieval_metrics ------------------------------------------------------

def _clustered_embeddings(spark, per=20, dim=8):
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(per):
        rows.append((i, [5.0 + rnd.random() * 0.01 for _ in range(dim)], 0))
        rows.append((100 + i, [-5.0 - rnd.random() * 0.01 for _ in range(dim)], 1))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_retrieval_metrics_perfect_on_separated_clusters(spark):
    emb = _clustered_embeddings(spark)
    out = similarity.retrieval_metrics(
        emb, k=5, sample_rate=0.5, max_queries=8
    ).collect()
    assert len(out) == 8
    for r in out:
        # same-cluster vectors are the nearest neighbors -> perfect metrics
        assert r["first_rel_rank"] == 1
        assert r["mrr"] == 1.0
        assert r["hits_at_k"] == 5
        assert abs(r["ndcg_at_k"] - 1.0) < 1e-9
        assert r["n_relevant"] == 19


def test_retrieval_metrics_gains_are_exact_literals(spark):
    gains = similarity._dcg_gains9(10)
    assert gains[0] == 1_000_000_000  # 1/log2(2) = 1
    for i, g in enumerate(gains, start=1):
        assert abs(g - 1e9 / math.log2(i + 1)) <= 0.5


def test_retrieval_metrics_ndcg_penalizes_late_hits(spark):
    # one query vector whose nearest neighbor is OPPOSITE-label: plant an
    # adversarial point closer than any same-label point
    rows = [(0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [0.99, 0.141, 0.0, 0.0], 1),   # cos ~0.99 to query
            (2, [0.9, 0.436, 0.0, 0.0], 0),    # cos ~0.9
            (3, [0.8, 0.6, 0.0, 0.0], 0)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.retrieval_metrics(
        emb, k=3, sample_rate=1.0, max_queries=None, seed="rm0"
    ).collect()
    r0 = [r for r in out if r["query_id"] == 0][0]
    assert r0["first_rel_rank"] == 2
    assert r0["mrr"] == 0.5
    assert 0 < r0["ndcg_at_k"] < 1.0
