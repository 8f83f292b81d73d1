"""Wave-6 operators: curriculum ordering, Naive Bayes classifier, cluster
topic labeling, token-budget water-filling, skew advisor, histogram
quantiles. Semantics are oracle-checked by q142–q147; these tests pin the
behavioral invariants a refactor could silently break (and exercise planted
signal the synthetic corpus lacks — e.g. NB on separable classes)."""

from pyspark.sql import functions as F

from esop_spark.operators import analytics, sampling, similarity, splits
from esop_spark.operators import text as text_ops


# --- curriculum_order -------------------------------------------------------

def _quality_docs(spark, n=80):
    # quality rises with doc_id: low ids are stopword-heavy and repetitive,
    # high ids are all-distinct tokens
    rows = []
    for i in range(n):
        if i < n // 2:
            rows.append((i, "the the the a a the a the a the", "en", "web"))
        else:
            rows.append((i, f"q{i} w{i} e{i} r{i} t{i} y{i} u{i} o{i}", "en", "web"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_curriculum_stages_order_by_quality(spark):
    docs = _quality_docs(spark)
    out = splits.curriculum_order(docs, stages=2).collect()
    by_id = {r["doc_id"]: r for r in out}
    # the low-quality half must occupy strictly lower stages than the
    # high-quality half (two distinct score values -> two stages)
    lo_stages = {by_id[i]["stage"] for i in range(40)}
    hi_stages = {by_id[i]["stage"] for i in range(40, 80)}
    assert max(lo_stages) < min(hi_stages)


def test_curriculum_positions_are_exact_ranks(spark):
    docs = _quality_docs(spark)
    out = splits.curriculum_order(docs, stages=2).collect()
    for stage in {r["stage"] for r in out}:
        pos = sorted(r["position"] for r in out if r["stage"] == stage)
        assert pos == list(range(1, len(pos) + 1))


def test_curriculum_order_partition_invariant(spark):
    docs = _quality_docs(spark)
    a = {(r["doc_id"], r["stage"], r["position"])
         for r in splits.curriculum_order(docs, stages=2).collect()}
    b = {(r["doc_id"], r["stage"], r["position"])
         for r in splits.curriculum_order(docs.repartition(7), stages=2).collect()}
    assert a == b


# --- nb_confusion -----------------------------------------------------------

def _separable_docs(spark, per_class=30):
    rows = []
    i = 0
    for lang, vocab in [("en", "cat dog bird"), ("fr", "chat chien oiseau")]:
        for _ in range(per_class):
            rows.append((i, f"{vocab} {vocab} filler{i % 3}", lang, "web"))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_nb_learns_separable_classes(spark):
    docs = _separable_docs(spark)
    out = text_ops.nb_confusion(docs).collect()
    n_total = sum(r["n_docs"] for r in out)
    n_correct = sum(r["n_docs"] for r in out if r["label_true"] == r["label_pred"])
    assert n_total > 0
    assert n_correct == n_total  # perfectly separable vocab -> no confusion


def test_nb_confusion_counts_cover_test_split(spark):
    docs = _separable_docs(spark)
    out = text_ops.nb_confusion(docs, train_ppm=500_000).collect()
    n_total = sum(r["n_docs"] for r in out)
    # every held-out doc appears exactly once in the confusion matrix
    from esop_spark.operators.dedup import md5_hash32

    test_docs = docs.filter(
        F.pmod(
            md5_hash32(F.concat(F.lit("nbsplit:"), F.col("doc_id").cast("string"))),
            F.lit(1_000_000),
        )
        >= 500_000
    ).count()
    assert n_total == test_docs


# --- cluster_topic_terms ----------------------------------------------------

def test_cluster_topics_label_planted_clusters(spark):
    # two well-separated embedding clusters with disjoint vocabulary
    import random

    rnd = random.Random(7)
    rows, docs = [], []
    for i in range(40):
        if i < 20:
            vec = [10.0 + rnd.random() * 0.1 for _ in range(8)]
            txt = "apple banana cherry apple banana"
        else:
            vec = [-10.0 - rnd.random() * 0.1 for _ in range(8)]
            txt = "xray yankee zulu xray yankee"
        rows.append((i, vec, 0))
        docs.append((i, txt, "en", "web"))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    d = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source"])
    out = similarity.cluster_topic_terms(
        d, emb, num_planes=4, top_buckets=2, k=2, dim=8
    ).collect()
    buckets = {}
    for r in out:
        buckets.setdefault(r["bucket"], set()).add(r["term"])
    assert len(buckets) == 2
    vocabs = sorted(frozenset(v) for v in buckets.values())
    assert any("apple" in v or "banana" in v for v in vocabs)
    assert any("xray" in v or "yankee" in v for v in vocabs)
    # clusters must not share topic terms (disjoint vocabulary)
    a, b = list(buckets.values())
    assert not (a & b)


def test_cluster_topics_rank_within_k(spark):
    rows = [(i, [float(i % 3), 1.0, 0.0, 0.0], 0) for i in range(30)]
    docs = [(i, f"tok{i % 5} tok{i % 7} common", "en", "web") for i in range(30)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    d = spark.createDataFrame(docs, ["doc_id", "text", "lang", "source"])
    out = similarity.cluster_topic_terms(
        d, emb, num_planes=3, top_buckets=4, k=3, dim=4
    ).collect()
    assert all(1 <= r["rank"] <= 3 for r in out)
    assert all(r["n_members"] >= 1 for r in out)


# --- token_budget_waterfill -------------------------------------------------

def _sourced_docs(spark):
    rows = []
    i = 0
    for src, n_docs, n_tok in [("tiny", 2, 5), ("mid", 10, 10), ("big", 40, 10)]:
        for _ in range(n_docs):
            rows.append((i, " ".join(f"w{j}" for j in range(n_tok)), "en", src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_waterfill_saturates_small_caps_and_respects_budget(spark):
    docs = _sourced_docs(spark)
    # budget = 50% of 510 tokens = 255; uniform weights -> fair share 85
    # per source; 'tiny' (cap 10) saturates, the surplus lifts the water
    # level to 122 which saturates 'mid' (cap 100) too; 'big' takes the rest
    out = sampling.token_budget_waterfill(docs, budget_num=1, budget_den=2).collect()
    by = {r["stratum"]: r for r in out}
    assert by["tiny"]["saturated"] and by["tiny"]["allocated_tokens"] == 10
    assert by["mid"]["saturated"] and by["mid"]["allocated_tokens"] == 100
    assert not by["big"]["saturated"]
    assert by["big"]["allocated_tokens"] == 255 - 10 - 100
    assert sum(r["allocated_tokens"] for r in out) == 510 // 2


def test_waterfill_never_exceeds_capacity(spark):
    docs = _sourced_docs(spark)
    out = sampling.token_budget_waterfill(
        docs, budget_num=9, budget_den=10,
        weights_ppm={"tiny": 8_000_000},
    ).collect()
    for r in out:
        assert 0 <= r["allocated_tokens"] <= r["cap_tokens"]


def test_waterfill_full_budget_saturates_everything(spark):
    docs = _sourced_docs(spark)
    out = sampling.token_budget_waterfill(docs, budget_num=1, budget_den=1).collect()
    assert all(r["saturated"] for r in out)
    assert sum(r["allocated_tokens"] for r in out) == 510


# --- hot_keys ---------------------------------------------------------------

def test_hot_keys_flags_skew(spark):
    rows = [(i, "hot") for i in range(90)] + [(90 + i, f"cold{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["row_id", "k"])
    out = analytics.hot_keys(df, "k", top_k=3).collect()
    assert out[0]["key"] == "hot"
    assert out[0]["n_rows"] == 90
    assert out[0]["share_ppm"] == 900_000
    # 11 distinct keys, mean key holds 100/11 rows; hot is 90/(100/11) = 9.9x
    assert abs(out[0]["skew_x"] - 90 * 11 / 100) < 1e-6
    assert len(out) == 3


def test_hot_keys_deterministic_tiebreak(spark):
    rows = [(i, f"k{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, ["row_id", "k"])
    out = analytics.hot_keys(df, "k", top_k=5).collect()
    assert [r["key"] for r in out] == ["k0", "k1", "k2", "k3", "k4"]


# --- histogram_quantiles ----------------------------------------------------

def test_histogram_quantiles_error_bound(spark):
    vals = [(i, i) for i in range(1, 1001)]  # uniform 1..1000
    df = spark.createDataFrame(vals, ["row_id", "v"])
    out = analytics.histogram_quantiles(
        df, F.col("v"), bins=100,
        quantiles_ppm=(500_000, 900_000, 990_000),
    ).collect()
    exact = {500_000: 500, 900_000: 900, 990_000: 990}
    for r in out:
        assert abs(r["approx_value"] - exact[r["q_ppm"]]) <= r["error_bound"]
        assert r["n_rows"] == 1000


def test_histogram_quantiles_exact_when_bins_cover_domain(spark):
    # domain width < bins -> width 1 -> the approximation IS exact
    vals = [(i, 10 + (i % 50)) for i in range(500)]
    df = spark.createDataFrame(vals, ["row_id", "v"])
    out = analytics.histogram_quantiles(
        df, F.col("v"), bins=128, quantiles_ppm=(500_000,)
    ).collect()
    assert out[0]["error_bound"] == 1
    # exact p50 of 10..59 uniform = 10 + 24 = 34 (ceil(0.5*500)=250th of
    # sorted 500 values, 10 repeats each -> value 10 + (250-1)//10 = 34)
    assert out[0]["approx_value"] == 34


def test_histogram_quantiles_merge_equals_rescan(spark):
    # histogram counts are mergeable: binning halves with the same min/max
    # contract and summing bin counts gives the same quantiles. Simulated
    # by checking partition-layout invariance of the one-shot plan.
    vals = [(i, (i * 37) % 997) for i in range(2000)]
    df = spark.createDataFrame(vals, ["row_id", "v"])
    a = sorted(map(tuple, analytics.histogram_quantiles(df, F.col("v")).collect()))
    b = sorted(map(tuple, analytics.histogram_quantiles(
        df.repartition(13), F.col("v")).collect()))
    assert a == b
