"""Wave-5 operators: split leakage audit, hybrid RRF retrieval, mixture
annealing schedule, kNN label audit. Semantics are oracle-checked by
q124–q127; these tests pin the invariants a refactor could silently break."""

import math

from pyspark.sql import functions as F

from esop_spark.operators import retrieval, sampling, similarity, splits


def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
        (2, "one two three four five six seven eight nine", "en", "book"),
        (3, "uno dos tres cuatro cinco seis siete ocho nueve", "es", "web"),
        (4, "aaa bbb ccc ddd eee fff ggg hhh iii jjj kkk", "es", "web"),
        (5, "pqr stu vwx yza bcd efg hij klm nop qrs tuv", "de", "web"),
    ] + [
        (i, f"w{i} x{i} y{i} z{i} k{i} l{i} m{i} n{i}", "en", "web")
        for i in range(6, 40)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def _embeddings(spark, n=40, dim=8):
    rows = [
        (i, [float((i * 7 + j * 3) % 5 + 1) for j in range(dim)], i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


# --- split_leakage ----------------------------------------------------------

def test_split_leakage_detects_cross_split_duplicate(spark):
    # docs 0 and 1 are identical; force them into opposite splits by
    # picking fractions until they separate is flaky — instead use a split
    # where train gets ~everything so any test doc built from train text
    # leaks fully.
    docs = _docs(spark)
    out = splits.split_leakage(
        docs, {"train": 0.9, "test": 0.1}, n=3, test_label="test"
    ).collect()
    for r in out:
        assert 0 <= r["n_leaked_docs"] <= r["n_test_docs"]
        assert 0 <= r["n_leaked_shingles"] <= r["n_test_shingles"]
        assert abs(r["doc_leak_frac"] - r["n_leaked_docs"] / r["n_test_docs"]) < 1e-6


def test_split_leakage_partition_invariant(spark):
    docs = _docs(spark)
    a = sorted(
        splits.split_leakage(docs, {"train": 0.7, "test": 0.3}, n=3).collect()
    )
    b = sorted(
        splits.split_leakage(
            docs.repartition(7, "lang"), {"train": 0.7, "test": 0.3}, n=3
        ).collect()
    )
    assert a == b


# --- hybrid_retrieval -------------------------------------------------------

def test_hybrid_retrieval_rrf_math_and_shape(spark):
    docs = _docs(spark)
    emb = _embeddings(spark)
    out = retrieval.hybrid_retrieval(docs, emb, [0, 2], k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["query_id"] != r["doc_id"], "self-match must be excluded"
        expect = 0.0
        if r["bm25_rank"] is not None:
            expect += 1.0 / (60 + r["bm25_rank"])
        if r["cos_rank"] is not None:
            expect += 1.0 / (60 + r["cos_rank"])
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9
    for qid, rows in by_q.items():
        ranks = sorted(r["fused_rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        # fused order must follow rrf desc
        srt = sorted(rows, key=lambda r: (-r["rrf_score"], r["doc_id"]))
        assert [r["fused_rank"] for r in srt] == sorted(r["fused_rank"] for r in rows)


def test_hybrid_retrieval_doc0_top_hit_is_its_duplicate(spark):
    # doc 1 is an exact copy of doc 0's text: it must win the BM25 leg.
    docs = _docs(spark)
    emb = _embeddings(spark)
    out = retrieval.hybrid_retrieval(docs, emb, [0], k=5).collect()
    bm_best = min(
        (r for r in out if r["bm25_rank"] is not None), key=lambda r: r["bm25_rank"]
    )
    assert bm_best["doc_id"] == 1


# --- anneal_schedule --------------------------------------------------------

def test_anneal_schedule_interpolates_natural_to_flat(spark):
    docs = _docs(spark)
    out = sampling.anneal_schedule(docs, phases=4, phase_budget_tokens=10_000).collect()
    by_phase = {}
    for r in out:
        by_phase.setdefault(r["phase"], {})[r["stratum"]] = r
    assert set(by_phase) == {1, 2, 3, 4}
    for phase, rows in by_phase.items():
        s = sum(r["weight"] for r in rows.values())
        assert abs(s - 1.0) < 1e-4, f"phase {phase} weights must normalize"
        assert sum(r["expected_tokens"] for r in rows.values()) <= 10_000
    # phase 1 = natural share
    for r in by_phase[1].values():
        assert abs(r["weight"] - r["natural_share"]) < 2e-6
    # later phases flatten: max-share stratum loses weight monotonically
    big = max(by_phase[1].values(), key=lambda r: r["natural_share"])["stratum"]
    w = [by_phase[p][big]["weight"] for p in (1, 2, 3, 4)]
    assert w[0] > w[1] > w[2] > w[3]
    # alpha grid is dyadic
    alphas = {p: by_phase[p][big]["alpha"] for p in (1, 2, 3, 4)}
    assert alphas == {1: 1.0, 2: 0.75, 3: 0.5, 4: 0.25}


def test_anneal_phase4_matches_quarter_power(spark):
    docs = _docs(spark)
    out = sampling.anneal_schedule(docs, phases=4).collect()
    p4 = [r for r in out if r["phase"] == 4]
    raw = {r["stratum"]: r["natural_share"] ** 0.25 for r in p4}
    tot = sum(raw.values())
    for r in p4:
        assert math.isclose(r["weight"], raw[r["stratum"]] / tot, rel_tol=1e-4)


# --- knn_label_audit --------------------------------------------------------

def test_knn_label_audit_perfectly_separated_labels_agree(spark):
    # Two far-apart clusters: label 0 near the origin axis, label 1 scaled
    # opposite direction — every kNN vote agrees with the own label.
    rows = [(i, [1.0 + 0.001 * i, 0.0, 0.0, 0.0], 0) for i in range(20)] + [
        (i, [0.0, 0.0, 0.001 * i, 5.0], 1) for i in range(20, 40)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = similarity.knn_label_audit(emb, k=3, sample_rate=0.5).collect()
    assert out, "sample must be non-empty"
    for r in out:
        assert r["n_agree"] == r["n_queries"]
        assert r["agree_rate"] == 1.0


def test_knn_label_audit_sample_bounds_queries(spark):
    emb = _embeddings(spark, n=40)
    out = similarity.knn_label_audit(emb, k=5, sample_rate=0.25).collect()
    n_queries = sum(r["n_queries"] for r in out)
    assert 1 <= n_queries < 40  # strict subset: the audit is sampled


# --- vocab_coverage ---------------------------------------------------------

def test_vocab_coverage_monotone_and_exact(spark):
    from esop_spark.operators import text as text_ops

    rows = [(0, "a a a a b b c d"), (1, "a b c e")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["cutoff"]: r
        for r in text_ops.vocab_coverage(docs, cutoffs=(1, 2, 5)).collect()
    }
    # counts: a=5, b=3, c=2, d=1, e=1  (total 12)
    assert out[1]["covered_tokens"] == 5
    assert out[2]["covered_tokens"] == 8
    assert out[5]["covered_tokens"] == 12
    assert out[5]["coverage"] == 1.0
    assert out[1]["coverage"] < out[2]["coverage"] < out[5]["coverage"]


# --- dedup_inflation --------------------------------------------------------

def test_dedup_inflation_counts_duplicates_within_slice(spark):
    from esop_spark.operators import dedup

    rows = [
        (0, "x y z", "web"),
        (1, "x y z", "web"),
        (2, "x y z", "web"),
        (3, "p q", "web"),
        (4, "x y z", "book"),  # same text, other slice: not inflated there
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["slice"]: r for r in dedup.dedup_inflation(docs).collect()}
    web = out["web"]
    assert web["n_docs"] == 4 and web["n_unique_docs"] == 2
    assert web["total_tokens"] == 11 and web["unique_tokens"] == 5
    assert web["doc_inflation"] == 2.0
    assert abs(web["token_inflation"] - 2.2) < 1e-6
    book = out["book"]
    assert book["n_docs"] == 1 and book["doc_inflation"] == 1.0


# --- filter_funnel ----------------------------------------------------------

def test_filter_funnel_first_fail_attribution(spark):
    from esop_spark.operators import text as text_ops

    long_doc = " ".join(["the", "a"] * 20)  # 40 words, passes everything
    rows = [
        (0, "tiny doc"),          # too_short (stage 1)
        (1, " ".join(["#"] * 40)),  # 40 words but all symbols → word_len? '#' len 1 <2.0 → stage 3 wins before symbol
        (2, long_doc),            # pass
        (3, long_doc),            # pass
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["rule"]: r for r in text_ops.filter_funnel(docs).collect()}
    assert set(out) == {"too_short", "too_long", "word_len", "symbol", "stopword"}
    assert out["too_short"]["n_killed"] == 1
    assert out["word_len"]["n_killed"] == 1  # first-fail: word_len outranks symbol
    assert out["symbol"]["n_killed"] == 0
    assert out["stopword"]["n_remaining"] == 2  # survivors after the last stage
    # waterfall is monotone non-increasing
    rem = [out[r]["n_remaining"] for r in
           ("too_short", "too_long", "word_len", "symbol", "stopword")]
    assert rem == sorted(rem, reverse=True)


# --- subsample_ci -----------------------------------------------------------

def test_subsample_ci_brackets_the_mean(spark):
    from esop_spark.operators import sampling

    rows = [(i, " ".join(["w"] * (10 + i % 7)), "en") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = sampling.subsample_ci(docs, replicates=16, rate=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_replicates"] == 16
    assert r["ci_lo"] <= r["mean_score"] <= r["ci_hi"]
    assert r["ci_hi"] - r["ci_lo"] < 2.0  # half-samples of 200 docs: tight


def test_subsample_ci_deterministic_across_partitioning(spark):
    from esop_spark.operators import sampling

    rows = [(i, " ".join(["w"] * (5 + i % 13)), ["en", "fr"][i % 2]) for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    a = sorted(sampling.subsample_ci(docs, replicates=8).collect())
    b = sorted(sampling.subsample_ci(docs.repartition(9), replicates=8).collect())
    assert a == b


# --- dau_wau_stickiness -----------------------------------------------------

def test_dau_wau_trailing_window(spark):
    import datetime as dt
    from esop_spark.operators import analytics

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1 active day 0 only; user 2 active days 0 and 6
    rows.append((1, base, "a", 0.0, "{}"))
    rows.append((2, base, "a", 0.0, "{}"))
    rows.append((2, base + dt.timedelta(days=6), "a", 0.0, "{}"))
    ev = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type", "value", "props"],
    )
    out = {r["day"]: r for r in analytics.dau_wau_stickiness(ev).collect()}
    days = sorted(out)
    d0, d6 = days[0], days[-1]
    assert d6 == d0 + 6
    assert out[d0]["dau"] == 2 and out[d0]["wau"] == 2
    # on day 6: only user 2 active that day, but both users still inside
    # the trailing 7-day window (user 1's day-0 activity covers d0..d6)
    assert out[d6]["dau"] == 1 and out[d6]["wau"] == 2
    assert abs(out[d6]["stickiness"] - 0.5) < 1e-9


# --- json_props_rollup ------------------------------------------------------

def test_json_props_rollup_extracts_and_counts_missing(spark):
    import datetime as dt
    from esop_spark.operators import analytics

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, 1, base, "click", 0.0, '{"k": 10}'),
        (1, 1, base, "click", 0.0, '{"k": 20}'),
        (2, 1, base, "view", 0.0, '{"other": 5}'),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    out = {r["event_type"]: r for r in analytics.json_props_rollup(ev).collect()}
    assert out["click"]["n_events"] == 2 and out["click"]["n_missing"] == 0
    assert out["click"]["sum_v"] == 30 and out["click"]["mean_v"] == 15.0
    assert out["view"]["n_missing"] == 1 and out["view"]["sum_v"] is None


# --- extremes_report --------------------------------------------------------

def test_extremes_report_picks_the_right_tails(spark):
    from esop_spark.operators import text as text_ops

    rows = [
        (0, " ".join(f"u{i}" for i in range(50))),   # longest, all distinct
        (1, "the the the the the"),                   # most repetitive + low quality
        (2, "a b c d"),
        (3, "p q r s t u v w"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text_ops.extremes_report(docs, k=2).collect()
    by_metric = {}
    for r in out:
        by_metric.setdefault(r["metric"], []).append(r)
    assert set(by_metric) == {"longest", "most_repetitive", "lowest_quality"}
    for name in by_metric:
        by_metric[name] = sorted(by_metric[name], key=lambda r: r["rank"])
        assert [r["rank"] for r in by_metric[name]] == [1, 2]
    assert by_metric["longest"][0]["doc_id"] == 0
    assert by_metric["longest"][0]["value"] == 50.0
    assert by_metric["most_repetitive"][0]["doc_id"] == 1
    assert abs(by_metric["most_repetitive"][0]["value"] - 0.8) < 1e-6
    assert by_metric["lowest_quality"][0]["doc_id"] == 1


# --- referential_integrity --------------------------------------------------

def test_referential_integrity_orphans_and_dups(spark):
    from esop_spark.operators import versioning

    left = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["doc_id"])
    right = spark.createDataFrame([(2,), (3,), (4,)], ["vec_id"])
    r = versioning.referential_integrity(left, right, "doc_id", "vec_id").collect()[0]
    assert r["n_left"] == 4 and r["n_right"] == 3
    assert r["n_left_orphan_keys"] == 1   # key 1
    assert r["n_right_orphan_keys"] == 1  # key 4
    assert r["n_left_dup_keys"] == 1      # key 2 twice
    assert r["n_right_dup_keys"] == 0


# --- minhash_calibration ----------------------------------------------------

def test_minhash_calibration_identical_docs_zero_error(spark):
    from esop_spark.operators import dedup

    # all docs identical: every pair has exact jaccard 1.0 and identical
    # signatures, so the estimator error must be exactly zero
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    r = dedup.minhash_calibration(docs, sample_rate=1.0, max_docs=None).collect()[0]
    assert r["n_pairs"] == 45
    assert r["mean_abs_err"] == 0.0 and r["max_abs_err"] == 0.0
    assert r["mean_exact"] == 1.0 and r["mean_est"] == 1.0


def test_minhash_calibration_error_bounded(spark):
    from esop_spark.operators import dedup

    rows = [
        (i, " ".join(f"w{(i * 3 + j) % 25}" for j in range(18))) for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    r = dedup.minhash_calibration(docs, sample_rate=1.0, max_docs=None).collect()[0]
    assert r["n_pairs"] > 0
    # 32 hashes: estimator std ~ sqrt(j(1-j)/32) <= 0.09; mean abs err well under
    assert 0 <= r["mean_abs_err"] < 0.15
    assert r["max_abs_err"] <= 0.5


# --- temporal_split / group_split -------------------------------------------

def test_temporal_split_embargo_discards_boundary(spark):
    import datetime as dt
    from esop_spark.operators import splits

    base = dt.datetime(2024, 1, 1)
    cutoff_ms = int((base + dt.timedelta(days=10)).timestamp() * 1000)
    rows = [
        (i, base + dt.timedelta(days=d), "a", 0.0, "{}", 1)
        for i, d in enumerate([0, 5, 10, 11, 13, 20])
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value", "props", "user_id"]
    )
    out = splits.temporal_split(ev, cutoff_ms, embargo_ms=3 * 86400000)
    got = {(r["split"]): r["n_events"] for r in out.collect()}
    assert got == {"train": 2, "embargo": 2, "test": 2}
    # ranges must not overlap across splits
    rngs = {r["split"]: (r["min_ms"], r["max_ms"]) for r in out.collect()}
    assert rngs["train"][1] < cutoff_ms <= rngs["embargo"][0]
    assert rngs["embargo"][1] < rngs["test"][0]


def test_group_split_each_user_in_one_split(spark):
    import datetime as dt
    from pyspark.sql import functions as F
    from esop_spark.operators import splits

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, "a", 0.0, "{}", i % 17) for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value", "props", "user_id"]
    )
    rep = splits.group_split_report(ev, {"train": 0.6, "test": 0.4})
    rows_ = rep.collect()
    assert sum(r["n_groups"] for r in rows_) == 17  # users partitioned, none split
    assert sum(r["n_rows"] for r in rows_) == 200
    # direct check: per-user distinct split count is 1
    assigned = ev.select(
        F.col("user_id"),
        splits.assign_split(F.col("user_id"), {"train": 0.6, "test": 0.4}, "grp0").alias("s"),
    )
    per_user = assigned.groupBy("user_id").agg(F.count_distinct("s").alias("ns"))
    assert per_user.filter(F.col("ns") > 1).count() == 0


# --- uncertainty_sample -----------------------------------------------------

def test_uncertainty_sample_picks_boundary_docs(spark):
    from esop_spark.operators import sampling

    # quality = round((0.5*(1-stop_ratio) + 0.5*ttr)*100); craft docs with
    # distinct scores around 50 by varying the stopword/distinct mix
    rows = [
        (1, "the the the the", "en"),            # low score
        (2, "a b c d e f g h", "en"),            # high (all distinct, no stop... 'a' is stop)
        (3, "the a the a w1 w2 w3 w4", "en"),    # middling
        (4, "w w w w w w w w", "en"),            # ttr low, no stopwords
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = sampling.uncertainty_sample(docs, threshold=50, k=2).collect()
    assert len(out) == 2
    ranks = sorted(r["rank"] for r in out)
    assert ranks == [1, 2]
    # verify selection = the 2 docs with smallest |q-50| (string-id tiebreak)
    allq = sampling.uncertainty_sample(docs, threshold=50, k=4).collect()
    dists = sorted(r["dist"] for r in allq)
    chosen = sorted(r["dist"] for r in out)
    assert chosen == dists[:2]


def test_uncertainty_sample_exact_k_per_stratum(spark):
    from esop_spark.operators import sampling

    rows = [
        (i, " ".join(f"w{j % (2 + i % 7)}" for j in range(10)), ["en", "fr"][i % 2])
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = sampling.uncertainty_sample(docs, threshold=50, k=3).collect()
    per = {}
    for r in out:
        per.setdefault(r["stratum"], []).append(r)
    assert set(per) == {"en", "fr"}
    for rows_ in per.values():
        assert len(rows_) == 3


# --- embed_documents --------------------------------------------------------

def test_embed_documents_deterministic_and_ann_compatible(spark):
    from esop_spark.operators import similarity

    rows = [(i, f"doc number {i} body text {i % 5}") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    emb = similarity.embed_documents(docs, dim=8)
    a = {r["doc_id"]: (tuple(r["embedding"]), r["norm"]) for r in emb.collect()}
    b = {
        r["doc_id"]: (tuple(r["embedding"]), r["norm"])
        for r in similarity.embed_documents(docs.repartition(7), dim=8).collect()
    }
    assert a == b, "embedding must be a pure function of content"
    assert all(len(v[0]) == 8 for v in a.values())
    assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v[0])
    # same text => same vector
    dup = spark.createDataFrame(
        [(100, "same words"), (200, "same words")], ["doc_id", "text"]
    )
    d = {r["doc_id"]: tuple(r["embedding"]) for r in
         similarity.embed_documents(dup, dim=8).collect()}
    assert d[100] == d[200]
    # feeds the ANN surface unchanged
    topk = similarity.ann_topk(
        emb.withColumnRenamed("doc_id", "vec_id"), query_ids=[0, 1], k=3
    ).collect()
    assert {r["query_id"] for r in topk} == {0, 1}
    assert all(r["rank"] <= 3 for r in topk)
