"""Round-3 curation operators: chunk dedup, bloom decontamination, DSIR,
conjunctive search / postings, canonical reps, centroid purity."""

import math

from pyspark.sql import functions as F

from esop_spark.operators import dedup, similarity, text as text_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- chunk_dedup_stats ------------------------------------------------------

def test_chunk_dedup_counts_and_first_occurrence(spark):
    # doc 0 and doc 1 share an identical 3-token chunk; doc 2 is unique.
    docs = _docs(
        spark,
        [
            (0, "a b c x y z"),
            (1, "a b c q r s"),
            (2, "u v w m n o"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.chunk_dedup_stats(docs, chunk_tokens=3).collect()
    }
    assert out[0]["n_chunks"] == 2 and out[1]["n_chunks"] == 2
    # the shared chunk "a b c": dup for both, removable only for doc 1
    assert out[0]["n_dup_chunks"] == 1 and out[0]["n_removable"] == 0
    assert out[1]["n_dup_chunks"] == 1 and out[1]["n_removable"] == 1
    assert out[2]["n_dup_chunks"] == 0 and out[2]["n_removable"] == 0
    assert out[1]["dup_frac"] == 0.5


def test_chunk_dedup_within_doc_repeat(spark):
    # the same chunk twice inside ONE doc: first occurrence kept
    docs = _docs(spark, [(5, "p q r p q r")])
    row = text_ops.chunk_dedup_stats(docs, chunk_tokens=3).collect()[0]
    assert row["n_chunks"] == 2
    assert row["n_dup_chunks"] == 2
    assert row["n_removable"] == 1


# --- bloom prefilter + decontamination --------------------------------------

def test_bloom_probe_no_false_negatives(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    words = dedup.bloom_build(keys, "k", m_bits=1 << 12, k=4)
    hits = keys.filter(
        dedup.bloom_probe_col(F.col("k"), words, 1 << 12, 4)
    ).count()
    assert hits == 50  # every inserted key passes


def test_bloom_prefilter_rejects_most_non_members(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    words = dedup.bloom_build(keys, "k", m_bits=1 << 14, k=4)
    others = spark.createDataFrame(
        [(f"other{i}",) for i in range(2000)], "k string"
    )
    fp = others.filter(
        dedup.bloom_probe_col(F.col("k"), words, 1 << 14, 4)
    ).count()
    # fp rate at n=50,k=4,m=16384 is ~(1-e^{-200/16384})^4 ≈ 2e-8
    assert fp <= 2


def test_bloom_contamination_matches_exact(spark):
    train = _docs(
        spark,
        [(0, "w1 w2 w3 w4 w5"), (1, "x1 x2 x3 x4"), (2, "w3 w4 w5 z9")],
    )
    test = _docs(spark, [(100, "w2 w3 w4 w5 hello")])
    got = {
        r["doc_id"]: r
        for r in dedup.bloom_contamination(train, test, n=3).collect()
    }
    exact = {
        r["doc_id"]: r for r in dedup.contamination(train, test, n=3).collect()
    }
    # bloom path returns per-TRAIN-doc rows; compare against the exact
    # semi-join computed directly
    assert set(got) == {0, 1, 2}
    assert got[0]["n_contaminated"] == 2  # "w2 w3 w4", "w3 w4 w5"
    assert got[1]["n_contaminated"] == 0
    assert got[2]["n_contaminated"] == 1  # "w3 w4 w5"
    assert exact[100]["n_sh"] == 3  # sanity: the exact op still works


# --- DSIR -------------------------------------------------------------------

def test_dsir_scores_separate_target_like_docs(spark):
    rows = [(i, "tt tt tt tt") for i in range(5)] + [
        (i + 10, "rr rr rr rr") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.dsir_importance(
        docs, target_pred=F.col("doc_id") < 5, buckets=64
    )
    got = {r["doc_id"]: r["dsir_score"] for r in out.collect()}
    # docs made of target-only tokens score higher than raw-only docs
    assert got[0] > got[10]
    assert all(abs(got[i] - got[0]) < 1e-9 for i in range(5))


def test_dsir_zero_for_uniform_corpus(spark):
    docs = _docs(spark, [(0, "z z z"), (1, "z z z")])
    out = text_ops.dsir_importance(docs, target_pred=F.lit(True), buckets=16)
    for r in out.collect():
        # target == raw distribution exactly -> llr == ln((c+1)/(n+B)) diff 0
        assert math.isclose(r["dsir_score"], 0.0, abs_tol=1e-9)


# --- inverted index / search ------------------------------------------------

def test_conjunctive_search_requires_all_terms(spark):
    docs = _docs(
        spark,
        [(0, "spark window join x"), (1, "spark join y"), (2, "window join")],
    )
    out = {r["doc_id"]: r["total_tf"] for r in
           text_ops.conjunctive_search(docs, ("spark", "window", "join")).collect()}
    assert out == {0: 3}


def test_build_postings_df_and_cap(spark):
    docs = _docs(spark, [(0, "t t u"), (1, "t v"), (2, "t u")])
    out = {r["term"]: r for r in text_ops.build_postings(docs, max_postings=2).collect()}
    assert out["t"]["df"] == 3 and out["t"]["total_tf"] == 4
    assert out["t"]["postings"] == [0, 1]  # capped at 2, ascending
    assert out["u"]["postings"] == [0, 2]


# --- canonical reps ---------------------------------------------------------

def test_canonical_reps_quality_then_min_id(spark):
    clusters = spark.createDataFrame(
        [(0, 0, 3), (1, 0, 3), (2, 0, 3), (7, 7, 2), (9, 7, 2)],
        "doc_id long, cluster_id long, cluster_size long",
    )
    scored = spark.createDataFrame(
        [(0, 50), (1, 90), (2, 90), (7, 10), (9, 10)],
        "doc_id long, quality_score long",
    )
    out = {r["cluster_id"]: r for r in
           dedup.canonical_reps(clusters, scored).collect()}
    # cluster 0: quality tie 90 between docs 1,2 -> smaller id wins
    assert out[0]["rep_doc_id"] == 1 and out[0]["rep_score"] == 90
    assert out[0]["cluster_size"] == 3 and out[0]["n_dropped"] == 2
    # cluster 7: tie at 10 -> doc 7
    assert out[7]["rep_doc_id"] == 7


# --- centroid purity --------------------------------------------------------

def test_centroid_purity_separable_labels(spark):
    rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(4)] + [
        (10 + i, [0.0, 1.0 + 0.01 * i], 1) for i in range(4)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    out = {r["label"]: r for r in similarity.centroid_purity(emb).collect()}
    assert out[0]["purity"] == 1.0 and out[1]["purity"] == 1.0
    assert out[0]["n_members"] == 4 and out[0]["n_correct"] == 4


def test_centroid_purity_flags_mislabeled(spark):
    rows = [(i, [1.0, 0.0], 0) for i in range(4)] + [
        (10 + i, [0.0, 1.0], 1) for i in range(3)
    ] + [(20, [1.0, 0.0], 1)]  # mislabeled: axis-0 vector under label 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    out = {r["label"]: r for r in similarity.centroid_purity(emb).collect()}
    assert out[0]["purity"] == 1.0
    assert out[1]["n_correct"] == 3 and out[1]["n_members"] == 4


# --- slice overlap ----------------------------------------------------------

def test_slice_overlap_detects_mirror_sources(spark):
    rows = [
        (0, "m1 m2 m3 m4 m5", "srcA"),
        (1, "m1 m2 m3 m4 m5", "srcB"),   # mirror of srcA
        (2, "z1 z2 z3 z4", "srcC"),      # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["slice_a"], r["slice_b"]): r
           for r in dedup.slice_overlap(docs, "source").collect()}
    assert out[("srcA", "srcB")]["overlap"] == 1.0
    assert ("srcA", "srcC") not in out and ("srcB", "srcC") not in out


# --- novelty ----------------------------------------------------------------

def test_novelty_first_writer_wins(spark):
    docs = _docs(
        spark,
        [(0, "n1 n2 n3 n4"), (1, "n1 n2 n3 n4"), (2, "f1 f2 f3")],
    )
    got = {r["doc_id"]: r for r in dedup.novelty_scores(docs, n=3).collect()}
    assert got[0]["novelty"] == 1.0   # first occurrence of every shingle
    assert got[1]["novelty"] == 0.0   # full copy of doc 0
    assert got[2]["novelty"] == 1.0


# --- zipf -------------------------------------------------------------------

def test_zipf_fit_exact_power_law(spark):
    # freq(rank r) = 64 >> (r-1): ln(c) = ln(64) - r ln 2 ... not ln(rank).
    # Use c_r = round(C / r) with C big so slope ≈ -1.
    rows = []
    did = 0
    for rank, term in enumerate(["w%02d" % i for i in range(1, 9)], start=1):
        for _ in range(1024 // rank):
            rows.append((did, term))
            did += 1
    docs = spark.createDataFrame(
        [(i, " ".join(t for _, t in rows[i:i+1])) for i, (d, t) in enumerate(rows)],
        "doc_id long, text string",
    )
    out = text_ops.zipf_fit(docs, top_v=8).collect()[0]
    assert out["n_terms"] == 8
    assert abs(out["slope"] + 1.0) < 0.05  # near-perfect 1/r law


# --- incremental dedup ------------------------------------------------------

def test_incremental_dedup_cross_release_only(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [
            (0, base),                      # old release
            (2, "unrelated q w e r t y"),   # old release
            (1, base),                      # new: dup of old 0
            (3, base),                      # new: dup of old 0 (and of new 1)
            (5, "fresh u i o p a s"),       # new: novel
        ],
    )
    pairs = dedup.incremental_minhash_pairs(
        docs, is_new=F.col("doc_id") % 2 == 1, threshold=0.5
    ).collect()
    got = {(r["id_old"], r["id_new"]) for r in pairs}
    # only old→new pairs; the new-new dup (1,3) must NOT appear
    assert got == {(0, 1), (0, 3)}
    assert all(r["jaccard"] == 1.0 for r in pairs)


# --- CMS / PMI / PSI --------------------------------------------------------

def test_cms_estimates_upper_bound_exact(spark):
    docs = _docs(spark, [(0, "x x x x y y z"), (1, "x y w v u t s")])
    out = {r["term"]: r for r in
           text_ops.cms_term_counts(docs, query_top_k=4, width=64).collect()}
    assert out["x"]["exact_c"] == 5
    for r in out.values():
        assert r["est_c"] >= r["exact_c"]  # CMS never underestimates


def test_cms_wide_sketch_is_exact(spark):
    docs = _docs(spark, [(0, "aa bb cc aa aa bb")])
    out = {r["term"]: r for r in
           text_ops.cms_term_counts(docs, query_top_k=3, width=8192).collect()}
    # 3 distinct terms in an 8192-wide sketch: collisions essentially impossible
    assert all(r["est_c"] == r["exact_c"] for r in out.values())


def test_pmi_flags_fixed_collocation(spark):
    # "hong kong" always adjacent; fillers vary
    rows = [(i, f"hong kong f{i} g{i} h{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.pmi_collocations(docs, top_k=5, min_count=5).collect()
    assert out[0]["w1"] == "hong" and out[0]["w2"] == "kong"
    assert out[0]["c_xy"] == 10 and out[0]["pmi"] > 0


def test_psi_zero_for_identical_slices(spark):
    rows = [(i, "a b c d e f", f"src{i % 2}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r["psi"] for r in
           text_ops.score_drift_psi(docs, "source").collect()}
    # both slices have the identical score distribution -> PSI == 0
    assert all(abs(v) < 1e-9 for v in out.values())


def test_psi_positive_for_drifted_slice(spark):
    good = [(i, "w1 w2 w3 w4 w5 w6 w7 w8", "stable") for i in range(10)]
    bad = [(100 + i, "a a a a a a a a", "drifted") for i in range(10)]  # low quality
    docs = spark.createDataFrame(good + bad, "doc_id long, text string, source string")
    out = {r["source"]: r["psi"] for r in
           text_ops.score_drift_psi(docs, "source").collect()}
    assert out["drifted"] > 0.1 and out["stable"] > 0.1  # both drift vs blend


# --- corpus datasheet / phrase search / covariance+PCA ----------------------

def test_corpus_datasheet_counts_and_dups(spark):
    rows = [
        (0, "w1 w2 w3 w4", "en", "s1"),
        (1, "w1 w2 w3 w4", "en", "s2"),   # exact dup of 0
        (2, "x1 x2 x3 x4", "de", "s1"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["lang"]: r for r in text_ops.corpus_datasheet(docs).collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["dup_docs"] == 1
    assert out["de"]["dup_docs"] == 0
    assert out["ALL"]["n_docs"] == 3 and out["ALL"]["n_tokens"] == 12
    assert out["ALL"]["dup_docs"] == 1
    assert out["ALL"]["n_sources"] == 2


def test_corpus_datasheet_cross_lang_dup_counts_globally(spark):
    # same text under two langs: per-lang dup 0, global dup 1
    rows = [(0, "same text here now", "en", "s1"),
            (1, "same text here now", "de", "s1")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["lang"]: r for r in text_ops.corpus_datasheet(docs).collect()}
    assert out["en"]["dup_docs"] == 0 and out["de"]["dup_docs"] == 0
    assert out["ALL"]["dup_docs"] == 1


def test_phrase_search_order_and_adjacency(spark):
    docs = _docs(
        spark,
        [
            (0, "big red fox jumps"),        # phrase present
            (1, "red big fox"),              # wrong order
            (2, "big blue red fox"),         # not adjacent ("big...red")
            (3, "big red big red wolf"),     # two occurrences
        ],
    )
    out = {r["doc_id"]: r["n_occurrences"] for r in
           text_ops.phrase_search(docs, ("big", "red")).collect()}
    assert out == {0: 1, 3: 2}


def test_embedding_covariance_and_pca_recover_planted_direction(spark):
    import random
    rnd = random.Random(7)
    # planted dominant direction along dim 0 (variance 100x others)
    rows = [
        (i, [rnd.gauss(0, 10.0), rnd.gauss(0, 1.0), rnd.gauss(0, 1.0)])
        for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cov_rows = similarity.embedding_covariance(emb).collect()
    assert len(cov_rows) == 6  # 3*(3+1)/2 upper triangle
    val, vec = similarity.pca_top_component(cov_rows, dim=3)
    assert abs(vec[0]) > 0.99          # dominant axis recovered
    assert val > 50                     # eigenvalue ~ planted variance
