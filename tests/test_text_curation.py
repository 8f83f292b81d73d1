"""Tests for the round-2 curation operators: PII scan, boilerplate
detection, repeated n-gram spans, BM25, semantic dedup, mixture resample."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from esop_spark.operators import sampling, similarity
from esop_spark.operators import text as text_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_scan_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail me at bob@example.com or alice@test.org today"),
            (2, "server 192.168.1.10 answered"),
            (3, "card 12345678901 on file"),
            (4, "nothing sensitive here"),
        ],
    )
    got = {r["doc_id"]: r for r in text_ops.pii_scan(docs).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_pii"] == 2
    assert got[2]["n_ipv4"] == 1 and got[2]["n_emails"] == 0
    assert got[3]["n_digit_runs"] == 1
    assert got[4]["n_pii"] == 0
    # redaction is total: redacted text of doc 1 contains no '@'
    red = docs.filter(F.col("doc_id") == 1).select(
        F.regexp_replace("text", text_ops.PII_EMAIL_RE, "<EMAIL>").alias("r")
    ).first()["r"]
    assert "@" not in red and red.count("<EMAIL>") == 2


def test_boilerplate_flags_common_segments(spark):
    header = "this is the standard header line of ten tokens exactly no"
    # 10-token chunks: docs 1-3 share the same first segment (df=3);
    # tails are unique.
    rows = [(i, f"{header} unique tail {i} body") for i in (1, 2, 3)]
    rows.append((4, "completely different text without any shared segment at all"))
    got = {
        r["doc_id"]: r
        for r in text_ops.boilerplate_stats(
            _docs(spark, rows), chunk_tokens=10, min_df=3
        ).collect()
    }
    assert got[1]["n_boilerplate"] == 1 and got[1]["n_segments"] == 2
    assert got[4]["n_boilerplate"] == 0
    assert abs(got[1]["boilerplate_frac"] - 0.5) < 1e-9


def test_repeated_ngrams_finds_shared_span(spark):
    span = "a b c d e f g h"
    docs = _docs(
        spark,
        [
            (1, f"x {span} y"),
            (2, f"z {span} w"),
            (3, "totally unrelated words only here nothing shared at all ok"),
        ],
    )
    out = text_ops.repeated_ngrams(docs, n=8, k=5).collect()
    assert len(out) == 1
    assert out[0]["span_docs"] == 2 and out[0]["n_occ"] == 2


def test_bm25_ranks_heavier_tf_higher(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark runs fast"),
            (2, "spark runs on a cluster"),
            (3, "nothing relevant at all here"),
        ],
    )
    out = text_ops.bm25_topk(docs, ("spark",), k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["bm25"] > out[1]["bm25"] > 0


def test_semantic_dedup_identical_vectors_share_bucket(spark):
    v = [0.1 * (i % 7) - 0.3 for i in range(8)]
    w = [-x for x in v]
    emb = spark.createDataFrame(
        [(1, v), (2, v), (3, w)], "vec_id bigint, embedding array<float>"
    )
    out = similarity.semantic_dedup(emb, num_planes=6, dim=8)
    rows = out.collect()
    by_keeper = {r["keeper_id"]: r["bucket_size"] for r in rows}
    # identical vectors collapse into one bucket (keeper = min id); the
    # negated vector lands in the complementary bucket
    assert by_keeper[1] == 2 and by_keeper[3] == 1
    # buckets are a pure function of content: re-running yields same rows
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, similarity.semantic_dedup(emb, num_planes=6, dim=8).collect())
    )


def test_mixture_resample_hits_exact_mixture(spark):
    rows = [(i, "en" if i < 80 else ("de" if i < 95 else "zh")) for i in range(110)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    # target 50/50 en/de; de (15 docs) is the binding stratum
    out = sampling.mixture_resample(
        df, "lang", {"en": 500000, "de": 500000}, F.col("doc_id")
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 15, "de": 15}
    assert "zh" not in counts
    # deterministic: independent of partitioning
    out2 = sampling.mixture_resample(
        df.repartition(7), "lang", {"en": 500000, "de": 500000}, F.col("doc_id")
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )


def test_oov_rate_counts_unknown_tokens(spark):
    docs = _docs(
        spark,
        [
            (1, "a a a b"),          # vocab will be {a, b} with k=2
            (2, "a b rare1 rare2"),
        ],
    )
    got = {r["doc_id"]: r for r in text_ops.oov_rate(docs, vocab_k=2).collect()}
    assert got[1]["oov_rate"] == 0.0
    assert got[2]["n_in_vocab"] == 2 and abs(got[2]["oov_rate"] - 0.5) < 1e-9


def test_unigram_logprob_rare_docs_score_higher(spark):
    docs = _docs(
        spark,
        [
            (1, "common common common common"),
            (2, "common rare"),
        ],
    )
    got = {r["doc_id"]: r["mean_nll"] for r in text_ops.unigram_logprob(docs).collect()}
    # doc 2 contains a rare token -> higher mean negative log-prob
    assert got[2] > got[1] > 0


def test_release_gate_waterfall_attribution(spark):
    rows = [
        # high-quality en doc, duplicated content (ids 1, 2) -> 1 released, 1 dup_drop
        (1, "s1", "the quick brown fox jumps over one lazy dog today fine"),
        (2, "s1", "the quick brown fox jumps over one lazy dog today fine"),
        # low-quality (all stopwords) -> quality_fail
        (3, "s1", "the the the the the the the the the the the the"),
        # no marker tokens at all -> lang_fail (pred unknown)
        (4, "s2", "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {
        r["source"]: r
        for r in text_ops.release_gate(df, min_quality=60, max_boiler_frac=1.0).collect()
    }
    s1 = got["s1"]
    assert s1["n_docs"] == 3 and s1["n_released"] == 1
    assert s1["n_dup_drop"] == 1 and s1["n_quality_fail"] == 1
    s2 = got["s2"]
    assert s2["n_lang_fail"] == 1 and s2["n_released"] == 0
    # waterfall counts always sum to n_docs
    for r in got.values():
        assert (
            r["n_quality_fail"] + r["n_lang_fail"] + r["n_boiler_fail"]
            + r["n_dup_drop"] + r["n_released"] == r["n_docs"]
        )


def test_embedding_dim_stats_mergeable(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, [3.0, 4.0])], "vec_id bigint, embedding array<float>"
    )
    got = {r["dim"]: r for r in similarity.embedding_dim_stats(emb).collect()}
    assert got[0]["min_x"] == 1.0 and got[0]["max_x"] == 3.0 and got[0]["mean_x"] == 2.0
    assert got[1]["mean_sq"] == 10.0  # (4 + 16) / 2
    # partitioning-invariant (mergeable partials)
    got2 = {r["dim"]: r for r in similarity.embedding_dim_stats(emb.repartition(5)).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {k: tuple(v) for k, v in got2.items()}


# --- property-based checks (small corpora vs Python brute force) -----------

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "y2"])
TEXT = st.lists(WORD, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_prop_pii_redaction_complete(spark, texts):
    rows = [
        (i, t + (" u%d@ex.com 10.0.0.%d id 123456789" % (i, i) if i % 2 else ""))
        for i, t in enumerate(texts)
    ]
    out = text_ops.pii_scan(_docs(spark, rows)).collect()
    # counts reproduce a Python regex brute force on the same text
    for r, (_, t) in zip(sorted(out, key=lambda r: r["doc_id"]), rows):
        assert r["n_emails"] == len(re.findall(text_ops.PII_EMAIL_RE, t))
        assert r["n_ipv4"] == len(re.findall(text_ops.PII_IPV4_RE, t))


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=2, max_size=8))
def test_prop_repeated_ngrams_matches_bruteforce(spark, texts):
    n = 2
    rows = list(enumerate(texts))
    out = text_ops.repeated_ngrams(_docs(spark, rows), n=n, k=100).collect()
    docs_of = {}
    occ = Counter()
    for i, t in rows:
        w = t.split(" ")
        for j in range(len(w) - n + 1):
            g = " ".join(w[j : j + n])
            occ[g] += 1
            docs_of.setdefault(g, set()).add(i)
    expect = {
        g: (len(ids), occ[g]) for g, ids in docs_of.items() if len(ids) >= 2
    }
    got = {r["span_hash"]: (r["span_docs"], r["n_occ"]) for r in out}
    import hashlib

    expect_hashed = {
        hashlib.md5(g.encode()).hexdigest(): v for g, v in expect.items()
    }
    assert got == expect_hashed


@settings(max_examples=5, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["en", "de", "fr"]),
        st.integers(min_value=1, max_value=40),
        min_size=2,
        max_size=3,
    )
)
def test_prop_mixture_resample_exact_counts(spark, sizes):
    rows = []
    i = 0
    for lang, cnt in sorted(sizes.items()):
        for _ in range(cnt):
            rows.append((i, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    weights = {lang: 1_000_000 // len(sizes) for lang in sizes}
    out = sampling.mixture_resample(df, "lang", weights, F.col("doc_id"))
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    t = min(n * 1_000_000 // weights[lang] for lang, n in sizes.items())
    expect = {lang: t * weights[lang] // 1_000_000 for lang in sizes}
    expect = {k: v for k, v in expect.items() if v > 0}
    assert got == expect


# --- bigram LM + Gopher rules + k-center ------------------------------------

def test_bigram_logprob_repeated_doc_scores_lower(spark):
    from esop_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b a b"),        # one dominant bigram pattern
            (1, "q w e r t y u i"),        # all-unique bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_ops.bigram_logprob(docs).collect()}
    assert got[0]["n_bigrams"] == 7 and got[1]["n_bigrams"] == 7
    # frequent bigrams are more probable -> lower NLL
    assert got[0]["mean_nll"] < got[1]["mean_nll"]


def test_bigram_logprob_short_docs_drop_out(spark):
    from esop_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(0, "single"), (1, "two words")], "doc_id long, text string"
    )
    rows = text_ops.bigram_logprob(docs).collect()
    assert {r["doc_id"] for r in rows} == {1}


def test_gopher_rules_flags(spark):
    from esop_spark.operators import text as text_ops

    long_ok = " ".join(["the"] * 15 + ["a"] * 15 + ["word"] * 10)  # 40 words, passes
    short = "the a tiny doc"                                       # too short
    symbols = " ".join(["#"] * 20 + ["the", "a"] + ["w"] * 18)     # symbol_frac 0.5
    rows = text_ops.gopher_rules(
        spark.createDataFrame(
            [("s0", long_ok), ("s0", short), ("s1", symbols)],
            "source string, text string",
        )
    ).collect()
    by_src = {r["source"]: r for r in rows}
    assert by_src["s0"]["n_pass"] == 1
    assert by_src["s0"]["n_too_short"] == 1
    assert by_src["s1"]["n_symbol"] == 1
    assert by_src["s1"]["n_pass"] == 0


def test_kcenter_assign_total_mass_and_self_assignment(spark):
    from esop_spark.operators import similarity

    import math

    # 12 unit vectors in 2 tight groups along axes 0 and 1
    rows = []
    for i in range(12):
        axis = i % 2
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 2) % 8] = 0.01 * (i // 2)  # slight spread, keeps argmax stable
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rep = similarity.kcenter_assign(emb, k=2).collect()
    assert sum(r["n_members"] for r in rep) == 12
    assert len(rep) == 2
    for r in rep:
        assert r["mean_cos"] > 0.9  # members cohere with their center


def test_containment_catches_subset_doc_jaccard_misses(spark):
    from esop_spark.operators import dedup

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, short), (1, short + " " + filler)], "doc_id long, text string"
    )
    # jaccard between the pair is small (long doc has ~16x the shingles)
    jac = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert jac == []
    got = dedup.containment_pairs(docs, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]
    assert got[0]["containment"] == 1.0


def test_bpe_token_stats_fertility(spark):
    from esop_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(0, "hello worlds"), (1, "ab 12 c!")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text_ops.bpe_token_stats(docs).collect()}
    # hello -> hell+o, worlds -> worl+ds : 4 pieces / 2 words
    assert got[0]["n_pieces"] == 4 and got[0]["n_words"] == 2
    assert got[0]["fertility"] == 2.0
    # ab(1) 1(1) 2(1) c(1) !(1) = 5 pieces / 3 words
    assert got[1]["n_pieces"] == 5 and got[1]["n_words"] == 3


def test_quality_cdf_monotone_and_total(spark):
    from esop_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j % (i + 1)}" for j in range(20))) for i in range(30)],
        "doc_id long, text string",
    )
    rows = sorted(text_ops.quality_cdf(docs).collect(), key=lambda r: r["quality_score"])
    assert sum(r["n_docs"] for r in rows) == 30
    fracs = [r["cum_frac"] for r in rows]
    assert fracs == sorted(fracs) and abs(fracs[-1] - 1.0) < 1e-9
    assert rows[-1]["cum_docs"] == 30


def test_embedding_outliers_flags_spike(spark):
    from esop_spark.operators import similarity

    # 40 tame vectors + one with a huge spike in dim 2
    rows = [(i, [float((i * 7 + d) % 5) / 5.0 for d in range(8)]) for i in range(40)]
    rows.append((99, [0.0, 0.0, 50.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in similarity.embedding_outliers(emb, 3.0).collect()}
    assert got[99]["is_outlier"] and got[99]["n_over"] >= 1
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1


def test_dup_span_coverage_interval_union(spark):
    from esop_spark.operators import text as text_ops

    shared = "s1 s2 s3 s4"  # one hot 4-gram shared by docs 0 and 1
    docs = spark.createDataFrame(
        [
            (0, shared + " u1 u2 u3 u4"),        # covered 4 of 8
            (1, "v1 " + shared + " v2 v3"),      # covered 4 of 7
            (2, "w1 w2 w3 w4 w5 w6 w7 w8"),      # clean
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_ops.dup_span_coverage(docs, n=4).collect()}
    assert got[0]["covered_tokens"] == 4 and got[0]["dup_frac"] == 0.5
    assert got[1]["covered_tokens"] == 4
    assert got[2]["covered_tokens"] == 0 and got[2]["dup_frac"] == 0.0


def test_dup_span_coverage_overlaps_not_double_counted(spark):
    from esop_spark.operators import text as text_ops

    # doc 0 repeats 'a b a b a b' so overlapping hot 2-grams tile it;
    # doc 1 shares the 2-grams, making them corpus-hot
    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "x a b y")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text_ops.dup_span_coverage(docs, n=2).collect()}
    # every position in doc 0 starts a hot 2-gram: full coverage, not 2*5
    assert got[0]["covered_tokens"] == 6 and got[0]["dup_frac"] == 1.0
    assert got[1]["covered_tokens"] == 2


def test_slice_divergence_identical_slices_zero(spark):
    from esop_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(0, "a b c", "s1"), (1, "a b c", "s2")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in text_ops.slice_divergence(docs, "source").collect()}
    assert got["s1"]["kl"] == 0.0 and got["s2"]["kl"] == 0.0
    assert got["s1"]["n_tokens"] == 3


def test_slice_divergence_drifted_slice_positive(spark):
    from esop_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(0, "a a a a", "base"), (1, "a a a a", "base"), (2, "z z z z", "drift")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r["kl"] for r in text_ops.slice_divergence(docs, "source").collect()}
    # drift's tokens are 1/3 of the corpus mass it claims fully: KL = ln(3)
    import math

    assert abs(got["drift"] - round(math.log(3), 6)) < 1e-6
    assert 0 < got["base"] < got["drift"]


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing's core property: two docs sharing a token run of length
    >= w+k-1 (= 8 with w=5, k=4) MUST share at least one fingerprint."""
    from esop_spark.operators import dedup

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    a = "a1 a2 a3 " + shared + " a4 a5"
    b = "b1 " + shared + " b2 b3 b4 b5 b6"
    c = " ".join(f"c{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    kg = dedup._words(docs, "text", "doc_id").select(
        F.col("doc_id"),
        F.posexplode(F.expr(dedup._positional_kgram_expr(4))).alias("pos0", "kgram"),
    )
    # recompute the packed fingerprints per doc to compare HASH parts only
    # (positions differ between the two docs by construction)
    fps = (
        kg.select(
            "doc_id",
            (F.pmod(F.xxhash64("kgram"), F.lit(1 << 32))).alias("h"),
            "pos0",
        )
    )
    from pyspark.sql.window import Window

    M = 1 << 20
    win = Window.partitionBy("doc_id").orderBy("pos0").rowsBetween(0, 4)
    sel = (
        fps.select(
            "doc_id",
            F.min(F.col("h") * M + (M - (F.col("pos0") + 1))).over(win).alias("fp"),
        )
        .distinct()
        .select("doc_id", (F.col("fp") / M).cast("bigint").alias("fph"))
    )
    by_doc = {
        r["doc_id"]: set()
        for r in docs.collect()
    }
    for r in sel.collect():
        by_doc[r["doc_id"]].add(r["fph"])
    assert by_doc[0] & by_doc[1], "shared 8-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2]) and not (by_doc[1] & by_doc[2])


def test_winnow_fingerprints_shape_and_determinism(spark):
    from esop_spark.operators import dedup

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(30))), (1, "x y z")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: (r["n_fp"], r["fp_checksum"])
         for r in dedup.winnow_fingerprints(docs).collect()}
    b = {r["doc_id"]: (r["n_fp"], r["fp_checksum"])
         for r in dedup.winnow_fingerprints(docs.repartition(7)).collect()}
    assert a == b
    assert a[0][0] >= 1
    assert 1 not in a  # doc with < k tokens emits no k-grams → absent


def test_lm_head_tail_join_matches_naive(spark):
    """The broadcast-head/shuffle-tail scoring plan must produce the exact
    same per-doc NLLs as the single shuffle join, including when the head
    is smaller than the vocabulary (tail leg active)."""
    from esop_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12))) for i in range(40)],
        "doc_id long, text string",
    )
    naive = {r["doc_id"]: (r["n_tokens"], r["mean_nll"])
             for r in text_ops.unigram_logprob(docs).collect()}
    ht = {r["doc_id"]: (r["n_tokens"], r["mean_nll"])
          for r in text_ops.unigram_logprob(docs, head_k=5).collect()}
    assert ht == naive
    naive_b = {r["doc_id"]: r["mean_nll"]
               for r in text_ops.bigram_logprob(docs).collect()}
    ht_b = {r["doc_id"]: r["mean_nll"]
            for r in text_ops.bigram_logprob(docs, head_k=7).collect()}
    assert ht_b == naive_b
