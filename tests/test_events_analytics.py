"""Semantic tests for the events analytics operators (q97-q99) and the
scan-shaped corpus diagnostics added alongside them (q100-q103)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from esop_spark.operators import analytics, sampling
from esop_spark.operators import text as text_ops


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(s), u, t, 1.0, "") for i, (s, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestFunnel:
    def test_strict_order_required(self, spark):
        # user 1 completes a->b->c in order; user 2 has b BEFORE a (b must
        # not count); user 3 only reaches a.
        ev = _events(
            spark,
            [
                (0, 1, "a"), (10, 1, "b"), (20, 1, "c"),
                (0, 2, "b"), (10, 2, "a"),
                (5, 3, "a"),
            ],
        )
        rows = {
            r["stage"]: r
            for r in analytics.funnel(ev, ("a", "b", "c")).collect()
        }
        assert rows["a"]["n_users"] == 3
        assert rows["b"]["n_users"] == 1
        assert rows["c"]["n_users"] == 1
        assert rows["a"]["conv_from_prev"] == 1.0
        assert rows["b"]["conv_from_prev"] == pytest.approx(1 / 3, abs=1e-6)
        assert rows["c"]["conv_from_prev"] == 1.0

    def test_same_timestamp_does_not_advance(self, spark):
        # b at the exact same instant as a: strictly-after excludes it
        ev = _events(spark, [(0, 1, "a"), (0, 1, "b")])
        rows = {
            r["stage"]: r["n_users"]
            for r in analytics.funnel(ev, ("a", "b")).collect()
        }
        assert rows == {"a": 1, "b": 0}

    def test_later_retry_counts(self, spark):
        # first b precedes a; a later b after a completes the funnel
        ev = _events(spark, [(0, 1, "b"), (5, 1, "a"), (9, 1, "b")])
        rows = {
            r["stage"]: r["n_users"]
            for r in analytics.funnel(ev, ("a", "b")).collect()
        }
        assert rows == {"a": 1, "b": 1}


class TestCohortRetention:
    def test_weekly_offsets(self, spark):
        day = 86400
        ev = _events(
            spark,
            [
                (0, 1, "view"),           # cohort day 0
                (8 * day, 1, "view"),     # week offset 1
                (0, 2, "view"),           # same cohort, only week 0
                (3 * day, 3, "view"),     # second cohort (day 3)
            ],
        )
        out = {
            (r["cohort_day"], r["week_offset"]): r
            for r in analytics.cohort_retention(ev).collect()
        }
        d0 = 19723  # 2024-01-01 epoch day
        assert out[(d0, 0)]["n_users"] == 2
        assert out[(d0, 1)]["n_users"] == 1
        assert out[(d0, 1)]["retention_frac"] == 0.5
        assert out[(d0 + 3, 0)]["n_users"] == 1

    def test_retention_capped_at_one(self, spark):
        ev = _events(spark, [(0, 1, "view"), (60, 1, "click")])
        for r in analytics.cohort_retention(ev).collect():
            assert 0 < r["retention_frac"] <= 1.0


class TestEventTransitions:
    def test_counts_and_probs(self, spark):
        ev = _events(
            spark,
            [(0, 1, "a"), (1, 1, "b"), (2, 1, "a"), (3, 1, "c"),
             (0, 2, "a"), (1, 2, "b")],
        )
        out = {
            (r["from_type"], r["to_type"]): r
            for r in analytics.event_transitions(ev).collect()
        }
        assert out[("a", "b")]["n"] == 2
        assert out[("a", "c")]["n"] == 1
        assert out[("b", "a")]["n"] == 1
        assert out[("a", "b")]["prob"] == pytest.approx(2 / 3, abs=1e-6)
        # probabilities per from_type sum to 1
        sums = {}
        for (f, _t), r in out.items():
            sums[f] = sums.get(f, 0) + r["prob"]
        for v in sums.values():
            assert v == pytest.approx(1.0, abs=1e-5)


class TestCharEntropy:
    def test_known_values(self, spark):
        docs = spark.createDataFrame(
            [(1, "aaaa"), (2, "ab"), (3, "abcd")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r for r in text_ops.char_entropy(docs).collect()
        }
        assert out[1]["entropy_bits"] == 0.0
        assert out[2]["entropy_bits"] == 1.0
        assert out[3]["entropy_bits"] == 2.0
        assert out[3]["n_chars_split"] == 4


class TestPaddingWaste:
    def test_buckets_and_truncation(self, spark):
        docs = spark.createDataFrame(
            [
                (1, " ".join(["w"] * 10)),    # bucket 16, pad 6
                (2, " ".join(["w"] * 17)),    # bucket 32, pad 15
                (3, " ".join(["w"] * 200)),   # bucket 128, truncate 72
            ],
            "doc_id long, text string",
        )
        out = {
            r["bucket_len"]: r
            for r in text_ops.padding_waste(docs, context_len=128).collect()
        }
        assert out[16]["padded_slots"] == 6
        assert out[32]["padded_slots"] == 15
        assert out[128]["truncated_tokens"] == 72
        assert out[128]["padded_slots"] == 0
        assert out[16]["waste_frac"] == pytest.approx(6 / 16, abs=1e-6)


class TestLangidConfusion:
    def test_fracs_sum_to_one(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the a of and is", "en"),
                (2, "the the the", "en"),
                (3, "und der die", "de"),
                (4, "xyz qrs", "de"),  # predicts unknown
            ],
            "doc_id long, text string, lang string",
        )
        out = text_ops.langid_confusion(docs).collect()
        per_true = {}
        for r in out:
            per_true.setdefault(r["true_lang"], 0)
            per_true[r["true_lang"]] += r["frac_of_true"]
        for v in per_true.values():
            assert v == pytest.approx(1.0, abs=1e-5)
        pairs = {(r["true_lang"], r["pred_lang"]): r["n_docs"] for r in out}
        assert pairs[("en", "en")] == 2
        assert pairs[("de", "de")] == 1
        assert pairs[("de", "unknown")] == 1


class TestMixtureEss:
    def test_uniform_strata_full_ess(self, spark):
        docs = spark.createDataFrame(
            [(i, "t", f"s{i % 4}") for i in range(40)],
            "doc_id long, text string, source string",
        )
        out = sampling.mixture_ess(docs, alpha=0.5).collect()
        # equal strata: temperature reweighting is a no-op, ESS == N
        for r in out:
            assert r["weight_ratio"] == pytest.approx(1.0, abs=1e-6)
            assert r["corpus_ess"] == pytest.approx(40.0, abs=1e-4)
            assert r["ess_frac"] == pytest.approx(1.0, abs=1e-6)

    def test_skewed_strata_reduce_ess(self, spark):
        docs = spark.createDataFrame(
            [(i, "t", "big" if i < 90 else "small") for i in range(100)],
            "doc_id long, text string, source string",
        )
        out = {r["stratum"]: r for r in sampling.mixture_ess(docs).collect()}
        assert out["small"]["weight_ratio"] > 1.0 > out["big"]["weight_ratio"]
        assert 0 < out["big"]["ess_frac"] < 1.0


class TestBpeMergeStep:
    def test_weighted_pair_counts(self, spark):
        docs = spark.createDataFrame(
            [(1, "ab ab abc"), (2, "x")], "doc_id long, text string"
        )
        out = [
            (r["left_sym"], r["right_sym"], r["pair_count"])
            for r in text_ops.bpe_merge_candidates(docs, top_k=5).collect()
        ]
        # ab appears 2x, abc 1x -> (a,b)=3, (b,c)=1; 1-char word x: no pairs
        assert out[0] == ("a", "b", 3)
        assert ("b", "c", 1) in out
        assert all(sym != "x" for sym, _, _ in out)


class TestScoreAuc:
    def test_perfect_separation(self, spark):
        # positives all high-TTR (score 100), negatives all repetition
        pos = [(i, "w%d y%d z%d q%d" % (i, i, i, i), "en") for i in range(5)]
        neg = [(100 + i, "r r r r", "de") for i in range(5)]
        docs = spark.createDataFrame(
            pos + neg, "doc_id long, text string, lang string"
        )
        r = text_ops.score_auc(docs).collect()[0]
        assert r["n_pos"] == 5 and r["n_neg"] == 5
        assert r["auc"] == 1.0

    def test_identical_scores_give_half(self, spark):
        docs = spark.createDataFrame(
            [(i, "a b c", "en" if i % 2 else "de") for i in range(10)],
            "doc_id long, text string, lang string",
        )
        r = text_ops.score_auc(docs).collect()[0]
        assert r["auc"] == pytest.approx(0.5, abs=1e-6)


class TestFunnelInSession:
    def test_cross_session_does_not_convert(self, spark):
        # user 1: a then b within one session -> converts; user 2: a, then
        # b only after a >30min gap (new session) -> b's session has no a
        ev = _events(
            spark,
            [
                (0, 1, "a"), (10, 1, "b"),
                (0, 2, "a"), (4000, 2, "b"),
            ],
        )
        rows = {
            r["stage"]: r["n_sessions"]
            for r in analytics.funnel_in_session(
                ev, ("a", "b"), gap_s=1800
            ).collect()
        }
        assert rows == {"a": 2, "b": 1}

    def test_two_converting_sessions_same_user(self, spark):
        ev = _events(
            spark,
            [(0, 1, "a"), (5, 1, "b"), (4000, 1, "a"), (4005, 1, "b")],
        )
        rows = {
            r["stage"]: r["n_sessions"]
            for r in analytics.funnel_in_session(
                ev, ("a", "b"), gap_s=1800
            ).collect()
        }
        assert rows == {"a": 2, "b": 2}


class TestClusterSizeHistogram:
    def test_bucketing_and_removable(self, spark):
        from esop_spark.operators import dedup

        clusters = spark.createDataFrame(
            # cluster 1: size 2; cluster 2: size 5 (bucket 8)
            [(10, 1, 2), (11, 1, 2)]
            + [(20 + i, 2, 5) for i in range(5)],
            "doc_id long, cluster_id long, cluster_size long",
        )
        out = {
            r["size_le"]: r
            for r in dedup.cluster_size_histogram(clusters).collect()
        }
        assert out[2]["n_clusters"] == 1
        assert out[2]["n_removable"] == 1
        assert out[8]["n_clusters"] == 1
        assert out[8]["n_docs"] == 5
        assert out[8]["n_removable"] == 4


class TestMergeableStats:
    def test_merge_equals_rescan(self, spark):
        df = spark.createDataFrame(
            [(i, f"s{i % 3}", float(i * i % 97)) for i in range(60)],
            "doc_id long, source string, v double",
        )
        whole = analytics.finalize_stats(
            analytics.mergeable_stats(df, "source", "v")
        )
        half_a = analytics.mergeable_stats(
            df.filter(F.col("doc_id") % 2 == 0), "source", "v"
        )
        half_b = analytics.mergeable_stats(
            df.filter(F.col("doc_id") % 2 == 1), "source", "v"
        )
        merged = analytics.finalize_stats(
            analytics.merge_stats(half_a, half_b)
        )
        a = {r["key"]: r.asDict() for r in whole.collect()}
        b = {r["key"]: r.asDict() for r in merged.collect()}
        assert a == b

    def test_key_only_in_delta(self, spark):
        old = analytics.mergeable_stats(
            spark.createDataFrame([(1, "a", 2.0)], "id long, k string, v double"),
            "k", "v",
        )
        delta = analytics.mergeable_stats(
            spark.createDataFrame([(2, "b", 5.0)], "id long, k string, v double"),
            "k", "v",
        )
        out = {r["key"]: r for r in
               analytics.finalize_stats(analytics.merge_stats(old, delta)).collect()}
        assert out["b"]["n"] == 1 and out["b"]["mean"] == 5.0
        assert out["a"]["n"] == 1


class TestPmcSegments:
    def test_known_segmentation(self, spark):
        # values 0,1,2 stay in one segment at eps=2 (width 4); the jump to
        # 100 opens a second; 101 extends it
        ev = spark.createDataFrame(
            [(i, _ts(i), 1, "e", v, "") for i, v in
             enumerate([0.0, 1.0, 2.0, 100.0, 101.0])],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        r = analytics.pmc_segments(ev, eps=2.0).collect()[0]
        assert r["n_points"] == 5
        assert r["n_segments"] == 2
        assert r["points_per_segment"] == 2.5

    def test_eps_zero_splits_on_any_change(self, spark):
        ev = spark.createDataFrame(
            [(i, _ts(i), 1, "e", float(i % 2), "") for i in range(6)],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        r = analytics.pmc_segments(ev, eps=0.0).collect()[0]
        assert r["n_segments"] == 6


class TestWindowAnomalies:
    def test_flags_spike_window(self, spark):
        # 10 quiet hours with 2 events each, one hour with 40 -> flagged
        rows = []
        eid = 0
        for h in range(10):
            for j in range(2):
                rows.append((3600 * h + j, 1, "click"))
                eid += 1
        for j in range(40):
            rows.append((3600 * 10 + j, 1, "click"))
        ev = _events(spark, [(s, u, t) for s, u, t in rows])
        out = analytics.window_anomalies(ev, width_s=3600, z_tau=2.0).collect()
        assert len(out) == 1
        assert out[0]["n"] == 40
        assert out[0]["z"] > 2.0


class TestHeapsFit:
    def test_power_law_recovered(self, spark):
        # strata with V = N^0.5 exactly: N tokens with V distinct values,
        # each repeated N/V times
        rows = []
        did = 0
        for n, v in [(16, 4), (64, 8), (256, 16)]:
            words = []
            for i in range(v):
                words += [f"s{n}_w{i}"] * (n // v)
            rows.append((did, " ".join(words), f"src{n}"))
            did += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        r = text_ops.heaps_fit(docs).collect()[0]
        assert r["n_strata"] == 3
        assert r["beta"] == pytest.approx(0.5, abs=1e-6)
        assert r["k"] == pytest.approx(1.0, abs=1e-4)


class TestIntereventGaps:
    def test_gap_percentiles(self, spark):
        # user 1: events at 0,10,30 -> gaps 10000ms (type b), 20000ms (type c)
        ev = _events(spark, [(0, 1, "a"), (10, 1, "b"), (30, 1, "c")])
        out = {r["event_type"]: r for r in
               analytics.interevent_gaps(ev).collect()}
        assert "a" not in out  # first event has no gap
        assert out["b"]["p50_ms"] == 10000.0
        assert out["c"]["p50_ms"] == 20000.0
        assert out["b"]["n_gaps"] == 1


class TestSessionCooccurrence:
    def test_support_counts(self, spark):
        # session 1 (user 1): {a,b}; session 2 (user 1, after gap): {a};
        # session 3 (user 2): {a,b,c}
        ev = _events(
            spark,
            [(0, 1, "a"), (10, 1, "b"), (4000, 1, "a"),
             (0, 2, "a"), (5, 2, "b"), (9, 2, "c")],
        )
        out = {(r["type_a"], r["type_b"]): r for r in
               analytics.session_cooccurrence(ev, gap_s=1800).collect()}
        assert out[("a", "b")]["n_sessions"] == 2
        assert out[("a", "c")]["n_sessions"] == 1
        assert out[("b", "c")]["n_sessions"] == 1
        # 3 baskets total
        assert out[("a", "b")]["support"] == pytest.approx(2 / 3, abs=1e-6)


class TestDistinctNgrams:
    def test_repetition_collapses_diversity(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a a a a a a", "rep"),          # distinct-1 = 1/6
                (2, "w x y z q r", "fresh"),        # distinct-1 = 1.0
            ],
            "doc_id long, text string, source string",
        )
        out = {r["stratum"]: r for r in
               text_ops.distinct_ngram_diversity(docs).collect()}
        assert out["fresh"]["distinct_1"] == 1.0
        assert out["fresh"]["distinct_2"] == 1.0
        assert out["rep"]["distinct_1"] == pytest.approx(1 / 6, abs=1e-6)
        assert out["rep"]["distinct_bigrams"] == 1


class TestHardNegatives:
    def test_dup_band_excluded(self, spark):
        from esop_spark.operators import similarity as sim

        # vec 0 = query; vec 1 identical (cos 1.0, excluded); vecs 2/3
        # partially similar (hard negatives); vec 4 orthogonal
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 1.0, 0.0, 0.0]),
            (3, [1.0, 2.0, 0.0, 0.0]),
            (4, [0.0, 0.0, 1.0, 0.0]),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = sim.hard_negatives(emb, [0], k=2, dup_tau=0.95).collect()
        got = [(r["neighbor_id"], r["rank"]) for r in out]
        # 1 excluded (cos=1.0 >= tau); 2 (cos~.707) then 3 (cos~.447)
        assert got == [(2, 1), (3, 2)]


class TestQualityLengthCorr:
    def test_perfect_positive_correlation(self, spark):
        # quality == 100*ttr; construct docs where both signals rise together
        docs = spark.createDataFrame(
            [
                (1, "a a a a", "s"),          # low ttr, 4 tokens
                (2, "a a b b c c", "s"),      # mid
                (3, "w x y z q r u v", "s"),  # high ttr, 8 tokens
            ],
            "doc_id long, text string, source string",
        )
        r = text_ops.quality_length_correlation(docs).collect()[0]
        assert r["n"] == 3
        assert -1.0 <= r["pearson_r"] <= 1.0
        assert r["pearson_r"] > 0.5  # longer docs here are higher quality


class TestLengthGini:
    def test_uniform_lengths_zero_gini(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * 10)) for i in range(20)],
            "doc_id long, text string",
        )
        r = text_ops.length_gini(docs).collect()[0]
        assert r["gini"] == 0.0
        assert r["total_tokens"] == 200

    def test_concentration_raises_gini(self, spark):
        docs = spark.createDataFrame(
            [(0, " ".join(["w"] * 1000))]
            + [(i, "w") for i in range(1, 11)],
            "doc_id long, text string",
        )
        r = text_ops.length_gini(docs).collect()[0]
        # one doc holds ~99% of mass across 11 docs
        assert r["gini"] > 0.85
