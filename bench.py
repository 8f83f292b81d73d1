"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full compute, no
driver-side collection), so the timing covers scan → shuffle → agg/join —
the same plan shape a cluster run would execute.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from esop_spark.session import get_spark

# Representative spread: manifest analytics, diffs, joins, agg, window,
# event windows, dedup (exact + ngram + minhash), similarity, text,
# contamination, sampling, tf-idf, quantization.
BENCH_QUERIES = [
    "q01_list_backups",
    "q03_upload_diff",
    "q04_restore_diff",
    "q13_filter_project",
    "q14_join_agg",
    "q15_group_agg",
    "q16_window_rank",
    "q20_events_windows",
    "q21_dedup_exact",
    "q22_dedup_minhash_lsh",
    "q23_ngram_jaccard",
    "q26_ann_topk",
    "q28_quality_score",
    "q49_contamination",
    "q50_stratified_sample",
    "q52_tfidf_top_terms",
    "q53_quantize_int8",
    "q54_pii_scan",
    "q55_boilerplate",
    "q56_semantic_dedup",
    "q57_mixture_resample",
    "q58_repeated_ngrams",
    "q59_bm25",
    "q60_oov_rate",
    "q61_unigram_logprob",
    "q62_release_gate",
    "q63_embedding_dim_stats",
    "q64_train_split",
    "q65_shard_packing",
    "q66_bigram_logprob",
    "q67_gopher_rules",
    "q68_kcenter_assign",
    "q69_containment_dedup",
    "q71_corpus_diff",
    "q73_embedding_outliers",
    "q74_dup_span_coverage",
    "q75_temperature_resample",
    "q76_source_cap",
    "q77_slice_divergence",
    "q78_winnow_fingerprints",
    "q79_weighted_sample",
    "q80_chunk_dedup",
    "q81_bloom_decontaminate",
    "q82_dsir_importance",
    "q83_conjunctive_search",
    "q84_canonical_reps",
    "q85_centroid_purity",
    "q86_slice_overlap",
    "q87_novelty",
    "q89_incremental_dedup",
    "q90_cms_heavy_hitters",
    "q91_pmi_collocations",
    "q92_score_drift_psi",
    "q93_image_neardup",
    "q97_funnel",
    "q98_cohort_retention",
    "q99_event_transitions",
    "q100_char_entropy",
    "q101_padding_waste",
    "q102_langid_confusion",
    "q103_mixture_ess",
    "q105_bpe_merge_step",
    "q106_score_auc",
    "q107_funnel_in_session",
    "q109_incremental_stats",
    "q110_pmc_compression",
    "q111_window_anomalies",
    "q112_heaps_fit",
    "q113_interevent_gaps",
    "q114_session_cooccurrence",
    "q115_distinct_ngrams",
    "q116_hard_negatives",
    "q117_quality_length_corr",
    "q118_length_gini",
    "q119_fuzzy_join",
    "q120_sequence_packing",
    "q121_dedup_rewrite",
    "q122_matryoshka_eval",
    "q123_quantized_recall",
    "q124_split_leakage",
    "q125_hybrid_retrieval",
    "q126_anneal_schedule",
    "q127_knn_label_audit",
    "q128_vocab_coverage",
    "q129_dedup_inflation",
    "q130_filter_funnel",
    "q131_subsample_ci",
    "q132_dau_wau",
    "q133_json_props",
    "q134_extremes_report",
    "q135_integrity_check",
    "q136_minhash_calibration",
    "q137_temporal_split",
    "q138_group_split",
    "q139_release_manifest",
    "q140_uncertainty_sample",
    "q141_embed_documents",
    "q142_curriculum_order",
    "q143_nb_confusion",
    "q144_cluster_topics",
    "q145_token_waterfill",
    "q146_hot_keys",
    "q147_histogram_quantiles",
    "q148_burst_detection",
    "q149_prototypicality",
    "q150_dedup_threshold_curve",
    "q151_kn_bigram_logprob",
    "q152_quantile_normalize",
    "q153_retrieval_metrics",
    "q154_surprisal_spans",
    "q155_table_profile",
    "q156_join_cardinality",
    "q159_pagerank",
    "q160_ewma_anomaly",
    "q161_association_rules",
    "q162_readability",
    "q163_winsorize",
    "q165_pareto_frontier",
    "q166_triangles",
    "q169_decayed_engagement",
    "q170_path_trigrams",
    "q171_gap_regularity",
    "q172_doc_keywords",
    "q173_chi2_independence",
    "q174_mmr_diversify",
    "q175_source_length_quantiles",
    "q176_term_clusters",
    "q177_benford",
    "q178_conversion_time",
    "q179_dow_profile",
    "q180_coverage_select",
    "q181_cohen_kappa",
    "q182_pseudonymize_audit",
    "q183_k_anonymity",
    "q185_bucket_balance",
    "q186_split_balance",
    "q187_centroid_drift",
    "q188_attribution",
    "q189_transition_drift",
    "q190_ctx_sweep",
    "q191_vocab_tail",
    "q192_jl_audit",
    "q193_ece_calibration",
    "q194_ks_drift",
    "q195_rfm_segments",
    "q196_markov_attribution",
    "q197_survival",
    "q198_intrinsic_dim",
    "q199_doremi_weights",
    "q200_term_burstiness",
    "q201_markov_entropy",
    "q202_hill_tail",
    "q203_top_eigen",
    "q204_cusum",
    "q205_spearman",
    "q206_halflife",
    "q207_chao1",
    "q208_lang_source_mi",
    "q209_regional_revenue",
    "q210_ab_conversion",
    "q211_time_spine",
    "q212_char_bigram_entropy",
    "q213_crossplit_nll",
    "q214_wilson_ci",
    "q215_daily_acf",
    "q216_revenue_concentration",
    "q217_hubness",
    "q218_ucb_source_rank",
    "q219_daily_jsd",
    "q220_cramers_v",
    "q221_dow_bands",
    "q222_head_churn",
    "q223_negative_sampling",
    "q224_sample_size",
    "q225_event_dedup_audit",
    "q226_sole_late_supplier",
    "q227_l_diversity",
    "q228_cap_sweep",
    "q229_feature_hash_collisions",
    "q230_mann_kendall",
    "q231_sparse_cosine",
    "q232_partition_advisor",
    "q233_assortativity",
    "q234_yoy_growth",
    "q235_best_split",
    "q236_stump_eval",
    "q237_seasonal_strength",
    "q238_user_entropy",
    "q241_shipping_priority",
    "q242_revenue_forecast",
    "q243_nation_trade_volume",
    "q244_market_share",
    "q245_product_profit",
    "q246_returned_items",
    "q247_order_count_distribution",
    "q248_promo_revenue",
    "q249_top_supplier",
    "q250_small_qty_revenue",
    "q251_large_volume_customers",
    "q252_discounted_revenue",
    "q253_dormant_customers",
    "q254_min_unit_price_supplier",
    "q255_important_part_value",
    "q256_pricing_summary",
    "q257_late_order_priority",
    "q258_part_supplier_counts",
    "q259_excess_shippers",
    "q260_zorder_layout",
    "q261_centroid_silhouette",
    "q262_adamic_adar",
    "q263_theil_sen_trend",
    "q264_layout_advisor",
    "q265_changepoint",
    "q266_kcore",
    "q267_hampel_outliers",
    "q268_compaction_plan",
    "q269_conformal_coverage",
    "q270_loso_influence",
    "q271_shipmode_priority",
    "q272_brand_rules",
    "q273_salt_advisor",
    "q274_xcorr_leadlag",
    "q275_top2_eigen",
    "q276_hll_audit",
    "q277_brier_decomposition",
    "q278_component_census",
    "q279_join_advisor",
    "q280_sample_quantile_audit",
    "q281_shuffle_balance",
    "q282_partial_corr",
    "q283_theil_decomposition",
    "q284_object_lifetimes",
    "q285_rollup_census",
    "q286_robust_profile",
    "q287_hll_window_merge",
    "q288_kmv_jaccard",
    "q289_rpo_gaps",
    "q290_histogram_pctile",
    "q291_deletion_impact",
    "q292_median_ci",
    "q293_delete_batches",
    "q294_dataset_card",
    "q295_backup_growth",
    "q296_readability",
    "q297_pit_features",
    "q298_linear_attribution",
    "q299_linear_mmd",
    "q300_curation_funnel",
]


def _pinned_shuffle_partitions(sf: float) -> int:
    """Per-SF shuffle sizing so partition counts (and therefore per-task
    input sizes) are stable run-to-run instead of inheriting whatever
    SPARK_GRAFT_CPUS implies: ~CPU-count at the test SFs, scaled up once
    data outgrows them (the same rule a cluster job would apply:
    partitions ≈ max(cores, data / target-partition-size))."""
    if sf >= 1:
        return 64
    return 32


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Optional subset for local smoke runs: comma-separated names, or a
    # prefix ending in '*' (e.g. "q24*"). Default (unset) runs everything.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    bench_queries = BENCH_QUERIES
    if subset:
        names = [s.strip() for s in subset.split(",") if s.strip()]
        picked: list[str] = []
        for pat in names:
            if pat.endswith("*"):
                picked.extend(
                    q for q in BENCH_QUERIES if q.startswith(pat[:-1])
                )
            elif pat in BENCH_QUERIES:
                picked.append(pat)
        bench_queries = picked
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(
        "esop-bench", shuffle_partitions=_pinned_shuffle_partitions(sf)
    )
    qs = entry_mod.queries()

    # Warm the JVM, parquet footers, and the cached fixture derivation so
    # per-query numbers measure the steady-state plan, not first-touch
    # JIT/IO/cache-materialization (two passes: the first materializes the
    # manifest_entries cache, the second warms codegen).
    for _ in range(2):
        qs["q01_list_backups"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # one untimed warmup per query (codegen/JIT for THAT plan), then 5 timed
    # trials. "queries" stays best-of-first-3 (comparable with earlier
    # rounds); "queries_median" is the median of all 5 — the
    # variance-honest stat (cheap queries swing up to 2x run-to-run, so a
    # best-of-N-only report can manufacture methodology-only "wins").
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in bench_queries:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            trials.append(time.perf_counter() - t0)
        timings[name] = round(min(trials[:3]), 3)
        medians[name] = round(sorted(trials)[2], 3)

    total = round(sum(timings.values()), 3)

    # Stop the JVM BEFORE printing the result line. Spark shares our stdout;
    # a >4 KB print is not an atomic pipe write, so a still-running JVM can
    # interleave shutdown log lines mid-JSON and corrupt the one line the
    # harness parses (exactly what happened once the suite outgrew ~150
    # queries). With the JVM gone, ours is the only writer.
    spark.stop()

    # The machine-parsed stdout line must stay well under 4 KB (the driver's
    # capture truncates past that: BENCH_r03..r05 all came back parsed:null
    # once the suite outgrew ~150 queries). So the primary line carries only
    # the totals + the 10 slowest queries; the FULL per-query best-of-3 and
    # median maps go to BENCH_DETAIL.json in the repo, committed each round.
    median_total = round(sum(medians.values()), 3)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "median_total_seconds": median_total,
                "sf": sf,
                "n_queries": len(timings),
                "queries": timings,
                "queries_median": medians,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "median_total_seconds": median_total,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
