"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (plus the north-star
extensions) registers here as a named query:

* a callable ``(spark, sf_dir) -> DataFrame`` (the Spark implementation)
* optionally an ANSI-SQL oracle string for DuckDB (same tables as
  pre-registered views). Queries without an oracle get the driver's
  weaker rows-only check — reserved for genuinely non-SQL-expressible
  ops (MinHash banding, SimHash, LSH bucketing).

Parity rules (driver hash-compares values after sorting columns by
name):
* identical output column names on both sides (alias everything);
* no raw timestamp columns in outputs — format to string or cast to
  date (Spark session tz is pinned UTC to match DuckDB's naive ts);
* double aggregates go through exact DECIMAL sums (functions.dsum) and
  the oracle mirrors with CAST(SUM(CAST(x AS DECIMAL(25,2))) AS DOUBLE);
* DuckDB SUM(BIGINT) returns HUGEINT — oracles cast back to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: registration)."""
    from cdc_kafka_project_spark.queries import (  # noqa: F401
        cdc_surface,
        relational,
        relational_ext,
        scale_patterns,
        text_analysis,
        dedup,
        similarity,
        multimodal,
        pipeline,
        retrieval,
        temporal,
        stats_analytics,
        graph,
    )


# Driver-gate ordering. The per-round correctness gate checks queries in
# dict order and covers a bounded prefix (~50 names), so the registry
# orders the checked dict explicitly rather than relying on module
# import order. STANDING RULE (round-2 verdict): every query that has
# never landed a driver CORRECTNESS row — or whose code changed this
# round — goes in FRONT of the window (tier 0), new queries prepended.
# ROTATION RULE (round-4 verdict): after tier 0, order by STALENESS —
# the driver regenerates testdata between rounds, so the names whose
# newest CORRECTNESS row is oldest re-verify first. Entering round 5
# that is the r1-era tier (49 names), then r2 (10), then r3 (24); the
# 50 names freshly green in CORRECTNESS_r04 sort last.
# Every name stays present regardless — this is a permutation, not a
# filter; names not listed here sort after the listed ones.
_GATE_PRIORITY: list[str] = [
    # -- tier 0: round-5 new queries (prepended as added) and queries
    #    whose implementation changed this round (need a fresh row
    #    under the new code path). --
    "event_value_psi_drift",
    "supplier_hhi_by_nation",
    "curation_funnel_report",
    "langid_confusion",
    "null_semantics_probe",
    "forecast_backtest_snaive",
    "theilsen_revenue_slope",
    "cohort_ltv_curve",
    "purchase_rate_wilson_ci",
    "embedding_label_outliers",
    "weekend_effect_ttest",
    "conversion_curve",
    "event_top_paths",
    "revenue_gini_by_segment",
    "user_growth_accounting",
    "ivm_join_delta_revenue",
    "lateral_topk_per_customer",
    "recursive_brand_reachability",
    "rolling_median_revenue",
    "part_pareto_frontier",
    "revenue_seasonality_decomp",
    "pagerank_brand_copurchase",
    "customer_rfm_quantile_scores",
    "price_qty_regression",
    "customer_rfm_segments",
    "event_transition_matrix",
    "benford_price_audit",
    "order_priority_chi2",
    "daily_revenue_acf",
    "hopping_event_counts",
    "bloom_semi_join_revenue",
    "cdc_debezium_roundtrip",
    "asof_join_cogrouped",
    "key_skew_report",
    "doc_sliding_chunks",
    "join_size_estimate",
    "event_value_mad_outliers",
    "sketch_user_overlap",
    "gapfill_linear_interp",
    "doc_nb_quality_score",
    "vocab_growth_curve",
    "dedup_minhash_index_probe",
    "doc_boilerplate_fraction",
    "source_token_quota_sample",
    "semantic_decontaminate",
    "purchase_click_attribution",
    "doc_readability",
    "zipf_slope",
    "brand_copurchase_lift",
    "source_distinctive_terms",
    "user_spend_ewma",
    "embedding_binary_quantize",
    "similarity_hamming_rerank",
    "bpe_merge_ranks",
    "doc_bpe_token_counts",
    "winsorized_price_stats",
    "shard_assignment_by_bytes",
    "corpus_source_report",
    "embedding_index_pipeline",
    "denormalized_order_lines",
    "sketch_incremental_distinct",
    "feature_quantile_buckets",
    "feature_label_index",
    "doc_bigram_logprob",
    "fk_integrity_audit",
    "event_value_drift_kl",
    "event_props_variant",
    "session_window_native",
    "unpivot_lineitem_measures",
    "split_leakage_audit",
    "lang_source_pmi",
    "interval_incident_event_stats",
    "interval_incident_overlap_pairs",
    "gapfill_daily_revenue",
    "embedding_matryoshka_fidelity",
    "similarity_ann_recall",
    "doc_span_dedup",
    "doc_stratified_split",
    "media_phash_dup_pairs",
    "bm25_topk",
    "text_index_topk",
    "hard_negative_mining",
    "dedup_incremental_new_docs",
    "rolling_7d_user_spend",
    "lang_temperature_sample",
    "dedup_exact_keep",
    "dedup_levenshtein_verify",
    "similarity_near_dup",
    "similarity_semdedup_keep",
    "doc_host_stats",
    # -- tier 1 (staleness: last driver row r1, on a long-gone testdata
    #    generation). CDC surface first — SURVEY §2's core semantics
    #    currently rest entirely on r1 rows — then q-series, set ops,
    #    windows, scalar/date surfaces. --
    "cdc_incremental_scan",
    "cdc_latest_state",
    "cdc_replica",
    "cdc_validate_valid",
    "cdc_validate_dlq",
    "cdc_json_decode",
    "cdc_json_encode",
    "cdc_merge_upsert",
    "cdc_running_totals",
    "asof_last_purchase",
    "q1_pricing_summary",
    "q2_min_price_per_type",
    "q3_shipping_priority",
    "q4_priority_exists",
    "q5_region_revenue",
    "q6_revenue_delta",
    "q12_priority_case_agg",
    "q14_promo_share",
    "q15_top_suppliers",
    "q16_supplier_variety",
    "q17_small_qty_avg",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_idle_rich_customers",
    "topk_orders",
    "set_union_active_keys",
    "set_intersect_keys",
    "set_except_keys",
    "semi_join_big_spenders",
    "anti_join_no_big_orders",
    "outer_join_nation_counts",
    "range_join_price_bands",
    "in_list_filter",
    "distinct_counts",
    "grouped_floor_sum",
    "scalar_exprs",
    "string_funcs",
    "date_exprs",
    "pivot_qty",
    "cube_agg",
    "rollup_agg",
    "percentile_prices",
    "conditional_aggs",
    "window_running_sum",
    "window_topn_per_group",
    "tumbling_hourly_agg",
    "latest_event_per_user",
    "event_props_extract",
    "event_props_typed",
    # -- tier 2 (staleness: last driver row r2) --
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q11_part_value_share",
    "q20_volume_suppliers",
    "q21_waiting_suppliers",
    "exact_moments",
    "grouping_sets_sql",
    "salted_event_type_totals",
    "token_frequency_top100",
    # -- tier 3 (staleness: last driver row r3) --
    "cdc_incremental_agg",
    "cdc_scd2_history",
    "cdc_time_travel",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "dedup_components",
    "dedup_near_keep",
    "dedup_simhash_pairs",
    "doc_contamination_hits",
    "doc_decontaminate",
    "embedding_norms",
    "embedding_quantize_int8",
    "similarity_topk",
    "similarity_pairs_above",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "media_catalog",
    "media_decode_features",
    "media_resize",
    "media_frame_sample",
    "media_audio_features",
    "text_tfidf_top_terms",
    "word_bigrams_top100",
    # -- tier 4 (fresh: green in CORRECTNESS_r04 on current-generation
    #    testdata; re-checked as slots allow) --
    "sessionize",
    "column_profile",
    "asof_join_purchases",
    "asof_join_next_purchase",
    "doc_unigram_logprob",
    "doc_source_quality_gate",
    "doc_uniform_sample",
    "source_weighted_sample",
    "corr_lineitem_measures",
    "funnel_view_click_purchase",
    "weekly_retention_cohorts",
    "session_stats",
    "weekly_revenue_wow",
    "salted_join_segment_revenue",
    "heavy_hitter_tokens",
    "dedup_normalized_groups",
    "doc_url_canonical",
    "embedding_pca_project",
    "curation_pipeline",
    "event_value_anomalies",
    "dedup_keep_longest",
    "doc_ngram_novelty",
    "doc_pii_redact",
    "doc_split_assign",
    "histogram_prices",
    "similarity_ann_pq",
    "embedding_label_centroids",
    "group_minmax_norm",
    "sketch_distinct_users",
    "sketch_percentiles",
    "cdc_snapshot_diff",
    "text_stats",
    "token_count_regex",
    "lang_id",
    "doc_fingerprint_md5",
    "doc_fingerprint_xx",
    "doc_winnow_fingerprints",
    "doc_quality_filter",
    "source_quota_sample",
    "doc_chunks",
    "doc_pack_assignments",
    "doc_repetition_stats",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
]


def _gate_order(names: list[str]) -> list[str]:
    rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    listed = [n for n in _GATE_PRIORITY if n in set(names)]
    rest = [n for n in names if n not in rank]
    return listed + rest


def all_queries() -> dict[str, QueryFn]:
    load_all()
    missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
    if missing:
        # explicit raise, not assert: the guard must survive python -O
        raise RuntimeError(
            f"_GATE_PRIORITY names queries that are not registered: {missing}"
            " — the priority list must stay an accurate record of the gate"
        )
    return {n: QUERIES[n] for n in _gate_order(list(QUERIES))}


def all_oracles() -> dict[str, str]:
    load_all()
    return {n: ORACLES[n] for n in _gate_order(list(ORACLES))}
