"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (plus the north-star
extensions) registers here as a named query:

* a callable ``(spark, sf_dir) -> DataFrame`` (the Spark implementation)
* optionally an ANSI-SQL oracle string for DuckDB (same tables as
  pre-registered views). Queries without an oracle are SKIPPED by the
  driver's hash gate (it records ``err: "no_oracle"`` — there is no
  rows-only fallback, per the round-5 verdict), so no-oracle names are
  reserved for genuinely non-SQL-expressible ops (MinHash banding,
  SimHash, LSH bucketing), each pinned by pytest bounds and/or an
  oracle-green exact twin, and they sort BEHIND every oracle-backed
  name in the gate order so they never burn a gate slot.

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
# dict order and covers a bounded prefix (exactly 50 names in r5), so
# the registry orders the checked dict explicitly rather than relying on
# module import order.
# ROUND-7 ORDER (round-6 verdict item 1): pure staleness rotation.
# The 50-slot window = the 28 r1-era + 10 r2-era + 12 oldest r3-era
# oracle-backed names (no name's last driver row is newer than r3).
# STANDING RULES (resume from round 8): never-checked or
# changed-this-round names front the window; after that order by
# staleness (oldest driver row first); no-oracle names always sort
# after every oracle-backed name.
# Every name stays present regardless — this is a permutation, not a
# filter; names not listed here sort after the listed ones.
_GATE_PRIORITY: list[str] = [
    # -- ROUND-7 WINDOW (round-6 verdict item 1: the entire 50-slot
    #    driver gate goes to the OLDEST driver rows; registry frozen
    #    apart from oracle conversions appended BEHIND the rotation).
    #    Tier 1: the 28 r1-era names — 4 testdata generations stale;
    #    these carry SURVEY §2 ops 2/4/6/13/23/24/25. --
    "grouped_floor_sum",
    "distinct_counts",
    "rollup_agg",
    "pivot_qty",
    "scalar_exprs",
    "in_list_filter",
    "topk_orders",
    "semi_join_big_spenders",
    "anti_join_no_big_orders",
    "outer_join_nation_counts",
    "set_union_active_keys",
    "set_except_keys",
    "set_intersect_keys",
    "window_topn_per_group",
    "window_running_sum",
    "tumbling_hourly_agg",
    "percentile_prices",
    "cube_agg",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q22_idle_rich_customers",
    "range_join_price_bands",
    "string_funcs",
    "date_exprs",
    "event_props_extract",
    "event_props_typed",
    "latest_event_per_user",
    "conditional_aggs",
    # -- Tier 2: the 10 r2-era names (TPC-H q7-q21 tier, salting,
    #    token frequency, grouping sets, exact moments). --
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q11_part_value_share",
    "q20_volume_suppliers",
    "q21_waiting_suppliers",
    "salted_event_type_totals",
    "token_frequency_top100",
    "grouping_sets_sql",
    "exact_moments",
    # -- Tier 3: the 12 oldest r3-era oracle-backed names (CDC
    #    history/time-travel, q10/q13, tf-idf, dedup graph tiers).
    #    28 + 10 + 12 = 50 = the driver gate window. --
    "cdc_scd2_history",
    "cdc_incremental_agg",
    "cdc_time_travel",
    "q10_returned_revenue",
    "q13_customer_distribution",
    "text_tfidf_top_terms",
    "word_bigrams_top100",
    "dedup_near_keep",
    "dedup_components",
    "doc_contamination_hits",
    "doc_decontaminate",
    "similarity_topk",
    # -- BEHIND THE ROTATION (lead the r8 window): rows-only→oracle
    #    conversions land here as they are made (never driver-checked
    #    as oracles), then the four r6-changed names whose last driver
    #    row is r5, then the 8 remaining r3-era names. After r8 covers
    #    these ~12-15, no oracle-backed name rests on a row older than
    #    two generations. --
    "sketch_incremental_distinct",
    "similarity_ann_recall",
    "text_index_topk",
    "skewed_salted_segment_revenue",
    "sketch_distinct_users",
    "sketch_percentiles",
    "doc_pack_assignments",
    "embedding_index_pipeline",
    "embedding_pca_project",
    "doc_bpe_token_counts",
    "similarity_semdedup_keep",
    "similarity_near_dup",
    "sketch_user_overlap",
    "dedup_minhash_index_probe",
    "supplier_hhi_by_nation",
    "bloom_semi_join_revenue",
    "embedding_norms",
    "embedding_quantize_int8",
    "media_audio_features",
    "media_catalog",
    "media_decode_features",
    "media_frame_sample",
    "media_resize",
    "similarity_pairs_above",
    # -- r4-era driver rows (oracle-backed) --
    "asof_join_next_purchase",
    "asof_join_purchases",
    "cdc_snapshot_diff",
    "column_profile",
    "corr_lineitem_measures",
    "curation_pipeline",
    "dedup_exact_groups",
    "dedup_exact_keep",
    "dedup_keep_longest",
    "dedup_levenshtein_verify",
    "dedup_ngram_jaccard",
    "dedup_normalized_groups",
    "doc_chunks",
    "doc_fingerprint_md5",
    "doc_host_stats",
    "doc_ngram_novelty",
    "doc_pii_redact",
    "doc_quality_filter",
    "doc_repetition_stats",
    "doc_source_quality_gate",
    "doc_split_assign",
    "doc_uniform_sample",
    "doc_unigram_logprob",
    "doc_url_canonical",
    "doc_winnow_fingerprints",
    "embedding_label_centroids",
    "event_value_anomalies",
    "funnel_view_click_purchase",
    "group_minmax_norm",
    "heavy_hitter_tokens",
    "histogram_prices",
    "lang_id",
    "salted_join_segment_revenue",
    "session_stats",
    "sessionize",
    "source_quota_sample",
    "source_weighted_sample",
    "text_stats",
    "token_count_regex",
    "weekly_retention_cohorts",
    "weekly_revenue_wow",
    # -- r5-era driver rows (oracle-backed) --
    "asof_join_cogrouped",
    "benford_price_audit",
    "brand_copurchase_lift",
    "cdc_debezium_roundtrip",
    "cohort_ltv_curve",
    "conversion_curve",
    "curation_funnel_report",
    "customer_rfm_quantile_scores",
    "customer_rfm_segments",
    "daily_revenue_acf",
    "doc_boilerplate_fraction",
    "doc_nb_quality_score",
    "doc_readability",
    "doc_sliding_chunks",
    "embedding_label_outliers",
    "event_top_paths",
    "event_transition_matrix",
    "event_value_mad_outliers",
    "event_value_psi_drift",
    "forecast_backtest_snaive",
    "gapfill_linear_interp",
    "hopping_event_counts",
    "ivm_join_delta_revenue",
    "join_size_estimate",
    "key_skew_report",
    "langid_confusion",
    "lateral_topk_per_customer",
    "null_semantics_probe",
    "order_priority_chi2",
    "pagerank_brand_copurchase",
    "part_pareto_frontier",
    "price_qty_regression",
    "purchase_click_attribution",
    "purchase_rate_wilson_ci",
    "recursive_brand_reachability",
    "revenue_gini_by_segment",
    "revenue_seasonality_decomp",
    "rolling_median_revenue",
    "semantic_decontaminate",
    "source_distinctive_terms",
    "source_token_quota_sample",
    "theilsen_revenue_slope",
    "user_growth_accounting",
    "vocab_growth_curve",
    "weekend_effect_ttest",
    "zipf_slope",
    # -- r6-era driver rows (freshest) --
    "asof_last_purchase",
    "bm25_topk",
    "cdc_incremental_scan",
    "cdc_json_decode",
    "cdc_json_encode",
    "cdc_latest_state",
    "cdc_merge_upsert",
    "cdc_replica",
    "cdc_running_totals",
    "cdc_validate_dlq",
    "cdc_validate_valid",
    "corpus_source_report",
    "dedup_incremental_new_docs",
    "denormalized_order_lines",
    "doc_bigram_logprob",
    "doc_span_dedup",
    "doc_stratified_split",
    "embedding_binary_quantize",
    "embedding_matryoshka_fidelity",
    "event_props_variant",
    "event_value_drift_kl",
    "feature_label_index",
    "feature_quantile_buckets",
    "fk_integrity_audit",
    "gapfill_daily_revenue",
    "hard_negative_mining",
    "interval_incident_event_stats",
    "interval_incident_overlap_pairs",
    "lang_source_pmi",
    "lang_temperature_sample",
    "media_phash_dup_pairs",
    "q12_priority_case_agg",
    "q14_promo_share",
    "q15_top_suppliers",
    "q16_supplier_variety",
    "q17_small_qty_avg",
    "q1_pricing_summary",
    "q2_min_price_per_type",
    "q3_shipping_priority",
    "q4_priority_exists",
    "q5_region_revenue",
    "q6_revenue_delta",
    "rolling_7d_user_spend",
    "session_window_native",
    "shard_assignment_by_bytes",
    "similarity_hamming_rerank",
    "split_leakage_audit",
    "unpivot_lineitem_measures",
    "user_spend_ewma",
    "winsorized_price_stats",
    # -- no-oracle names, ALWAYS LAST (the driver has no rows-only
    #    fallback — a no-oracle name in the window burns a slot and
    #    records err). Each is pinned by pytest bounds and/or an
    #    oracle-green exact twin. --
    "doc_fingerprint_xx",
    "bpe_merge_ranks",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_ann_pq",
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
