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
# ROUND-6 ORDER (round-5 verdict items 2+3): pure catch-up. Tier 0a =
# the 29 oracle-backed names that have never had a driver row; tier 0b =
# 21 r1-era names (CDC core first) — together exactly the 50-slot
# window. Then changed-this-round names, the rest of the r1 tier, r2,
# r3, then the r4/r5-fresh names, and ALL no-oracle names dead last.
# STANDING RULES (apply again from round 7): never-checked or
# changed-this-round names front the window; after that order by
# staleness (oldest driver row first); no-oracle names always sort
# after every oracle-backed name.
# Every name stays present regardless — this is a permutation, not a
# filter; names not listed here sort after the listed ones.
_GATE_PRIORITY: list[str] = [
    # -- tier 0a (round-6 catch-up gate, per the round-5 verdict:
    #    REGISTRY GROWTH FROZEN this round; the whole ~50-slot window
    #    goes to names with no driver row yet or r1-era rows). These 29
    #    are oracle-backed session-3 additions that have never had a
    #    driver CORRECTNESS row. --
    "event_props_variant",
    "session_window_native",
    "unpivot_lineitem_measures",
    "winsorized_price_stats",
    "shard_assignment_by_bytes",
    "denormalized_order_lines",
    "feature_quantile_buckets",
    "feature_label_index",
    "fk_integrity_audit",
    "event_value_drift_kl",
    "doc_span_dedup",
    "doc_stratified_split",
    "split_leakage_audit",
    "lang_source_pmi",
    "corpus_source_report",
    "doc_bigram_logprob",
    "embedding_matryoshka_fidelity",
    "embedding_binary_quantize",
    "similarity_hamming_rerank",
    "media_phash_dup_pairs",
    "bm25_topk",
    "hard_negative_mining",
    "dedup_incremental_new_docs",
    "rolling_7d_user_spend",
    "lang_temperature_sample",
    "interval_incident_event_stats",
    "interval_incident_overlap_pairs",
    "gapfill_daily_revenue",
    "user_spend_ewma",
    # -- tier 0b: r1-era CDC core + q-series (last driver row is r1,
    #    four testdata generations old — SURVEY §2's core semantics
    #    re-verify on current data). 29 + 21 = 50 = the gate window. --
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
    # -- changed-this-round names (standing rule would put these in
    #    front, but the round-5 verdict's catch-up gate takes priority;
    #    they sit just past the window and lead the r7 rotation).
    #    supplier_hhi_by_nation: oracle expression-tree fix;
    #    bloom_semi_join_revenue: operator join-ambiguity fix;
    #    sketch_user_overlap / dedup_minhash_index_probe: exact-twin
    #    columns added (now oracle-backed). --
    "supplier_hhi_by_nation",
    "bloom_semi_join_revenue",
    "sketch_user_overlap",
    "dedup_minhash_index_probe",
    # -- remaining r1-era names (staleness rotation continues here
    #    in round 7) --
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
    "window_topn_per_group",
    "window_running_sum",
    "tumbling_hourly_agg",
    "percentile_prices",
    "cube_agg",
    "q18_large_orders",
    "q22_idle_rich_customers",
    "q19_disjunctive_pred",
    "range_join_price_bands",
    "set_intersect_keys",
    "string_funcs",
    "date_exprs",
    "event_props_extract",
    "latest_event_per_user",
    "conditional_aggs",
    "event_props_typed",
    # -- r2-era --
    "q7_nation_volume",
    "q21_waiting_suppliers",
    "q8_market_share",
    "q9_product_profit",
    "q11_part_value_share",
    "q20_volume_suppliers",
    "salted_event_type_totals",
    "token_frequency_top100",
    "grouping_sets_sql",
    "exact_moments",
    # -- r3-era (oracle-backed only; rows-only names sort last) --
    "cdc_scd2_history",
    "cdc_incremental_agg",
    "cdc_time_travel",
    "q13_customer_distribution",
    "q10_returned_revenue",
    "text_tfidf_top_terms",
    "word_bigrams_top100",
    "dedup_near_keep",
    "dedup_components",
    "doc_contamination_hits",
    "doc_decontaminate",
    "similarity_topk",
    "embedding_norms",
    "embedding_quantize_int8",
    "similarity_pairs_above",
    "media_catalog",
    "media_decode_features",
    "media_resize",
    "media_frame_sample",
    "media_audio_features",
    # -- fresh: green in CORRECTNESS_r05 on current-generation data --
    "cdc_debezium_roundtrip",
    "ivm_join_delta_revenue",
    "asof_join_cogrouped",
    "brand_copurchase_lift",
    "key_skew_report",
    "join_size_estimate",
    "event_value_mad_outliers",
    "lateral_topk_per_customer",
    "recursive_brand_reachability",
    "null_semantics_probe",
    "doc_sliding_chunks",
    "doc_nb_quality_score",
    "vocab_growth_curve",
    "doc_boilerplate_fraction",
    "source_token_quota_sample",
    "doc_readability",
    "zipf_slope",
    "source_distinctive_terms",
    "langid_confusion",
    "semantic_decontaminate",
    "embedding_label_outliers",
    "curation_funnel_report",
    "purchase_click_attribution",
    "gapfill_linear_interp",
    "price_qty_regression",
    "customer_rfm_segments",
    "event_transition_matrix",
    "benford_price_audit",
    "order_priority_chi2",
    "daily_revenue_acf",
    "hopping_event_counts",
    "customer_rfm_quantile_scores",
    "revenue_seasonality_decomp",
    "rolling_median_revenue",
    "part_pareto_frontier",
    "user_growth_accounting",
    "conversion_curve",
    "event_top_paths",
    "revenue_gini_by_segment",
    "weekend_effect_ttest",
    "cohort_ltv_curve",
    "purchase_rate_wilson_ci",
    "forecast_backtest_snaive",
    "theilsen_revenue_slope",
    "event_value_psi_drift",
    "pagerank_brand_copurchase",
    # -- fresh-ish: green in CORRECTNESS_r04 --
    "cdc_snapshot_diff",
    "sessionize",
    "asof_join_purchases",
    "asof_join_next_purchase",
    "funnel_view_click_purchase",
    "weekly_retention_cohorts",
    "session_stats",
    "weekly_revenue_wow",
    "group_minmax_norm",
    "histogram_prices",
    "column_profile",
    "corr_lineitem_measures",
    "salted_join_segment_revenue",
    "heavy_hitter_tokens",
    "event_value_anomalies",
    "text_stats",
    "token_count_regex",
    "lang_id",
    "doc_fingerprint_md5",
    "doc_winnow_fingerprints",
    "doc_quality_filter",
    "source_quota_sample",
    "doc_chunks",
    "doc_repetition_stats",
    "doc_pii_redact",
    "doc_host_stats",
    "doc_split_assign",
    "doc_unigram_logprob",
    "doc_source_quality_gate",
    "doc_uniform_sample",
    "source_weighted_sample",
    "doc_url_canonical",
    "dedup_exact_groups",
    "dedup_exact_keep",
    "dedup_ngram_jaccard",
    "dedup_normalized_groups",
    "dedup_levenshtein_verify",
    "dedup_keep_longest",
    "doc_ngram_novelty",
    "embedding_label_centroids",
    "curation_pipeline",
    # -- no-oracle names, ALWAYS LAST (round-5 verdict item 3: the
    #    driver has no rows-only fallback — a no-oracle name in the
    #    window burns a slot and records err). Each is pinned by pytest
    #    bounds and/or an oracle-green exact twin. --
    "sketch_distinct_users",
    "sketch_percentiles",
    "sketch_incremental_distinct",
    "doc_fingerprint_xx",
    "doc_pack_assignments",
    "bpe_merge_ranks",
    "doc_bpe_token_counts",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "similarity_ann_lsh",
    "similarity_near_dup",
    "similarity_ann_ivf",
    "similarity_ann_pq",
    "similarity_semdedup_keep",
    "embedding_pca_project",
    "similarity_ann_recall",
    "embedding_index_pipeline",
    "text_index_topk",
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
