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

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_kafka_project_spark import cache

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle) under ``name``.

    The REGISTERED callable is wrapped with the materialization
    lifecycle (``cache.begin_query``): invoking a different query —
    or the same name against a different sf_dir — through the registry
    releases the persisted AND localCheckpoint intermediates the
    previous query left behind, so a long-lived session serving many
    queries holds at most one query's blocks (the round-8 100x sweep
    OOMed a 16 GB driver heap on exactly this accumulation, and the
    checkpoint class additionally survives clearCache).
    The decorator returns the UNWRAPPED builder, so direct module
    imports (tests, composition inside other builders) see no
    lifecycle side effects.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # ownership keyed on (name, sf_dir): the scale-stress
            # big/base protocol runs one name against two datasets —
            # a name-only key would keep both datasets' blocks live
            cache.begin_query(name, sf_dir)
            return fn(spark, sf_dir)

        QUERIES[name] = run
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
# The window is machine-computed each round by
# tools/plan_gate_rotation.py from the CORRECTNESS_r*.json history
# (verify with --check); the full permutation below is its output.
# STANDING RULES: never-checked or changed-this-round names front the
# window; after that order by staleness (oldest driver row first);
# no-oracle names always sort after every oracle-backed name.
# Every name stays present regardless — this is a permutation, not a
# filter; names not listed here sort after the listed ones.
_GATE_PRIORITY: list[str] = [
    # -- ROUND-14 WINDOW (round-13 verdict item 3; computed by
    #    tools/plan_gate_rotation.py --changed doc_winnow_fingerprints,
    #    dedup_ngram_jaccard,dedup_simhash,dedup_simhash_pairs,
    #    dedup_near_keep,dedup_components,dedup_levenshtein_verify).
    #    Tier 1: the seven names whose registered plan or oracle
    #    changed this round — the winnow flat-Horner oracle rewrite,
    #    the int64 shingle/token-hash exchanges (jaccard_pairs /
    #    simhash) and the simhash filter-before-dedup fix — front
    #    the window; then oracle-backed names by staleness (oldest
    #    newest-driver-row first, alphabetical within a round). --
    "doc_winnow_fingerprints",  # changed-this-round (r9)
    "dedup_ngram_jaccard",  # changed-this-round (r9)
    "dedup_simhash",  # changed-this-round (r11)
    "dedup_simhash_pairs",  # changed-this-round (r11)
    "dedup_near_keep",  # changed-this-round (r12)
    "dedup_components",  # changed-this-round (r12)
    "dedup_levenshtein_verify",  # changed-this-round (r13)
    "dedup_normalized_groups",  # r9
    "doc_chunks",  # r9
    "doc_fingerprint_md5",  # r9
    "doc_host_stats",  # r9
    "doc_ngram_novelty",  # r9
    "doc_pack_assignments",  # r9
    "doc_pii_redact",  # r9
    "doc_quality_filter",  # r9
    "doc_repetition_stats",  # r9
    "doc_source_quality_gate",  # r9
    "doc_split_assign",  # r9
    "doc_uniform_sample",  # r9
    "doc_unigram_logprob",  # r9
    "doc_url_canonical",  # r9
    "embedding_index_pipeline",  # r9
    "embedding_label_centroids",  # r9
    "embedding_norms",  # r9
    "embedding_pca_project",  # r9
    "embedding_quantize_int8",  # r9
    "event_value_anomalies",  # r9
    "group_minmax_norm",  # r9
    "heavy_hitter_tokens",  # r9
    "media_audio_features",  # r9
    "media_catalog",  # r9
    "media_decode_features",  # r9
    "media_frame_sample",  # r9
    "media_resize",  # r9
    "similarity_ann_recall",  # r9
    "similarity_pairs_above",  # r9
    "skewed_salted_segment_revenue",  # r9
    "text_index_topk",  # r9
    "asof_join_cogrouped",  # r10
    "benford_price_audit",  # r10
    "bloom_semi_join_revenue",  # r10
    "brand_copurchase_lift",  # r10
    "cdc_debezium_roundtrip",  # r10
    "customer_rfm_quantile_scores",  # r10
    "customer_rfm_segments",  # r10
    "daily_revenue_acf",  # r10
    "doc_boilerplate_fraction",  # r10
    "doc_nb_quality_score",  # r10
    "doc_readability",  # r10
    "doc_sliding_chunks",  # r10
    # -- BEHIND THE ROTATION, by staleness (oldest driver row
    #    first, alphabetical within a round): r10 remainder, then
    #    r11 / r12 / r13 tiers. Every name is oracle-backed as of
    #    r13, so the no-oracle tail rule is vacuously satisfied. --
    "embedding_label_outliers",  # r10 (displaced by the wider r14 fronted tier)
    "event_top_paths",  # r10 (displaced by the wider r14 fronted tier)
    "event_transition_matrix",  # r10 (displaced by the wider r14 fronted tier)
    "event_value_mad_outliers",  # r10 (displaced by the wider r14 fronted tier)
    "forecast_backtest_snaive",  # r10 (displaced by the wider r14 fronted tier)
    "gapfill_linear_interp",
    "histogram_prices",
    "hopping_event_counts",
    "ivm_join_delta_revenue",
    "join_size_estimate",
    "key_skew_report",
    "lang_id",
    "langid_confusion",
    "lateral_topk_per_customer",
    "media_phash_dup_pairs",
    "null_semantics_probe",
    "order_priority_chi2",
    "pagerank_brand_copurchase",
    "part_pareto_frontier",
    "salted_join_segment_revenue",
    "session_stats",
    "sessionize",
    "sketch_distinct_users",
    "sketch_percentiles",
    "source_quota_sample",
    "source_weighted_sample",
    "text_stats",
    "token_count_regex",
    "weekly_retention_cohorts",
    "weekly_revenue_wow",
    "asof_last_purchase",
    "bm25_topk",
    "cdc_incremental_scan",
    "cdc_json_decode",
    "cdc_json_encode",
    "cdc_latest_state",
    "cdc_merge_upsert",
    "cdc_replica",
    "cdc_running_totals",
    "cdc_snapshot_diff",
    "cdc_validate_dlq",
    "cohort_ltv_curve",
    "conversion_curve",
    "curation_funnel_report",
    "curation_pipeline",
    "dedup_minhash_index_probe",
    "doc_bpe_token_counts",
    "event_value_psi_drift",
    "funnel_view_click_purchase",
    "lang_temperature_sample",
    "price_qty_regression",
    "purchase_click_attribution",
    "purchase_rate_wilson_ci",
    "q21_waiting_suppliers",
    "recursive_brand_reachability",
    "revenue_gini_by_segment",
    "revenue_seasonality_decomp",
    "rolling_median_revenue",
    "semantic_decontaminate",
    "similarity_near_dup",
    "similarity_semdedup_keep",
    "sketch_incremental_distinct",
    "sketch_user_overlap",
    "source_distinctive_terms",
    "source_token_quota_sample",
    "supplier_hhi_by_nation",
    "text_tfidf_top_terms",
    "theilsen_revenue_slope",
    "user_growth_accounting",
    "vocab_growth_curve",
    "weekend_effect_ttest",
    "zipf_slope",
    "anti_join_no_big_orders",
    "cdc_incremental_agg",
    "cdc_scd2_history",
    "cdc_time_travel",
    "cdc_validate_valid",
    "conditional_aggs",
    "corpus_source_report",
    "cube_agg",
    "date_exprs",
    "dedup_incremental_new_docs",
    "dedup_minhash_lsh",
    "denormalized_order_lines",
    "doc_bigram_logprob",
    "doc_decontaminate",
    "doc_fingerprint_xx",
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
    "asof_join_next_purchase",
    "asof_join_purchases",
    "bpe_merge_ranks",
    "column_profile",
    "corr_lineitem_measures",
    "dedup_exact_groups",
    "dedup_exact_keep",
    "dedup_keep_longest",
    "distinct_counts",
    "doc_contamination_hits",
    "event_props_extract",
    "event_props_typed",
    "exact_moments",
    "grouped_floor_sum",
    "grouping_sets_sql",
    "in_list_filter",
    "latest_event_per_user",
    "outer_join_nation_counts",
    "percentile_prices",
    "pivot_qty",
    "q10_returned_revenue",
    "q11_part_value_share",
    "q13_customer_distribution",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q20_volume_suppliers",
    "q22_idle_rich_customers",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "range_join_price_bands",
    "rollup_agg",
    "salted_event_type_totals",
    "scalar_exprs",
    "semi_join_big_spenders",
    "set_except_keys",
    "set_intersect_keys",
    "set_union_active_keys",
    "similarity_ann_ivf",
    "similarity_ann_lsh",
    "similarity_ann_pq",
    "similarity_topk",
    "string_funcs",
    "token_frequency_top100",
    "topk_orders",
    "tumbling_hourly_agg",
    "window_running_sum",
    "window_topn_per_group",
    "word_bigrams_top100",
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
