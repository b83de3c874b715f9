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
    )


# Driver-gate ordering. The per-round correctness gate checks queries in
# dict order and covers a bounded prefix (~50 names), so the registry
# orders the checked dict explicitly rather than relying on module
# import order. STANDING RULE (round-2 verdict): every query that has
# never landed a driver CORRECTNESS row goes in FRONT of the window —
# tier 0 below — and each round's new queries are prepended there.
# Every name stays present regardless — this is a permutation, not a
# filter; names not listed here sort after the listed ones.
_GATE_PRIORITY: list[str] = [
    # -- tier 0: queries needing a fresh driver row first. Round-4:
    #    sessionize broke on the regenerated NTZ testdata (fixed in
    #    catalog.load_table) — standing rule puts it at the very front
    #    until its green row lands — followed by every round-4 addition
    #    (as-of joins, LM scoring, sampling, SemDeDup, funnels/cohorts,
    #    salted join, heavy hitters, curation pipeline, ...). --
    "sessionize",
    "column_profile",
    "asof_join_purchases",
    "doc_unigram_logprob",
    "doc_source_quality_gate",
    "similarity_semdedup_keep",
    "doc_uniform_sample",
    "source_weighted_sample",
    "asof_join_next_purchase",
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
    "dedup_levenshtein_verify",
    "dedup_keep_longest",
    "doc_ngram_novelty",
    # round-3 tier 0 (all landed green/rows-only rows in r3):
    "doc_pii_redact",
    "doc_host_stats",
    "doc_split_assign",
    "histogram_prices",
    "similarity_ann_pq",
    "embedding_label_centroids",
    "group_minmax_norm",
    "sketch_distinct_users",
    "sketch_percentiles",
    "cdc_snapshot_diff",
    # -- tier 1: north-star (text, dedup, similarity, multimodal) --
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
    "dedup_exact_keep",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_components",
    "dedup_near_keep",
    "embedding_quantize_int8",
    "similarity_topk",
    "embedding_norms",
    "similarity_ann_lsh",
    "similarity_near_dup",
    "similarity_ann_ivf",
    "similarity_pairs_above",
    "media_catalog",
    "media_decode_features",
    "media_resize",
    "media_frame_sample",
    "media_audio_features",
    # -- tier 2: round-2 additions, all driver-checked by r3; kept
    #    inside the gate's ~50-query window for periodic re-checks --
    "doc_contamination_hits",
    "doc_decontaminate",
    "cdc_scd2_history",
    "cdc_incremental_agg",
    "cdc_time_travel",
    "text_tfidf_top_terms",
    "word_bigrams_top100",
    "q13_customer_distribution",
    "q10_returned_revenue",
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
    # -- tier 3: round-1-green core, re-checked as slots allow --
    "cdc_incremental_scan",
    "cdc_latest_state",
    "cdc_replica",
    "cdc_validate_valid",
    "cdc_validate_dlq",
    "cdc_json_decode",
    "cdc_json_encode",
    "cdc_merge_upsert",
    "cdc_running_totals",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "topk_orders",
    "asof_last_purchase",
]


def _gate_order(names: list[str]) -> list[str]:
    rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    listed = [n for n in _GATE_PRIORITY if n in set(names)]
    rest = [n for n in names if n not in rank]
    return listed + rest


def all_queries() -> dict[str, QueryFn]:
    load_all()
    missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
    assert not missing, (
        f"_GATE_PRIORITY names queries that are not registered: {missing} "
        "— the priority list must stay an accurate record of the gate"
    )
    return {n: QUERIES[n] for n in _gate_order(list(QUERIES))}


def all_oracles() -> dict[str, str]:
    load_all()
    return {n: ORACLES[n] for n in _gate_order(list(ORACLES))}
