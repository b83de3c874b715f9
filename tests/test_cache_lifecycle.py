"""Round-9 persist-lifecycle pins (round-8 verdict item 1).

Before round 9, ~12 query builders persisted model-sized intermediates
(vocab counts, PMI cells, CC edge lists) with no release path; a
long-lived session serving many queries accumulated cached blocks
until the driver heap overflowed (LOCAL_SCALE_r08.md "Cache
accumulation": 16 GB heap OOM ~26 queries in at the 100x replica).
These tests pin the registry-boundary fix (cdc_kafka_project_spark/
cache.py): 30+ queries — including every persisting builder — run in
ONE session and the persistent-RDD map is empty between queries.
"""

from __future__ import annotations

import pytest

from cdc_kafka_project_spark import cache
from cdc_kafka_project_spark.registry import all_queries
from tests.conftest import SF_SMOKE

#: every builder that persists intermediates via scoped_persist
#: (grep `scoped_persist(` in queries/ — update when a site is added)
PERSISTING = [
    "doc_unigram_logprob",
    "lang_source_pmi",
    "doc_bigram_logprob",
    "doc_nb_quality_score",
    "source_distinctive_terms",
    "pagerank_brand_copurchase",
    "gapfill_daily_revenue",
    "gapfill_linear_interp",
    "event_value_drift_kl",
]

#: cheap fillers so the one-session loop covers 30+ registered queries
FILLERS = [
    "q1_pricing_summary",
    "q6_revenue_delta",
    "distinct_counts",
    "in_list_filter",
    "scalar_exprs",
    "string_funcs",
    "date_exprs",
    "grouped_floor_sum",
    "topk_orders",
    "conditional_aggs",
    "exact_moments",
    "percentile_prices",
    "histogram_prices",
    "session_stats",
    "text_stats",
    "token_count_regex",
    "lang_id",
    "doc_quality_filter",
    "doc_chunks",
    "sketch_distinct_users",
    "sketch_percentiles",
]


def _n_persistent(spark) -> int:
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


@pytest.fixture(autouse=True)
def _clean(spark):
    cache.release_caches()
    spark.catalog.clearCache()
    yield
    cache.release_caches()
    spark.catalog.clearCache()


def test_source_has_no_unscoped_persist():
    """Every engine-side persist() must go through scoped_persist so
    the registry can release it — a bare .persist() reintroduces the
    unbounded accumulation this module exists to prevent."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parent.parent / "cdc_kafka_project_spark"
    hits = [
        f"{p.relative_to(pkg)}:{i + 1}"
        for p in pkg.rglob("*.py")
        if p.name != "cache.py"
        for i, ln in enumerate(p.read_text().splitlines())
        if ".persist(" in ln.split("#")[0] or ".cache()" in ln.split("#")[0]
    ]
    assert hits == [], f"unscoped persist/cache (use cache.scoped_persist): {hits}"


def test_one_session_30_queries_empty_between(spark):
    """The verdict's done-criterion: 30+ registered queries (all 9
    persisting builders interleaved with fillers) in ONE session;
    after each query materializes and releases, the JVM persistent-RDD
    map is EMPTY — no block survives into the next query."""
    q = all_queries()
    # interleave so persisting queries are separated by fillers, the
    # serving-session shape that used to accumulate
    names = [n for pair in zip(PERSISTING, FILLERS) for n in pair]
    names += FILLERS[len(PERSISTING):]
    assert len(names) >= 30
    for name in names:
        q[name](spark, SF_SMOKE).count()
        cache.release_caches()
        assert _n_persistent(spark) == 0, f"blocks leaked after {name}"
        assert cache.live_count() == 0


def test_next_query_auto_releases_previous(spark):
    """Callers that never call release_caches still can't accumulate:
    entering a DIFFERENT query through the registry releases the
    previous query's blocks, so a session holds at most one query's
    intermediates."""
    q = all_queries()
    q["doc_unigram_logprob"](spark, SF_SMOKE).count()
    assert _n_persistent(spark) >= 1  # the vocab model is cached
    first_live = cache.live_count()
    assert first_live >= 1
    q["pagerank_brand_copurchase"](spark, SF_SMOKE).count()
    # unigram's handles were released at begin_query; only pagerank's
    # tracked handles remain
    assert cache.live_count() == 3  # e, wout, nodes
    cache.release_caches()
    assert _n_persistent(spark) == 0


def test_same_query_rerun_stays_warm(spark):
    """Re-invoking the SAME query must NOT release its caches between
    runs — Spark's CacheManager matches canonicalized plans, so the
    bench's median-of-3 protocol hits warm blocks (releasing here
    would turn every timed run into a cold rebuild)."""
    q = all_queries()
    q["doc_unigram_logprob"](spark, SF_SMOKE).count()
    n_before = _n_persistent(spark)
    assert n_before >= 1
    q["doc_unigram_logprob"](spark, SF_SMOKE).count()
    # CacheManager deduped the second persist onto the same entry —
    # nothing was released, nothing new registered
    assert _n_persistent(spark) == n_before
    cache.release_caches()
    assert _n_persistent(spark) == 0


def test_release_is_idempotent_and_safe_after_clearcache(spark):
    """clearCache (the correctness tool's hygiene) followed by
    release_caches must not raise — double-unpersist is a no-op."""
    q = all_queries()
    q["doc_unigram_logprob"](spark, SF_SMOKE).count()
    spark.catalog.clearCache()
    assert cache.release_caches() >= 1
    assert cache.release_caches() == 0
    assert _n_persistent(spark) == 0
