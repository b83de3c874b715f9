"""Physical-plan inspection: the engine's scale contract, testable.

The reference has no optimizer (SURVEY.md §4) — Catalyst is ours, but
only if the plans actually keep the properties we claim (broadcast for
dims, pushdown to the scan, no stray cartesian products, bounded
shuffle count). These helpers turn ``explain()`` text into assertions
so tests/test_plans.py can pin the plan shape of every headline query:
a regression that silently turns a broadcast join into a 100 TB
sort-merge shuffle fails CI, not the cluster.
"""

from cdc_kafka_project_spark.plans.inspect import (
    count_exchanges,
    count_global_windows,
    count_key_exchanges,
    count_scans,
    formatted_plan,
    has_broadcast_join,
    has_cartesian,
    has_sort_merge_join,
    partition_filters,
    plan_summary,
    pushed_filters,
    scan_columns,
    simple_plan,
)

__all__ = [
    "count_exchanges",
    "count_global_windows",
    "count_key_exchanges",
    "count_scans",
    "formatted_plan",
    "has_broadcast_join",
    "has_cartesian",
    "has_sort_merge_join",
    "partition_filters",
    "plan_summary",
    "pushed_filters",
    "scan_columns",
    "simple_plan",
]
