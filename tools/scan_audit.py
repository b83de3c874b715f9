#!/usr/bin/env python
"""Executed-scan audit: how many REAL file scans does each query run?

A naive text count over the plan string overstates scans — an
``InMemoryRelation`` (persisted intermediate) prints its full child
lineage including the original parquet scan, which executes at most
once. This tool walks the PHYSICAL plan tree instead and counts
``FileSourceScan`` nodes that are not beneath an ``InMemoryTableScan``
boundary, i.e. scans that actually hit the source per execution.

A query reading one table N>=3 times is the 100 TB smell the round-10
phash fix removed (each extra reference re-runs the scan + any
Pandas-UDF derivation above it); the fix is a scoped checkpoint /
persist of the small derived table before the multi-reference point
(dedup.py's signature tables, multimodal's band table).

    python tools/scan_audit.py [sf_dir] [names...]   # default: all
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

#: per-node-class boundaries below which scans do not re-execute
_CACHED_BOUNDARIES = ("InMemoryTableScan",)


def real_scans(df) -> dict[str, int]:
    """table -> count of FileSourceScan nodes outside cached subtrees."""
    counts: dict[str, int] = {}

    def walk(node, under_cache: bool) -> None:
        name = node.nodeName()
        if any(b in name for b in _CACHED_BOUNDARIES):
            under_cache = True
        if not under_cache and ("Scan parquet" in name or "FileScan" in name):
            try:
                loc = node.relation().location().rootPaths().head().toString()
                table = loc.rstrip("/").rsplit("/", 1)[-1].removesuffix(
                    ".parquet"
                )
            except Exception:
                table = "?"
            counts[table] = counts.get(table, 0) + 1
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next(), under_cache)
        # AQE wraps stages; recurse into plan children of query stages
        try:
            walk(node.plan(), under_cache)  # ShuffleQueryStage/Broadcast
        except Exception:
            pass

    walk(df._jdf.queryExecution().executedPlan(), False)
    return counts


def main() -> int:
    from cdc_kafka_project_spark import cache
    from cdc_kafka_project_spark.registry import all_queries
    from cdc_kafka_project_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("scan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for name, fn in all_queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.count()  # materialize so AQE finalizes + caches fill
            counts = real_scans(df)
        except Exception as e:
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            flagged += 1
            continue
        finally:
            cache.release_caches()
        worst = {t: c for t, c in counts.items() if c >= 3}
        if worst:
            print(f"MULTI {name}: {worst}")
            flagged += 1
    print(f"done; {flagged} flagged (>=3 executed scans of one table)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
