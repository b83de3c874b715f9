#!/usr/bin/env python
"""One-command serving soak: every registered query through ONE
long-lived session, leak-checked after each (round-11 verdict item 4 —
the r10/r11 soaks were ad-hoc shell runs logged in /tmp).

    python tools/serving_soak.py [SF_DIR] [names...]

The deployment shape this guards: a cluster session serving many
queries back-to-back. Both materialization classes must release
deterministically (scoped persists + scoped/owned localCheckpoints —
see cache.py's module docstring; the round-8 100x sweep OOMed a 16 GB
driver heap on exactly this accumulation). After each query's output
is materialized the soak calls ``cache.release_caches()`` (the same
release point a serving loop hits between requests) and then asserts
the JVM persistent-RDD map is EMPTY — any surviving entry is a leak:
a materialization that bypassed the scoped wrappers or a consumer
that never freed its owned checkpoint.

Prints one summary line: ``soak: N queries in S s, leaks: [...],
errs: [...]`` — both lists must be empty.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def persistent_rdd_count(spark) -> int:
    """Entries in the JVM persistent-RDD map (covers persist() blocks
    AND localCheckpoint RDDs, which spark.catalog views never show)."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def main() -> int:
    from cdc_kafka_project_spark import cache
    from cdc_kafka_project_spark.registry import all_queries
    from cdc_kafka_project_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark("serving-soak")
    spark.sparkContext.setLogLevel("ERROR")

    leaks: list[str] = []
    errs: list[str] = []
    t0 = time.time()
    n = 0
    for name, fn in all_queries().items():
        if only and name not in only:
            continue
        t1 = time.time()
        try:
            fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — report, keep soaking
            errs.append(f"{name}: {type(e).__name__}: {e}")
            print(f"ERR   {name}: {type(e).__name__}: {e}", flush=True)
            cache.release_caches()
            continue
        cache.release_caches()
        left = persistent_rdd_count(spark)
        if left:
            leaks.append(f"{name}: {left} persistent RDDs after release")
            print(f"LEAK  {name}: {left} persistent RDDs", flush=True)
        n += 1
        if n % 20 == 0:
            print(
                f"... {n} queries, {time.time() - t0:.0f}s elapsed "
                f"(last {name} {time.time() - t1:.1f}s)",
                flush=True,
            )
    print(
        f"soak: {n} queries in {time.time() - t0:.0f} s, "
        f"leaks: {leaks}, errs: {errs}"
    )
    return 0 if not leaks and not errs else 1


if __name__ == "__main__":
    sys.exit(main())
