#!/usr/bin/env python
"""Registry-wide partition-invariance audit.

The classic distributed-correctness failure is an answer that depends
on HOW the data was partitioned — a non-commutative aggregate, a
window missing a total-order tiebreak, rand() seeded per partition, a
first()/head() over an unordered frame. The DuckDB oracle gate cannot
catch these when the default partitioning happens to match; this tool
can: it runs EVERY registered query twice under deliberately different
execution geometry —

  pass A: local[4],  spark.sql.shuffle.partitions=3,  AQE ON
  pass B: local[7],  spark.sql.shuffle.partitions=13, AQE OFF,
          input files split small (maxPartitionBytes) so scans
          produce a different partition count too

— normalizes each result (columns sorted by name, rows sorted, floats
repr'd) exactly like tools/check_correctness.py, and compares SHA-256
digests. Any mismatch = the query's answer depends on partitioning,
which at 1000 executors means a silently wrong answer.

Known-variant queries (partition-relative outputs BY DESIGN) are
listed in ALLOWED_VARIANT with the reason; the tool fails if one of
them becomes invariant (stale allowlist) only informationally.

    python tools/invariance_check.py [sf_dir] [query ...]

Each pass runs in a SEPARATE SparkSession (stop + rebuild) so configs
that are fixed at session start (shuffle partitions without AQE)
really differ.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, ".")

#: Queries whose OUTPUT is allowed to vary with partitioning, each
#: with the reason. Keep this list empty-ish: a registered drivable
#: surface should be partition-invariant even when the underlying
#: operator is partition-relative (fold to flags/counts instead).
ALLOWED_VARIANT: dict[str, str] = {}

PASSES = [
    {"master": "local[4]", "shuffle": 3, "aqe": "true",
     "max_part_bytes": "134217728"},
    {"master": "local[7]", "shuffle": 13, "aqe": "false",
     "max_part_bytes": "1048576"},
]


def _session(cfg):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    b = (
        SparkSession.builder.master(cfg["master"])
        .appName("invariance-check")
        .config("spark.sql.shuffle.partitions", str(cfg["shuffle"]))
        .config("spark.sql.adaptive.enabled", cfg["aqe"])
        .config("spark.sql.files.maxPartitionBytes", cfg["max_part_bytes"])
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def _digest(pdf) -> str:
    import pandas as pd  # noqa: F401

    df = pdf[sorted(pdf.columns)].copy()
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon = []
        for v in tup:
            if isinstance(v, float):
                canon.append("NaN" if math.isnan(v) else repr(v))
            elif v is None:
                canon.append("NULL")
            else:
                canon.append(str(v))
        rows.append("\x1f".join(canon))
    rows.sort()
    h = hashlib.sha256()
    h.update(("\x1e".join(sorted(df.columns))).encode())
    for r in rows:
        h.update(b"\x1d")
        h.update(r.encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from cdc_kafka_project_spark.registry import all_queries

    names = [n for n in all_queries() if not only or n in only]
    digests: list[dict[str, str]] = []
    for cfg in PASSES:
        spark = _session(cfg)
        # re-resolve after session swap: query fns close over nothing,
        # but catalog caches views per session — fresh load_all is safe
        qs = all_queries()
        out: dict[str, str] = {}
        for name in names:
            t0 = time.time()
            try:
                out[name] = _digest(qs[name](spark, sf_dir).toPandas())
            except Exception as e:  # noqa: BLE001 — audit must finish
                out[name] = f"ERROR: {type(e).__name__}: {str(e)[:120]}"
            print(
                f"# pass[{cfg['shuffle']}p] {name}: {time.time()-t0:.1f}s",
                file=sys.stderr,
            )
        digests.append(out)
        spark.stop()

    n_ok = n_var = n_err = 0
    for name in names:
        a, b = digests[0][name], digests[1][name]
        if a.startswith("ERROR") or b.startswith("ERROR"):
            print(f"ERR   {name}: {a if a.startswith('ERROR') else b}")
            n_err += 1
        elif a == b:
            if name in ALLOWED_VARIANT:
                print(f"note  {name}: invariant despite allowlist entry "
                      f"({ALLOWED_VARIANT[name]}) — entry may be stale")
            n_ok += 1
        elif name in ALLOWED_VARIANT:
            print(f"allow {name}: varies ({ALLOWED_VARIANT[name]})")
            n_ok += 1
        else:
            print(f"VARY  {name}: partition-dependent result "
                  f"({a[:12]} != {b[:12]})")
            n_var += 1
    print(f"\n{n_ok} invariant/allowed, {n_var} partition-dependent, "
          f"{n_err} errors")
    return 1 if (n_var or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
