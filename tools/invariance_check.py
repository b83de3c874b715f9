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

#: --wide (r14, verdict item 7): a third pass mirroring the replica
#: sweep's scale_env geometry (256 shuffle partitions, AQE on) so the
#: 1000x-healed names are pinned invariant under the EXACT partition
#: count the scale runs execute with, not just the two toy geometries.
WIDE_PASS = {"master": "local[8]", "shuffle": 256, "aqe": "true",
             "max_part_bytes": "134217728"}


def _session(cfg):
    import os

    from pyspark.sql import SparkSession

    from cdc_kafka_project_spark.session import RUNTIME_CONFS

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    b = (
        SparkSession.builder.master(cfg["master"])
        .appName("invariance-check")
        .config("spark.sql.shuffle.partitions", str(cfg["shuffle"]))
        .config("spark.sql.files.maxPartitionBytes", cfg["max_part_bytes"])
        .config("spark.ui.enabled", "false")
        # this host's tuned memory/scratch settings (session.py): the
        # driver heap IS the executor heap in local mode, and shuffle
        # scratch must avoid the stalling virtio root disk — without
        # these, larger sf_dirs OOM/stall and report ERR rows that
        # have nothing to do with partition-dependence. (JVM-static
        # confs apply on first launch only; later same-process
        # sessions inherit the JVM.)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.buffer.pageSize", "4m")
        .config("spark.local.dir",
                os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                               "/dev/shm/spark-graft-tmp"))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    # per-pass geometry OVERRIDES the defaults (after RUNTIME_CONFS so
    # the AQE toggle isn't clobbered)
    b = b.config("spark.sql.adaptive.enabled", cfg["aqe"])
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.adaptive.enabled", cfg["aqe"])
    s.conf.set("spark.sql.shuffle.partitions", str(cfg["shuffle"]))
    s.conf.set("spark.sql.files.maxPartitionBytes", cfg["max_part_bytes"])
    return s


_NORMALIZE = None


def _normalize_fn():
    """tools/check_correctness.py's normalize() — the SAME
    canonicalizer the oracle gate uses (imported, not copied, so the
    two tools cannot drift). Loaded once."""
    global _NORMALIZE
    if _NORMALIZE is None:
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "check_correctness",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "check_correctness.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _NORMALIZE = mod.normalize
    return _NORMALIZE


def _digest(pdf) -> str:
    cols, rows = _normalize_fn()(pdf)
    h = hashlib.sha256()
    h.update(("\x1e".join(cols)).encode())
    for r in rows:
        h.update(b"\x1d")
        h.update("\x1f".join(r).encode())
    return h.hexdigest()


def main() -> int:
    import os

    args = [a for a in sys.argv[1:] if a != "--wide"]
    passes = list(PASSES) + (
        [WIDE_PASS] if "--wide" in sys.argv[1:] else []
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        print(f"usage: python {sys.argv[0]} [--wide] [sf_dir] [query ...]")
        print(f"error: sf_dir is not a directory: {sf_dir!r}")
        return 2
    only = set(args[1:])

    from cdc_kafka_project_spark.registry import all_queries

    names = [n for n in all_queries() if not only or n in only]
    digests: list[dict[str, str]] = []
    for cfg in passes:
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
            finally:
                # persisted intermediates accumulate across a full-
                # registry session and overflow the heap at replica
                # scale (see check_correctness.py) — drop per query
                spark.catalog.clearCache()
            print(
                f"# pass[{cfg['shuffle']}p] {name}: {time.time()-t0:.1f}s",
                file=sys.stderr,
            )
        digests.append(out)
        spark.stop()

    n_ok = n_var = n_err = 0
    for name in names:
        ds = [d[name] for d in digests]
        err = next((d for d in ds if d.startswith("ERROR")), None)
        if err is not None:
            print(f"ERR   {name}: {err}")
            n_err += 1
        elif all(d == ds[0] for d in ds):
            if name in ALLOWED_VARIANT:
                print(f"note  {name}: invariant despite allowlist entry "
                      f"({ALLOWED_VARIANT[name]}) — entry may be stale")
            n_ok += 1
        elif name in ALLOWED_VARIANT:
            print(f"allow {name}: varies ({ALLOWED_VARIANT[name]})")
            n_ok += 1
        else:
            print(f"VARY  {name}: partition-dependent result "
                  f"({' != '.join(dict.fromkeys(d[:12] for d in ds))})")
            n_var += 1
    print(f"\n{n_ok} invariant/allowed, {n_var} partition-dependent, "
          f"{n_err} errors")
    return 1 if (n_var or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
