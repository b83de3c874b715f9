"""Scoped persist lifecycle for query-builder intermediates.

~12 registered query builders persist() a small model-sized
intermediate (vocab counts, PMI cells, CC edge lists) that two or more
downstream branches consume — without the cache each branch re-scans
the corpus (the measured pathology `doc_bigram_logprob` documents).
Before round 9 those blocks had no release path: the builder returns a
lazy DataFrame, the caller materializes it, and nothing ever
unpersisted the intermediates. A long-lived serving session therefore
accumulated cached blocks query after query until the driver heap
overflowed — observed live at the 100x replica sweep
(LOCAL_SCALE_r08.md "Cache accumulation": 16 GB heap OOM ~26 queries
in), and the exact deployment shape a 1000-executor cluster serving
many queries per session implies.

The fix is deterministic ownership at the registry call boundary (the
one place every query invocation passes through):

* builders persist through :func:`scoped_persist`, which tracks the
  handle against the query name being built;
* the registry wrapper calls :func:`begin_query` before each builder —
  entering a DIFFERENT query releases every block the previous query
  left behind, so a session never holds more than one query's
  intermediates no matter how many queries it serves;
* re-entering the SAME query keeps its caches: Spark's CacheManager
  matches canonicalized plans, so repeat invocations (the bench's
  median-of-3 protocol, a dashboard refresh) hit the warm blocks
  instead of paying a release + rebuild per run;
* callers that want a clean session NOW (test teardown, the end of a
  serving loop) call :func:`release_caches` explicitly.

Unpersisting is always safe — a released intermediate recomputes from
lineage if an old result handle is re-collected — so the contract
callers must hold is about performance only: materialize a query's
output before building the next one (the driver gate, bench.py, and
every serving loop already do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

#: live persisted intermediates, owned by the query named in _OWNER
_LIVE: list[DataFrame] = []
_OWNER: str | None = None


def scoped_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """persist() with registry-scoped lifetime (released when a
    different query begins, or on :func:`release_caches`)."""
    df = df.persist(level) if level is not None else df.persist()
    _LIVE.append(df)
    return df


def begin_query(name: str) -> None:
    """Mark the start of a registered query build: release the
    previous query's intermediates unless it is the same query being
    re-run (plan-canonical cache reuse keeps repeat runs warm)."""
    global _OWNER
    if _OWNER is not None and _OWNER != name:
        release_caches()
    _OWNER = name


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many handles
    were released. Idempotent; safe after clearCache/session stop."""
    global _OWNER
    n = len(_LIVE)
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            # session already stopped or cache already cleared — the
            # blocks are gone either way
            pass
    _OWNER = None
    return n


def live_count() -> int:
    """Number of tracked (not yet released) persist handles."""
    return len(_LIVE)
