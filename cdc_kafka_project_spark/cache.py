"""Scoped lifecycle for persisted / checkpointed query intermediates.

Two classes of materialized intermediate exist in the engine, and both
need a deterministic release path (without one, a long-lived serving
session accumulates executor/driver storage query after query until
the heap overflows — observed live at the 100x replica sweep,
LOCAL_SCALE_r08.md "Cache accumulation": 16 GB heap OOM ~26 queries
in, and the exact deployment shape a 1000-executor cluster serving
many queries per session implies):

* ``.persist()`` blocks (vocab counts, PMI cells, PageRank edges) —
  registered via :func:`scoped_persist`. CacheManager matches
  canonicalized plans, so re-running the SAME query hits the warm
  blocks; releasing is always safe (a released intermediate recomputes
  from lineage if an old handle is re-collected).
* ``localCheckpoint(eager=True)`` blocks (BPE merge loops, CC label
  propagation, LSH signature materializations) — registered via
  :func:`scoped_localcheckpoint`. These are invisible to
  ``spark.catalog.clearCache()`` AND survive :func:`release_caches`'s
  predecessor (round-9 verdict: blocks freed only by nondeterministic
  Python-GC -> ContextCleaner). A checkpoint truncates lineage, so —
  unlike a persist — its blocks CANNOT recompute after release: the
  release points below only fire after the owning query's output is
  materialized, which is the standing contract (the driver gate,
  bench.py, and every serving loop materialize each query's output
  before building the next).

Release points, all deterministic:

* builders persist/checkpoint through the ``scoped_*`` wrappers, which
  track the handle against the query being built;
* the registry wrapper calls :func:`begin_query` before each builder —
  entering a DIFFERENT query (or the same name against a different
  ``sf_dir``: the scale-stress big/base protocol) releases every block
  the previous query left behind;
* re-entering the SAME (name, sf_dir) keeps pure-persist queries warm
  (plan-canonical cache reuse — the bench's median-of-3 protocol) but
  releases everything when the previous run checkpointed: checkpoint
  RDDs are new objects per build, so their plans can never re-match,
  and a kept persist downstream of a released checkpoint could not
  recompute — the conservative rule is a cold rebuild;
* loop bodies that supersede a checkpoint mid-build (BPE's merge
  rounds, CC's label rounds) release the superseded handle immediately
  via :func:`release_checkpoint`;
* callers that want a clean session NOW (test teardown, the end of a
  serving loop) call :func:`release_caches` explicitly.

Single-threaded by design: the module-global registries assume one
query builds at a time (the registry call boundary, the driver gate,
bench.py, and pytest all serialize builds). Two queries building
concurrently in one session would interleave ownership — run them in
separate sessions instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

#: live persisted intermediates as (jvm analyzed plan | None, handle),
#: owned by the query keyed in _OWNER; the plan reference powers the
#: same-plan dedupe in scoped_persist
_LIVE: list[tuple[object, DataFrame]] = []
#: live localCheckpoint frames (LogicalRDD-backed), same ownership
_LIVE_CK: list[DataFrame] = []
_OWNER: tuple[str, str | None] | None = None

#: audit-only trail of PRE-materialization frames (the input df of each
#: scoped_persist / scoped_localcheckpoint this query): a checkpoint
#: truncates lineage to a LogicalRDD and a persist hides its subtree
#: behind InMemoryTableScan, so the final frame's executed plan no
#: longer shows the file scans that ran to materialize them — the
#: executed-scan audit (tools/scan_audit.py) walks these frames to
#: count that I/O. Each entry is ``(frame, executed)``: ``executed`` is
#: True iff the frame's OWN QueryExecution ran at registration (an
#: eager localCheckpoint — its AQE plan is finalized and honest to
#: walk), False for persists and lazy checkpoints (they materialize
#: later through a CONSUMER's InMemoryTableScan, so walking their
#: finalPhysicalPlan() during the audit would EXECUTE the whole plan
#: mid-audit — the auditor must use the static plan instead, r11
#: ADVICE). Off by default (serving sessions should not retain dead
#: plan objects); cleared with the registry.
_AUDIT_TRAIL: list[tuple[DataFrame, bool]] = []
_AUDIT = False


def set_audit(on: bool) -> None:
    """Enable/disable the pre-materialization audit trail."""
    global _AUDIT
    _AUDIT = on
    if not on:
        _AUDIT_TRAIL.clear()


def audit_trail() -> list[tuple[DataFrame, bool]]:
    """``(frame, executed)`` pairs recorded since the last
    begin_query/release_caches (empty unless :func:`set_audit` on);
    ``executed`` = the frame's own QueryExecution already ran (eager
    checkpoint), so its EXECUTED plan is safe and honest to walk."""
    return list(_AUDIT_TRAIL)


def _analyzed(df: DataFrame):
    try:
        return df._jdf.queryExecution().analyzed()
    except Exception:
        return None


def scoped_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """persist() with registry-scoped lifetime (released when a
    different query begins, or on :func:`release_caches`). Re-persisting
    a plan already tracked for the current query (a same-name re-run)
    does not grow the handle list — CacheManager dedupes the blocks and
    the dedupe here keeps ``_LIVE`` bounded across unbounded re-runs."""
    jplan = _analyzed(df)
    out = df.persist(level) if level is not None else df.persist()
    if jplan is not None:
        for other, _ in _LIVE:
            try:
                if other is not None and other.sameResult(jplan):
                    return out
            except Exception:
                break
    _LIVE.append((jplan, out))
    if _AUDIT:
        # force the STATIC physical plan now, before CacheManager's
        # substitution can fold this frame's own plan into an
        # InMemoryRelation of itself — sparkPlan is a lazy val on the
        # Dataset's QueryExecution, so the auditor's later
        # static_scans() walk sees this pre-persist tree (audit mode
        # only; planning cost, zero execution)
        try:
            df._jdf.queryExecution().sparkPlan()
        except Exception:
            pass
        _AUDIT_TRAIL.append((df, False))
    return out


def scoped_localcheckpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint() with registry-scoped lifetime. The returned
    frame's blocks are freed deterministically at the next
    :func:`begin_query` / :func:`release_caches` (or earlier via
    :func:`release_checkpoint`); after release the frame CANNOT be
    re-collected — lineage is truncated by construction."""
    out = df.localCheckpoint(eager=eager)
    _LIVE_CK.append(out)
    if _AUDIT:
        # eager=True ran the input frame's QueryExecution just now (the
        # checkpoint materializes through it), so its finalized AQE
        # plan is safe to walk; a lazy checkpoint materializes later
        # through a consumer and must be walked statically
        _AUDIT_TRAIL.append((df, eager))
    return out


def owned_localcheckpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint whose lifetime is owned by the CALLER, not the
    query-scoped registry — :func:`begin_query` / :func:`release_caches`
    never sweep it. For long-lived handles that must stay valid across
    registered-query invocations (the embedded-log consumer's pinned
    poll batch: kafka's poll/process/commit contract lets arbitrary
    work — including registry queries — run between poll and commit).
    The caller MUST free it via :func:`free_owned_checkpoint`; an owned
    checkpoint that is never freed leaks its blocks for the session."""
    return df.localCheckpoint(eager=eager)


def free_owned_checkpoint(df: DataFrame | None) -> None:
    """Free an :func:`owned_localcheckpoint` frame's blocks NOW.
    Idempotent; no-op on None. After this the frame cannot be
    re-collected (lineage is truncated by construction)."""
    if df is not None:
        _free_checkpoint_blocks(df)


def release_checkpoint(df: DataFrame | None) -> bool:
    """Release ONE tracked checkpoint early — the superseded-state
    pattern: an iterative builder (BPE merges, CC labels) re-checkpoints
    its loop state and the previous round's blocks are dead weight the
    moment the new checkpoint is materialized. Returns True iff ``df``
    was tracked. No-op on None / untracked frames."""
    if df is None:
        return False
    for i, d in enumerate(_LIVE_CK):
        if d is df:
            _LIVE_CK.pop(i)
            _free_checkpoint_blocks(d)
            return True
    return False


def _free_checkpoint_blocks(df: DataFrame) -> None:
    # A checkpointed Dataset's analyzed plan IS the LogicalRDD holding
    # the persisted RDD — unpersisting it removes the blocks from the
    # JVM persistent-RDD map immediately (catalog.clearCache and
    # DataFrame.unpersist never see this RDD; GC + ContextCleaner was
    # the only other path, and it is nondeterministic).
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        # session already stopped — the blocks are gone either way
        pass


def begin_query(name: str, sf_dir: str | None = None) -> None:
    """Mark the start of a registered query build: release the previous
    query's intermediates unless it is the same (name, sf_dir) being
    re-run AND the previous run left no checkpoints (checkpoint RDDs
    are per-build objects — never plan-matched, so keeping them buys
    nothing and costs their blocks)."""
    global _OWNER
    key = (name, sf_dir)
    if (_OWNER is not None and _OWNER != key) or _LIVE_CK:
        release_caches()
    _OWNER = key


def release_caches() -> int:
    """Unpersist every tracked intermediate (persists AND checkpoint
    blocks); returns how many handles were released. Idempotent; safe
    after clearCache/session stop."""
    global _OWNER
    n = len(_LIVE) + len(_LIVE_CK)
    while _LIVE:
        _, df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            # session already stopped or cache already cleared — the
            # blocks are gone either way
            pass
    while _LIVE_CK:
        _free_checkpoint_blocks(_LIVE_CK.pop())
    _AUDIT_TRAIL.clear()
    _OWNER = None
    return n


def live_count() -> int:
    """Number of tracked (not yet released) handles, both classes."""
    return len(_LIVE) + len(_LIVE_CK)


def live_checkpoint_count() -> int:
    """Number of tracked (not yet released) checkpoint frames."""
    return len(_LIVE_CK)
