"""Parse ``explain`` output into checkable facts.

Counts come from the "simple" physical-plan tree (operators inline, one
per line); scan details (PushedFilters / ReadSchema) are parsed from
the same text — Spark prints them on the FileScan line. All helpers
work on the pre-execution plan: with AQE the join *strategy* can still
improve at runtime (e.g. a stats-misjudged sort-merge join flipping to
broadcast), so tests assert the properties that must hold either way
(no cartesian, filters pushed, columns pruned, bounded exchanges).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (node list + per-node details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """The physical plan tree, operators inline."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan is broadcast (hash or nested-loop)."""
    p = simple_plan(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in simple_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains an un-broadcast cartesian product —
    the thing that must never survive review for large inputs."""
    return "CartesianProduct" in simple_plan(df)


def dedup_cached_subtrees(p: str) -> str:
    """Collapse repeated InMemoryRelation bodies in a plan string.

    ``toString`` reprints a cached relation's ENTIRE build plan at every
    InMemoryTableScan that reads it, so a persisted subtree consumed N
    times inflates text-based exchange counts by N× even though the
    build executes once. Keep the first print of each distinct cached
    relation, drop the repeats (the scan line itself stays)."""
    out: list[str] = []
    seen: set[str] = set()
    skip_indent: int | None = None
    for line in p.splitlines():
        indent = len(re.match(r"^[\s:+|-]*", line).group(0))
        if skip_indent is not None:
            if indent > skip_indent:
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            # key on the relation text only (tree-glyph prefixes differ
            # per occurrence); expression ids (#123) are re-numbered per
            # print of the same cached relation — strip both. Distinct
            # relations with identical schema+storage conflate, which
            # only under-counts — fine for a red-flag heuristic.
            key = re.sub(
                r"#\d+L?", "#", line[line.index("InMemoryRelation"):]
            )
            out.append(line)
            if key in seen:
                skip_indent = indent
            else:
                seen.add(key)
            continue
        out.append(line)
    return "\n".join(out)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded).
    Each one is a full materialize-and-repartition of its input — the
    unit of cost to minimize at 100 TB. A persisted subtree's
    exchanges count once (its build runs once), not once per reuse."""
    p = dedup_cached_subtrees(simple_plan(df))
    return len(re.findall(r"\bExchange (?:hash|range|RoundRobin|Single)", p))


def count_key_exchanges(df: DataFrame) -> int:
    """Data-dependent shuffles only (hash/range partitioning) — the
    exchanges whose cost scales with key cardinality and skew.
    Round-robin re-splits (functions.spread on an under-partitioned
    local file; a no-op on pre-split cluster inputs) are excluded."""
    p = dedup_cached_subtrees(simple_plan(df))
    return len(re.findall(r"\bExchange (?:hash|range)partitioning", p))


def count_scans(df: DataFrame) -> int:
    return len(re.findall(r"FileScan parquet|Scan parquet", simple_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans —
    predicates the parquet reader evaluates against row-group stats.
    Returned as raw strings like ``GreaterThan(l_shipdate,...)``."""
    p = simple_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", p):
        body = m.group(1).strip()
        if body:
            # split on top-level commas only (filter args contain commas)
            out.extend(re.findall(r"[A-Za-z]+\([^()]*\)|[A-Za-z]+\(.*?\)(?=, [A-Z]|$)", body))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries across the plan's file scans —
    predicates resolved against directory names before any I/O is
    planned. Non-empty means the scan is partition-pruned."""
    p = simple_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", p):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan ReadSchema column lists — what each parquet scan will
    actually read off disk (column-pruning evidence)."""
    p = simple_plan(df)
    out: list[list[str]] = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", p):
        body = m.group(1)
        cols = [c.split("#")[0].strip() for c in body.split(",")]
        out.append([c for c in cols if c])
    return out


def count_global_windows(df: DataFrame) -> int:
    """Number of Window operators fed by ``Exchange SinglePartition``
    — i.e. windows with an empty PARTITION BY, which pull their entire
    input through ONE task. Harmless on a bounded aggregate (a
    |dates|-row daily rollup), fatal on a fact table at 100 TB, so the
    plan audit flags each occurrence and requires either a bounded-
    input rationale or a partitioned/boundary-based rewrite.

    Heuristic on the simple-plan text: for each ``Window`` line, walk
    down its child chain past the window's own Sort / Project /
    WindowGroupLimit until the first Exchange; SinglePartition there
    means the window is global. Cached-subtree reprints are collapsed
    first so a persisted input doesn't multiply the count."""
    p = dedup_cached_subtrees(simple_plan(df))
    lines = p.splitlines()
    n = 0
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow\b(?!GroupLimit)", line):
            continue
        for nxt in lines[i + 1:]:
            if re.search(r"\bExchange\b", nxt):
                if "SinglePartition" in nxt:
                    n += 1
                break
            # operators that legitimately sit between a Window and its
            # exchange; anything else (another Window, an Aggregate, a
            # scan) ends this window's child chain un-exchanged —
            # its input was already partitioned upstream
            if not re.search(
                r"\bSort\b|\bProject\b|\bWindowGroupLimit\b|\bFilter\b",
                nxt,
            ):
                break
    return n


def plan_summary(df: DataFrame) -> dict:
    """One-call digest used by tests and bench diagnostics."""
    p = simple_plan(df)
    return {
        "broadcast_joins": len(
            re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", p)
        ),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", p)),
        "cartesian": "CartesianProduct" in p,
        "exchanges": count_exchanges(df),
        "global_windows": count_global_windows(df),
        "scans": count_scans(df),
        "pushed_filters": pushed_filters(df),
        "scan_columns": scan_columns(df),
    }
