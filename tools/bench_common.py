"""The ONE definition of a per-query bench regression, shared by
bench.py's stderr diff and tools/bench_diff.py's BENCH_DIFF.md verdict
column — so the two tools can never disagree about which queries
regressed (the cross-tool inconsistency the round-6 bench-hardening
work exists to prevent)."""

from __future__ import annotations


def regressed(old: float | None, new: float | None) -> bool:
    """>25% relative AND >0.2 s absolute slower. None (no data) is
    never a regression by itself — callers decide how to treat missing
    evidence."""
    return (
        old is not None
        and new is not None
        and old > 0
        and (new - old) / old > 0.25
        and new - old > 0.2
    )
