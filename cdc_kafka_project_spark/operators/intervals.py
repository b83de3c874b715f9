"""Interval (range-overlap) joins that scale past the broadcast tier.

Spark plans a non-equi join (``fact.ts BETWEEN i.start AND i.end``)
as BroadcastNestedLoopJoin — fine while the interval side fits in one
executor's memory (``relational_ext.range_join_price_bands`` is that
tier), fatal when both sides are large: BNLJ degenerates to a
cartesian scan and a single-partition fallback.

The distributed strategy here is **bin-and-equi-join** (the classic
"binned interval join" used by every genomic-range and time-window
engine): quantize time into fixed-width bins, explode each interval
into the bins it covers, tag each fact with its single bin, and
equi-join on the bin before applying the exact range predicate.

* The shuffle is a plain hash exchange on an integer bin key — shuffle
  volume is |facts| + Σ(interval spans)/bin_width rows, never the
  cross product; Catalyst plans a SortMergeJoin/ShuffledHashJoin and
  AQE coalesces or splits skewed bins.
* A fact lands in exactly ONE bin, so a (fact, interval) match is
  produced exactly once — no post-join dedup pass.
* Interval-interval overlap explodes BOTH sides, so a pair may share
  several bins; the match-once trick assigns each candidate pair to
  the canonical first bin of its overlap region
  (``bin == floor(max(start_a, start_b) / width)``) which again makes
  every overlapping pair appear exactly once, dedup-free.

Pick ``bin_width_sec`` near the typical interval span: wider bins cut
explode fan-out but pack more false candidates into a bin; narrower
bins do the reverse. Skewed hot bins (everything in one hour) are a
salting candidate, but AQE's skew-join split handles them first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bin_point_interval_join", "bin_interval_overlap_join"]


def _bin_of(ts: Column, width_sec: int) -> Column:
    # integer microseconds -> bin ordinal; floor division is exact and
    # engine-agnostic (no float time arithmetic).
    return F.floor(F.unix_micros(ts) / F.lit(width_sec * 1_000_000)).cast("long")


def bin_point_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_width_sec: int = 3600,
) -> DataFrame:
    """All (fact, interval) rows with ``start <= fact.ts <= end``
    (bounds inclusive), as an equi-join on a time bin.

    Output = fact columns + interval columns (names must not collide;
    callers project/rename first). Works big-to-big: neither side is
    collected or broadcast.
    """
    f = facts.withColumn("__bin", _bin_of(F.col(fact_ts_col), bin_width_sec))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin_of(F.col(start_col), bin_width_sec),
                _bin_of(F.col(end_col), bin_width_sec),
            )
        ),
    )
    joined = f.join(i, "__bin").where(
        F.col(fact_ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bin")


def bin_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "start_ts",
    l_end: str = "end_ts",
    r_start: str = "r_start_ts",
    r_end: str = "r_end_ts",
    bin_width_sec: int = 3600,
) -> DataFrame:
    """All (left, right) interval pairs that overlap
    (``l_start <= r_end AND r_start <= l_end``, bounds inclusive).

    Both sides explode to their covered bins; the join keeps a pair
    only in the first bin of the overlap region, so each overlapping
    pair emits exactly once with no distinct/dedup stage — the
    dedup-free property matters at scale because a post-join
    ``dropDuplicates`` would be a second full shuffle of the result.
    """
    l = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin_of(F.col(l_start), bin_width_sec),
                _bin_of(F.col(l_end), bin_width_sec),
            )
        ),
    )
    r = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin_of(F.col(r_start), bin_width_sec),
                _bin_of(F.col(r_end), bin_width_sec),
            )
        ),
    )
    overlap_first_bin = _bin_of(
        F.greatest(F.col(l_start), F.col(r_start)), bin_width_sec
    )
    joined = (
        l.join(r, "__bin")
        .where(F.col(l_start) <= F.col(r_end))
        .where(F.col(r_start) <= F.col(l_end))
        .where(F.col("__bin") == overlap_first_bin)
    )
    return joined.drop("__bin")
