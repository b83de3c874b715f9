"""Bounded-memory frequency sketches (candidate + verify pattern).

``heavy_hitters``: exact top-k frequent items over an arbitrarily large
item stream using Misra-Gries summaries per partition followed by an
exact recount of the candidate union — the standard two-phase shape
that keeps worst-case memory fixed no matter the item cardinality:

* Phase 1 (map-only): each partition runs a Misra-Gries summary with
  ``capacity`` counters (public algorithm, Misra & Gries 1982). Any
  item whose GLOBAL frequency exceeds N/capacity must exceed
  n_p/capacity in at least one partition (pigeonhole), so it survives
  in that partition's summary — the candidate union provably contains
  every item with freq > N/capacity.
* Phase 2: exact counts for candidates only — the corpus streams once
  more through a filter against the (tiny, broadcast) candidate set,
  then one partial-agg shuffle of |candidates| keys.

Exactness contract: if the true k-th frequency f_k > N/capacity, the
result is EXACTLY the top-k (the driver oracle recomputes it as a
plain GROUP BY / ORDER BY / LIMIT). Size ``capacity`` accordingly
(capacity >= N/f_k); when the tail is too flat for that bound the
result degrades to "top-k among items with freq > N/capacity" —
loudly documented, never silently wrong counts (phase 2 counts are
always exact).

Contrast with groupBy+top-k: the plain plan shuffles |vocab| keys;
this shuffles |candidates| <= capacity x partitions keys — the
difference between a web-scale vocabulary and a few thousand rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructField, StructType


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 25,
    capacity: int = 4096,
) -> DataFrame:
    """Exact top-``k`` (item, n) for the items column, provided the
    k-th frequency exceeds N/``capacity`` (see module docstring).
    Deterministic tie-break: count desc, then item asc. Works for any
    hashable item type — the candidate schema mirrors the input
    column's type, so integer keys rejoin without lossy casts."""

    def phase1(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            col = pdf[item_col].dropna()
            for x in col:
                if x in counters:
                    counters[x] += 1
                elif len(counters) < capacity:
                    counters[x] = 1
                else:
                    # decrement in place, drop zeroed keys — no dict
                    # rebuild/rehash per miss. Each pass removes
                    # len(counters) units of count mass and mass only
                    # enters one per arrival, so total decrement work
                    # is O(N) over the stream (amortized O(1)/item).
                    dead = []
                    for kk in counters:
                        nv = counters[kk] - 1
                        if nv:
                            counters[kk] = nv
                        else:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame({item_col: list(counters.keys())})

    src = df.select(item_col)
    # candidate schema derived from the input column (round-4 advice:
    # a hardcoded `string` coerced non-string keys lossily)
    cand_schema = StructType([StructField(item_col, df.schema[item_col].dataType)])
    candidates = src.mapInPandas(phase1, cand_schema).distinct()
    exact = (
        src.join(F.broadcast(candidates), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.orderBy(F.col("n").desc(), item_col).limit(k)


def hll_state_table(
    df: DataFrame,
    bucket_col: Column | str,
    value_col: str,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Per-bucket mergeable HLL state: (bucket, sketch binary, exact n).

    The sketch-state-table pattern: distinct-count state that MERGES —
    persist one DataSketches HLL per bucket (day/source/shard) and any
    later question ("distinct over this month", "distinct across these
    sources", "distinct after today's delta") is a union of the
    relevant sketches, never a rescan of history. At 100 TB the state
    table is |buckets| rows of ~KB binaries vs re-shuffling every raw
    value; this is exactly how merge_agg_states maintains SUM/COUNT,
    extended to the one aggregate that is NOT naively additive.

    The exact count rides along for test-SF error pinning; production
    drops it (computing it is the rescan the sketch avoids).

    Shape (r11): the (bucket, value) pairs are DEDUPED FIRST, then the
    sketch and the exact count are plain aggregates over the distinct
    set. Mixing countDistinct with a non-distinct object aggregate in
    ONE agg triggers Spark's Expand rewrite, which evaluates the HLL
    agg keyed by (bucket, value) — one object buffer PER DISTINCT
    VALUE (measured Java-heap OOM at the 100x replica, 10 M buffers);
    HLL updates are idempotent per value, so the dedup-first sketch is
    identical. The distinct() is an unsafe-row hash agg that spills.
    """
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    d = df.select(b.alias(bucket_name), F.col(value_col)).distinct()
    return d.groupBy(bucket_name).agg(
        F.hll_sketch_agg(value_col).alias("sketch"),
        F.count(F.lit(1)).alias("exact_distinct"),
    )


def hll_union_estimate(
    states: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge sketch states (optionally per group) and estimate: the
    read side of the state table. Union is associative and
    order-independent, so replays/backfills can merge in any order."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
        F.sum("exact_distinct").alias("sum_bucket_exact"),
    ]
    if group_cols:
        return states.groupBy(*group_cols).agg(*agg)
    return states.agg(*agg)
