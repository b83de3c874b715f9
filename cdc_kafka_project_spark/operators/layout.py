"""Data-layout optimization: multi-column clustering (z-order) for
file skipping.

At 100 TB the cheapest scan is the one that never happens: parquet
footers carry per-file/row-group min-max stats, and a reader prunes a
file when the predicate falls outside its range. A layout sorted on ONE
column gives perfect pruning on that column and none on any other;
interleaving the bits of several columns (a Morton / z-order curve —
public technique, used by Delta OPTIMIZE ZORDER BY and friends) gives
good-not-perfect pruning on ALL of them simultaneously.

Everything here is plan-level: normalize each clustering column to a
fixed-width integer, interleave bits with codegen'd shift/or
expressions, range-partition + sort on the z-value, write. No UDFs, no
driver data pass (two scalar aggregates for the normalization bounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucketize(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column linearly onto [0, 2^bits - 1] as a long.

    Linear min-max scaling (not quantiles): one pass computes the
    bounds, the mapping is codegen'd arithmetic. Heavy skew compresses
    into few codes and weakens (never breaks) pruning; a quantile
    normalizer would slot in here without touching the interleave.
    """
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.lit(top).cast("long"),
        F.greatest(
            F.lit(0).cast("long"), F.floor(scaled * F.lit(float(top)))
        ),
    )


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` bits from each column into one long:
    bit i of column j lands at position i * n + j. Pure shift/and/or
    expression tree — whole-stage codegen keeps it JVM-side."""
    n = len(cols)
    out: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
            out = bit if out is None else out.bitwiseOR(bit)
    assert out is not None
    return out


def zorder_value(
    df: DataFrame, cols: list[str], bits_per_col: int = 16
) -> DataFrame:
    """Add a ``__z`` column: the Morton code of ``cols`` (each
    min-max-normalized to ``bits_per_col`` bits). Bounds come from one
    scalar aggregate over the input — two driver scalars per column,
    not a data collect."""
    if not (1 <= len(cols) * bits_per_col <= 63):
        raise ValueError("total interleaved bits must fit in a long")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    ).head()
    # Empty input (head() -> None) or an all-NULL column (min/max ->
    # None) has no defined curve; fail loudly rather than TypeError
    # inside _bucketize's arithmetic.
    if bounds is None:
        raise ValueError("zorder_value: input DataFrame is empty")
    missing = [c for c in cols if bounds[f"__lo_{c}"] is None]
    if missing:
        raise ValueError(
            f"zorder_value: column(s) {missing} are all-NULL (or NaN); "
            "z-order bounds are undefined"
        )
    normed = [
        _bucketize(
            F.col(c), bounds[f"__lo_{c}"], bounds[f"__hi_{c}"], bits_per_col
        )
        for c in cols
    ]
    return df.withColumn("__z", _interleave(normed, bits_per_col))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits_per_col: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    z-order curve over ``cols``: range-partition on ``__z`` (each file
    owns a contiguous curve segment, so every clustering column's
    min-max footprint per file is narrow), sort within partitions (so
    row-group stats inside each file are tight too), drop the helper
    column on write. Readers filtering on ANY of ``cols`` then skip
    most files on footer stats alone — the multi-column analog of the
    single-column sort, at the cost of none being perfectly sorted."""
    z = zorder_value(df, cols, bits_per_col)
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(bytes / target)`` files (the streaming-sink hygiene job —
    availableNow micro-batches and foreachBatch appends leave a long
    tail of KB-sized files whose per-file open/footer cost eventually
    dominates scans; at 100 TB, metadata pressure on the driver too).

    Safe-rewrite protocol: write the compacted copy NEXT TO the live
    directory, then swap atomically-enough for a single writer (rename
    live -> .old, compacted -> live, drop .old). ``sort_within_by``
    optionally re-sorts rows within each output file so min-max footer
    stats stay selective after compaction (compaction without a sort
    erases clustering). Returns {files_before, files_after, bytes}.
    """
    import math
    import os
    import shutil

    files = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": total,
    }
