"""As-of (point-in-time) join — the two-table operator.

The reference has no joins at all (SURVEY §2 deliberate-absences), but
any user replaying its change-streams against market/telemetry data
immediately needs "latest right row at-or-before each left row". Spark
has no native ASOF JOIN (DuckDB/Pandas do), and the naive formulation —
range-condition join + row_number — explodes quadratically on hot keys.

This is the scalable composition: tag both sides, union, one window
pass per key ordered by time, ``last(<right-row struct>,
ignorenulls=True)`` carries the most recent right row forward onto each
left row. The sweep moves ONE struct, not per-column lasts — a right
row whose value column is legitimately NULL still matches as a unit
(per-column sweeps would stitch columns from different right rows).

``direction="nearest"`` runs BOTH sweeps over the same union in one
plan (two window functions, same key partitioning — one exchange, two
sorts) and picks per-row; there is no rejoin of the two directional
results, so NULL left-payload values and duplicate left rows pass
through untouched (an earlier join-based recombine dropped NULL rows
and fanned out duplicates).

Cost model at 100 TB: ONE shuffle of |left| + |right| rows on the key
(the same exchange a plain equi-join would do), then a linear
per-partition sort-and-sweep. No range explosion, no per-key state
beyond the sort. Skewed keys behave exactly like any window over a hot
key (AQE/salting applies); pre-bucketed inputs join shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

#: suffix applied to right-side value columns in the output
DEFAULT_SUFFIX = "_asof"


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    rvals: list[str],
    lcols: list[str],
) -> DataFrame:
    """Union of both sides with a ``__side`` tag (right=0, left=1), a
    common ``__ts`` event-time column, and the right row packed into a
    single ``__r`` struct (NULL on left rows so ``last(ignorenulls)``
    skips them)."""
    r_row = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in rvals],
    )
    r_row_type = StructType(
        [StructField("__rts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in rvals]
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        # typed NULL struct so last(ignorenulls) skips left rows
        F.lit(None).cast(r_row_type).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        r_row.alias("__r"),
    )
    return l_tagged.unionByName(r_tagged)


def _split_cols(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str] | None,
) -> tuple[list[str], list[str]]:
    rvals = list(
        right_value_cols
        if right_value_cols is not None
        else [c for c in right.columns if c not in keys and c != right_ts]
    )
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    return rvals, lcols


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = DEFAULT_SUFFIX,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``direction="backward"`` (default): for every left
    row, the right row with the greatest ``right_ts`` <= ``left_ts``
    for the same key (inclusive on equal timestamps, matching DuckDB
    ``ASOF JOIN ... ON r.ts <= l.ts``). ``direction="forward"``: the
    smallest ``right_ts`` >= ``left_ts`` (DuckDB ``ON r.ts >= l.ts``,
    pandas ``merge_asof(direction="forward")``) — the sweep just runs
    time-descending.

    Returns every left row (left-outer semantics) plus, per requested
    right value column, ``<col><suffix>`` — NULL when no right row
    precedes it — and ``<right_ts><suffix>``, the matched timestamp.

    ``tolerance_seconds`` voids matches older than the tolerance
    (``left_ts - matched_ts > tolerance`` -> NULLs), the pandas
    ``merge_asof(tolerance=...)`` contract.

    If the right side can carry duplicate (key, ts) rows, dedup it
    first (e.g. ``latest_per_key``) — the sweep would otherwise pick
    the duplicate that sorts last, which is deterministic only with a
    total order.
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, key_cols, left_ts, right_ts,
            right_value_cols, tolerance_seconds, suffix,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = list(key_cols)
    rvals, lcols = _split_cols(
        left, right, keys, left_ts, right_ts, right_value_cols
    )
    # right rows sort BEFORE a left row at the same instant
    # (__side 0 < 1) => inclusive match in either direction; forward
    # sweeps time-descending so "preceding" rows are future ones
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = _tag_union(
        left, right, keys, left_ts, right_ts, rvals, lcols
    ).withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    def _gate(col: Column) -> Column:
        if tolerance_seconds is None:
            return col
        gap = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__rts"))
        if direction == "forward":
            gap = -gap
        age_ok = gap <= int(tolerance_seconds * 1_000_000)
        return F.when(F.col("__m").isNotNull() & age_ok, col)

    return swept.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__ts").alias(left_ts),
        *lcols,
        *[_gate(F.col(f"__m.{c}")).alias(f"{c}{suffix}") for c in rvals],
        _gate(F.col("__m.__rts")).alias(f"{right_ts}{suffix}"),
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str] | None,
    tolerance_seconds: float | None,
    suffix: str,
) -> DataFrame:
    """direction="nearest" (pandas merge_asof parity): per left row the
    right row with the smallest |gap|, ties to the EARLIER right row
    (pandas breaks nearest-ties backward). Both directional sweeps run
    as two window functions over ONE tagged union — same key
    partitioning (one exchange, two sorts), then a per-row pick. No
    rejoin, so left rows with NULL payloads or exact duplicates keep
    strict left-outer row-for-row semantics. Tolerance applies to the
    absolute gap on each side independently before the pick."""
    keys = list(key_cols)
    rvals, lcols = _split_cols(
        left, right, keys, left_ts, right_ts, right_value_cols
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = (
        _tag_union(left, right, keys, left_ts, right_ts, rvals, lcols)
        .withColumn("__mb", F.last("__r", ignorenulls=True).over(wb))
        .withColumn("__mf", F.last("__r", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
    )
    bgap = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__mb.__rts"))
    fgap = F.unix_micros(F.col("__mf.__rts")) - F.unix_micros(F.col("__ts"))
    b_ok = F.col("__mb").isNotNull()
    f_ok = F.col("__mf").isNotNull()
    if tolerance_seconds is not None:
        tol = int(tolerance_seconds * 1_000_000)
        b_ok = b_ok & (bgap <= tol)
        f_ok = f_ok & (fgap <= tol)
    # pick backward when it qualifies and is at-least-as-close (tie ->
    # the earlier row, i.e. backward), else forward if it qualifies
    use_b = b_ok & (~f_ok | (bgap <= fgap))

    def _pick(name: str) -> Column:
        return (
            F.when(use_b, F.col(f"__mb.{name}"))
            .when(f_ok, F.col(f"__mf.{name}"))
        )

    return swept.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *lcols,
        *[_pick(c).alias(f"{c}{suffix}") for c in rvals],
        _pick("__rts").alias(f"{right_ts}{suffix}"),
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    right_value_cols: Sequence[str] = (),
    suffix: str = "_r",
    num_buckets: int | None = None,
) -> DataFrame:
    """As-of join via ``groupBy().cogroup().applyInPandas`` — the
    grouped-Pandas twin of :func:`asof_join` (backward direction,
    inclusive ties), built on ``pandas.merge_asof``.

    Same contract as :func:`asof_join`: left rows all survive
    (left-outer), the matched right row's ``ts`` and value columns are
    appended with ``suffix``, and the right side must be unique per
    (keys, ts).

    The cogroup key is NOT the raw join key: each applyInPandas group
    is one Python crossing, so cogrouping on a high-cardinality key
    (millions of users) pays millions of tiny Arrow round-trips —
    measured 13.6 s vs 1.4 s for the same data at sf0.1. Both sides
    are instead cogrouped on ``pmod(xxhash64(keys), num_buckets)``
    (deterministic — guide §2.5's retry-safe synthetic key) and
    ``merge_asof(by=keys)`` does the per-key alignment inside each
    bucket batch: bit-identical results, bounded group count.
    ``num_buckets`` defaults to the session's shuffle width (the
    SPARK_GRAFT_SHUFFLE_PARTITIONS knob at replica scale), so bucket
    state stays ~one task's share of rows at any data size.

    When to use which: the tag-union-window operator is the hot path —
    ONE exchange over the union, pure JVM. Cogroup still shuffles BOTH
    sides and crosses into Python, so it costs more for the same
    semantics; its value is the shape — when per-key alignment logic
    outgrows SQL (model scoring against a per-key state, custom
    matching rules), this is the idiomatic Spark surface for it, and
    buckets parallelize across executors with Arrow-batched transfer.
    """
    import pandas as pd

    keys = list(keys)
    rvals = list(right_value_cols)
    # Self-join hygiene: when left and right derive from the same source
    # DataFrame, their columns carry identical Catalyst attribute ids and
    # the cogroup plan deduplicates them — the Python worker then receives
    # a right frame missing the shared-name columns. Re-aliasing mints
    # fresh attribute ids (a no-op projection otherwise).
    right = right.select([F.col(c).alias(c) for c in right.columns])
    out_schema = StructType(list(left.schema.fields))
    out_schema = out_schema.add(
        f"{ts_col}{suffix}", right.schema[ts_col].dataType
    )
    for c in rvals:
        out_schema = out_schema.add(f"{c}{suffix}", right.schema[c].dataType)
    int_like = {
        f.name
        for f in out_schema.fields
        if f.name.endswith(suffix) and f.dataType.simpleString() in ("bigint", "int")
    }
    left_cols = [f.name for f in left.schema.fields]

    spark = left.sparkSession
    if num_buckets is None:
        try:
            num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            num_buckets = spark.sparkContext.defaultParallelism
        num_buckets = max(num_buckets, 2)
    bcol = "__asof_bucket"
    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets))

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # merge_asof(by=keys) needs both frames sorted by the ON column
        # only; per-key backward-inclusive matching is identical to the
        # per-group form (right unique per (keys, ts) by contract).
        l = l.sort_values(ts_col, kind="mergesort")[left_cols]
        if l.empty or r.empty:
            out = l.copy()
            out[f"{ts_col}{suffix}"] = pd.NaT
            for c in rvals:
                out[f"{c}{suffix}"] = None
        else:
            r2 = r.sort_values(ts_col, kind="mergesort")[
                [*keys, ts_col, *rvals]
            ]
            r2 = r2.rename(columns={c: f"{c}{suffix}" for c in rvals})
            r2[f"{ts_col}{suffix}"] = r2[ts_col]
            # NULL-key alignment (r15 advice item 3): Spark's window
            # twin partitions with null == null (a null-key left row
            # matches null-key right rows on ts alone), but pandas
            # merge_asof(by=...) never aligns NaN/NaT/None groups. Merge
            # on TEMP by-columns instead; a key column that carries a
            # null in either frame is normalized to object dtype with a
            # sentinel standing in for null (the fast no-null path
            # passes the original column through untouched). The left
            # frame's real key columns reach the output unmodified.
            by_tmp = []
            for i, k in enumerate(keys):
                bk = f"__by_{i}"
                by_tmp.append(bk)
                if l[k].isna().any() or r2[k].isna().any():
                    sent = "\x00__asof_null__"
                    l[bk] = l[k].astype(object).where(l[k].notna(), sent)
                    r2[bk] = r2[k].astype(object).where(r2[k].notna(), sent)
                else:
                    l[bk] = l[k]
                    r2[bk] = r2[k]
            r2 = r2[[*by_tmp, ts_col, f"{ts_col}{suffix}",
                     *[f"{c}{suffix}" for c in rvals]]]
            out = pd.merge_asof(
                l, r2, on=ts_col, by=by_tmp, direction="backward"
            ).drop(columns=by_tmp)
        for c in int_like:
            out[c] = out[c].astype("Int64")
        return out

    return (
        left.withColumn(bcol, bucket)
        .groupBy(bcol)
        .cogroup(right.withColumn(bcol, bucket).groupBy(bcol))
        .applyInPandas(merge, out_schema)
    )
