"""Temporal analytics: big-to-big range joins and calendar gap-fill.

Two shapes every time-series warehouse needs that vanilla SQL joins
don't scale to:

* **Interval overlap at big-to-big size.** Spark plans a pure
  non-equi time-range join as BroadcastNestedLoopJoin — fine when one
  side broadcasts (``range_join_price_bands``), a cartesian stall when
  both sides are large. ``operators/intervals.py`` turns it into a
  hash equi-join on a time bin; these queries prove the binned plan
  computes exactly what the naive BETWEEN join computes (the oracle IS
  the naive join).
* **Calendar gap-fill / forward-fill.** Resampling to a dense daily
  spine with zero-fill and last-observation-carried-forward. The scale
  property: the spine join and window run on the *aggregated* series
  (days x groups), never on the fact table — 100 TB of orders
  collapses to a few thousand aggregate rows before any calendar
  logic happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_kafka_project_spark.cache import scoped_persist
from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.functions import dsum
from cdc_kafka_project_spark.operators import intervals as iv
from cdc_kafka_project_spark.registry import query

#: incident fixture: every high-value error event opens a 1-hour window
INCIDENT_VALUE_MIN = 99.0
INCIDENT_SPAN = "INTERVAL 1 HOUR"

_INCIDENT_CTE = f"""
    inc AS (
        SELECT event_id AS incident_id,
               ts AS start_ts,
               ts + {INCIDENT_SPAN} AS end_ts
        FROM events
        WHERE event_type = 'error' AND value >= {INCIDENT_VALUE_MIN}
    )
"""


def _incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-value error events as 1-hour incident windows."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= INCIDENT_VALUE_MIN)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr(INCIDENT_SPAN)).alias("end_ts"),
    )


@query(
    "interval_incident_event_stats",
    oracle=f"""
    WITH {_INCIDENT_CTE}
    SELECT inc.incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM inc JOIN events e ON e.ts BETWEEN inc.start_ts AND inc.end_ts
    GROUP BY inc.incident_id
    """,
)
def interval_incident_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join, big-to-big tier: every event (any user)
    landing inside any incident window, aggregated per incident.

    The plan is a hash equi-join on a 1-hour time bin (facts bin once,
    windows explode to <= 2 bins) followed by the exact BETWEEN
    refinement — shuffle volume |events| + 2|incidents|, no broadcast,
    no nested loop. The oracle is the naive non-equi join, so a green
    row proves bin-and-refine is lossless (match-once by construction:
    a fact has exactly one bin).
    """
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    inc = _incidents(spark, sf_dir)
    joined = iv.bin_point_interval_join(
        ev, inc, fact_ts_col="ts", start_col="start_ts", end_col="end_ts",
        bin_width_sec=3600,
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@query(
    "interval_incident_overlap_pairs",
    oracle=f"""
    WITH {_INCIDENT_CTE}
    SELECT a.incident_id AS incident_a, b.incident_id AS incident_b
    FROM inc a JOIN inc b
      ON a.start_ts <= b.end_ts AND b.start_ts <= a.end_ts
     AND a.incident_id < b.incident_id
    """,
)
def interval_incident_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval overlap join: all pairs of incident windows
    that overlap in time (correlated incidents).

    Both sides explode to their covered bins and equi-join; the
    first-overlap-bin rule emits each overlapping pair exactly once,
    so there is NO post-join distinct — at scale that saves a second
    full shuffle of the pair set. The oracle is the naive non-equi
    self-join.
    """
    inc = _incidents(spark, sf_dir)
    right = inc.select(
        F.col("incident_id").alias("incident_b"),
        F.col("start_ts").alias("r_start_ts"),
        F.col("end_ts").alias("r_end_ts"),
    )
    left = inc.select(
        F.col("incident_id").alias("incident_a"),
        "start_ts",
        "end_ts",
    )
    pairs = iv.bin_interval_overlap_join(
        left, right,
        l_start="start_ts", l_end="end_ts",
        r_start="r_start_ts", r_end="r_end_ts",
        bin_width_sec=3600,
    )
    return pairs.filter(F.col("incident_a") < F.col("incident_b")).select(
        "incident_a", "incident_b"
    )


@query(
    "gapfill_daily_revenue",
    oracle="""
    WITH agg AS (
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_raw,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS rev_raw
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
               CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    days AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    spine AS (
        SELECT p.o_orderpriority, d.day
        FROM (SELECT DISTINCT o_orderpriority FROM orders) p CROSS JOIN days d
    )
    SELECT s.o_orderpriority,
           strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(a.n_raw, 0) AS n_orders,
           COALESCE(a.rev_raw, 0.0) AS revenue,
           last_value(a.rev_raw IGNORE NULLS) OVER (
               PARTITION BY s.o_orderpriority ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ffill_revenue
    FROM spine s
    LEFT JOIN agg a ON s.o_orderpriority = a.o_orderpriority AND s.day = a.day
    """,
)
def gapfill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward fill: daily revenue per order
    priority on a dense day spine — missing days appear with zero
    count/revenue, and ``ffill_revenue`` carries the last observed
    day's revenue forward (LOCF; NULL before the first observation).

    Scale shape: the fact table collapses to |priorities| x |days|
    aggregate rows in one shuffle; the spine (sequence + explode of a
    1-row min/max aggregate — no driver collect) and the LOCF window
    run on that tiny series. Window parallelism is |priorities|, which
    is fine BECAUSE the windowed input is the aggregate, never the
    facts.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate").alias("day")
    # the spine's bounds and priority list derive from the AGGREGATE,
    # not the raw table, so the fact scan happens exactly once (the
    # agg branch is persisted — three consumers would otherwise each
    # re-scan orders; see doc_bigram_logprob for the measured version
    # of this pathology)
    agg = scoped_persist(
        orders.groupBy("o_orderpriority", day).agg(
            F.count(F.lit(1)).alias("n_raw"),
            dsum("o_totalprice").alias("rev_raw"),
        )
    )
    bounds = agg.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    prios = agg.select("o_orderpriority").distinct()
    spine = prios.crossJoin(F.broadcast(days))
    joined = spine.join(agg, ["o_orderpriority", "day"], "left")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "o_orderpriority",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_raw", F.lit(0)).alias("n_orders"),
        F.coalesce("rev_raw", F.lit(0.0)).alias("revenue"),
        F.last("rev_raw", ignorenulls=True).over(w).alias("ffill_revenue"),
    )


@query(
    "gapfill_linear_interp",
    oracle="""
    WITH agg AS (
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS rev
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM agg),
    days AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    spine AS (
        SELECT p.o_orderpriority, d.day
        FROM (SELECT DISTINCT o_orderpriority FROM agg) p CROSS JOIN days d
    ),
    j AS (
        SELECT s.o_orderpriority, s.day, a.rev,
               last_value(a.rev IGNORE NULLS) OVER w_back AS pv,
               last_value(CASE WHEN a.rev IS NOT NULL THEN s.day END
                          IGNORE NULLS) OVER w_back AS pd,
               first_value(a.rev IGNORE NULLS) OVER w_fwd AS nv,
               first_value(CASE WHEN a.rev IS NOT NULL THEN s.day END
                           IGNORE NULLS) OVER w_fwd AS nd
        FROM spine s
        LEFT JOIN agg a ON s.o_orderpriority = a.o_orderpriority
                       AND s.day = a.day
        WINDOW
        w_back AS (PARTITION BY s.o_orderpriority ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_fwd AS (PARTITION BY s.o_orderpriority ORDER BY s.day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS day,
           floor(rev * 100 + 0.5) / 100 AS observed,
           floor((CASE
               WHEN rev IS NOT NULL THEN rev
               WHEN pv IS NULL OR nv IS NULL THEN NULL
               ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                      / CAST(nd - pd AS DOUBLE))
           END) * 100 + 0.5) / 100 AS interp_revenue
    FROM j
    """,
)
def gapfill_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation on the dense day spine — the numeric twin
    of `gapfill_daily_revenue`'s LOCF: a missing day's revenue is
    interpolated between the nearest observed days on each side
    (NULL outside the observed range, where one anchor is missing).

    Same scale shape as the LOCF query: facts collapse to the
    aggregate once, and the two anchor windows (backward
    last-observed, forward first-observed) run over the tiny
    |priorities| x |days| series, never the facts. Interpolation
    arithmetic is ordered identically on both engines and rounded to
    2 decimals.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate").alias("day")
    agg = scoped_persist(
        orders.groupBy("o_orderpriority", day)
        .agg(dsum("o_totalprice").alias("rev"))
    )
    bounds = agg.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    prios = agg.select("o_orderpriority").distinct()
    spine = prios.crossJoin(F.broadcast(days))
    j = spine.join(agg, ["o_orderpriority", "day"], "left")
    w_back = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("rev").isNotNull(), F.col("day"))
    j = j.select(
        "o_orderpriority",
        "day",
        "rev",
        F.last("rev", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("pd"),
        F.first("rev", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("nd"),
    )
    frac = F.datediff(F.col("day"), F.col("pd")).cast("double") / F.datediff(
        F.col("nd"), F.col("pd")
    ).cast("double")
    interp = (
        F.when(F.col("rev").isNotNull(), F.col("rev"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return j.select(
        "o_orderpriority",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.floor(F.col("rev") * 100 + F.lit(0.5)) / 100).alias("observed"),
        (F.floor(interp * 100 + F.lit(0.5)) / 100).alias("interp_revenue"),
    )


EWMA_ALPHA = 0.3


@query(
    "user_spend_ewma",
    oracle=f"""
    WITH p AS (
        SELECT user_id, value, ts, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    series AS (
        SELECT user_id,
               list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
        FROM p GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(xs) AS BIGINT) AS n_purchases,
           floor(list_reduce(xs, (acc, x) ->
                 acc * {1.0 - EWMA_ALPHA} + x * {EWMA_ALPHA})
                 * 1e6 + 0.5) / 1e6 AS ewma_spend
    FROM series
    """,
)
def user_spend_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of purchase
    value — a RECURSIVE (non-associative) per-key computation:
    s_0 = x_0, s_i = (1-a)*s_{{i-1}} + a*x_i in strict event order.
    No window frame or aggregate expresses this, so it is the
    canonical applyInPandas use case: one key-partitioned shuffle,
    then an ordered fold per user inside the Arrow batch. The
    applyInPandas GROUP is a hash bucket of users, not one user —
    each group is a separate Python crossing, so grouping on the raw
    key pays |users| tiny Arrow round-trips (guide §4: measured 6.0 s
    → ~1 s at sf0.1); the per-user fold order inside a bucket is
    identical (sort by user, ts, event_id; fold per user run).

    The oracle folds the same series with DuckDB's list_reduce —
    identical seed and operation ORDER, so IEEE arithmetic agrees
    bit-for-bit and only one floor-form rounding is needed. This row
    pins that the engine's grouped-Python surface computes exactly
    the declared recursion, not an approximation (pandas ewm's
    adjust=True default, for instance, is a DIFFERENT formula).
    """
    import math

    import pandas as pd

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "value", "ts", "event_id")

    a = EWMA_ALPHA
    spark_ = ev.sparkSession
    try:
        n_buckets = int(spark_.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n_buckets = spark_.sparkContext.defaultParallelism
    n_buckets = max(n_buckets, 2)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        uids: list = []
        ns: list = []
        ewmas: list = []
        for uid, grp in pdf.groupby("user_id", sort=False):
            s = None
            for x in grp["value"].astype(float):
                s = x if s is None else (1.0 - a) * s + a * x
            uids.append(uid)
            ns.append(len(grp))
            ewmas.append(math.floor(s * 1e6 + 0.5) / 1e6)
        return pd.DataFrame(
            {"user_id": uids, "n_purchases": ns, "ewma_spend": ewmas}
        )

    return (
        ev.withColumn(
            "__b", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
        )
        .groupBy("__b")
        .applyInPandas(
            fold, "user_id long, n_purchases long, ewma_spend double"
        )
    )
