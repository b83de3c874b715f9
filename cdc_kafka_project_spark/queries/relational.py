"""Relational operator surface: scalar exprs, filters, aggregation, sort,
joins, windows, set ops (SURVEY.md §2 #2-#6, #12-#14, #20, #22-#26 and
§7.3's "free extended surface").

The reference delegates all relational work to Postgres SQL + Python
loops; here each operator is a declarative DataFrame program whose plan
Catalyst optimizes (pushdown, pruning, broadcast selection, AQE). Every
double aggregate uses exact decimal sums (functions.dsum) so the answer
is independent of partitioning — see functions/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.functions import (
    CHARGE_DEC_SQL,
    REVENUE_DEC_SQL,
    charge_dec,
    davg,
    dsum,
    revenue_dec,
)
from cdc_kafka_project_spark.registry import query

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST({CHARGE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical grouped-aggregate scan.

    Map-side partial aggregation + one shuffle on the (tiny) group key;
    at 100 TB this is scan-bound, which is the right bottleneck.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = revenue_dec()
    charge = charge_dec()
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "grouped_floor_sum",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS total_floor_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def grouped_floor_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project-1 department running-sum analog (ops #24, #26; pdf p.3-6):
    floor() the measure, accumulate as integer per group."""
    od = _t(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.sum(F.floor("o_totalprice")).cast("long").alias("total_floor_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "distinct_counts",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under the hood).
    The approximate twin (HLL approx_count_distinct, constant memory at
    100 TB) is exercised in tests — it has no exact oracle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: rollup over two keys (subtotals + grand total)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "pivot_qty",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS VARCHAR) AS DOUBLE) AS qty_O,
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS VARCHAR) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — never let
    pivot() scan for distinct values at scale."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


# ---------------------------------------------------------------------------
# Scalar expressions / filters / sort-limit
# ---------------------------------------------------------------------------


@query(
    "scalar_exprs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_price,
           lower(o_orderpriority) AS priority_lc,
           substr(o_orderpriority, 1, 1) AS priority_code,
           CAST(o_totalprice AS VARCHAR) AS price_str
    FROM orders
    WHERE year(o_orderdate) >= 1998
    """,
)
def scalar_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar expression pack (ops #6, #12, #13, #24, #25): year-extract
    filter, floor, lower, substring, cast-to-string — all codegen'd."""
    od = _t(spark, sf_dir, "orders")
    return od.filter(F.year("o_orderdate") >= 1998).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.floor("o_totalprice").cast("long").alias("floor_price"),
        F.lower("o_orderpriority").alias("priority_lc"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        F.col("o_totalprice").cast("string").alias("price_str"),
    )


@query(
    "in_list_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_type IN ('signup', 'purchase', 'error')
    """,
)
def in_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (op #23; pdf p.3's department IN (ECC,CIT,EMS))."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        F.col("event_type").isin("signup", "purchase", "error")
    ).select("event_id", "user_id", "event_type")


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + limit (ops #4, #20). Spark plans TakeOrderedAndProject —
    per-partition heaps, no global sort. Deterministic tiebreak on key."""
    od = _t(spark, sf_dir, "orders")
    return od.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    ).limit(20)


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.

    customer (filtered) broadcasts; lineitem⋈orders is the one real
    shuffle. Filters sit on the scans so parquet prunes row groups.
    """
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15 00:00:00"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15 00:00:00"
    )
    joined = li.join(
        od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey),
        F.col("l_orderkey") == od.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(revenue_dec()).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join (region->nation->customer->orders->lineitem).

    nation/region are true dimensions and carry explicit broadcast
    hints. customer is NOT a dimension at 100 TB (~15 B rows at TPC-H
    proportions), so the customer⋈orders edge carries no hint — AQE
    picks broadcast when the post-filter customer side is actually
    small (it is at test SFs) and falls back to a shuffle join when it
    isn't. Only orders⋈lineitem always shuffles.
    """
    re = _t(spark, sf_dir, "region")
    na = _t(spark, sf_dir, "nation")
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = cu.join(
        F.broadcast(na.join(F.broadcast(re), na.n_regionkey == re.r_regionkey)),
        cu.c_nationkey == na.n_nationkey,
    )
    joined = li.join(od, li.l_orderkey == od.o_orderkey).join(
        dims, od.o_custkey == dims.c_custkey
    )
    return joined.groupBy("r_name", "n_name").agg(
        dsum(revenue_dec()).alias("revenue")
    )


@query(
    "semi_join_big_spenders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cu.join(
        od, cu.c_custkey == od.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_no_big_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def anti_join_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): the complement set."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cu.join(
        od, cu.c_custkey == od.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "outer_join_nation_counts",
    oracle="""
    SELECT n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_customers
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def outer_join_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving empty groups (COUNT(col) skips nulls)."""
    na = _t(spark, sf_dir, "nation")
    cu = _t(spark, sf_dir, "customer")
    return (
        na.join(cu, na.n_nationkey == cu.c_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_active_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def set_union_active_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) across two derived key sets."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    a = cu.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    b = od.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@query(
    "set_except_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def set_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): rich customers who never placed a 450k+ order."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    a = cu.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    b = od.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b).distinct()


# ---------------------------------------------------------------------------
# Window functions / event-time patterns
# ---------------------------------------------------------------------------


@query(
    "window_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ranked window — one shuffle on the group key.
    AQE handles group-count skew; no driver-side grouping ever."""
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        od.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(25,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running total over event time — the window-function form
    of the reference's per-message accumulator (op #26)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double")
    return ev.select("user_id", "event_id", running.alias("running_value"))


@query(
    "sessionize",
    oracle="""
    SELECT user_id, event_id, CAST(session_id AS BIGINT) AS session_id FROM (
        SELECT user_id, event_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session assignment via lag + cumulative
    sum. Gap math in exact integer microseconds so engines agree. The
    streaming twin is session_window() (tests/test_streaming.py)."""
    return sessionize_frame(_t(spark, sf_dir, "events"))


def sessionize_frame(ev: DataFrame) -> DataFrame:
    """Frame-level sessionize (the registered query over any events-
    shaped frame — also pinned on the adversarial skew fixture by
    tests/test_skew.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > 1800 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum).cast("long"))
        .select("user_id", "event_id", "session_id")
    )


@query(
    "asof_last_purchase",
    oracle=f"""
    SELECT event_id, user_id,
           strftime(MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    '{TS_FMT_DUCK}') AS last_purchase_time
    FROM events
    """,
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) lookup: for every event, the most recent
    purchase at-or-before it for the same key — the window-composition
    form of an as-of join (no native operator needed when the probe and
    build sides share a key)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.date_format(last_purchase, TS_FMT_SPARK).alias("last_purchase_time"),
    )


@query(
    "tumbling_hourly_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form; the streaming twin uses
    window()+watermark — tests/test_streaming.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("total_value"),
        )
    )


@query(
    "asof_join_purchases",
    oracle=f"""
    WITH c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, ts, value, event_id
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '{TS_FMT_DUCK}') AS click_time,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_time,
           p.value AS purchase_value,
           p.event_id AS purchase_event_id
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True two-table as-of join (operators/asof.py): every click joined
    to the user's latest purchase at-or-before it. The oracle is
    DuckDB's NATIVE ASOF JOIN, so the union+window composition is
    checked against an independent as-of implementation, not a mirror
    of itself. Right side deduped per (user, ts) first — the operator's
    documented precondition."""
    from cdc_kafka_project_spark.operators.asof import asof_join
    from cdc_kafka_project_spark.operators.cdc import latest_per_key

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = latest_per_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value", "event_id"
        ),
        ["user_id", "ts"],
        ["event_id"],
    )
    out = asof_join(
        clicks,
        purchases,
        ["user_id"],
        right_value_cols=["value", "event_id"],
        suffix="_p",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("click_time"),
        F.date_format("ts_p", TS_FMT_SPARK).alias("purchase_time"),
        F.col("value_p").alias("purchase_value"),
        F.col("event_id_p").alias("purchase_event_id"),
    )


@query(
    "asof_join_next_purchase",
    oracle=f"""
    WITH c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, ts, event_id
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1
    )
    SELECT c.event_id, c.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS next_purchase_time,
           p.event_id AS next_purchase_event_id
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
)
def asof_join_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (time-to-conversion analysis: for every click,
    the user's NEXT purchase at-or-after it) — the operator's forward
    sweep checked against DuckDB's native ASOF JOIN with the reversed
    inequality."""
    from cdc_kafka_project_spark.operators.asof import asof_join
    from cdc_kafka_project_spark.operators.cdc import latest_per_key

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = latest_per_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        ),
        ["user_id", "ts"],
        ["event_id"],
    )
    out = asof_join(
        clicks,
        purchases,
        ["user_id"],
        right_value_cols=["event_id"],
        suffix="_p",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts_p", TS_FMT_SPARK).alias("next_purchase_time"),
        F.col("event_id_p").alias("next_purchase_event_id"),
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH fv AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), fc AS (
        SELECT e.user_id, MIN(e.ts) AS first_click
        FROM events e JOIN fv ON e.user_id = fv.user_id
        WHERE e.event_type = 'click' AND e.ts >= fv.first_view
        GROUP BY e.user_id
    ), fp AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN fc ON e.user_id = fc.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM fv) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM fc) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM fp) AS BIGINT) AS n_purchase
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (product analytics): users who viewed, then
    clicked at-or-after their first view, then purchased at-or-after
    that click.

    Scan discipline (r11): 2 executed scans of events, down from 5 —
    scan 1 (filter-pushed to 'view') reduces to first-view per user;
    scan 2 reads clicks AND purchases together (filter-pushed IN
    list), joins the checkpointed first-view frame on user_id, and
    one keyed aggregation computes first-qualifying-click per user
    while collecting that user's purchase timestamps (purchases are
    the rarest funnel stage, so the per-user array is the smallest of
    the three types — views, the heavy type, are never collected).
    The first purchase at-or-after the first click is then an array
    lookup, no third pass over the stream."""
    from cdc_kafka_project_spark import cache

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = cache.scoped_localcheckpoint(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    cp = ev.filter(F.col("event_type").isin("click", "purchase"))
    per_user = (
        cp.join(fv, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).alias("first_click"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("event_type") == "purchase", F.col("ts"))
                )
            ).alias("__purchases"),
        )
        .withColumn(
            "first_purchase",
            F.when(
                F.col("first_click").isNotNull(),
                F.array_min(
                    F.filter(
                        "__purchases", lambda t: t >= F.col("first_click")
                    )
                ),
            ),
        )
    )
    return per_user.groupBy().agg(
        # every per_user row joined fv, but fv rows with no click or
        # purchase events don't reach per_user — count views from fv
        F.count(F.lit(1)).alias("n_click_or_purchase"),
        F.count("first_click").alias("n_click"),
        F.count("first_purchase").alias("n_purchase"),
    ).crossJoin(
        F.broadcast(fv.groupBy().agg(F.count(F.lit(1)).alias("n_view")))
    ).select("n_view", "n_click", "n_purchase")


@query(
    "weekly_retention_cohorts",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ), cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id
    )
    SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week,
           CAST((a.week - c.cohort_week) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_week, week_offset
    """,
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (the growth-analytics staple): bucket each user
    by first-active week, count distinct users active at each week
    offset. Two keyed aggregations (per-user-week activity dedup, then
    per-user min) plus one user-keyed join — the activity dedup
    collapses the event stream to |user x active-week| rows FIRST, so
    the join and everything after run on the collapsed set, not the
    raw 100 TB stream. Spark's date_trunc('week') and DuckDB's both
    start weeks on Monday."""
    ev = _t(spark, sf_dir, "events")
    act = (
        ev.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "session_stats",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
               AS duration_sec,
           CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level rollup on top of sessionize: events, duration,
    value per (user, session). The session assignment reuses the same
    lag+cumsum window (one user-keyed shuffle); the rollup groups on
    (user, session) — already co-partitioned by user, so AQE plans the
    second agg without a new exchange. Duration in whole seconds via
    exact integer-microsecond arithmetic."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > 1800 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(cum).cast("long")
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # integer division (both engines floor): float/1e6 + cast would
        # truncate in Spark but round in DuckDB's double->BIGINT cast
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000"
        ).alias("duration_sec"),
        dsum("value").alias("total_value"),
    )


@query(
    "weekly_revenue_wow",
    oracle="""
    WITH w AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
               SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT CAST(week AS VARCHAR) AS week,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
           floor((CAST(CAST(rev AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(lag(rev) OVER (ORDER BY week) AS VARCHAR)
                         AS DOUBLE) - 1)
                 * 1e6 + 0.5) / 1e6 AS wow_change
    FROM w
    """,
)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change: aggregate FIRST (per-week decimal
    sums — one partial-agg shuffle over the fact table), THEN window
    over the tiny aggregated series. The single-partition window is
    safe exactly because it runs on |weeks| rows, never the fact table
    — the ordering trap this query exists to demonstrate."""
    od = _t(spark, sf_dir, "orders")
    weekly = od.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("week")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("rev"))
    w = Window.orderBy("week")
    return weekly.select(
        F.col("week").cast("string").alias("week"),
        F.col("rev").cast("double").alias("revenue"),
        (
            F.floor(
                (
                    F.col("rev").cast("double")
                    / F.lag("rev").over(w).cast("double")
                    - 1
                )
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("wow_change"),
    )


@query(
    "session_window_native",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id))
                            > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the NATIVE session_window aggregation (the
    same data-driven 30-min-gap windows Structured Streaming maintains
    as state) — the one-expression twin of the lag+cumsum `sessionize`
    query, sharing one oracle definition: a session starts where the
    gap exceeds the timeout.

    session_window's window START is min(ts) of the session by
    construction, which is what the gaps-and-islands oracle groups on
    — so the two formulations must agree row-for-row. One keyed
    shuffle; merging overlapping proto-windows happens inside the agg."""
    ev = _t(spark, sf_dir, "events")
    sw = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sw.select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        "n_events",
    )


@query(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via the native unpivot (melt) operator —
    the inverse of pivot_qty. Catalyst plans one Expand over the scan
    (each row fans out to |measures| rows map-side), NOT |measures|
    self-unions re-reading the table — the reason this form survives a
    100 TB input where the UNION ALL oracle would scan it three
    times."""
    li = _t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


@query(
    "asof_join_cogrouped",
    oracle=f"""
    WITH c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, ts, value, event_id
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '{TS_FMT_DUCK}') AS click_time,
           strftime(p.ts, '{TS_FMT_DUCK}') AS purchase_time,
           p.value AS purchase_value,
           p.event_id AS purchase_event_id
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def asof_join_cogrouped_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cogroup/applyInPandas as-of form (pandas merge_asof per key
    group) against the SAME DuckDB native-ASOF oracle as
    `asof_join_purchases` — three independent implementations of one
    semantic (tag-union-window, pandas merge_asof, DuckDB ASOF) now
    cross-check each other. This is also the registry's
    `cogroup().applyInPandas` API-surface row."""
    from cdc_kafka_project_spark.operators.asof import asof_join_cogrouped
    from cdc_kafka_project_spark.operators.cdc import latest_per_key

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = latest_per_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value", "event_id"
        ),
        ["user_id", "ts"],
        ["event_id"],
    )
    out = asof_join_cogrouped(
        clicks,
        purchases,
        ["user_id"],
        right_value_cols=["value", "event_id"],
        suffix="_p",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("click_time"),
        F.date_format("ts_p", TS_FMT_SPARK).alias("purchase_time"),
        F.col("value_p").alias("purchase_value"),
        F.col("event_id_p").alias("purchase_event_id"),
    )
