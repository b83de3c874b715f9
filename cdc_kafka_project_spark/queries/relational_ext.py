"""Extended relational surface: TPC-H-shaped subquery/join/agg patterns.

The reference delegates everything relational to Postgres (SURVEY.md §2,
§4) — a user switching engines expects the full ANSI surface, so this
module covers the shapes the core module (relational.py) doesn't:
correlated EXISTS, scalar subqueries, min-per-group joins, HAVING,
disjunctive join predicates, CUBE, INTERSECT, exact percentiles,
string/date/JSON scalar packs, and a broadcast range join.

Every query follows the parity rules in registry.py (exact decimal
sums, aliased columns, dates not raw timestamps). Scale notes sit on
each query: which side broadcasts, where the one shuffle is, what AQE
does at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.cache import scoped_localcheckpoint
from cdc_kafka_project_spark.functions import (
    DISCOUNT_AMOUNT_DEC_SQL,
    REVENUE_DEC_SQL,
    davg,
    discount_amount_dec,
    dsum,
    fround,
    local_rows_df,
    revenue_dec,
)
from cdc_kafka_project_spark.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(25,6)")


# ---------------------------------------------------------------------------
# Aggregate-only shapes
# ---------------------------------------------------------------------------


@query(
    "q6_revenue_delta",
    oracle=f"""
    SELECT CAST(CAST(SUM(CAST({DISCOUNT_AMOUNT_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single global aggregate.

    Both predicates push to the parquet scan (row-group min/max prune);
    the agg is map-side partial + a 1-row final — scan-bound at any SF.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
    ).agg(dsum(discount_amount_dec()).alias("revenue"))


@query(
    "percentile_prices",
    oracle="""
    SELECT floor((quantile_cont(o_totalprice, 0.5)) * 1e4 + 0.5) / 1e4 AS p50,
           floor((quantile_cont(o_totalprice, 0.9)) * 1e4 + 0.5) / 1e4 AS p90,
           floor((median(o_totalprice)) * 1e4 + 0.5) / 1e4 AS med
    FROM orders
    """,
)
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation, matches quantile_cont).

    Exact percentile sorts within groups — fine for a global scalar; at
    100 TB the streaming-friendly twin is approx_percentile (KLL-style
    sketch, constant memory, mergeable) which has no exact oracle and is
    pinned in tests instead.
    """
    od = _t(spark, sf_dir, "orders")
    return od.agg(
        fround(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        fround(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        fround(F.median("o_totalprice"), 4).alias("med"),
    )


@query(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping sets in one pass (Expand + single shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


# ---------------------------------------------------------------------------
# Subquery shapes (EXISTS / scalar / min-per-group / HAVING)
# ---------------------------------------------------------------------------


@query(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi term.

    Planned as a left-semi hash join on the equi key with the range
    term as the join residual — one shuffle, no decorrelation gymnastics.
    """
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hit = od.join(
        li,
        (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q17_small_qty_avg",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem, (SELECT l_partkey AS agg_pk,
                           0.2 * AVG(l_quantity) AS small_qty
                    FROM lineitem GROUP BY l_partkey) pq
    WHERE l_partkey = agg_pk AND l_quantity < small_qty
    """,
)
def q17_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-key average)
    decorrelated into an aggregate + self-join.

    The per-part agg output is |parts| rows — orders of magnitude
    smaller than lineitem — so it re-joins cheaply on the already
    shuffled key; AQE picks broadcast when it fits.
    """
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("small_qty")
    )
    return (
        li.join(
            per_part,
            (li.l_partkey == per_part.agg_pk)
            & (li.l_quantity < per_part.small_qty),
        )
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered IN subquery -> semi join -> agg.

    The HAVING agg reuses lineitem's orderkey shuffle; the surviving key
    set is small, so the semi join broadcasts under AQE.
    """
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        od.join(big.withColumnRenamed("l_orderkey", "bk"),
                od.o_orderkey == F.col("bk"), "left_semi")
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


@query(
    "q2_min_price_per_type",
    oracle="""
    SELECT p.p_type, p.p_partkey, p.p_retailprice
    FROM part p JOIN (SELECT p_type, MIN(p_retailprice) AS mn
                      FROM part GROUP BY p_type) m
    ON p.p_type = m.p_type AND p.p_retailprice = m.mn
    """,
)
def q2_min_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group subquery joined back (all rows
    achieving their group's minimum — ties included, unlike row_number).

    The group-min side is |types| rows -> broadcast; part scans once.
    """
    pt = _t(spark, sf_dir, "part")
    mins = pt.groupBy(F.col("p_type").alias("mt")).agg(
        F.min("p_retailprice").alias("mn")
    )
    return (
        pt.join(
            F.broadcast(mins),
            (pt.p_type == F.col("mt")) & (pt.p_retailprice == F.col("mn")),
        )
        .select("p_type", "p_partkey", "p_retailprice")
    )


@query(
    "q15_top_suppliers",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6)))
               AS total_rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey AS suppkey,
           CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_rev
    FROM rev WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar MAX subquery over a derived aggregate.

    The equality compare happens on the exact DECIMAL revenue (not
    double), so ties and the max are engine-independent. The 1-row max
    broadcasts via cross join; the agg is computed once and reused
    (Spark dedups the shared subplan under AQE reuse).
    """
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_dec(revenue_dec())).alias(
            "rev_dec"
        )
    )
    mx = rev.agg(F.max("rev_dec").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.rev_dec == F.col("mx"))
        .select("suppkey", F.col("rev_dec").cast("double").alias("total_rev"))
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000)
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery threshold + anti join
    (rich customers who never placed a 350k+ order).

    The threshold is one row (exact decimal mean -> double, same bits on
    both engines) cross-joined broadcast; the NOT EXISTS is a left-anti
    hash join on the customer key.
    """
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    thr = cu.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("thr")
    )
    return (
        cu.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Join shapes (CASE agg, conditional share, disjunctive, variety, range)
# ---------------------------------------------------------------------------


@query(
    "q12_priority_case_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-conditional counts in one agg pass."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01 00:00:00"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


@query(
    "q14_promo_share",
    oracle=f"""
    -- 100.0 multiplies AFTER the varchar-routed decimal->double cast
    -- (100.0 * SUM(decimal) would convert via DuckDB's double-rounding
    -- decimal->double path before the wrap), mirroring the Spark side:
    -- lit(100.0) * sum(promo).cast(double) / sum(rev).cast(double)
    SELECT 100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))
                   ELSE CAST(0 AS DECIMAL(25,6)) END) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share over a dim join.

    part is the dimension -> broadcast, so lineitem never shuffles; the
    ratio is exact-decimal-summed on both branches before the divide.
    """
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    rev = _dec(revenue_dec())
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(25,6)")
    )
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21)
    GROUP BY p_brand, p_type
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: filtered dim join + grouped COUNT(DISTINCT).

    (lineitem stands in for partsupp — the reference data has no
    partsupp table.) Distinct agg = two-phase partial dedup then count;
    the filtered part side broadcasts.
    """
    pt = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides.

    Catalyst extracts the common single-side conjuncts (brand/size on
    part, quantity range on lineitem) and pushes them below the join as
    a disjunctive prefilter; the full predicate stays as the residual.
    """
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(c1 | c2 | c3).agg(
        dsum(revenue_dec()).alias(
            "revenue"
        )
    )


@query(
    "range_join_price_bands",
    oracle="""
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    JOIN (VALUES ('p00_100k', 0.0, 100000.0),
                 ('p100_250k', 100000.0, 250000.0),
                 ('p250_400k', 250000.0, 400000.0),
                 ('p400k_up', 400000.0, 1e18)) AS b(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: fact rows matched to interval buckets by a
    pure inequality predicate — no equi key.

    The band table is tiny and broadcast, so this plans as
    BroadcastNestedLoopJoin: each fact partition scans k intervals —
    O(rows * k) map-side work, zero shuffle, the only scalable shape
    for a non-equi join. (If bands were numerous, the scale path is
    binning: compute the bucket id with width_bucket-style arithmetic
    and equi-join on it.)
    """
    # project to the single joined/aggregated column BEFORE the nested
    # loop: BNLJ copies its input rows once per probed interval, so row
    # width multiplies directly into join cost
    od = _t(spark, sf_dir, "orders").select("o_totalprice")
    bands = local_rows_df(
        spark,
        [
            ("p00_100k", 0.0, 100000.0),
            ("p100_250k", 100000.0, 250000.0),
            ("p250_400k", 250000.0, 400000.0),
            ("p400k_up", 400000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        od.join(
            F.broadcast(bands),
            (od.o_totalprice >= bands.lo) & (od.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Set op + scalar expression packs
# ---------------------------------------------------------------------------


@query(
    "set_intersect_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def set_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): rich customers who did place a 450k+ order."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    a = cu.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    b = od.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_uc,
           concat(c_mktsegment, ':', c_name) AS tagged,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(length(c_name) AS INT) AS name_len,
           CAST(c_name LIKE '%1%' AS BOOLEAN) AS has_one,
           replace(c_mktsegment, 'ING', '') AS seg_short
    FROM customer
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar pack: upper/concat/lpad/regexp_extract/length/LIKE/
    replace — all codegen'd JVM expressions, no UDFs (SURVEY §2 #12)."""
    cu = _t(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("name_uc"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias(
            "tagged"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.length("c_name").cast("int").alias("name_len"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.replace(F.col("c_mktsegment"), F.lit("ING"), F.lit("")).alias(
            "seg_short"
        ),
    )


@query(
    "date_exprs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT)
               AS days_since_95,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(quarter(o_orderdate) AS INT) AS qtr
    FROM orders
    """,
)
def date_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar pack: datediff, interval add, trunc, last_day,
    ISO weekday, quarter (SURVEY §2 #13/#25 generalized)."""
    od = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return od.select(
        "o_orderkey",
        d.alias("odate"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias(
            "days_since_95"
        ),
        F.date_add(d, 90).alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.dayofweek(d).alias("dow_raw")  # Sun=1 .. Sat=7
        .cast("int"),
        F.quarter(d).cast("int").alias("qtr"),
    ).withColumn(
        # ISO weekday (Mon=1..Sun=7) from Spark's Sun=1..Sat=7
        "iso_dow",
        ((F.col("dow_raw") + 5) % 7 + 1).cast("int"),
    ).select(
        "o_orderkey", "odate", "days_since_95", "due_date",
        "month_start", "month_end", "iso_dow", "qtr",
    )


@query(
    "event_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
           CAST(json_extract_string(props, '$.missing') AS INT) AS prop_missing
    FROM events
    """,
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON prop extraction (SURVEY §7.5): path access on
    a string column; missing paths yield NULL, never errors."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.get_json_object("props", "$.missing").cast("int").alias(
            "prop_missing"
        ),
    )


@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type
    FROM (SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max per key WITHOUT a window sort: aggregate
    ``max(struct(ts, event_id, ...))`` — struct ordering gives the
    max_by semantics with a deterministic tiebreak, in one partial-agg
    shuffle (each map task keeps one struct per key). On skewed keys
    this beats row_number's full per-partition sort; the oracle is the
    window formulation to prove equivalence."""
    ev = _t(spark, sf_dir, "events")
    m = F.max(F.struct("ts", "event_id", "event_type")).alias("m")
    return (
        ev.groupBy("user_id")
        .agg(m)
        .select(
            "user_id",
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.event_type").alias("last_type"),
        )
    )


@query(
    "conditional_aggs",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
               AS n_errors,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') > 0
                AS BOOLEAN) AS has_purchase,
           CAST(CAST(SUM(CAST(value AS DECIMAL(25,6)))
                FILTER (WHERE event_type = 'purchase') AS VARCHAR) AS DOUBLE)
               AS purchase_value
    FROM events
    GROUP BY user_id
    """,
)
def conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation pack: count_if, existence flag,
    conditional exact-decimal sum — one pass, no joins."""
    ev = _t(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    is_buy = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count_if(is_err).alias("n_errors"),
        F.max(is_buy).alias("has_purchase"),
        F.sum(F.when(is_buy, F.col("value").cast("decimal(25,6)")))
        .cast("double")
        .alias("purchase_value"),
    )


@query(
    "event_props_typed",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    """,
)
def event_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema: parse the props column into a
    typed struct once, then use fields as ordinary columns — the
    schema'd upgrade over per-path get_json_object when several fields
    are read (one parse instead of N path walks)."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k int").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_bucket"),
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation (per-customer order counts,
    then the histogram of those counts). Zero-order customers survive
    via the left join + COUNT(col). The second groupBy's input is
    |customers| rows — the first shuffle dominates, the second is
    near-free under AQE coalescing."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: selective fact filter -> 3 dim joins -> agg ->
    top-k. Returnflag filter sits on the lineitem scan; customer and
    nation broadcast; one shuffle for the grouped sum."""
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    dims = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(dims), od.o_custkey == dims.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(revenue_dec()).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {REVENUE_DEC_SQL} AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                      JOIN orders ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair filter across two
    different dimension paths (supplier's nation vs customer's nation)
    + year bucketing. Both nation joins broadcast; the disjunctive pair
    predicate evaluates post-join (it spans both paths)."""
    su = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    n1 = na.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        dsum(revenue_dec()).alias(
            "revenue"
        )
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the last shipper in each multi-supplier order.

    Scan discipline (r11): the EXISTS / NOT-EXISTS pair is decided
    from ONE per-(order, supplier) aggregate instead of two fact
    self-joins. For a lineitem of supplier s in order o:

    * EXISTS another supplier      ⟺ o has ≥ 2 suppliers;
    * NOT EXISTS a later ship from ⟺ l_shipdate ≥ other_max(s), the
      another supplier                max ship date over o's OTHER
                                      suppliers,

    where other_max(s) = m1 (the order's overall max) unless s is the
    UNIQUE supplier whose latest ship hits m1, in which case it's the
    runner-up distinct value m2. m1/m2 come from a sort_array over the
    collect_set of per-supplier maxima — bounded by suppliers-per-
    order, never corpus-wide. 2 executed scans of lineitem (aggregate
    pass + row pass), down from 3, and one fact self-join eliminated."""
    from cdc_kafka_project_spark import cache

    su = _t(spark, sf_dir, "supplier")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    # per-(order, supplier) latest ship date — checkpointed: it feeds
    # both the per-order summary and the per-supplier residual join
    aux = cache.scoped_localcheckpoint(
        li.groupBy("l_orderkey", "l_suppkey").agg(
            F.max("l_shipdate").alias("__smax")
        )
    )
    stats = aux.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sort_array(F.collect_set("__smax"), asc=False).alias("__tops"),
    )
    per_supp = (
        aux.join(
            stats.select(
                "l_orderkey",
                "__n_supp",
                F.col("__tops")[0].alias("__m1"),
                F.get(F.col("__tops"), 1).alias("__m2"),  # null-safe (ANSI)
            ),
            "l_orderkey",
        )
        .filter(F.col("__n_supp") >= 2)  # EXISTS another supplier
    )
    # n_at_max: suppliers whose latest ship hits the order max
    n_at_max = (
        per_supp.filter(F.col("__smax") == F.col("__m1"))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__n_at_max"))
    )
    per_supp = per_supp.join(n_at_max, "l_orderkey").select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            (F.col("__smax") == F.col("__m1")) & (F.col("__n_at_max") == 1),
            F.col("__m2"),
        )
        .otherwise(F.col("__m1"))
        .alias("__other_max"),
    )
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    cand = l1.join(per_supp, ["l_orderkey", "l_suppkey"]).filter(
        F.col("l_shipdate") >= F.col("__other_max")
    )
    return (
        cand.join(od, cand.l_orderkey == od.o_orderkey, "left_semi")
        .join(F.broadcast(su), cand.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                         THEN CAST(volume AS DECIMAL(25,6)) ELSE 0 END) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {REVENUE_DEC_SQL} AS volume,
               n2.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    order volume per year. Seven-table snowflake — every dimension
    (part, customer, both nation copies, region, supplier) broadcasts;
    lineitem<->orders is the only big join, and the conditional-sum /
    sum ratio runs on exact decimal sums so the double division is
    deterministic on both engines."""
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = na.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = revenue_dec().cast("decimal(25,6)")
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(re), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    agg = j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
            F.lit(0).cast("decimal(25,6)")
        )).cast("double").alias("__num"),
        F.sum(vol).cast("double").alias("__den"),
    )
    return agg.select(
        "o_year", (F.col("__num") / F.col("__den")).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS profit
    FROM part JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN nation ON s_nationkey = n_nationkey,
    LATERAL (SELECT n_name AS nation,
                    CAST(year(o_orderdate) AS INT) AS o_year) t
    WHERE p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year revenue on a part-name
    pattern. (The testdata schema has no partsupp/ps_supplycost, so
    profit reduces to discounted revenue — the join/agg shape is
    Q9's.) part filters by LIKE before broadcasting; nation/supplier
    broadcast; the orderkey join is the one shuffle."""
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    od = _t(spark, sf_dir, "orders")
    na = _t(spark, sf_dir, "nation")
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        dsum(revenue_dec()).alias(
            "profit"
        )
    )


@query(
    "q11_part_value_share",
    oracle=f"""
    SELECT l_partkey,
           CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(CAST(SUM(CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) >
      (SELECT CAST(CAST(SUM(CAST({REVENUE_DEC_SQL}
                            AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) * 0.0006
       FROM lineitem)
    """,
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose value exceeds a fraction of the
    global total (scalar-subquery HAVING). (No partsupp table in the
    testdata; lineitem value concentration carries the shape.) The
    1-row global total broadcasts into the HAVING filter — two scans
    of lineitem, both aggregating map-side; AQE replans the tiny
    cross join to broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    value = dsum(revenue_dec())
    per_part = li.groupBy("l_partkey").agg(value.alias("value"))
    total = li.agg((value * F.lit(0.0006)).alias("__threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("__threshold"))
        .select("l_partkey", "value")
    )


@query(
    "q20_volume_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%red%' AND year(l_shipdate) = 1996
        GROUP BY l_suppkey
        HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) > 300
    )
    """,
)
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers above a shipped-quantity threshold on
    a filtered part set (IN-subquery over a grouped HAVING). The inner
    aggregate is lineitem x broadcast(filtered part) -> suppkey
    groupBy; the outer IN becomes a left-semi join that broadcasts the
    (tiny) qualifying-supplier list."""
    li = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1996)
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    qualifying = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
        .select("l_suppkey")
    )
    return (
        su.join(
            F.broadcast(qualifying),
            su.s_suppkey == qualifying.l_suppkey,
            "left_semi",
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


MIN_COPURCHASE_SUPPORT = 25


@query(
    "brand_copurchase_lift",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM ob),
    cb AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY brand
    ),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, c_ab,
           floor(CAST(c_ab AS DOUBLE) * n.n_orders
                 / (ca.c * cb2.c) * 1e6 + 0.5) / 1e6 AS lift
    FROM pairs
    JOIN cb ca ON ca.brand = pairs.brand_a
    JOIN cb cb2 ON cb2.brand = pairs.brand_b
    CROSS JOIN n
    WHERE c_ab >= {MIN_COPURCHASE_SUPPORT}
    """,
)
def brand_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: for brand pairs co-occurring in an
    order, lift = P(a,b) / (P(a)·P(b)) — >1 means the brands travel
    together more than independence predicts (cross-sell signal,
    also the co-occurrence statistic behind item-item recommenders).

    Scale shape: the pair generation is a self-join WITHIN order
    groups — fanout bounded by (items per order choose 2), never
    corpus-quadratic (same discipline as the shingle/band joins).
    Brand marginals and the order count broadcast; one double
    division per surviving pair, floor-rounded.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .distinct()
    )
    # referenced three times below (marginals, pair self-join);
    # scoped checkpoint: materialize once, blocks released when the
    # owning query ends (cache.py lifecycle)
    ob = scoped_localcheckpoint(ob)
    n = ob.agg(F.countDistinct("okey").alias("n_orders"))
    cb = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= MIN_COPURCHASE_SUPPORT)
    )
    ca = cb.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    cb2 = cb.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    lift = (
        F.col("c_ab").cast("double")
        * F.col("n_orders")
        / (F.col("c_a") * F.col("c_b"))
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb2), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            (F.floor(lift * 1e6 + F.lit(0.5)) / 1e6).alias("lift"),
        )
    )
