"""Scale-pattern queries: the shapes that keep 100 TB jobs alive.

Each query here demonstrates a named big-data pattern (skew salting,
two-phase aggregation, explode fan-out control, exact moments via
decimal sums, SQL entry point) while producing an oracle-checkable
answer — the pattern is the point; the result proves it computes the
same thing as the naive plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_kafka_project_spark.cache import scoped_localcheckpoint, scoped_persist
from cdc_kafka_project_spark.catalog import load_table, register_views
from cdc_kafka_project_spark.functions import fround, tokens
from cdc_kafka_project_spark.registry import query

N_SALT = 8


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "salted_event_type_totals",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_event_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted aggregation: ``event_type`` has ~5 distinct values,
    so a plain groupBy sends each key's entire mass to one reducer —
    the classic hot-key stall. Salting splits every key into N_SALT
    sub-keys (random-ish but deterministic spray via pmod(xxhash64)),
    aggregates partials, then re-aggregates the N_SALT partials per
    key — second shuffle moves only |keys| x N_SALT rows.

    Decimal partials re-sum exactly, so the answer is bit-identical to
    the unsalted plan (the oracle IS the unsalted plan).
    """
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn(
        "__salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALT))
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pv").cast("double").alias("total_value"),
    )


@query(
    "token_frequency_top100",
    oracle=r"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS word
          FROM documents WHERE trim(text) <> '')
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 100
    """,
)
def token_frequency_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency (the canonical explode fan-out): tokenize
    -> explode -> count -> top-k. Partial aggregation absorbs the
    fan-out map-side (each partition pre-counts its own tokens), so the
    shuffle carries |vocab| rows per partition, not |tokens|; the top-k
    is a TakeOrderedAndProject, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.transform(tokens("text"), lambda t: F.lower(t))).alias(
            "word"
        )
    )
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(100)
    )


@query(
    "grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL entry point
    (``spark.sql`` over registered views — the engine's second API
    surface; every DataFrame query here could be written this way).

    r16 (guide §2.3, aggregate before you expand): GROUPING SETS plans
    an Expand that replicates every INPUT row once per set — 3x the
    fact through the decimal aggregate (the one genuinely core-bound
    headline-family query in SCALING_r16.md, 11.6x at 8 cores). The
    fact now collapses to its (flag, status) partials first — COUNT
    re-aggregates as SUM, the DECIMAL sum is associative, so the rows
    are bit-identical — and Expand replicates ~|flag x status| partial
    rows instead of 100 TB of fact."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        WITH base AS (
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS n,
                   SUM(CAST(l_quantity AS DECIMAL(25,6))) AS s
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus,
               SUM(n) AS n,
               CAST(CAST(SUM(s) AS STRING) AS DOUBLE) AS sum_qty
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "exact_moments",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s1,
           floor(((CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                    / COUNT(*))
                 / (COUNT(*) - 1)) * 1e2 + 0.5) / 1e2 AS var_samp_exact
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent variance: built-in ``var_samp`` streams in
    float64, so its last ulps depend on partition boundaries — fine for
    statistics, fatal for a correctness gate. This computes the second
    moment from exact decimal sums (sum, sum of squares), making the
    variance a deterministic function of the data alone. Same single
    shuffle as any grouped agg."""
    od = _t(spark, sf_dir, "orders")
    # (18,2): squares land at DECIMAL(37,4) — exact and inside both
    # engines' 38-digit cap (a (25,6) square would overflow precision
    # and each engine truncates differently)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    s1 = F.sum(dec).cast("double")
    s2 = F.sum(dec * dec).cast("double")
    return od.groupBy("o_orderpriority").agg(
        n.alias("n"),
        s1.alias("s1"),
        fround((s2 - s1 * s1 / n) / (n - 1), 2).alias("var_samp_exact"),
    )


@query(
    "group_minmax_norm",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CASE WHEN mx > mn THEN (c_acctbal - mn) / (mx - mn) END AS acctbal_norm
    FROM (SELECT c_custkey, c_mktsegment, c_acctbal,
                 MIN(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
                 MAX(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
          FROM customer)
    """,
)
def group_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pattern (``applyInPandas``): per-segment min-max
    normalization, each group processed as one Arrow-batched pandas
    frame. Min/max are order-independent and the normalization is a
    single IEEE subtract/divide, so parity with the window-function
    oracle is exact — the demo stays hash-checkable.

    When to reach for this shape: per-group logic that built-ins can't
    express (model scoring, per-group fitting). For THIS computation
    the window formulation is strictly better (no Python) — the oracle
    is that formulation; docstring is the warning label.
    """
    import pandas as pd

    cu = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        mn, mx = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        out["acctbal_norm"] = (
            (pdf["c_acctbal"] - mn) / (mx - mn) if mx > mn else None
        )
        return out

    return cu.groupBy("c_mktsegment").applyInPandas(
        norm, "c_custkey long, c_mktsegment string, acctbal_norm double"
    )


@query(
    "sketch_distinct_users",
    # Exact-twin oracle (sketch_user_overlap pattern): exact distincts
    # are plain SQL; the HLL++ estimate is engine-impl-defined and
    # rides only through the error-bound flag (oracle: literal TRUE).
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type next to the exact
    count — the sketch an interactive layer serves at 100 TB (one pass,
    fixed memory per group, mergeable across partitions) where exact
    distinct needs a full shuffle of the key space. rsd=0.02: at these
    cardinalities HLL++ stays in sparse (near-exact) mode, and the
    dense-register merge cost scales 1/rsd^2 — 0.01 measured 2.6x
    slower for zero accuracy gain here.

    Drivable surface = (event_type, exact_users, approx_within_5pct):
    the estimate folds to a 5%-relative / 16-absolute-floor bound flag
    the driver hash-checks; raw estimate accuracy stays pytest-pinned
    (tests/test_text.py)."""
    ev = _t(spark, sf_dir, "events")
    # dedup-first (r11): countDistinct next to the HLL++ aggregate in
    # one agg triggers the Expand rewrite — an HLL buffer per
    # (type, user) group, measured heap-OOM at the 100x replica. Over
    # the distinct pairs both aggregates are plain and bounded.
    d = ev.select("event_type", "user_id").distinct()
    return d.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("exact_users"),
    ).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(0.05 * F.col("exact_users"), F.lit(16.0))
        ).alias("approx_within_5pct"),
    )


@query(
    "sketch_percentiles",
    # Exact-twin oracle: exact interpolated percentiles match DuckDB's
    # quantile_cont bit-for-bit at floor((...) * 1e4 + 0.5) / 1e4 (the percentile_prices
    # precedent); the GK-sketch values ride through a 1%-relative
    # bound flag (oracle: literal TRUE). GK rank error at accuracy
    # 10000 is <= n/10000 ranks, far inside 1% of value here.
    # KNOWN LATENT FLAKE (round-7 advice): Spark's BigDecimal HALF_UP
    # vs DuckDB's double ROUND can disagree by one ulp when a
    # percentile lands within ~1e-5 of a .00005 boundary. Green at
    # sf0.01 and sf0.1 on the current generation; if a future testdata
    # generation ever flips this hash, drop BOTH sides to
    # floor((...) * 1e2 + 0.5) / 1e2 (the original percentile_prices precision) rather
    # than debugging the engines' rounding paths.
    oracle="""
    SELECT floor((quantile_cont(o_totalprice, 0.5)) * 1e4 + 0.5) / 1e4 AS exact_p50,
           floor((quantile_cont(o_totalprice, 0.95)) * 1e4 + 0.5) / 1e4 AS exact_p95,
           floor((quantile_cont(o_totalprice, 0.99)) * 1e4 + 0.5) / 1e4 AS exact_p99,
           TRUE AS approx_within_1pct
    FROM orders
    """,
)
def sketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK-summary sketch) p50/p95/p99 of order
    totals next to the exact percentiles — mergeable one-pass quantiles
    vs the exact sort-based path. Drivable surface = the exact
    percentiles (oracle-mirrored vs quantile_cont) plus one flag
    folding all three sketch values to a 1%-relative bound; raw sketch
    values stay pytest-pinned."""
    od = _t(spark, sf_dir, "orders")
    agg = od.agg(
        F.expr(
            "percentile_approx(o_totalprice, array(0.5, 0.95, 0.99), 10000)"
        ).alias("approx_p"),
        F.expr(
            "percentile(o_totalprice, array(0.5, 0.95, 0.99))"
        ).alias("exact_p"),
    )
    within = [
        F.abs(F.col("approx_p")[i] - F.col("exact_p")[i])
        <= 0.01 * F.abs(F.col("exact_p")[i])
        for i in range(3)
    ]
    return agg.select(
        fround(F.col("exact_p")[0], 4).alias("exact_p50"),
        fround(F.col("exact_p")[1], 4).alias("exact_p95"),
        fround(F.col("exact_p")[2], 4).alias("exact_p99"),
        (within[0] & within[1] & within[2]).alias("approx_within_1pct"),
    )


@query(
    "histogram_prices",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 500) AS BIGINT) AS bucket,
           CAST(floor(l_extendedprice / 500) * 500 AS DOUBLE) AS lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice (the profiling pass a
    data-quality dashboard runs over every numeric column): bucket =
    floor(x/width). One partial-agg shuffle keyed on the bucket —
    cardinality is the bucket count, not the row count, so the shuffle
    is O(buckets) and the 100 TB scan stays map-dominated. Exact
    decimal totals keep the answer partition-count-invariant."""
    from cdc_kafka_project_spark.functions import dsum

    li = _t(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 500).cast("long")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("total"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 500).cast("double").alias("lo"),
            "n",
            "total",
        )
    )


# (col_name, kind) for the orders profile. Kind picks the min/max
# string formatter that both engines render identically: bigints cast
# directly, doubles go through DECIMAL(25,2) (exact 2-decimal money
# values; decimal->string keeps trailing zeros in both engines),
# timestamps format to 'yyyy-MM-dd HH:mm:ss'.
_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
]


def _profile_fmt_spark(col: str, kind: str):
    c = F.col(col)
    if kind == "double":
        return c.cast("decimal(25,2)").cast("string")
    if kind == "timestamp":
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def _profile_fmt_duck(expr: str, kind: str) -> str:
    if kind == "double":
        return f"CAST(CAST({expr} AS DECIMAL(25,2)) AS VARCHAR)"
    if kind == "timestamp":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({expr} AS VARCHAR)"


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {_profile_fmt_duck(f'MIN({c})', kind)} AS min_value,
           {_profile_fmt_duck(f'MAX({c})', kind)} AS max_value
    FROM orders"""
    for c, kind in _PROFILE_COLS
)


@query("column_profile", oracle=_PROFILE_ORACLE)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of ``orders`` — rows/nulls/distincts/
    min/max for every column — the first pass any data-quality or
    schema-drift monitor runs over a new drop.

    Two map-reduced scans, both shuffle only O(partitions) partial
    states, then a 1-row x 1-row join and a driver-free ``stack``
    unpivot:

    * **nulls/min/max**: one global agg. No grouping keys -> no sort,
      partial buffers merge map-side, the exchange moves one row per
      partition.
    * **distinct counts**: one agg of COUNT(DISTINCT ...) over all
      columns at once (Catalyst's Expand rewrite). Var-width string
      grouping keys would force the whole Expand output through a
      SortAggregate (min/max string buffers are hash-agg-hostile), so
      string columns are counted via ``xxhash64`` — every Expand key
      is fixed-width and the plan stays HashAggregate end-to-end.
      64-bit hashing is exact up to astronomically unlikely collisions
      (P ~ n^2/2^65; ~1e-9 at 10M distinct strings) — the same
      trade already made by the exact-dedup digest tier. At truly
      high cardinality swap in approx_count_distinct (HLL) instead.

    A naive single ``agg`` with raw multi-COUNT(DISTINCT) measured 6x
    slower here: Expand(x7) into a 7-string-key SortAggregate sorts
    |rows| x 7 expanded rows.
    """
    od = _t(spark, sf_dir, "orders")
    base_aggs = [F.count(F.lit(1)).alias("n_rows")]
    nd_aggs = []
    for c, kind in _PROFILE_COLS:
        base_aggs.append(F.sum(F.isnull(c).cast("long")).alias(f"nn_{c}"))
        base_aggs.append(F.min(c).alias(f"mn_{c}"))
        base_aggs.append(F.max(c).alias(f"mx_{c}"))
        if kind == "string":
            # mask NULL first: xxhash64(NULL) is a non-null seed hash,
            # but COUNT(DISTINCT) must skip NULLs
            key = F.when(F.col(c).isNotNull(), F.xxhash64(c))
        else:
            key = F.col(c)
        nd_aggs.append(F.count_distinct(key).alias(f"nd_{c}"))
    one = od.agg(*base_aggs).join(od.agg(*nd_aggs))
    for c, kind in _PROFILE_COLS:
        one = one.withColumn(
            f"mns_{c}", _profile_fmt_spark(f"mn_{c}", kind)
        ).withColumn(f"mxs_{c}", _profile_fmt_spark(f"mx_{c}", kind))
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mns_{c}, mxs_{c}" for c, _ in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_value, max_value)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value")


@query(
    "corr_lineitem_measures",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS DECIMAL(25,6))) AS sq,
               SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS sp,
               SUM(CAST(l_discount AS DECIMAL(25,6))) AS sd,
               SUM(CAST(l_quantity AS DECIMAL(25,6))
                   * CAST(l_quantity AS DECIMAL(25,6))) AS sqq,
               SUM(CAST(l_extendedprice AS DECIMAL(25,6))
                   * CAST(l_extendedprice AS DECIMAL(25,6))) AS spp,
               SUM(CAST(l_discount AS DECIMAL(25,6))
                   * CAST(l_discount AS DECIMAL(25,6))) AS sdd,
               SUM(CAST(l_quantity AS DECIMAL(25,6))
                   * CAST(l_extendedprice AS DECIMAL(25,6))) AS sqp,
               SUM(CAST(l_quantity AS DECIMAL(25,6))
                   * CAST(l_discount AS DECIMAL(25,6))) AS sqd,
               SUM(CAST(l_extendedprice AS DECIMAL(25,6))
                   * CAST(l_discount AS DECIMAL(25,6))) AS spd
        FROM lineitem
    )
    SELECT n,
           floor((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
                  - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                         - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                           - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS corr_qty_price,
           floor((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE)
                  - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                         - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                           - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS corr_qty_disc,
           floor((CAST(n AS DOUBLE) * CAST(spd AS DOUBLE)
                  - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                         - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                           - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS corr_price_disc
    FROM s
    """,
)
def corr_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between the lineitem measures in
    ONE scan — the multivariate profiling pass feature-engineering jobs
    run before training. All co-moments (sums, squares, cross products)
    accumulate as exact DECIMALs, so the partial aggregation is
    order/partition-invariant and both engines compute identical sums;
    the closed-form corr arithmetic then runs once on scalars in
    float64 (identical operand bits -> identical IEEE results, rounded
    to 6). Contrast with F.corr: its float running state is partition-
    order-dependent — fine statistically, but not reproducible
    bit-for-bit across engines or cluster layouts.
    """
    q = F.col("l_quantity").cast("decimal(25,6)")
    p = F.col("l_extendedprice").cast("decimal(25,6)")
    d = F.col("l_discount").cast("decimal(25,6)")
    li = _t(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"),
        F.sum(p * p).alias("spp"),
        F.sum(d * d).alias("sdd"),
        F.sum(q * p).alias("sqp"),
        F.sum(q * d).alias("sqd"),
        F.sum(p * d).alias("spd"),
    )
    n = F.col("n").cast("double")

    def corr(sxy, sx, sy, sxx, syy):
        num = n * F.col(sxy).cast("double") - F.col(sx).cast("double") * F.col(
            sy
        ).cast("double")
        vx = n * F.col(sxx).cast("double") - F.col(sx).cast("double") * F.col(
            sx
        ).cast("double")
        vy = n * F.col(syy).cast("double") - F.col(sy).cast("double") * F.col(
            sy
        ).cast("double")
        return F.floor(num / (F.sqrt(vx) * F.sqrt(vy)) * 1e6 + F.lit(0.5)) / 1e6

    return s.select(
        "n",
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


@query(
    "salted_join_segment_revenue",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salted join (operators/skew.py): orders spray into 8
    sub-keys per customer, the customer side replicates 8x, and the
    grouped result is bit-identical to the plain join (the oracle IS
    the plain join). On this data the keys aren't skewed — the query
    pins CORRECTNESS of the reshape; the skew win is pinned by
    tests/test_skew.py and the AQE engagement tests cover the
    automatic path."""
    from cdc_kafka_project_spark.operators.skew import salted_join

    od = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(od, cu, ["o_custkey"], n_salt=8, spray_cols=["o_orderkey"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("revenue"),
    )


#: the deterministic hot key the adversarial skew fixture collapses
#: onto — a real c_custkey so the hot mass SURVIVES the inner join
SKEW_HOT_USER = 7


def skewed_events(ev: DataFrame) -> DataFrame:
    """Adversarial-scale skew fixture (round-6 verdict item 8): a
    deterministic remap of `events` where every user_id divisible by 5
    collapses onto SKEW_HOT_USER — one key carrying ~20% of all rows,
    the shape where a plain keyed shuffle parks a fifth of the corpus
    on one reducer. Derived at query time (testdata is read-only) and
    expressible identically in SQL, so oracle twins stay exact.

    Reference parity: the reference's 3-partition keyed topic
    (admin.py:53) is the toy version of this concern — key routing
    decides which partition absorbs a key's full mass; this fixture
    scales that question to a key distribution a real cluster chokes
    on and pins the mitigation (operators/skew.py::salted_join)."""
    return ev.select(
        F.when(F.col("user_id") % 5 == 0, F.lit(SKEW_HOT_USER))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_id",
        "event_type",
        "ts",
        "value",
    )


@query(
    "skewed_salted_segment_revenue",
    # oracle = the PLAIN join over the same deterministic skew remap —
    # the salted plan must be bit-identical to it
    oracle=f"""
    WITH skewed AS (
        SELECT CASE WHEN user_id % 5 = 0 THEN {SKEW_HOT_USER}
                    ELSE user_id END AS user_id,
               value
        FROM events
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS total_value,
           CAST(SUM(CASE WHEN user_id = {SKEW_HOT_USER} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot_events
    FROM skewed JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def skewed_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join UNDER REAL SKEW: the `skewed_events` fixture (one
    user carrying ~20% of rows) joins the customer segment dim through
    operators/skew.py::salted_join — the hot key sprays across N_SALT
    sub-keys, so no post-shuffle partition carries the hot user's full
    mass (pinned ≤ 2x the partition mean by tests/test_skew.py, which
    also pins that the unsalted shape concentrates). The grouped
    result is bit-identical to the plain join (the oracle IS the plain
    join over the same remap). Unlike `salted_join_segment_revenue`
    (correctness of the reshape on unskewed keys), this query pins the
    reshape on data that actually NEEDS it."""
    from cdc_kafka_project_spark.operators.skew import salted_join

    ev = skewed_events(_t(spark, sf_dir, "events")).select(
        "user_id", "event_id", "value"
    )
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cu, ["user_id"], n_salt=N_SALT,
                         spray_cols=["event_id"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .cast("double")
        .alias("total_value"),
        F.sum(
            F.when(F.col("user_id") == SKEW_HOT_USER, F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_hot_events"),
    )


@query(
    "heavy_hitter_tokens",
    oracle=r"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS word
          FROM documents WHERE trim(text) <> '')
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 25
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-25 tokens via Misra-Gries candidates + exact recount
    (operators/sketches.py): per-partition bounded-memory summaries
    (capacity 4096 counters regardless of vocabulary size) yield a
    provable candidate superset of everything with freq > N/4096; the
    exact recount then shuffles |candidates| keys, not |vocab|. The
    oracle is the plain GROUP BY top-25 — identical answers, different
    memory ceiling. Compare token_frequency_top100: same answer family,
    |vocab|-keyed shuffle."""
    from cdc_kafka_project_spark.operators.sketches import heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.transform(tokens("text"), lambda t: F.lower(t))).alias(
            "word"
        )
    )
    return heavy_hitters(toks, "word", k=25, capacity=4096)


@query(
    "event_value_anomalies",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS s1,
               CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))
                        * CAST(value AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS s2
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           floor((e.value - m.s1 / m.n)
                 / SQRT((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
                 * 1e6 + 0.5) / 1e6 AS zscore
    FROM events e JOIN m USING (event_type)
    WHERE ABS((e.value - m.s1 / m.n)
              / SQRT((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))) > 3.0
    """,
)
def event_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (>3 sigma) — the monitoring pass that
    catches corrupted feeds. Two-phase: per-type moments from exact
    decimal sums (order/partition-invariant, |types| rows), broadcast
    back over the stream, one filter pass. The z arithmetic runs on
    identical scalar operands in both engines, so even the >3.0 cut
    agrees bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(25,6)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    z = (F.col("value") - s1 / n) / F.sqrt((s2 - s1 * s1 / n) / (n - 1))
    return (
        ev.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            "value",
            (F.floor(z * 1e6 + F.lit(0.5)) / 1e6).alias("zscore"),
        )
    )


@query(
    "winsorized_price_stats",
    oracle="""
    WITH th AS (
        SELECT o_orderpriority,
               CAST(floor(quantile_cont(o_totalprice, 0.05) * 1e6 + 0.5) / 1e6
                    AS DECIMAL(25,6)) AS p05,
               CAST(floor(quantile_cont(o_totalprice, 0.95) * 1e6 + 0.5) / 1e6
                    AS DECIMAL(25,6)) AS p95
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(th.p05 AS DOUBLE) AS p05,
           CAST(th.p95 AS DOUBLE) AS p95,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           -- CASE, not least/greatest: DuckDB's least() promotes
           -- DECIMAL args to DOUBLE, which would de-exact the sum
           CAST(CAST(CAST(CAST(SUM(CASE
                    WHEN CAST(o.o_totalprice AS DECIMAL(25,6)) < th.p05 THEN th.p05
                    WHEN CAST(o.o_totalprice AS DECIMAL(25,6)) > th.p95 THEN th.p95
                    ELSE CAST(o.o_totalprice AS DECIMAL(25,6)) END) AS VARCHAR) AS DOUBLE)
                / COUNT(*) AS VARCHAR) AS DOUBLE) AS winsorized_mean
    FROM orders o JOIN th USING (o_orderpriority)
    GROUP BY o.o_orderpriority, th.p05, th.p95
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clamped) mean per group — the robust-stats
    alternative to trimming that keeps row counts intact: clamp every
    price into its group's [p05, p95], then average.

    Two-phase like the quantile gate: exact interpolated percentiles
    per group (tiny agg, |groups| rows) broadcast back over the facts,
    clamp + exact DECIMAL sum in ONE more pass — no corpus-wide window,
    no sort. Percentiles floor-round to 6dp (the portable boundary
    form) and the clamp runs in DECIMAL(25,6) on both engines, so the
    winsorized sum is bit-exact cross-engine.
    """
    orders = _t(spark, sf_dir, "orders")
    rnd6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    th = orders.groupBy("o_orderpriority").agg(
        rnd6(F.percentile("o_totalprice", F.lit(0.05)))
        .cast("decimal(25,6)").alias("p05"),
        rnd6(F.percentile("o_totalprice", F.lit(0.95)))
        .cast("decimal(25,6)").alias("p95"),
    )
    clamped = F.least(
        F.greatest(F.col("o_totalprice").cast("decimal(25,6)"), F.col("p05")),
        F.col("p95"),
    )
    return (
        orders.join(F.broadcast(th), "o_orderpriority")
        .groupBy("o_orderpriority", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(clamped).cast("double") / F.count(F.lit(1)))
            .cast("double").alias("winsorized_mean"),
        )
        .select(
            "o_orderpriority",
            F.col("p05").cast("double").alias("p05"),
            F.col("p95").cast("double").alias("p95"),
            "n_orders",
            "winsorized_mean",
        )
    )


@query(
    "shard_assignment_by_bytes",
    oracle="""
    SELECT doc_id, source,
           CAST(floor((cum - n_chars) / 4000.0) AS BIGINT) AS shard_id
    FROM (
        SELECT doc_id, source, n_chars,
               SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
        FROM documents
    )
    """,
)
def shard_assignment_by_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-side shard planning: assign documents to ~4 KB output
    shards per source by cumulative size — the deterministic manifest a
    100 TB export job computes BEFORE writing, so every shard lands
    near the target size regardless of task boundaries (vs
    maxRecordsPerFile, which balances row counts, not bytes).

    shard_id = floor(bytes_before_me / target): a document starts the
    next shard exactly when the running total crosses the boundary.
    The window partitions by source — shards never span sources (the
    usual manifest contract) and the plan parallelizes across them; a
    single giant source would instead pre-bucket on a hash prefix and
    plan shards per bucket.
    """
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum("n_chars").over(w) - F.col("n_chars")
    return docs.select(
        "doc_id",
        "source",
        F.floor(cum_before / F.lit(4000.0)).alias("shard_id"),
    )


@query(
    "denormalized_order_lines",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority,
           c.c_mktsegment,
           n.n_name AS cust_nation,
           p.p_brand,
           s.s_name AS supp_name,
           CAST(CAST(l.l_extendedprice AS DECIMAL(25,6))
                * (1 - CAST(l.l_discount AS DECIMAL(25,6))) AS DOUBLE)
               AS net_price
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def denormalized_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature denormalization for export (the 'one wide table' every
    training job asks for): fact rows joined to FOUR dimension tables
    in a single pass.

    The scale shape this pins: the fact table shuffles AT MOST once
    (lineitem ⋈ orders on the orderkey — two big sides), and every
    dimension attaches via broadcast-hash join at test SF, so adding
    dims never re-exchanges the fact stream there. That is the
    difference between an export that scans 100 TB once and one that
    shuffles it four times — pinned in tests/test_plans.py.

    Only NATION — fixed cardinality by schema (25 rows at every SF) —
    carries an explicit broadcast hint. customer/part/supplier all
    scale WITH the fact tables (TPC-H scales them ∝ SF; the replica
    builder does too), so they are deliberately unhinted: AQE
    broadcasts them while they fit (every test SF through 100x) and
    degrades to shuffle joins when they outgrow memory — r13's 1000x
    probe caught the previous part/supplier hints OOMing the broadcast
    build at 20M parts ('Not enough memory to build and broadcast'),
    exactly the hint-vs-reality failure a 1.5B-customer cluster would
    hit. A hint is a promise about cardinality; only schema-fixed
    tables get to make it."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    pa = _t(spark, sf_dir, "part")
    su = _t(spark, sf_dir, "supplier")
    net = (
        F.col("l_extendedprice").cast("decimal(25,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(25,6)"))
    ).cast("double")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(pa, li.l_partkey == pa.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "c_mktsegment",
            F.col("n_name").alias("cust_nation"),
            "p_brand",
            F.col("s_name").alias("supp_name"),
            net.alias("net_price"),
        )
    )


@query(
    "sketch_incremental_distinct",
    # Exact-twin oracle (round-6 verdict item 4a, same pattern as
    # sketch_user_overlap): the per-window EXACT distincts are plain
    # SQL; the HLL estimates are DataSketches-impl-defined, so the
    # drivable surface carries them only through the 10%-with-floor
    # error FLAG (oracle side: literal TRUE). Raw estimate values and
    # the parquet state-table round-trip stay pytest-pinned.
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS est_within_10pct
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS est_within_10pct
    FROM events
    """,
)
def sketch_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count state (operators/sketches.py::
    hll_state_table): one HLL sketch per day of events, then the
    month's total distinct users as a UNION OF SKETCHES — the pattern
    that answers any-range distinct questions from |buckets| KB-sized
    states instead of rescanning history. Estimate error vs exact and
    parquet state-table round-trip (persist sketches, read back, merge
    with a delta) are pinned in tests/test_sketches.py.

    Drivable surface = (day, exact_distinct, est_within_10pct): the
    exact columns oracle-mirror, and each window's sketch estimate is
    folded to a hash-checkable bound flag (10% relative with a small
    absolute floor — HLL is near-exact in sparse mode, so tiny windows
    must not demand register-level equality). The exact total for the
    'ALL' row costs the one user-keyed distinct shuffle the sketch
    union avoids at 100 TB; it rides here for error pinning only."""
    from cdc_kafka_project_spark.operators import sketches as sk

    ev = _t(spark, sf_dir, "events")
    # the state table is tiny (one row per day) and referenced twice
    # (daily rows + the ALL-row sketch union); checkpoint it so events
    # is scanned once here + once for the exact total (2 executed
    # scans, down from 3) — exactly how a production state table is
    # served (persisted once, merged per question, history unread)
    states = scoped_localcheckpoint(
        sk.hll_state_table(ev, F.to_date("ts"), "user_id", "day")
    )
    flag = (
        F.abs(F.col("est_distinct") - F.col("exact_distinct"))
        <= F.greatest(0.10 * F.col("exact_distinct"), F.lit(16.0))
    ).alias("est_within_10pct")
    daily = states.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.hll_sketch_estimate("sketch").cast("long").alias("est_distinct"),
        "exact_distinct",
    ).select("day", "exact_distinct", flag)
    exact_total = ev.agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    total = sk.hll_union_estimate(states).crossJoin(
        F.broadcast(exact_total)
    ).select(
        F.lit("ALL").alias("day"),
        "exact_distinct",
        (
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            <= F.greatest(0.10 * F.col("exact_distinct"), F.lit(16.0))
        ).alias("est_within_10pct"),
    )
    return daily.unionByName(total)


@query(
    "feature_quantile_buckets",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey)
                AS BIGINT) AS price_decile
    FROM orders
    """,
)
def feature_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth binning (quantile bucketing, the standard numeric
    feature transform): per-group price deciles via ntile. The
    orderkey tiebreak makes the assignment total and deterministic —
    without it, equal prices straddling a decile boundary would land
    engine-dependently. One keyed window; the per-group sort spills,
    never a global sort."""
    from pyspark.sql import Window

    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return od.select(
        "o_orderkey",
        F.ntile(10).over(w).cast("long").alias("price_decile"),
    )


@query(
    "feature_label_index",
    oracle="""
    WITH idx AS (
        SELECT c_mktsegment,
               CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT)
                   AS segment_idx
        FROM (SELECT DISTINCT c_mktsegment FROM customer)
    )
    SELECT c.c_custkey, c.c_mktsegment, idx.segment_idx
    FROM customer c JOIN idx USING (c_mktsegment)
    """,
)
def feature_label_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical label indexing (StringIndexer without the ML
    wrapper, reproducible by construction): the vocabulary is the
    DISTINCT value set ranked lexicographically — stable across runs,
    partitionings, and engines, unlike frequency-ordered indexers that
    tie-break arbitrarily. The index table is |vocab| rows, built with
    a window over the distinct set (tiny) and broadcast-joined back —
    the facts never shuffle."""
    from pyspark.sql import Window

    cu = _t(spark, sf_dir, "customer")
    idx = (
        cu.select("c_mktsegment").distinct()
        .withColumn(
            "segment_idx",
            (F.dense_rank().over(Window.orderBy("c_mktsegment")) - 1).cast("long"),
        )
    )
    return cu.join(F.broadcast(idx), "c_mktsegment").select(
        "c_custkey", "c_mktsegment", "segment_idx"
    )


@query(
    "fk_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for each declared FK
    edge — the constraint check a lakehouse must run itself (parquet
    enforces nothing). Each edge is a left-anti join + count; the
    dimension sides broadcast, the fact sides stream by — auditing a
    100 TB fact table costs one scan per edge and no fact shuffle."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey")

    def orphans(fact, dim, fk, pk, name):
        n = (
            fact.join(
                F.broadcast(dim.select(F.col(pk).alias(fk)).distinct()),
                fk,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )
        return n

    return (
        orphans(li, od, "l_orderkey", "o_orderkey", "lineitem.l_orderkey->orders")
        .unionByName(
            orphans(od, cu, "o_custkey", "c_custkey", "orders.o_custkey->customer")
        )
        .unionByName(
            orphans(cu, na, "c_nationkey", "n_nationkey",
                    "customer.c_nationkey->nation")
        )
    )


@query(
    "event_value_drift_kl",
    oracle="""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'ref' ELSE 'cur' END AS half,
               least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin
        FROM events
    ),
    cells AS (
        SELECT event_type, half, bin, CAST(COUNT(*) AS BIGINT) AS n
        FROM binned GROUP BY event_type, half, bin
    ),
    tot AS (
        SELECT event_type, half, CAST(SUM(n) AS BIGINT) AS tn
        FROM cells GROUP BY event_type, half
    ),
    probs AS (
        SELECT c.event_type, c.bin,
               MAX(CASE WHEN c.half = 'ref'
                        THEN (c.n + 1.0) / (t.tn + 10.0) END) AS p_ref,
               MAX(CASE WHEN c.half = 'cur'
                        THEN (c.n + 1.0) / (t.tn + 10.0) END) AS p_cur,
               MAX(CASE WHEN c.half = 'ref' THEN t.tn END) AS tn_ref,
               MAX(CASE WHEN c.half = 'cur' THEN t.tn END) AS tn_cur
        FROM cells c JOIN tot t ON c.event_type = t.event_type
                                AND c.half = t.half
        GROUP BY c.event_type, c.bin
    )
    SELECT event_type,
           floor(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS kl_cur_vs_ref
    FROM (
        SELECT event_type,
               CAST(floor((pc * ln(pc / pr)) * 1e12 + 0.5) / 1e12 AS DECIMAL(30,12)) AS term
        FROM (
            SELECT event_type,
                   COALESCE(p_cur, 1.0 / (max_tn_cur + 10.0)) AS pc,
                   COALESCE(p_ref, 1.0 / (max_tn_ref + 10.0)) AS pr
            FROM (
                SELECT p.*,
                       MAX(tn_ref) OVER (PARTITION BY event_type) AS max_tn_ref,
                       MAX(tn_cur) OVER (PARTITION BY event_type) AS max_tn_cur
                FROM probs p
            )
        )
    )
    GROUP BY event_type
    """,
)
def event_value_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: KL(cur || ref) of the event-value
    histogram per event type, reference = first half of the month,
    current = second half. Add-1-smoothed probabilities over 10 fixed
    equi-width bins, so bins absent from one half contribute through
    the smoothing floor instead of dividing by zero.

    Plan: one scan bins every event, one shuffle to (type, half, bin)
    cells (30 x 2 x 10 rows max), everything after runs on the cell
    table. The KL sum is over <= 10 cells per type — the floor-rounded
    ln is the only float boundary (portable form shared with the LM
    scores)."""
    ev = _t(spark, sf_dir, "events")
    half = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), "ref"
    ).otherwise("cur")
    bin_ = F.least(F.floor(F.col("value") / 50.0).cast("long"), F.lit(9))
    # cell table persisted: consumed by the totals AND the probs join
    # — without it each branch re-scans the events (the re-scan
    # pathology doc_bigram_logprob documents)
    cells = scoped_persist(
        ev.select("event_type", half.alias("half"), bin_.alias("bin"))
        .groupBy("event_type", "half", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.groupBy("event_type", "half").agg(F.sum("n").alias("tn"))
    j = cells.join(tot, ["event_type", "half"])
    p = (F.col("n") + F.lit(1.0)) / (F.col("tn") + F.lit(10.0))
    probs = j.groupBy("event_type", "bin").agg(
        F.max(F.when(F.col("half") == "ref", p)).alias("p_ref"),
        F.max(F.when(F.col("half") == "cur", p)).alias("p_cur"),
        F.max(F.when(F.col("half") == "ref", F.col("tn"))).alias("tn_ref"),
        F.max(F.when(F.col("half") == "cur", F.col("tn"))).alias("tn_cur"),
    )
    from pyspark.sql import Window

    wt = Window.partitionBy("event_type")
    probs = probs.withColumn("max_tn_ref", F.max("tn_ref").over(wt)).withColumn(
        "max_tn_cur", F.max("tn_cur").over(wt)
    )
    p_cur = F.coalesce(F.col("p_cur"), F.lit(1.0) / (F.col("max_tn_cur") + 10.0))
    p_ref = F.coalesce(F.col("p_ref"), F.lit(1.0) / (F.col("max_tn_ref") + 10.0))
    # per-cell KL terms round into DECIMAL before the sum so the
    # ~10-term addition is order-independent (float sums are not)
    term = fround(p_cur * F.log(p_cur / p_ref), 12).cast("decimal(30,12)")
    kl = F.sum(term).cast("double")
    return probs.groupBy("event_type").agg(
        (F.floor(kl * 1e6 + F.lit(0.5)) / 1e6).alias("kl_cur_vs_ref")
    )


@query(
    "key_skew_report",
    oracle="""
    WITH freq AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
           floor((MAX(cnt) / SUM(cnt)) * 1e6 + 0.5) / 1e6 AS top1_share,
           floor((quantile_cont(cnt, 0.50)) * 1e4 + 0.5) / 1e4 AS p50_key_rows,
           floor((quantile_cont(cnt, 0.99)) * 1e4 + 0.5) / 1e4 AS p99_key_rows,
           floor((MAX(cnt) / quantile_cont(cnt, 0.50)) * 1e4 + 0.5) / 1e4 AS skew_ratio
    FROM freq
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostic: the per-key frequency distribution of a
    prospective join/groupBy key, as one summary row.

    This is the planning query you run BEFORE a 100 TB join to decide
    between a plain hash join, AQE skew handling, or explicit salting
    (``salted_join_segment_revenue``): ``skew_ratio`` (hottest key vs
    median key) and ``top1_share`` are the decision inputs. Cost is one
    partial-agg shuffle to key counts (|keys| rows), then a single-row
    global agg over the tiny counts relation — the facts are scanned
    once and never sorted. percentile() interpolates linearly, matching
    DuckDB's quantile_cont.
    """
    freq = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    p50 = F.expr("percentile(cnt, 0.50)")
    p99 = F.expr("percentile(cnt, 0.99)")
    return freq.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_key_rows"),
        fround(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
        fround(p50, 4).alias("p50_key_rows"),
        fround(p99, 4).alias("p99_key_rows"),
        fround(F.max("cnt") / p50, 4).alias("skew_ratio"),
    )


@query(
    "join_size_estimate",
    oracle="""
    WITH lf AS (
        SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_orderkey
    ),
    of AS (
        SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_orderkey
    ),
    prod AS (
        SELECT lf.k, lf.cnt * of.cnt AS out_rows
        FROM lf JOIN of ON lf.k = of.k
    )
    SELECT CAST(SUM(out_rows) AS BIGINT) AS est_join_rows,
           CAST(COUNT(*) AS BIGINT) AS n_matching_keys,
           CAST(MAX(out_rows) AS BIGINT) AS hottest_key_rows,
           floor((MAX(out_rows) / SUM(out_rows)) * 1e6 + 0.5) / 1e6 AS hottest_share
    FROM prod
    """,
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality planning: the EXACT output size of
    ``lineitem ⋈ orders`` computed from per-key frequency histograms —
    sum over matching keys of cnt_left × cnt_right — plus the hottest
    key's contribution.

    At 100 TB you run this (or its sketch approximation) before
    committing to a join order: the histogram join touches |keys|
    rows per side instead of materializing the join, detects
    many-to-many blowup (est_join_rows >> max(|L|,|R|)) and tells you
    whether one skewed key dominates (hottest_share -> salt it).
    Two partial-agg shuffles to key counts + one tiny key join —
    never the fact-to-fact join itself.
    """
    lf = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count("*").alias("cnt_l"))
    )
    of = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count("*").alias("cnt_r"))
    )
    prod = lf.join(of, "k").select(
        (F.col("cnt_l") * F.col("cnt_r")).alias("out_rows")
    )
    return prod.agg(
        F.sum("out_rows").alias("est_join_rows"),
        F.count("*").alias("n_matching_keys"),
        F.max("out_rows").alias("hottest_key_rows"),
        fround(F.max("out_rows") / F.sum("out_rows"), 6).alias(
            "hottest_share"
        ),
    )


@query(
    "event_value_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS absdev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(absdev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           floor((ANY_VALUE(d.med)) * 1e6 + 0.5) / 1e6 AS med,
           floor((ANY_VALUE(m.mad)) * 1e6 + 0.5) / 1e6 AS mad,
           CAST(SUM(CASE WHEN floor((d.absdev - 4.4478 * m.mad) * 1e6 + 0.5) / 1e6 > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag
    values with |v - median| > 3σ-equivalent (4.4478 = 3 x 1.4826
    consistency constant) per event type. Unlike the z-score tier
    (`event_value_anomalies`), a few extreme values cannot drag the
    threshold — median and MAD have a 50% breakdown point.

    Plan: two small per-type quantile aggs broadcast back over the
    stream, one counting agg. percentile() interpolates linearly like
    quantile_cont; the threshold comparison is rounded identically on
    both engines so boundary floats cannot flip. At 100 TB swap the
    exact percentile for approx_percentile (the GK sketch) — the plan
    shape is unchanged.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        fround(F.any_value("med"), 6).alias("med"),
        fround(F.any_value("mad"), 6).alias("mad"),
        F.sum(
            F.when(
                fround(
                    F.col("absdev") - F.lit(4.4478) * F.col("mad"), 6
                )
                > 0,
                1,
            ).otherwise(0)
        ).alias("n_outliers"),
    )


def _user_overlap_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full overlap frame: HLL estimates AND exact distinct counts
    side by side (one row). Shared by the registered query (which
    projects the drivable exact columns plus the error-bound flag) and
    the pytest error pin (which reads the raw estimates)."""
    ev = _t(spark, sf_dir, "events")
    pair = ev.filter(F.col("event_type").isin("view", "purchase"))
    # dedup-first — same Expand-rewrite OOM class as
    # sketch_distinct_users (see there); identical sketches by HLL
    # update idempotence
    st = (
        pair.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.hll_sketch_agg("user_id").alias("sketch"),
            F.count(F.lit(1)).alias("exact"),
        )
    )
    est = st.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("est"),
        "exact",
        "sketch",
    )
    combined = est.agg(
        F.sum(F.when(F.col("event_type") == "view", F.col("est"))).alias(
            "est_view"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("est"))
        ).alias("est_purchase"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_union"),
        F.sum(F.when(F.col("event_type") == "view", F.col("exact"))).alias(
            "exact_view"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("exact"))
        ).alias("exact_purchase"),
    )
    exact_union = pair.agg(
        F.countDistinct("user_id").alias("exact_union")
    )
    return combined.crossJoin(exact_union).select(
        F.col("est_view").cast("long").alias("est_view"),
        F.col("est_purchase").cast("long").alias("est_purchase"),
        F.col("est_union").cast("long").alias("est_union"),
        F.greatest(
            F.lit(0),
            (
                F.col("est_view")
                + F.col("est_purchase")
                - F.col("est_union")
            ).cast("long"),
        ).alias("est_intersection"),
        F.col("exact_view").cast("long").alias("exact_view"),
        F.col("exact_purchase").cast("long").alias("exact_purchase"),
        F.col("exact_union").cast("long").alias("exact_union"),
        (
            F.col("exact_view")
            + F.col("exact_purchase")
            - F.col("exact_union")
        ).cast("long").alias("exact_intersection"),
    )


@query(
    "sketch_user_overlap",
    # Exact-twin oracle (round-5 verdict item 8): the exact distinct
    # counts are plain SQL; the HLL estimates are engine-defined, so
    # the drivable surface carries them only through the 10% error
    # FLAG (oracle side: literal TRUE) — if the sketch pipeline ever
    # drifts past the pinned bound, the hash flips and the driver
    # catches it, without demanding cross-engine register equality.
    oracle="""
    WITH pair AS (
        SELECT user_id, event_type FROM events
        WHERE event_type IN ('view', 'purchase')
    )
    SELECT
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'view'
                                 THEN user_id END) AS BIGINT) AS exact_view,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                 THEN user_id END) AS BIGINT)
            AS exact_purchase,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_union,
        CAST(COUNT(DISTINCT CASE WHEN event_type = 'view'
                                 THEN user_id END)
             + COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                   THEN user_id END)
             - COUNT(DISTINCT user_id) AS BIGINT) AS exact_intersection,
        TRUE AS est_within_10pct
    FROM pair
    """,
)
def sketch_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between two behaviors ('view' vs
    'purchase') by HLL inclusion-exclusion: |A∩B| ≈ est(A) + est(B) -
    est(A∪B), where est(A∪B) is a SKETCH UNION — no rescan of either
    side. This is the audience-overlap question every segmentation
    system asks; with per-day/per-source sketch state tables
    (`sketch_incremental_distinct`) any pairwise overlap is computable
    from KB-sized summaries alone.

    The exact counts ride along for error pinning (computed the
    expensive way: user-keyed distinct shuffles — exactly the cost
    the sketch path avoids at 100 TB). Drivable surface = the exact
    columns (oracle-mirrored) plus `est_within_10pct`, the sketch
    pipeline's inclusion-exclusion error folded to a hash-checkable
    boolean (bound: 10% of the exact intersection with a 5%-of-union
    absolute floor, since HLL error scales with the union size — a
    zero-overlap generation must not demand an exactly-zero estimate);
    raw estimate values stay pytest-pinned
    (tests/test_sketches.py) because HLL register layouts are
    engine-implementation-defined.
    """
    full = _user_overlap_full(spark, sf_dir)
    return full.select(
        "exact_view",
        "exact_purchase",
        "exact_union",
        "exact_intersection",
        (
            # tolerance floor (r6 advice): HLL inclusion-exclusion error
            # scales with the UNION size, so a tiny (or zero) exact
            # intersection must not demand a near-exact estimate — that
            # would flip the gate hash on sketch noise, not a defect
            F.abs(F.col("est_intersection") - F.col("exact_intersection"))
            <= F.greatest(
                0.10 * F.col("exact_intersection"),
                0.05 * F.col("exact_union"),
            )
        ).alias("est_within_10pct"),
    )


@query(
    "lateral_topk_per_customer",
    oracle="""
    SELECT c.c_custkey AS custkey, l.o_orderkey AS orderkey,
           l.o_totalprice AS totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) l
    """,
)
def lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the
    SQL:1999 form of top-k-per-group; Spark 4 and DuckDB both speak
    it). Catalyst DECORRELATES the subquery — the executed plan is the
    same rank-window-over-join shape as `window_topn_per_group`, not
    |customers| subquery executions, so the SQL surface costs nothing
    extra at scale. Customers with no orders drop (CROSS JOIN LATERAL
    semantics on an empty correlated result)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey, l.o_orderkey AS orderkey,
               l.o_totalprice AS totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) l
        """
    )


#: sparsification threshold for the recursive-reachability edge set:
#: keep co-purchase edges seen in at least this many orders
REACH_MIN_W = 2
REACH_MAX_HOPS = 3


@query(
    "recursive_brand_reachability",
    oracle=f"""
    WITH RECURSIVE reach(brand, hop) AS (
        SELECT MIN(p_brand), 0 FROM part
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN (
            SELECT a.brand AS src, b.brand AS dst
            FROM (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
                  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey) a
                 JOIN
                 (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
                  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey) b
                 ON a.okey = b.okey AND a.brand <> b.brand
            GROUP BY a.brand, b.brand
            HAVING COUNT(*) >= {REACH_MIN_W}
        ) e ON e.src = r.brand
        WHERE r.hop < {REACH_MAX_HOPS}
    )
    SELECT brand, CAST(MIN(hop) AS INTEGER) AS min_hops,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM reach GROUP BY brand ORDER BY brand
    """,
)
def recursive_brand_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE) doing a bounded BFS:
    minimum hop count and path count from the lexicographically first
    brand over the sparsified co-purchase graph (edges seen in ≥
    {REACH_MIN_W} orders), paths capped at {REACH_MAX_HOPS} hops.

    The edge set is materialized to a temp view FIRST (one fact-table
    aggregation) so each recursive step joins the frontier against the
    tiny edge table — the same persist-then-iterate contract as
    `pagerank_brand_copurchase`; the recursion itself is driven by the
    engine (Catalyst's recursive-CTE execution), not a Python loop.
    Hop-bounded UNION ALL recursion terminates deterministically on
    cyclic graphs; path counts are exact multiset counts, identical in
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    # MATERIALIZE the edge table before the recursion (the
    # persist-then-iterate contract the docstring promises): a temp
    # view is lazy, so every recursive step would otherwise re-run the
    # fact-table self-join + aggregation — measured 6.8 s -> ~2 s at
    # sf0.1 (the recursion re-derived the edges once per hop). The
    # checkpointed frame is |brands|^2-bounded (~hundreds of rows).
    edges = scoped_localcheckpoint(
        a.join(b, (F.col("a.okey") == F.col("b.okey"))
               & (F.col("a.brand") != F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("src"), F.col("b.brand").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= REACH_MIN_W)
        .select("src", "dst")
    )
    edges.createOrReplaceTempView("reach_edges")
    part.createOrReplaceTempView("part_v")
    return spark.sql(
        f"""
        WITH RECURSIVE reach(brand, hop) AS (
            SELECT MIN(p_brand), 0 FROM part_v
            UNION ALL
            SELECT e.dst, r.hop + 1
            FROM reach r JOIN reach_edges e ON e.src = r.brand
            WHERE r.hop < {REACH_MAX_HOPS}
        )
        SELECT brand, CAST(MIN(hop) AS INT) AS min_hops,
               COUNT(*) AS n_paths
        FROM reach GROUP BY brand ORDER BY brand
        """
    )


@query(
    "null_semantics_probe",
    oracle="""
    WITH seq AS (
        SELECT lag(event_type) OVER w AS prev_t,
               lead(event_type) OVER w AS next_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(prev_t) AS BIGINT) AS n_nonnull_prev,
           CAST(SUM(CASE WHEN prev_t = next_t THEN 1 ELSE 0 END) AS BIGINT)
               AS eq_matches,
           CAST(SUM(CASE WHEN prev_t IS NOT DISTINCT FROM next_t
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS nullsafe_eq_matches,
           CAST(SUM(CASE WHEN prev_t IS NULL AND next_t IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS both_null,
           CAST(COUNT(DISTINCT next_t) AS BIGINT) AS distinct_next
    FROM seq
    """,
)
def null_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic parity probe: regular equality (NULL
    propagates, so NULL = NULL contributes nothing), null-safe
    equality (`<=>` / IS NOT DISTINCT FROM: NULL <=> NULL is TRUE),
    COUNT(col) vs COUNT(*) null exclusion, and COUNT(DISTINCT)
    null handling — pinned against a second engine on data with
    real NULLs (the lag/lead sequence edges). The CDC merge and as-of
    operators lean on exactly these semantics; this query keeps the
    engine's NULL contract regression-checked explicitly.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_t"),
        F.lead("event_type").over(w).alias("next_t"),
    )
    return seq.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("prev_t").alias("n_nonnull_prev"),
        F.sum(
            F.when(F.col("prev_t") == F.col("next_t"), 1).otherwise(0)
        ).cast("long").alias("eq_matches"),
        F.sum(
            F.when(F.expr("prev_t <=> next_t"), 1).otherwise(0)
        ).cast("long").alias("nullsafe_eq_matches"),
        F.sum(
            F.when(
                F.col("prev_t").isNull() & F.col("next_t").isNull(), 1
            ).otherwise(0)
        ).cast("long").alias("both_null"),
        F.countDistinct("next_t").cast("long").alias("distinct_next"),
    )
