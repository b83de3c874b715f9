"""Iterative graph analytics on DataFrames.

The reference has no graph surface (SURVEY.md §2 — its dataflow is a
linear CDC pipe); this module shows the Spark-idiomatic shape for
iterative graph algorithms: collapse the fact table to an aggregated
edge list ONCE (the only big shuffle), then iterate joins on the tiny
aggregate. The companion iterative operator is connected components
(``operators/dedup.py``); PageRank here adds the weighted-propagation
family with an *exact* SQL oracle — the fixed iteration count unrolls
into a CTE chain, so DuckDB independently reproduces every iteration
bit-for-bit (per-iteration floor-form rounding keeps both engines in
lockstep; contribution sums go through exact DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_kafka_project_spark.cache import scoped_persist
from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.registry import query

#: damping factor and fixed iteration count (unrolled in the oracle)
PR_DAMPING = 0.85
PR_ITERS = 3


def _pr_iteration_sql(i: int) -> str:
    """One unrolled PageRank iteration as two CTE blocks."""
    return f"""
    s{i} AS (
        SELECT e.dst AS brand,
               CAST(CAST(SUM(CAST(r{i - 1}.r * CAST(e.w AS DOUBLE)
                             / CAST(wo.wout AS DOUBLE)
                             AS DECIMAL(25,12))) AS VARCHAR) AS DOUBLE) AS sumin
        FROM e JOIN r{i - 1} ON e.src = r{i - 1}.brand
               JOIN wout wo ON wo.src = e.src
        GROUP BY e.dst
    ),
    r{i} AS (
        SELECT nd.brand,
               floor(((1 - {PR_DAMPING}) / nn.n
                      + {PR_DAMPING} * COALESCE(s{i}.sumin, 0.0))
                     * 1e6 + 0.5) / 1e6 AS r
        FROM nodes nd CROSS JOIN nn LEFT JOIN s{i} ON s{i}.brand = nd.brand
    )"""


@query(
    "pagerank_brand_copurchase",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nodes AS (SELECT DISTINCT brand FROM ob),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    e AS (
        SELECT a.brand AS src, b.brand AS dst, CAST(COUNT(*) AS BIGINT) AS w
        FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand <> b.brand
        GROUP BY a.brand, b.brand
    ),
    wout AS (
        SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY src
    ),
    r0 AS (
        SELECT brand, floor(1.0 / nn.n * 1e6 + 0.5) / 1e6 AS r
        FROM nodes CROSS JOIN nn
    ),
    {",".join(_pr_iteration_sql(i) for i in range(1, PR_ITERS + 1))}
    SELECT brand, r AS pagerank FROM r{PR_ITERS} ORDER BY brand
    """,
)
def pagerank_brand_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the brand co-purchase graph: nodes are
    part brands, edge (a→b) weight = number of orders containing both
    brands, rank propagated for {PR_ITERS} damped iterations.

    Scale shape: 100 TB of lineitem collapses to the distinct
    (order, brand) set and then to the |brands|² edge aggregate in one
    pass — the ONLY fact-table shuffle. Each iteration is a join of the
    edge table with the rank table (broadcast the ranks when the node
    set fits — here it always does; shuffle edges by src otherwise)
    plus a map-side-combined sum by dst. Determinism: ranks floor-round
    to 6dp after every iteration and contribution sums go through
    DECIMAL(25,12), so any partitioning — and the DuckDB unrolled-CTE
    oracle — produces bit-identical trajectories.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    nodes = ob.select("brand").distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    a, b = ob.alias("a"), ob.alias("b")
    # edge aggregate persisted once: every iteration re-reads it, and
    # without the persist the whole fact-table lineage (scan + distinct
    # + pair join) replays per iteration — the plan audit showed 49
    # exchanges unpersisted vs a handful with the materialized edges.
    # At cluster scale this is "checkpoint the edge list, iterate on it".
    e = scoped_persist(
        a.join(b, (F.col("a.okey") == F.col("b.okey"))
               & (F.col("a.brand") != F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("src"), F.col("b.brand").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wout = scoped_persist(
        e.groupBy("src").agg(F.sum("w").cast("long").alias("wout"))
    )
    nodes = scoped_persist(nodes)

    def round6(c):
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    r = nodes.crossJoin(F.broadcast(nn)).select(
        "brand", round6(F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            e.join(F.broadcast(r), e.src == r.brand)
            .join(F.broadcast(wout.withColumnRenamed("src", "wsrc")),
                  F.col("src") == F.col("wsrc"))
            .select(
                "dst",
                (
                    F.col("r") * F.col("w").cast("double")
                    / F.col("wout").cast("double")
                ).cast("decimal(25,12)").alias("contrib"),
            )
        )
        s = contrib.groupBy("dst").agg(
            F.sum("contrib").cast("double").alias("sumin")
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(F.broadcast(s), nodes.brand == s.dst, "left")
            .select(
                "brand",
                round6(
                    F.lit(1 - PR_DAMPING) / F.col("n")
                    + F.lit(PR_DAMPING)
                    * F.coalesce(F.col("sumin"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return r.select("brand", F.col("r").alias("pagerank")).orderBy("brand")


# docstring is a plain string (not an f-string) so the constant renders;
# guard for python -OO, where docstrings are stripped to None
if pagerank_brand_copurchase.__doc__:
    pagerank_brand_copurchase.__doc__ = pagerank_brand_copurchase.__doc__.replace(
        "{PR_ITERS}", str(PR_ITERS)
    )
