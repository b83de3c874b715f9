"""Bucketed co-located joins: pre-shuffle once at write time, join
shuffle-free forever after — the storage-layout half of the 100 TB
strategy (SURVEY.md §7: "co-locate joins via bucketing").

Writes two tables bucketed by the join key into a temp warehouse and
asserts the join plan has NO exchange on either side: Spark trusts the
bucket layout as a pre-existing hash partitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.plans import count_key_exchanges, simple_plan

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    od = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    for df, name, key in ((od, "b_orders", "o_orderkey"),
                          (li, "b_lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    od = spark.table(ot)
    li = spark.table(lt)
    joined = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    p = simple_plan(joined)
    # the join itself must not exchange either side; the groupBy on a
    # different key is the only legitimate shuffle
    assert count_key_exchanges(joined) <= 1, p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p, p


def test_bucketed_join_matches_unbucketed_result(spark, bucketed_tables):
    ot, lt = bucketed_tables
    got = (
        spark.table(lt)
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    od = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    want = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert got == want


def test_bucketed_groupby_on_bucket_key_no_shuffle(spark, bucketed_tables):
    _, lt = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert count_key_exchanges(agg) == 0, simple_plan(agg)


def test_bucketed_changelog_cdc_apply_no_shuffle(spark, tmp_path_factory):
    """The CDC 100 TB endgame: a curated change-log written bucketed by
    the key makes apply_changes (window latest-per-key) shuffle-free —
    the scan's bucket layout satisfies the window's required hash
    distribution, so replica maintenance costs a sorted scan, not a
    full-corpus exchange."""
    import datetime as dt

    from cdc_kafka_project_spark.operators import cdc
    from cdc_kafka_project_spark.schemas import EMP_CDC_SCHEMA
    from tests.test_cdc_golden import golden_rows

    base = tmp_path_factory.mktemp("bucketed_log")
    log = spark.createDataFrame(golden_rows(), EMP_CDC_SCHEMA)
    spark.sql("DROP TABLE IF EXISTS b_emp_cdc")
    (
        log.write.bucketBy(N_BUCKETS, "emp_id")
        .sortBy("emp_id")
        .option("path", str(base / "b_emp_cdc"))
        .mode("overwrite")
        .saveAsTable("b_emp_cdc")
    )
    try:
        valid, _ = cdc.validate_split(
            spark.table("b_emp_cdc"), cdc.employee_invalid_predicate()
        )
        replica = cdc.apply_changes(valid)
        assert count_key_exchanges(replica) == 0, simple_plan(replica)
        rows = replica.collect()
        assert len(rows) == 1 and rows[0].emp_id == 2  # Emma survives
    finally:
        spark.sql("DROP TABLE IF EXISTS b_emp_cdc")
