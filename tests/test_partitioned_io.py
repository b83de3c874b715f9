"""Date-partitioned writes + partition pruning: the other half of the
storage layout story (bucketing covers join keys; partitioning covers
time). A curated log written as dt=YYYY-MM-DD directories must prune
scans to the requested days — at 100 TB the difference between reading
one day and reading three years."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_kafka_project_spark.catalog import load_table
from cdc_kafka_project_spark.plans import formatted_plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part_events") / "events_by_day")
    ev = load_table(spark, SF_DIR, "events")
    (
        ev.withColumn("dt", F.col("ts").cast("date"))
        .write.partitionBy("dt")
        .mode("overwrite")
        .parquet(out)
    )
    return out


def test_partition_pruning_in_plan(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    one_day = df.filter(F.col("dt") == "2024-01-02")
    p = formatted_plan(one_day)
    assert "PartitionFilters" in p
    # the dt predicate must land in PartitionFilters (pruning), not in
    # PushedFilters (row-group evaluation after reading the file)
    pf = p.split("PartitionFilters")[1].split("]")[0]
    assert "dt" in pf, p


def test_partition_pruning_reads_only_matching_days(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events)
    days = [r.dt for r in df.select("dt").distinct().collect()]
    target = sorted(days)[0]
    got = df.filter(F.col("dt") == target).count()
    want = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("ts").cast("date") == target)
        .count()
    )
    assert got == want and got > 0


def test_partitioned_roundtrip_preserves_rows(spark, partitioned_events):
    ev = load_table(spark, SF_DIR, "events")
    back = spark.read.parquet(partitioned_events)
    assert back.count() == ev.count()
