"""AQE runtime-replanning contracts: the configs session.py turns on
must actually ENGAGE on the shapes they exist for — a config that never
fires is indistinguishable from a missing one.

Thresholds are lowered to make local[4]-scale data look like cluster
scale; assertions read the ADAPTIVE final plan after execution (AQE
only finalizes on action).
"""

import pytest


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """One key owning ~50% of the left side must trigger
    OptimizeSkewedJoin: the final plan's sort-merge join is marked
    skew=true and its shuffle read 'skewed' — instead of one reducer
    stalling on the hot key. The pad is uuid() (incompressible): skew
    detection reads COMPRESSED map-output sizes, so a constant pad
    deflates below any threshold and hides the skew."""
    old = _with_confs(
        spark,
        {
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32768",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    try:
        left = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 7 ELSE id END AS k", "uuid() AS pad"
        )
        right = spark.range(0, 50_000).selectExpr("id AS k", "id * 2 AS v")
        df = left.join(right, "k")
        assert len(df.collect()) == 125_000  # 100k hot + 25k odd ids < 50k
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
        assert "AQEShuffleRead skewed" in plan, plan[:3000]
    finally:
        _restore(spark, old)


def test_aqe_coalesces_tiny_shuffle_partitions(spark):
    """A near-empty aggregation must not keep the configured reducer
    count: AQEShuffleRead coalesces post-shuffle partitions to the
    data's actual size."""
    old = _with_confs(spark, {"spark.sql.shuffle.partitions": "8"})
    try:
        df = spark.range(0, 100).selectExpr("id % 3 AS k").groupBy("k").count()
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead coalesced" in plan, plan[:3000]
    finally:
        _restore(spark, old)
