"""Mergeable HLL sketch state tables (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators import sketches as sk


def test_hll_state_error_bound_and_union(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("bucket"), (F.col("id") % 7001).alias("uid")
    )
    states = sk.hll_state_table(df, "bucket", "uid")
    rows = {r.bucket: r for r in states.collect()}
    for r in rows.values():
        # per-bucket estimate within 3% of exact
        est = spark.createDataFrame([r]).select(
            F.hll_sketch_estimate("sketch")
        ).collect()[0][0]
        assert abs(est - r.exact_distinct) / r.exact_distinct < 0.03
    # union across buckets ~ true global distinct (7001), not the sum
    u = sk.hll_union_estimate(states).collect()[0]
    assert abs(u.est_distinct - 7001) / 7001 < 0.03
    assert u.sum_bucket_exact > 7001  # buckets overlap, sum overcounts


def test_hll_state_table_parquet_roundtrip_merge(spark, tmp_path):
    """The incremental-maintenance loop: persist sketch state, read it
    back, merge with a new delta's sketches — estimate must track the
    union of both generations without touching generation-1 raw data."""
    p = str(tmp_path / "hll_state")
    gen1 = spark.range(0, 5000).select(F.lit("d1").alias("bucket"), F.col("id").alias("uid"))
    sk.hll_state_table(gen1, "bucket", "uid").write.parquet(p)

    delta = spark.range(4000, 9000).select(F.lit("d2").alias("bucket"), F.col("id").alias("uid"))
    merged = spark.read.parquet(p).unionByName(
        sk.hll_state_table(delta, "bucket", "uid")
    )
    est = sk.hll_union_estimate(merged).collect()[0].est_distinct
    assert abs(est - 9000) / 9000 < 0.03


def test_hll_overlap_inclusion_exclusion_error_bound(spark):
    """est_intersection within 10% of the exact overlap on a corpus
    with known 50% overlap structure."""
    from cdc_kafka_project_spark.queries.scale_patterns import (
        _user_overlap_full,
        sketch_user_overlap,
    )
    from tests.conftest import SF_SMOKE

    r = _user_overlap_full(spark, SF_SMOKE).collect()[0]
    exact = r["exact_intersection"]
    assert exact > 0
    # mirrors the registered flag's bound: 10% relative with a
    # 5%-of-union absolute floor (HLL error scales with the union)
    err = abs(r["est_intersection"] - exact)
    assert err <= max(0.10 * exact, 0.05 * r["exact_union"]), (
        r["est_intersection"], exact, r["exact_union"]
    )
    # sanity: union <= a + b, intersection <= min(a, b)
    assert r["est_union"] <= r["est_view"] + r["est_purchase"]
    assert r["est_intersection"] <= min(r["est_view"], r["est_purchase"]) * 1.02
    # the registered (drivable) projection folds the same bound to a flag
    d = sketch_user_overlap(spark, SF_SMOKE).collect()[0]
    assert d["est_within_10pct"] is True
    assert d["exact_intersection"] == exact
