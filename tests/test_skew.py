"""salted_join: identical results to the plain join, with the hot key
spread over n_salt shuffle buckets."""

import pytest
from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators.skew import salted_join


@pytest.fixture()
def frames(spark):
    # one hot key (7) owning 80% of the big side + a long tail
    big = spark.range(0, 10_000).selectExpr(
        "CASE WHEN id % 5 != 0 THEN 7 ELSE id END AS k", "id AS row_id"
    )
    small = spark.range(0, 2_000).selectExpr("id AS k", "id * 10 AS v")
    return big, small


def test_salted_inner_join_matches_plain(spark, frames):
    big, small = frames
    plain = {(r.k, r.row_id, r.v) for r in big.join(small, "k").collect()}
    salted = {
        (r.k, r.row_id, r.v)
        for r in salted_join(big, small, ["k"], n_salt=8).collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_left_join_matches_plain(spark, frames):
    big, small = frames
    # shrink the small side so some keys miss -> NULLs must survive
    small = small.filter(F.col("k") < 100)
    plain = {
        (r.k, r.row_id, r.v) for r in big.join(small, "k", "left").collect()
    }
    salted = {
        (r.k, r.row_id, r.v)
        for r in salted_join(big, small, ["k"], n_salt=4, how="left").collect()
    }
    assert salted == plain
    assert any(v is None for _, _, v in salted)  # unmatched keys kept


def test_salt_actually_spreads_hot_key(spark, frames):
    big, _ = frames
    n = (
        big.filter(F.col("k") == 7)
        .withColumn(
            "__salt", F.pmod(F.xxhash64("row_id"), F.lit(8)).cast("int")
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n == 8  # the hot key occupies every salt bucket


def test_salted_join_rejects_unsupported_how(spark, frames):
    big, small = frames
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(big, small, ["k"], how="full")


def test_salted_join_requires_spray_columns(spark):
    big = spark.range(3).selectExpr("id AS k")
    small = spark.range(3).selectExpr("id AS k", "id AS v")
    with pytest.raises(ValueError, match="spray"):
        salted_join(big, small, ["k"])
