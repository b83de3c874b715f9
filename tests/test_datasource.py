"""Python DataSource API (Spark 4) connector over the embedded log:
batch scan parity, streaming offset slices, and checkpoint resume."""

import pytest
from pyspark.sql import functions as F

from cdc_kafka_project_spark.sources import embedded_log_ds
from cdc_kafka_project_spark.streaming.embedded_kafka import EmbeddedLog


@pytest.fixture()
def log(tmp_path):
    return EmbeddedLog(str(tmp_path / "broker"))


def _publish(spark, log, topic, rows):
    log.publish(
        spark.createDataFrame(rows, "key string, value string"),
        topic,
        order_col="value",
    )


def _decoded(df):
    return {
        (r["key"], r["value"], r["partition"], r["offset"])
        for r in df.select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            "partition",
            "offset",
        ).collect()
    }


def test_batch_read_matches_raw_batch(spark, log):
    embedded_log_ds.register(spark)
    log.create_topic("t", num_partitions=3)
    _publish(spark, log, "t", [(f"k{i % 5}", f"v{i}") for i in range(40)])
    got = spark.read.format("embedded_log").options(
        root=log.root, topic="t"
    ).load()
    want = log.raw_batch(spark, "t")
    assert _decoded(got) == _decoded(want)
    # scan parallelism == topic partition count (Kafka's 1:1 mapping)
    assert got.rdd.getNumPartitions() == 3


def test_batch_read_missing_topic_raises(spark, log):
    embedded_log_ds.register(spark)
    with pytest.raises(Exception, match="does not exist"):
        spark.read.format("embedded_log").options(
            root=log.root, topic="nope"
        ).load().collect()


def test_stream_resumes_from_checkpoint_without_replay(spark, log, tmp_path):
    """availableNow burst 1 reads the whole log; more records arrive;
    burst 2 from the same checkpoint reads ONLY the delta — the
    offsets-dict checkpoint story, end to end."""
    embedded_log_ds.register(spark)
    log.create_topic("t", num_partitions=2)
    _publish(spark, log, "t", [(f"k{i}", f"a{i}") for i in range(10)])

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def burst():
        q = (
            spark.readStream.format("embedded_log")
            .options(root=log.root, topic="t")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    burst()
    first = _decoded(spark.read.parquet(out_dir))
    assert {v for _, v, _, _ in first} == {f"a{i}" for i in range(10)}

    _publish(spark, log, "t", [(f"k{i}", f"b{i}") for i in range(7)])
    burst()
    both = _decoded(spark.read.parquet(out_dir))
    assert {v for _, v, _, _ in both} == {f"a{i}" for i in range(10)} | {
        f"b{i}" for i in range(7)
    }
    # no replay: each record delivered exactly once across bursts
    assert len(both) == 17
