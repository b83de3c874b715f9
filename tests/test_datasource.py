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


def test_debezium_over_datasource_end_to_end(spark, log, tmp_path):
    """The full modern-CDC path in one test: Debezium envelopes
    published to the embedded topic, streamed via the Python
    DataSource connector, decoded with the typed envelope schema, and
    applied to a replica in foreachBatch — with a second burst over
    the same checkpoint applying only the delta."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from cdc_kafka_project_spark.operators.cdc import latest_per_key
    from cdc_kafka_project_spark.streaming.kafka_io import (
        decode_debezium,
        encode_debezium,
    )

    ROW = "emp_id long, name string, salary long"
    row_schema = StructType.fromDDL(ROW)
    embedded_log_ds.register(spark)
    log.create_topic("cdc", num_partitions=2)

    def publish(changes):
        chg = spark.createDataFrame(
            changes,
            StructType.fromDDL(
                f"k long, before struct<{ROW.replace(', ', ',')}>, "
                f"after struct<{ROW.replace(', ', ',')}>, "
                "op string, ts_ms long, seq long"
            ),
        )
        log.publish(
            encode_debezium(chg, "k", table="employees", seq_col="seq"),
            "cdc",
            order_col="value",
        )

    publish(
        [
            (1, None, Row(emp_id=1, name="A", salary=10), "c", 1000, 1),
            (2, None, Row(emp_id=2, name="B", salary=20), "c", 1500, 2),
            (1, Row(emp_id=1, name="A", salary=10),
             Row(emp_id=1, name="A", salary=11), "u", 2000, 3),
        ]
    )

    replica_dir = str(tmp_path / "replica")
    ckpt = str(tmp_path / "ckpt")
    applied_batches = []

    def apply_batch(batch_df, epoch_id):
        decoded = decode_debezium(batch_df, row_schema)
        assert decoded.filter(F.col("op").isNull()).count() == 0
        flat = decoded.select(
            F.col("row.emp_id").alias("emp_id"),
            F.col("op"),
            F.col("row.name").alias("name"),
            F.col("row.salary").alias("salary"),
            "ts_ms",
            "seq",
        )
        flat.write.mode("append").parquet(replica_dir)
        applied_batches.append(flat.count())

    def burst():
        q = (
            spark.readStream.format("embedded_log")
            .options(root=log.root, topic="cdc")
            .load()
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    burst()
    log_df = spark.read.parquet(replica_dir)
    replica = latest_per_key(log_df, ["emp_id"], ["ts_ms", "seq"]).filter(
        F.col("op") != "d"
    )
    state = {r["emp_id"]: r for r in replica.collect()}
    assert state[1]["salary"] == 11 and state[2]["salary"] == 20

    # delta burst: delete emp 2, insert emp 3 — resume applies ONLY these
    publish(
        [
            (2, Row(emp_id=2, name="B", salary=20), None, "d", 3000, 4),
            (3, None, Row(emp_id=3, name="C", salary=30), "c", 3500, 5),
        ]
    )
    burst()
    log_df = spark.read.parquet(replica_dir)
    replica = latest_per_key(log_df, ["emp_id"], ["ts_ms", "seq"]).filter(
        F.col("op") != "d"
    )
    state = {r["emp_id"]: r for r in replica.collect()}
    assert set(state) == {1, 3}
    assert state[3]["salary"] == 30
    # exactly-once across bursts: 3 rows then 2, never a replay
    assert sum(applied_batches) == 5
