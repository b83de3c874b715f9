"""Live-Kafka smoke layer (round-13 verdict, "Next round" #5).

The sandbox ships neither a broker nor the spark-sql-kafka jar, so the
real ``format("kafka")`` paths (streaming/kafka_io.py:146 source,
write_keyed_stream's broker branch) are proven only up to plan
construction plus the embedded-transport twin. These tests close the
deployable-day-one gap: point ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` at a real
broker (with the kafka jar on the classpath, e.g. via
``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``)
and the full produce -> broker -> consume -> decode round-trip runs;
in this environment they SKIP loudly with the activation recipe.

Run against a live broker:

    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \
    python -m pytest tests/test_live_kafka.py -v
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from cdc_kafka_project_spark.streaming import kafka_io

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason=(
        "no live broker configured — set SPARK_GRAFT_KAFKA_BOOTSTRAP="
        "host:port (and put the spark-sql-kafka jar on the classpath) "
        "to run the real format('kafka') round-trip; the embedded "
        "transport covers the envelope logic in this environment"
    ),
)

VALUE_SCHEMA = StructType(
    [
        StructField("emp_id", IntegerType()),
        StructField("name", StringType()),
        StructField("op", StringType()),
    ]
)


def _rows(spark, n: int = 5):
    return spark.createDataFrame(
        [Row(emp_id=i, name=f"emp-{i}", op="INSERT") for i in range(n)]
    )


def test_live_batch_produce_then_stream_consume(spark, tmp_path):
    """Round-trip through a real broker: envelope-encode a batch onto a
    fresh topic with the batch kafka sink, then consume it back through
    read_cdc_stream (the streaming format('kafka') source,
    kafka_io.py:146) with an availableNow trigger and assert the
    decoded payloads match what was produced."""
    topic = f"spark-graft-smoke-{uuid.uuid4().hex[:12]}"
    produced = _rows(spark)

    (
        kafka_io.encode_envelope(produced, key_col="emp_id")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    decoded = kafka_io.read_cdc_stream(
        spark, BOOTSTRAP, topic, VALUE_SCHEMA, starting_offsets="earliest"
    )
    out = str(tmp_path / "sink")
    q = (
        decoded.select("key", "payload.*")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out).orderBy("emp_id").collect()
    assert [r.emp_id for r in got] == [0, 1, 2, 3, 4]
    assert all(r.key == str(r.emp_id) for r in got)
    assert all(r.op == "INSERT" for r in got)


def test_live_keyed_sink_roundtrip(spark, tmp_path):
    """write_keyed_stream's broker branch end-to-end: stream a small
    rate-limited source through the keyed kafka sink, read the topic
    back as a batch, and assert the wire format (string key = primary
    key, JSON value) and per-key completeness."""
    topic = f"spark-graft-smoke-{uuid.uuid4().hex[:12]}"
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _rows(spark).write.parquet(str(src_dir / "batch0"))

    stream = spark.readStream.schema(
        "emp_id int, name string, op string"
    ).parquet(str(src_dir / "*"))

    writer = kafka_io.write_keyed_stream(
        stream,
        bootstrap_servers=BOOTSTRAP,
        topic=topic,
        key_col="emp_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    decoded = kafka_io.decode_envelope(raw, VALUE_SCHEMA)
    got = decoded.select("key", "payload.*").orderBy("emp_id").collect()
    assert [r.emp_id for r in got] == [0, 1, 2, 3, 4]
    assert all(r.key == str(r.emp_id) for r in got)
    # corrupt-payload contract holds on the live path too: a NULL
    # payload is only produced by corruption, never by valid rows
    assert decoded.filter(F.col("payload").isNull()).count() == 0
