"""Environment-gated capability tests (round-4 verdict #8).

The sandbox ships neither the spark-sql-kafka jar nor spark-avro, so
the real ``format("kafka")`` start path and ``avro_source`` run as
documented gates (`NotImplementedError` / embedded transport). These
tests SKIP loudly in that environment and auto-activate the moment the
capability appears (e.g. a future sandbox adds
``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13``):
the skip line in CI output is the standing reminder that the surface
exists but has never executed here.
"""

import pytest

from cdc_kafka_project_spark.schemas import EMP_CDC_SCHEMA


def _kafka_jar_present(spark) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:  # DATA_SOURCE_NOT_FOUND without the jar
        return "failed to find" not in str(e).lower().replace("the ", "")


def _avro_module_present(spark, tmp_path) -> bool:
    try:
        spark.range(1).write.format("avro").save(str(tmp_path / "avro_probe"))
        return True
    except Exception as e:
        return "failed to find" not in str(e).lower().replace("the ", "")


def test_real_kafka_source_and_sink_start(spark, tmp_path):
    """With the kafka jar on the classpath, the SAME read/write helpers
    used by the embedded-transport suite must build real broker-backed
    plans: a streaming source with the decoded envelope schema and a
    kafka-format sink writer. (Needs no broker: load() and writer
    construction are lazy; an actual .start() additionally needs a
    reachable bootstrap server.)"""
    if not _kafka_jar_present(spark):
        pytest.skip(
            "spark-sql-kafka jar not on classpath — real format('kafka') "
            "start path untested in this environment (embedded transport "
            "covers the envelope logic; see streaming/embedded_kafka.py)"
        )
    from cdc_kafka_project_spark.streaming import kafka_io

    src = kafka_io.read_cdc_stream(
        spark, "localhost:9092", "bf_employee_cdc", EMP_CDC_SCHEMA,
        max_offsets_per_trigger=100,
    )
    assert src.isStreaming
    assert set(EMP_CDC_SCHEMA.fieldNames()) <= set(src.columns)

    writer = kafka_io.write_keyed_stream(
        src, "localhost:9092", "bf_employee_cdc_out", "emp_id",
        str(tmp_path / "ckpt"),
    )
    # a DataStreamWriter wired for the kafka format, ready to .start()
    assert writer.__class__.__name__ == "DataStreamWriter"


def test_avro_source_roundtrip(spark, tmp_path):
    """With spark-avro present, avro_source must read back what the
    native writer produced — the gate raises only on jar absence."""
    if not _avro_module_present(spark, tmp_path):
        pytest.skip(
            "spark-avro module not on classpath — avro_source gate "
            "(sources/files.py) verified by test_sources.py error-path "
            "test only in this environment"
        )
    from cdc_kafka_project_spark.sources.files import avro_source

    path = str(tmp_path / "emp_avro")
    spark.range(0, 10).selectExpr("id", "concat('n', id) AS name").write.format(
        "avro"
    ).save(path)
    got = avro_source(spark, path)
    assert got.count() == 10
    assert set(got.columns) == {"id", "name"}
