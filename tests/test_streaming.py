"""Streaming pipeline tests: file-source micro-batches drive the same
operators the Kafka path uses (unified model), bounded with
availableNow triggers — the reference's short-burst runs."""

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators import cdc
from cdc_kafka_project_spark.schemas import EMP_CDC_SCHEMA, EMPLOYEE_SALARIES_SCHEMA
from cdc_kafka_project_spark.streaming import kafka_io
from cdc_kafka_project_spark.streaming.pipeline import (
    CdcFileStreamPipeline,
    streaming_running_totals,
    streaming_windowed_counts,
)
from tests.test_cdc_golden import golden_rows


@pytest.fixture()
def tmpdirs(tmp_path):
    src = tmp_path / "src"
    work = tmp_path / "work"
    src.mkdir()
    return str(src), str(work)


def _pipeline(spark, src, work):
    return CdcFileStreamPipeline(
        spark,
        source_dir=src,
        work_dir=work,
        schema=EMP_CDC_SCHEMA,
        invalid=cdc.employee_invalid_predicate(),
    )


def test_streaming_cdc_golden_workload(spark, tmpdirs):
    src, work = tmpdirs
    spark.createDataFrame(golden_rows(), EMP_CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    p = _pipeline(spark, src, work)
    p.run_available_now()

    assert {r.emp_id for r in p.dlq().collect()} == {3, 4, -100}
    snap = p.snapshot().collect()
    assert len(snap) == 1 and snap[0].emp_id == 2  # Emma


def test_streaming_incremental_batches_resume_from_checkpoint(spark, tmpdirs):
    """Two short-burst runs over a growing source directory: the second
    run must process only the new files (checkpointed offsets) and the
    replica view must reflect the merged state."""
    src, work = tmpdirs
    rows = golden_rows()
    first, second = rows[:5], rows[5:]  # inserts | update+delete of Alice

    spark.createDataFrame(first, EMP_CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    p = _pipeline(spark, src, work)
    p.run_available_now()
    snap1 = {r.emp_id: r.salary for r in p.snapshot().collect()}
    assert snap1 == {1: 80000, 2: 72000}  # Alice + Emma

    spark.createDataFrame(second, EMP_CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    p2 = _pipeline(spark, src, work)
    p2.run_available_now()
    snap2 = p2.snapshot().collect()
    assert len(snap2) == 1 and snap2[0].emp_id == 2

    # curated log holds exactly the 4 valid events (no reprocessing)
    assert p2.curated_log().count() == 4


def test_streaming_running_totals_update_mode(spark, tmp_path):
    """Project-1 running aggregation (pdf p.4-6): per-department totals
    over floored salaries, golden-totals-style."""
    src = tmp_path / "sal"
    src.mkdir()
    from decimal import Decimal

    d = dt.date(2015, 1, 1)
    rows = [
        ("ECC", "d1", "t", d, Decimal("100.75")),
        ("CIT", "d1", "t", d, Decimal("200.25")),
        ("ECC", "d2", "t", d, Decimal("49.50")),
    ]
    spark.createDataFrame(rows, EMPLOYEE_SALARIES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = streaming_running_totals(
        spark,
        str(src),
        EMPLOYEE_SALARIES_SCHEMA,
        str(tmp_path / "cp"),
        query_name="rt_test",
    )
    q.awaitTermination()
    got = {
        r.department: r.total_salary
        for r in spark.sql("SELECT * FROM rt_test").collect()
    }
    assert got == {"ECC": 149, "CIT": 200}  # floor(100.75)+floor(49.50), floor(200.25)


def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    rows = golden_rows()
    spark.createDataFrame(rows, EMP_CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    q = streaming_windowed_counts(
        spark,
        str(src),
        EMP_CDC_SCHEMA,
        str(tmp_path / "cp2"),
        window="1 hour",
        query_name="wc_test",
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM wc_test").collect()
    # all 7 events fall in the same hour window (12:00-13:00)
    assert len(got) == 1 and got[0].n == 7


def test_kafka_envelope_roundtrip(spark):
    """encode -> decode over static frames (the Kafka-facing transform
    layer; producer.py:62-71 / consumer.py:42-43)."""
    df = spark.createDataFrame(golden_rows(), EMP_CDC_SCHEMA)
    wire = kafka_io.encode_envelope(
        df.withColumn("dob", F.col("dob").cast("string")).withColumn(
            "last_updated_at", F.col("last_updated_at").cast("string")
        ),
        key_col="emp_id",
    )
    assert wire.columns == ["key", "value"]
    # wire format stringifies dates/timestamps (producer.py:56,63)
    from pyspark.sql import types as T

    stringly = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if f.dataType.typeName() in ("date", "timestamp") else f.dataType,
            )
            for f in EMP_CDC_SCHEMA.fields
        ]
    )
    decoded = kafka_io.decode_envelope(
        wire.withColumn("value", F.col("value").cast("binary")),
        value_schema=stringly,
    ).select("key", "payload.*")
    back = decoded.collect()
    assert len(back) == len(golden_rows())
    keys = {r.key for r in back}
    assert keys == {str(r[0]) for r in golden_rows()}


def test_decode_envelope_routes_corrupt_payloads_to_null(spark):
    """Malformed JSON -> NULL payload (DLQ-routable), never a crash —
    deliberate upgrade over consumer.py:95-102's silent swallow."""
    from pyspark.sql import types as T

    raw = spark.createDataFrame(
        [("1", bytearray(b'{"emp_id": 1}')), ("2", bytearray(b"not json"))],
        "key string, value binary",
    )
    schema = T.StructType([T.StructField("emp_id", T.LongType())])
    out = kafka_io.decode_envelope(raw, schema)
    got = {r.key: r.payload for r in out.collect()}
    assert got["1"] is not None and got["1"].emp_id == 1
    assert got["2"] is None


def test_stateful_running_totals_survive_restart(spark, tmp_path):
    """applyInPandasWithState: state round-trips through the checkpoint
    across two bounded runs — the durable upgrade over the reference's
    in-memory watermark (producer.py:15)."""
    import decimal

    from cdc_kafka_project_spark.streaming.stateful import (
        latest_totals,
        run_stateful_totals,
    )

    src = tmp_path / "sal2"
    src.mkdir()
    d = dt.date(2015, 1, 1)
    cp = str(tmp_path / "cp_state")
    out = str(tmp_path / "totals_out")

    first = [
        ("ECC", "d1", "t", d, decimal.Decimal("100.75")),
        ("CIT", "d1", "t", d, decimal.Decimal("200.25")),
    ]
    spark.createDataFrame(first, EMPLOYEE_SALARIES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_stateful_totals(
        spark, str(src), EMPLOYEE_SALARIES_SCHEMA, cp, out
    ).awaitTermination()
    got1 = {r.department: r.total_salary for r in latest_totals(spark, out).collect()}
    assert got1 == {"ECC": 100, "CIT": 200}

    # second batch lands; a NEW bounded run must resume prior state
    second = [
        ("ECC", "d2", "t", d, decimal.Decimal("49.50")),
        ("EMS", "d3", "t", d, decimal.Decimal("10.99")),
    ]
    spark.createDataFrame(second, EMPLOYEE_SALARIES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_stateful_totals(
        spark, str(src), EMPLOYEE_SALARIES_SCHEMA, cp, out
    ).awaitTermination()
    got2 = {r.department: r.total_salary for r in latest_totals(spark, out).collect()}
    # accumulated across runs: ECC = 100 + 49; CIT untouched in run 2
    # but still current from run 1's emission
    assert got2 == {"ECC": 149, "CIT": 200, "EMS": 10}


def test_sized_state_session_caps_state_partitions(spark, tmp_path):
    """r16: stateful_shuffle_width caps state partitioning at the key
    domain (a per-group operator can never use more parallelism than
    groups; empty state partitions still pay per-batch store
    lifecycle), and sized_state_session applies it WITHOUT touching the
    caller's session conf. The checkpoint's state dir layout is the
    ground truth for how many stores the stream actually committed."""
    import decimal
    import os

    from cdc_kafka_project_spark.streaming.stateful import (
        latest_totals,
        run_stateful_totals,
        sized_state_session,
        stateful_shuffle_width,
    )

    base_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert stateful_shuffle_width(spark, 3) == min(base_width, 3)
    assert stateful_shuffle_width(spark, 10**6) == base_width

    sess = sized_state_session(spark, 3)
    assert int(sess.conf.get("spark.sql.shuffle.partitions")) == min(
        base_width, 3
    )
    # caller's session untouched
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == base_width

    src = tmp_path / "sal_sized"
    src.mkdir()
    d = dt.date(2015, 1, 1)
    cp = str(tmp_path / "cp_sized")
    out = str(tmp_path / "totals_sized")
    rows = [
        ("ECC", "d1", "t", d, decimal.Decimal("100.75")),
        ("CIT", "d1", "t", d, decimal.Decimal("200.25")),
        ("EMS", "d3", "t", d, decimal.Decimal("10.99")),
    ]
    spark.createDataFrame(rows, EMPLOYEE_SALARIES_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run_stateful_totals(
        sess, str(src), EMPLOYEE_SALARIES_SCHEMA, cp, out
    ).awaitTermination()
    got = {
        r.department: r.total_salary
        for r in latest_totals(spark, out).collect()
    }
    assert got == {"ECC": 100, "CIT": 200, "EMS": 10}
    # the state store committed exactly the capped partition count
    state_dirs = os.listdir(os.path.join(cp, "state", "0"))
    n_parts = len([x for x in state_dirs if x.isdigit()])
    assert n_parts == min(base_width, 3), state_dirs


def test_tws_plan_builds_without_execution(spark, tmp_path):
    """The transformWithStateInPandas plan must CONSTRUCT in any
    environment (protobuf is an execution-time dependency only):
    streaming flag set, output schema as declared."""
    from cdc_kafka_project_spark.streaming.stateful import running_totals_tws

    src = tmp_path / "tws_plan_src"
    src.mkdir()
    stream = spark.readStream.schema(EMPLOYEE_SALARIES_SCHEMA).parquet(str(src))
    out = running_totals_tws(stream)
    assert out.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("department", "string"),
        ("total_salary", "bigint"),
    ]


def test_tws_running_totals_parity_and_restart(spark, tmp_path):
    """transformWithStateInPandas (the current Spark 4.x stateful API,
    RocksDB-backed) must produce the same totals as the
    applyInPandasWithState implementation and resume state across
    bounded runs. Skips when google.protobuf is absent (TWS's state
    protocol dependency; not shipped in this container)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState requires protobuf for its state protocol",
    )
    import decimal

    from cdc_kafka_project_spark.streaming.stateful import running_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "sal_tws"
        src.mkdir()
        d = dt.date(2015, 1, 1)
        cp = str(tmp_path / "cp_tws")

        def run():
            stream = spark.readStream.schema(EMPLOYEE_SALARIES_SCHEMA).parquet(
                str(src)
            )
            q = (
                running_totals_tws(stream)
                .writeStream.outputMode("update")
                .format("memory")
                .queryName("tws_totals")
                .option("checkpointLocation", cp)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        first = [
            ("ECC", "d1", "t", d, decimal.Decimal("100.75")),
            ("CIT", "d1", "t", d, decimal.Decimal("200.25")),
        ]
        spark.createDataFrame(first, EMPLOYEE_SALARIES_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        run()
        got1 = {
            r.department: r.total_salary
            for r in spark.table("tws_totals").collect()
        }
        assert got1 == {"ECC": 100, "CIT": 200}

        second = [("ECC", "d2", "t", d, decimal.Decimal("49.50"))]
        spark.createDataFrame(second, EMPLOYEE_SALARIES_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        run()  # memory sink resets per run; emission covers batch 2 only
        got2 = {
            r.department: r.total_salary
            for r in spark.table("tws_totals").collect()
        }
        assert got2["ECC"] == 149  # resumed 100 + floor(49.50)
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_scd2_view_equals_batch_over_merged_log(spark, tmpdirs):
    """SCD2-over-the-curated-log after two streaming bursts must equal
    the batch scd2_history over the full valid change-log: version
    chains survive the batch boundary (an update arriving in burst 2
    closes the version opened in burst 1) with no history rewrite."""
    from cdc_kafka_project_spark.operators.cdc import scd2_history

    src, work = tmpdirs
    rows = golden_rows()
    first, second = rows[:5], rows[5:]

    spark.createDataFrame(first, EMP_CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    p = _pipeline(spark, src, work)
    p.run_available_now()
    spark.createDataFrame(second, EMP_CDC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    p2 = _pipeline(spark, src, work)
    p2.run_available_now()

    def key(df):
        return sorted(
            (r.emp_id, r.seq, str(r.valid_to_ts), r.is_current)
            for r in df.collect()
        )

    got = key(p2.scd2_view())
    # batch twin: one-shot validate + scd2 over the SAME raw workload
    from cdc_kafka_project_spark.operators.cdc import (
        employee_invalid_predicate,
        validate_split,
    )

    valid_log, _ = validate_split(
        spark.createDataFrame(rows, EMP_CDC_SCHEMA), employee_invalid_predicate()
    )
    want = key(
        scd2_history(valid_log, p2.key_cols, p2.order_cols, "last_updated_at")
    )
    assert got == want and got
    # Alice (emp 1): insert then update then delete — the burst-2
    # events must CLOSE the versions opened in burst 1 (cross-batch
    # version chaining), leaving exactly one open row: the delete
    # tombstone (raw history keeps it; live views filter the action)
    alice = sorted(
        (r for r in p2.scd2_view().collect() if r.emp_id == 1),
        key=lambda r: r.seq,
    )
    assert len(alice) >= 2
    assert all(r.valid_to_ts is not None for r in alice[:-1])
    assert alice[-1].is_current and alice[-1].action == "delete"
