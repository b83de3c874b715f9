#!/usr/bin/env python
"""Decompose the two bench streaming surfaces (r15 verdict item 3).

Measures, in one session:
  * the golden-pipeline wall per STEP (setup/workload/producer/consumer/
    verify) across 3 fresh-workdir runs;
  * the consumer-throughput replay per MICRO-BATCH cost under variants:
      - baseline (session shuffle partitions, default checkpoint fs)
      - fewer state partitions (newSession with shuffle.partitions=N)
      - coalesced sink
    so the state-store / sink / python-boundary shares are attributable.

Usage: python tools/measure_streaming.py [--variants base,state8,...]
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdc_kafka_project_spark.session import get_spark  # noqa: E402


def golden_steps(spark, runs: int = 3) -> list[dict]:
    """run_full_pipeline with per-step timing (same work, same order)."""
    import datetime as dt

    from cdc_kafka_project_spark.operators import cdc
    from cdc_kafka_project_spark.schemas import (
        EMP_CDC_SCHEMA,
        KAFKA_ENVELOPE_SCHEMA,
    )
    from cdc_kafka_project_spark.streaming import full_pipeline as fp
    from cdc_kafka_project_spark.streaming import kafka_io
    from cdc_kafka_project_spark.streaming.embedded_kafka import EmbeddedLog

    out = []
    for _ in range(runs):
        work = tempfile.mkdtemp(prefix="meas-fullpipe-")
        t = {}
        try:
            t0 = time.time()
            log = EmbeddedLog(os.path.join(work, "broker"))
            source_dir = os.path.join(work, "emp_cdc")
            curated_dir = os.path.join(work, "curated")
            os.makedirs(source_dir, exist_ok=True)
            log.create_topic(fp.CDC_TOPIC, num_partitions=3)
            log.create_topic(fp.DLQ_TOPIC, num_partitions=1)
            t["setup"] = time.time() - t0

            t0 = time.time()
            rows = fp.golden_workload()
            spark.createDataFrame(rows, EMP_CDC_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(source_dir)
            t["workload"] = time.time() - t0

            t0 = time.time()
            changes = spark.readStream.schema(EMP_CDC_SCHEMA).parquet(
                source_dir
            )
            producer = kafka_io.write_keyed_stream(
                fp.to_wire(changes),
                bootstrap_servers="embedded",
                topic=fp.CDC_TOPIC,
                key_col="emp_id",
                checkpoint_dir=os.path.join(work, "cp_producer"),
                transport=log,
                order_col="last_updated_at",
            )
            producer.trigger(availableNow=True).start().awaitTermination()
            t["producer"] = time.time() - t0

            t0 = time.time()
            decoded = kafka_io.read_cdc_stream(
                spark,
                bootstrap_servers="embedded",
                topic=fp.CDC_TOPIC,
                value_schema=KAFKA_ENVELOPE_SCHEMA,
                transport=log,
            )
            invalid = F.coalesce(fp.wire_invalid_predicate(), F.lit(True))
            bad = F.col("payload").isNull() | invalid

            def _consume(batch, epoch_id):
                log.publish(
                    batch.filter(bad).select(
                        "key", F.col("raw_value").alias("value")
                    ),
                    fp.DLQ_TOPIC,
                )
                fp.from_wire(batch.filter(~bad)).write.mode("append").parquet(
                    curated_dir
                )

            (
                decoded.writeStream.foreachBatch(_consume)
                .option(
                    "checkpointLocation", os.path.join(work, "cp_consumer")
                )
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
            t["consumer"] = time.time() - t0

            t0 = time.time()
            replica = cdc.apply_changes(
                spark.read.schema(EMP_CDC_SCHEMA).parquet(curated_dir),
                key_cols=("emp_id",),
                order_cols=("last_updated_at", "seq"),
            )
            replica_rows = sorted(
                (r.emp_id, r.first_name, r.salary) for r in replica.collect()
            )
            dlq = sorted(
                int(bytes(r.key).decode())
                for r in log.raw_batch(spark, fp.DLQ_TOPIC).collect()
            )
            n_prod = int(log.raw_batch(spark, fp.CDC_TOPIC).count())
            t["verify"] = time.time() - t0
            assert [r[1] for r in replica_rows] == ["Emma"], replica_rows
            assert len(dlq) == 3 and n_prod == 7
            t["total"] = sum(t.values())
        finally:
            shutil.rmtree(work, ignore_errors=True)
        out.append({k: round(v, 3) for k, v in t.items()})
    return out


def throughput_variants(spark, sf_dir: str, variants: list[str]) -> dict:
    from pyspark.sql import Window

    from cdc_kafka_project_spark.catalog import load_table
    from cdc_kafka_project_spark.schemas import TESTDATA_SCHEMAS
    from cdc_kafka_project_spark.streaming.embedded_kafka import EmbeddedLog
    from cdc_kafka_project_spark.streaming.kafka_io import (
        decode_envelope,
        encode_envelope,
    )
    from cdc_kafka_project_spark.streaming.stateful import (
        running_totals_stateful,
    )

    work = tempfile.mkdtemp(prefix="meas-stream-tp-")
    results = {}
    try:
        events = load_table(spark, sf_dir, "events")
        log = EmbeddedLog(os.path.join(work, "log"))
        topic = "events-bench"
        log.create_topic(topic, num_partitions=4)
        enc = encode_envelope(
            events, "event_id", passthrough=(F.col("event_id"),)
        )
        n_rows = 0
        for i in range(8):
            n_rows += log.publish(
                enc.filter(F.col("event_id") % 8 == i).drop("event_id"),
                topic,
            )
        data_dir = log._data_dir(topic)
        n_files = sum(
            1 for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        mfpt = max(1, n_files // 10)

        def run(tag: str, sess, coalesce_sink: bool, ckpt_base: str) -> dict:
            runs = []
            batches = []
            for r in range(3):
                ckpt = os.path.join(ckpt_base, f"ckpt_{tag}_{r}")
                out_dir = os.path.join(work, f"totals_{tag}_{r}")
                raw = log.raw_stream(sess, topic, max_files_per_trigger=mfpt)
                decoded = decode_envelope(raw, TESTDATA_SCHEMAS["events"])
                typed = decoded.filter(
                    F.col("payload").isNotNull()
                ).select(
                    F.col("payload.event_type").alias("event_type"),
                    F.col("payload.value").alias("value"),
                )
                totals = running_totals_stateful(
                    typed, group_col="event_type", amount_col="value"
                )
                epoch_times = []

                def write_batch(batch_df, epoch_id):
                    t0 = time.time()
                    b = batch_df.withColumn("__epoch", F.lit(int(epoch_id)))
                    if coalesce_sink:
                        b = b.coalesce(1)
                    b.write.mode("append").parquet(out_dir)
                    epoch_times.append(round(time.time() - t0, 3))

                t0 = time.time()
                (
                    totals.writeStream.outputMode("update")
                    .queryName(f"meas_tp_{tag}_{r}")
                    .foreachBatch(write_batch)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                    .awaitTermination()
                )
                runs.append(time.time() - t0)
                batches.append(len(epoch_times))
                if r == 0:
                    w = F.row_number().over(
                        Window.partitionBy("event_type").orderBy(
                            F.col("__epoch").desc()
                        )
                    )
                    got = {
                        (x.event_type, x.total_salary)
                        for x in sess.read.parquet(out_dir)
                        .withColumn("__rn", w)
                        .filter(F.col("__rn") == 1)
                        .select("event_type", "total_salary")
                        .collect()
                    }
                    want = {
                        (x.event_type, x.total_salary)
                        for x in events.groupBy("event_type")
                        .agg(
                            F.sum(
                                F.floor(F.col("value")).cast("long")
                            ).alias("total_salary")
                        )
                        .collect()
                    }
                    assert got == want, f"{tag}: totals diverged"
            med = sorted(runs)[1]
            return {
                "wall_med": round(med, 3),
                "wall_min": round(min(runs), 3),
                "rows_per_sec_med": round(n_rows / med, 1),
                "rows_per_sec_max": round(n_rows / min(runs), 1),
                "n_batches": batches,
                "sink_time_last_run_sec": round(sum(epoch_times), 3),
            }

        for v in variants:
            if v == "base":
                results[v] = run("base", spark, False, work)
            elif v.startswith("state"):
                n = int(v.removeprefix("state"))
                s2 = spark.newSession()
                s2.conf.set("spark.sql.shuffle.partitions", str(n))
                results[v] = run(v, s2, False, work)
            elif v == "sink1":
                results[v] = run(v, spark, True, work)
            elif v.startswith("shm"):
                base = tempfile.mkdtemp(
                    prefix="meas-ckpt-", dir="/dev/shm"
                )
                try:
                    results[v] = run(v, spark, False, base)
                finally:
                    shutil.rmtree(base, ignore_errors=True)
            else:
                raise SystemExit(f"unknown variant {v}")
            print(f"## {v}: {json.dumps(results[v])}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return {"n_rows": n_rows, "variants": results}


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--variants", default="base,state8,sink1,shm")
    ap.add_argument("--skip-golden", action="store_true")
    args = ap.parse_args()
    spark = get_spark("measure-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    if not args.skip_golden:
        spark.sparkContext.setJobDescription("golden pipeline steps")
        out["golden_steps"] = golden_steps(spark)
        print("## golden:", json.dumps(out["golden_steps"]), flush=True)
    spark.sparkContext.setJobDescription("throughput variants")
    out["throughput"] = throughput_variants(
        spark, args.sf_dir, args.variants.split(",")
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
