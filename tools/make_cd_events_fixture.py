#!/usr/bin/env python
"""Constant-temporal-density events replica (round-13 verdict item 4).

The standard replica builder (make_scale_replica.py) keeps event
timestamps in their original ~30-day range — a K-times-DENSER stream
over the same window. That is the realistic scale-up for
sessionization and watermark state, but it is a fixture ARTIFACT for
the interval-join twins: packing K-fold incidents into the same range
inflates per-time-bin fan-out quadratically (O(K^2) join volume /
output), which is why interval_incident_event_stats and
interval_incident_overlap_pairs carried >=1000x exclusions in r13.
Real K-fold event data spans ~K-fold the time at roughly constant
density, keeping per-window fan-out constant and the interval joins
linear in K.

This tool assembles a fixture dir where ONLY events differs:

    python tools/make_cd_events_fixture.py SRC_SF_DIR BASE_REPLICA_DIR \
        OUT_DIR K

* ``events.parquet``: K replicas, ids shifted by i*10**8 (the standard
  key convention), timestamps shifted by i * (base span + 2 h) so the
  replica blocks are time-disjoint even after the 1-hour incident
  window extension — density is exactly the base density everywhere.
* every other table: a symlink into BASE_REPLICA_DIR (both Spark and
  DuckDB read through symlinks), so the fixture costs one events table
  of disk, not a second 17 GB replica.
"""

from __future__ import annotations

import math
import os
import shutil
import sys

sys.path.insert(0, ".")

OFFSET = 10**8
CHUNK = 100


def build(src: str, base_replica: str, out: str, k: int) -> None:
    from pyspark.sql import functions as F

    from cdc_kafka_project_spark.catalog import load_table
    from cdc_kafka_project_spark.schemas import TESTDATA_TABLES
    from cdc_kafka_project_spark.session import get_spark

    spark = get_spark("cd-events-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    base = load_table(spark, src, "events")
    lo, hi = base.agg(F.min("ts"), F.max("ts")).first()
    span_sec = math.ceil((hi - lo).total_seconds())
    # +2h margin: the incident fixture extends windows 1h past an
    # event's ts; disjoint blocks keep cross-replica overlap at zero,
    # i.e. density is EXACTLY base density, never accidentally higher
    # at block seams.
    shift_sec = span_sec + 7200
    print(f"base events span {span_sec} s; per-replica shift {shift_sec} s")

    cols = base.columns
    tmp = os.path.join(out, "__tmp_events")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    def one_replica(i: int):
        rep = base
        for c in ("event_id", "user_id"):
            rep = rep.withColumn(c, F.col(c) + F.lit(i * OFFSET))
        if i > 0:
            rep = rep.withColumn(
                "ts",
                F.col("ts")
                + F.expr(f"INTERVAL {i * shift_sec} SECONDS"),
            )
        return rep.select(cols)

    for lo_i in range(0, k, CHUNK):
        chunk = list(range(lo_i, min(lo_i + CHUNK, k)))
        reps = one_replica(chunk[0])
        for i in chunk[1:]:
            reps = reps.unionByName(one_replica(i))
        n_files = max(1, round(8 * len(chunk) / CHUNK))
        reps.repartition(n_files).write.mode("append").parquet(tmp)

    final = os.path.join(out, "events.parquet")
    if os.path.lexists(final):
        if os.path.isdir(final) and not os.path.islink(final):
            shutil.rmtree(final)
        else:
            os.remove(final)
    os.rename(tmp, final)
    n = spark.read.parquet(final).count()
    print(f"events: {n} rows -> {final}")

    for t in TESTDATA_TABLES:
        if t == "events":
            continue
        link = os.path.join(out, f"{t}.parquet")
        target = os.path.abspath(os.path.join(base_replica, f"{t}.parquet"))
        if not os.path.exists(target):
            raise SystemExit(f"missing {target} in BASE_REPLICA_DIR")
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(target, link)
        print(f"{t}: symlink -> {target}")


def main() -> int:
    if len(sys.argv) != 5 or not os.path.isdir(sys.argv[1]):
        print(__doc__)
        return 2
    build(sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
