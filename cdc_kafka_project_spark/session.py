"""SparkSession factory + runtime configuration.

The driver (and some hosts) hand us an externally-built SparkSession, so
everything that can be applied at runtime lives in ``configure_session``
and is applied defensively before reads — in particular the
``nanosAsLong`` escape hatch: the synthetic ``events`` table is written
with parquet TIMESTAMP(NANOS) which Spark's vectorized reader rejects
unless this flag is set (we then convert ns->us ourselves, JVM-side).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs every session needs for correctness parity
#: with the DuckDB oracle and for reading the testdata.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet uses TIMESTAMP(NANOS); read as long, convert ourselves.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are UTC-naive; pin Spark's session zone so
    # date_format/unix_timestamp agree with the oracle.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalesce + skew-join handling. Free scalability.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-provided session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be static on exotic deployments; never fail
            # configuration — individual readers cope or raise clearly.
            pass
    return spark


def get_spark(
    app_name: str = "cdc-kafka-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession sized for this host.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism;
    shuffle partitions default to the same number — at cluster scale you
    want ~2-3x total cores instead, which callers override.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        # local mode = driver-only JVM: the driver heap IS the executor
        # heap. Measured on this host: a LARGE heap is a net loss — task
        # page size scales with heap/cores, so 32 threads each zeroing
        # multi-MB pages per hash-agg/shuffle turn small stages GC-bound
        # (words-distinct at sf0.1: 2.8s @8g vs 7.5s+ @64g, degrading
        # across a session). 16g fits sf0.1 joins + caches with headroom.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Cap task memory pages: tiny-partition stages dominate locally,
        # and page zeroing otherwise scales with heap size.
        .config("spark.buffer.pageSize", "4m")
        # Shuffle/spill scratch on tmpfs: this host's root disk is a
        # virtio device with multi-second write stalls that land on
        # random map stages; shuffle files are ephemeral by definition.
        # On a real cluster SPARK_LOCAL_DIRS (node-local SSDs) wins.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft-tmp"),
        )
        # GCLocker hardening (r12): at the 100x replica, long serving
        # sessions died on "Retried waiting for GCLocker too often
        # allocating N words" — a >100 MB humongous sort/hash-array
        # allocation failing while Arrow JNI critical sections across
        # 32 task threads hold the GCLocker; HotSpot's default gives a
        # humongous allocation only TWO retries before throwing OOM
        # (GCLockerRetryAllocationCount=2, diagnostic). Raising the
        # retry budget converts the spurious OOM into a short wait.
        # Applies only when this builder launches the JVM (local mode /
        # client driver); on a cluster set it in executor opts too.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:+UnlockDiagnosticVMOptions"
                " -XX:GCLockerRetryAllocationCount=64",
            ),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure_session(spark)
