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

#: JVM hardening applied to BOTH driver and executor launch options.
#:
#: GCLocker retry budget (r12): at the 100x replica, long serving
#: sessions died on "Retried waiting for GCLocker too often allocating
#: N words" — a >100 MB humongous sort/hash-array allocation failing
#: while Arrow JNI critical sections across 32 task threads hold the
#: GCLocker; HotSpot's default gives a humongous allocation only TWO
#: retries before throwing OOM (GCLockerRetryAllocationCount=2,
#: diagnostic). Raising the retry budget converts the spurious OOM
#: into a short wait.
#:
#: IgnoreUnrecognizedVMOptions leads (r12 advisor): the GCLocker and
#: its retry knob are slated for removal in newer JDKs (the GCLocker
#: itself is gone in JDK 22+'s G1); without the ignore flag, a JDK
#: that dropped the option would refuse to launch with "Unrecognized
#: VM option", breaking every get_spark() call. With it, unsupported
#: flags degrade to no-ops and the JVM still starts.
HARDENING_JAVA_OPTS = (
    "-XX:+IgnoreUnrecognizedVMOptions"
    " -XX:+UnlockDiagnosticVMOptions"
    " -XX:GCLockerRetryAllocationCount=64"
)


def _java_opts(env_var: str) -> str:
    """Hardening defaults + any env-provided extras APPENDED (r12
    advisor: env opts used to REPLACE the defaults, silently dropping
    the GCLocker hardening when a user added an unrelated flag).
    Later JVM flags win on conflict, so env extras still override."""
    extra = os.environ.get(env_var, "").strip()
    return f"{HARDENING_JAVA_OPTS} {extra}" if extra else HARDENING_JAVA_OPTS

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
    # Partition discovery for the materialized ANN/token indexes: the
    # LSH index has 2^n_planes (256) bucket directories, above the
    # 32-dir default threshold, so EVERY probe paid a 254-task listing
    # job just to enumerate local directories (measured 1.38 s ->
    # 0.86 s per probe with driver-side listing). Local/driver-side
    # listing of <=1024 dirs is microseconds on a local FS; on object
    # stores where listing is the bottleneck, override via
    # SPARK_GRAFT_PARALLEL_LISTING_THRESHOLD.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": os.environ.get(
        "SPARK_GRAFT_PARALLEL_LISTING_THRESHOLD", "1024"
    ),
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
        # SPARK_GRAFT_SHUFFLE_PARTITIONS (r13): replica-scale sweeps
        # need wider shuffles than cores — at the 1000x replica, 32
        # partitions put ~19M lineitem rows in one task's sort, which
        # is how the denormalize probe OOMed its heap. AQE coalesces
        # the excess at small SF, so a high value costs nothing there.
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp:
            try:
                shuffle_partitions = int(env_sp.strip())
            except ValueError:
                raise ValueError(
                    "SPARK_GRAFT_SHUFFLE_PARTITIONS must be an integer "
                    f"(got {env_sp!r})"
                ) from None
        else:
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
        # JVM hardening (see HARDENING_JAVA_OPTS). In local mode only
        # the driver option matters (driver JVM == executor JVM), but
        # a real cluster launches separate executor JVMs that would
        # otherwise run without the GCLocker retry budget and die the
        # way the r12 100x serving soak did — so plumb BOTH (r12
        # verdict item 4). Env vars APPEND extras, never replace.
        .config("spark.driver.extraJavaOptions",
                _java_opts("SPARK_GRAFT_DRIVER_JAVA_OPTS"))
        .config("spark.executor.extraJavaOptions",
                _java_opts("SPARK_GRAFT_EXECUTOR_JAVA_OPTS"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure_session(spark)
