"""Streaming corpus curation — the batch operator library under
``readStream`` (Structured Streaming's unified model: the SAME
quality-gate expressions and content fingerprinting run unchanged;
only the source/sink and each stage's state policy differ).

Batch twin: ``queries/pipeline.py::curation_pipeline``. The streaming
differences, stated honestly:

* the quality gate is stateless (pure column expressions via
  ``quality_reason_expr``) — identical semantics to batch;
* exact dedup becomes ``dropDuplicatesWithinWatermark`` on the
  normalized content digest: state holds each digest only until the
  watermark passes it, so "exact" is exact within the watermark
  horizon — unbounded cross-epoch dedup is the batch pipeline's (or a
  sink compaction pass's) job. Standard bounded-state trade;
* decontamination needs a distinct-shingle semi/anti-join, which is
  not expressible inside an append-mode stream (stateful
  distinct + stream self-join) — it runs INSIDE ``foreachBatch``,
  where each micro-batch is a static frame and the proven batch
  operator (``dedup.decontaminate``) applies as-is against the static
  eval set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from cdc_kafka_project_spark.operators import dedup as dd
from cdc_kafka_project_spark.operators import text as text_ops


def gated_deduped_stream(
    doc_stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality gate + watermark-bounded exact dedup, purely in-stream
    (no state beyond the digest set inside the watermark horizon).
    Input must carry an event/ingest timestamp column."""
    reason, _ = text_ops.quality_reason_expr("text")
    gated = doc_stream.filter(reason.isNull())
    return (
        gated.withColumn(
            "__fp", F.md5(dd.normalize_for_dedup(F.col("text")))
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def run_streaming_curation(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    work_dir: str,
    eval_docs: DataFrame | None = None,
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
    decon_n: int = 4,
) -> StreamingQuery:
    """Bounded availableNow run: gate+dedup in-stream, decontamination
    per micro-batch in ``foreachBatch`` (static-frame semantics), output
    appended as parquet under ``work_dir``/curated. Restartable from the
    checkpoint like every other pipeline here."""
    out_dir = os.path.join(work_dir, "curated")
    ckpt = os.path.join(work_dir, "checkpoint")
    stream = spark.readStream.schema(schema).parquet(source_dir)
    curated = gated_deduped_stream(stream, ts_col, watermark)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df
        if eval_docs is not None and not batch_df.isEmpty():
            out = dd.decontaminate(batch_df, eval_docs, n=decon_n)
        out.write.mode("append").parquet(out_dir)

    q = (
        curated.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def incremental_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    out_dir: str,
    digest_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of digest-table-backed incremental dedup — the
    streaming twin of the batch ``dedup_incremental_new_docs`` query,
    with UNBOUNDED horizon: instead of watermark-bounded streaming
    state (which forgets digests once the watermark passes), the seen
    set is a persisted parquet digest table that only ever appends.
    At 100 TB that is the right state store — the digest table is
    16-byte rows, anti-joined per batch, and survives any restart.

    Per epoch: dedup within the batch (min id per digest), anti-join
    against the digest table, then write BOTH the surviving docs and
    their digests under ``epoch=<id>`` directories with overwrite —
    a replayed epoch (foreachBatch's at-least-once) rewrites the same
    partition instead of double-appending, making the sink effectively
    exactly-once.
    """
    if batch_df.isEmpty():
        return
    from pyspark.sql import Window

    fp = F.md5(F.trim(F.col(text_col)))
    w = Window.partitionBy("__fp").orderBy(id_col)
    firsts = (
        batch_df.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if os.path.isdir(digest_dir) and any(
        f.startswith("epoch=") for f in os.listdir(digest_dir)
    ):
        # Exclude THIS epoch's partition from the seen set: a replayed
        # epoch (at-least-once delivery) already wrote its own digests,
        # and anti-joining against them would erase its own output on
        # the overwrite — the replay must see exactly the state the
        # first attempt saw. (epoch is the hive partition column the
        # epoch=<id> directory layout discovers.)
        seen = spark.read.parquet(digest_dir)
        seen = seen.filter(F.col("epoch") != F.lit(epoch_id)).select(
            F.col("fp").alias("__fp")
        )
        firsts = firsts.join(seen, "__fp", "left_anti")
    firsts.drop("__fp").write.mode("overwrite").parquet(
        os.path.join(out_dir, f"epoch={epoch_id}")
    )
    firsts.select(F.col("__fp").alias("fp")).write.mode("overwrite").parquet(
        os.path.join(digest_dir, f"epoch={epoch_id}")
    )


def run_incremental_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Bounded availableNow run of the digest-table incremental dedup:
    each micro-batch keeps only documents whose content digest has
    never been seen in ANY previous epoch (cross-restart, no watermark
    horizon). Checkpoint-restartable; epoch-keyed overwrites keep
    replays idempotent."""
    out_dir = os.path.join(work_dir, "unique")
    digest_dir = os.path.join(work_dir, "digests")
    ckpt = os.path.join(work_dir, "checkpoint")
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        incremental_dedup_batch(
            spark, batch_df, epoch_id, out_dir, digest_dir, text_col, id_col
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
