"""Event-time streaming operators beyond tumbling windows.

The reference has no event-time semantics at all — its "window" is a
monotone high-water-mark scan (producer.py:15,74) that silently drops
late rows (SURVEY.md §2 deliberate-absences note). These operators are
the full Structured Streaming event-time surface a user upgrading from
it gets: sliding windows, data-driven session windows, watermarked
stream dedup, and time-interval stream-stream joins. All are tested
with bounded availableNow runs over file sources (tests/test_streaming
_windows.py) — the same programs run unbounded on Kafka sources.

State-at-scale notes: every operator here keys its state by
(key, window) and evicts on watermark — state size is bounded by
(distinct keys x windows inside the watermark horizon), never by
stream length. That is the property the reference's unbounded replica
table lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def _file_stream(
    spark: SparkSession, source_dir: str, schema: StructType
) -> DataFrame:
    return spark.readStream.schema(schema).parquet(source_dir)


def sliding_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window counts: each event lands in window/slide
    overlapping windows (here 2). Partial aggregation still applies —
    the map side emits one (window, partial) pair per window an event
    covers, so the shuffle grows by the overlap factor, not the raw
    event count times windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
        )
    )


def session_window_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Data-driven session windows (gap-based, per key): the streaming
    twin of the batch ``sessionize`` query. Sessions merge as events
    arrive; a session closes (and its state evicts) when the watermark
    passes last_event + gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("sess"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only
    until the watermark passes it — at-least-once sources (Kafka
    redelivery, producer retries) become effectively-once without
    unbounded seen-set state. The reference papers over redelivery with
    idempotent INSERTs (consumer.py:74); this removes the duplicates
    before they reach any sink."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on key + time interval:
    right.ts in [left.ts + lower, left.ts + upper].

    Both sides are watermarked so the join state (buffered rows
    awaiting matches) evicts once no future match is possible — the
    textbook watermarked interval join. At scale both streams shuffle
    on the key once; state per key is bounded by the interval width.

    ``how="leftOuter"`` adds the no-match emission semantics: an
    unmatched left row is held in state and emitted with NULL right
    columns only once the right watermark passes its match window (the
    engine can then PROVE no future match exists) — so outer results
    arrive a watermark-delay later than inner ones, usually in a
    subsequent micro-batch. That deferral is the correctness price of
    exactly-once no-match detection on unbounded streams.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def run_to_memory(
    df: DataFrame,
    checkpoint_dir: str,
    query_name: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """Bounded availableNow run into a named in-memory table (test/dev
    sink; swap for kafka/parquet in production)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_static_enriched_counts(
    events: DataFrame,
    dim: DataFrame,
    key_col: str = "user_id",
    dim_attr: str = "segment",
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-static dimension enrichment: each micro-batch inner-joins
    the (broadcast) static dim, then aggregates per (window, dim
    attribute) — the standard fact-stream x dimension-table topology.

    Stream-static joins are STATELESS (the static side re-broadcasts
    per micro-batch, no join state accumulates), so the only state is
    the windowed aggregate — bounded by (attrs × windows inside the
    watermark), the same contract as every operator in this module.
    Events with no dim row drop (inner semantics); route them to a DLQ
    with a left join + isnull filter when completeness matters.
    """
    enriched = events.withWatermark(ts_col, watermark).join(
        F.broadcast(dim.select(F.col(key_col), F.col(dim_attr))),
        on=key_col,
    )
    return (
        enriched.groupBy(
            F.window(F.col(ts_col), window).alias("win"), dim_attr
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col(dim_attr),
            "n",
        )
    )
