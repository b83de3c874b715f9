"""Event-time streaming operators: sliding/session windows, watermark
dedup, stream-stream interval join — bounded availableNow runs over
file sources, results checked against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cdc_kafka_project_spark.streaming import windows as W

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture()
def events_dir(spark, tmp_path):
    rows = [
        (1, _ts(0), 1, "click"),
        (2, _ts(3), 1, "click"),
        (3, _ts(7), 2, "view"),
        (4, _ts(12), 1, "click"),
        # late-ish but inside watermark
        (5, _ts(1), 2, "view"),
    ]
    p = tmp_path / "events_src"
    p.mkdir()
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(p))
    return str(p)


def test_sliding_windows_overlap_counts(spark, tmp_path, events_dir):
    stream = W._file_stream(spark, events_dir, EVENTS_SCHEMA)
    df = W.sliding_window_counts(
        stream, window="10 minutes", slide="5 minutes"
    )
    W.run_to_memory(df, str(tmp_path / "cp"), "slide_counts", "update")
    got = {
        (r.win_start.minute, r.win_end.minute): r.n
        for r in spark.table("slide_counts").collect()
    }
    # events at minutes 0,1,3,7,12; 10-min windows sliding by 5:
    # [55,05):0,1,3  [00,10):0,1,3,7  [05,15):7,12  [10,20):12
    assert got[(0, 10)] == 4
    assert got[(5, 15)] == 2
    assert got[(10, 20)] == 1
    assert got[(55, 5)] == 3


def test_session_windows_gap_split(spark, tmp_path):
    rows = [
        (1, _ts(0), 1, "a"),
        (2, _ts(5), 1, "a"),   # same session (gap 10m)
        (3, _ts(30), 1, "a"),  # new session
        (4, _ts(0), 2, "b"),
    ]
    src = tmp_path / "sess_src"
    src.mkdir()
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = W._file_stream(spark, str(src), EVENTS_SCHEMA)
    df = W.session_window_stats(stream, gap="10 minutes")
    # session windows reject update mode (windows merge as events
    # arrive); complete re-emits the full result each batch
    W.run_to_memory(df, str(tmp_path / "cp"), "sess_stats", "complete")
    got = sorted(
        (r.user_id, r.sess_start.minute, r.n_events)
        for r in spark.table("sess_stats").collect()
    )
    assert got == [(1, 0, 2), (1, 30, 1), (2, 0, 1)]


def test_dedup_within_watermark_drops_redelivery(spark, tmp_path):
    rows = [
        (1, _ts(0), 1, "a"),
        (1, _ts(0), 1, "a"),   # exact redelivery
        (1, _ts(2), 1, "a"),   # same key, later ts -> also dropped (same id)
        (2, _ts(1), 2, "b"),
    ]
    src = tmp_path / "dd_src"
    src.mkdir()
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = W._file_stream(spark, str(src), EVENTS_SCHEMA)
    df = W.dedup_within_watermark(stream, ["event_id"])
    W.run_to_memory(df, str(tmp_path / "cp"), "dd_out", "append")
    got = sorted(r.event_id for r in spark.table("dd_out").collect())
    assert got == [1, 2]


def test_interval_join_matches_within_bounds(spark, tmp_path):
    clicks = [
        (1, _ts(0), 1, "click"),
        (2, _ts(30), 2, "click"),
    ]
    buys = [
        (10, _ts(10), 1, "purchase"),   # 10m after click 1 -> match
        (11, _ts(20), 1, "purchase"),   # 20m after click 1 -> outside 15m
        (12, _ts(29), 2, "purchase"),   # before click 2 -> no match
    ]
    cdir, bdir = tmp_path / "clicks", tmp_path / "buys"
    cdir.mkdir(), bdir.mkdir()
    spark.createDataFrame(clicks, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(cdir))
    spark.createDataFrame(buys, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(bdir))
    left = W._file_stream(spark, str(cdir), EVENTS_SCHEMA).select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
    )
    right = W._file_stream(spark, str(bdir), EVENTS_SCHEMA).select(
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
        "user_id",
    )
    joined = W.interval_join(
        left, right, "user_id", "click_ts", "buy_ts",
        lower="0 seconds", upper="15 minutes",
    ).select("click_id", "buy_id")
    W.run_to_memory(joined, str(tmp_path / "cp"), "ij_out", "append")
    got = sorted((r.click_id, r.buy_id) for r in spark.table("ij_out").collect())
    assert got == [(1, 10)]


def test_interval_join_left_outer_emits_no_match_after_watermark(
    spark, tmp_path
):
    """leftOuter stream-stream join: the unmatched click emits with a
    NULL buy only after the right watermark proves no future match can
    arrive — i.e. in a LATER burst than the inner results."""
    cdir, bdir = tmp_path / "oc", tmp_path / "ob"
    out, ckpt = tmp_path / "oout", tmp_path / "ocp"
    cdir.mkdir(), bdir.mkdir()
    spark.createDataFrame(
        [(1, _ts(0), 1, "click"), (3, _ts(0), 3, "click")], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(cdir))
    spark.createDataFrame(
        [(10, _ts(10), 1, "purchase")], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(bdir))

    def burst():
        left = W._file_stream(spark, str(cdir), EVENTS_SCHEMA).select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            "user_id",
        )
        right = W._file_stream(spark, str(bdir), EVENTS_SCHEMA).select(
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
            "user_id",
        )
        joined = W.interval_join(
            left, right, "user_id", "click_ts", "buy_ts",
            lower="0 seconds", upper="15 minutes", how="leftOuter",
        ).select("click_id", "buy_id")
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.click_id, r.buy_id)
            for r in spark.read.parquet(str(out)).collect()
        )

    first = burst()
    assert (1, 10) in first           # inner match emits immediately
    assert (3, None) not in first     # outer held: watermark can't prove yet

    # late right-side rows advance the right watermark far past
    # click_ts + upper; re-burst until the no-data batch flushes state
    results = first
    for n in (1, 2, 3):
        late = dt.datetime(2024, 1, 1, 12 + n, 0)
        # the GLOBAL watermark is min(left wm, right wm) — both sides
        # must see late events before outer rows can be proven final
        spark.createDataFrame(
            [(90 + n, late, 99, "purchase")], EVENTS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(bdir))
        spark.createDataFrame(
            [(80 + n, late, 98, "click")], EVENTS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(cdir))
        results = burst()
        if (3, None) in results:
            break
    assert (3, None) in results, results
    assert (1, 10) in results and len([r for r in results if r[0] == 1]) == 1


def test_stream_static_join_enriches_and_aggregates(spark, tmp_path, events_dir):
    """Stream-static broadcast enrichment: per-window counts keyed by
    the static dim's attribute; users missing from the dim drop."""
    dim = spark.createDataFrame(
        [(1, "gold"), (3, "bronze")], "user_id long, segment string"
    )  # user 2 deliberately absent
    stream = W._file_stream(spark, events_dir, EVENTS_SCHEMA)
    df = W.stream_static_enriched_counts(
        stream, dim, window="10 minutes", watermark="30 minutes"
    )
    W.run_to_memory(df, str(tmp_path / "cp"), "enriched_counts", "update")
    got = {
        (r.win_start.minute, r.segment): r.n
        for r in spark.table("enriched_counts").collect()
    }
    # user 1 clicks at minutes 0,3,12 -> [00,10): 2 gold, [10,20): 1 gold
    # user 2's views (minutes 7, 1) drop: not in dim
    assert got == {(0, "gold"): 2, (10, "gold"): 1}
