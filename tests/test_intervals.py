"""Binned interval joins (operators/intervals.py) + calendar gap-fill.

The operator's whole claim is "equi-join plan, naive-join semantics":
these tests pin both halves — brute-force parity on adversarial
fixtures (bin-straddling spans, inclusive bounds, multi-bin shared
overlaps) and a physical plan with no BroadcastNestedLoopJoin or
cartesian product.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators import intervals as iv
from cdc_kafka_project_spark.plans import has_cartesian, plan_summary


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 3, 1, h, m, s)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, _ts(0, 0)),    # exactly on a bin edge
        (2, _ts(0, 59, 59)),
        (3, _ts(1, 30)),
        (4, _ts(5, 0)),
        (5, _ts(23, 59)),
    ]
    return spark.createDataFrame(rows, "fact_id long, ts timestamp")


@pytest.fixture(scope="module")
def windows(spark):
    rows = [
        # straddles 3 hourly bins; inclusive end lands exactly on fact 3? no
        (10, _ts(0, 30), _ts(2, 15)),
        # zero-length interval exactly on fact 4's timestamp (inclusive both ends)
        (11, _ts(5, 0), _ts(5, 0)),
        # covers nothing
        (12, _ts(10, 0), _ts(10, 5)),
        # end boundary exactly equal to fact 2's ts
        (13, _ts(0, 45), _ts(0, 59, 59)),
    ]
    return spark.createDataFrame(rows, "win_id long, start_ts timestamp, end_ts timestamp")


def _brute_point(facts, windows):
    return (
        facts.crossJoin(windows)
        .where(F.col("ts").between(F.col("start_ts"), F.col("end_ts")))
        .select("fact_id", "win_id")
    )


@pytest.mark.parametrize("width", [60, 3600, 86400])
def test_point_join_matches_brute_force_all_widths(spark, facts, windows, width):
    got = sorted(
        (r.fact_id, r.win_id)
        for r in iv.bin_point_interval_join(
            facts, windows, "ts", bin_width_sec=width
        ).select("fact_id", "win_id").collect()
    )
    want = sorted((r.fact_id, r.win_id) for r in _brute_point(facts, windows).collect())
    assert got == want
    # spot the semantics the fixture encodes: inclusive bounds both ends
    assert (4, 11) in got and (2, 13) in got and all(w != 12 for _, w in got)


def test_point_join_emits_each_match_once(spark, facts, windows):
    # a fact has exactly one bin -> no dedup stage needed even when the
    # interval spans many bins
    out = iv.bin_point_interval_join(facts, windows, "ts", bin_width_sec=60)
    pairs = [(r.fact_id, r.win_id) for r in out.select("fact_id", "win_id").collect()]
    assert len(pairs) == len(set(pairs))


@pytest.mark.parametrize("width", [60, 3600])
def test_overlap_join_matches_brute_force_and_dedup_free(spark, windows, width):
    right = windows.select(
        F.col("win_id").alias("r_win_id"),
        F.col("start_ts").alias("r_start_ts"),
        F.col("end_ts").alias("r_end_ts"),
    )
    out = iv.bin_interval_overlap_join(
        windows, right, bin_width_sec=width
    ).select("win_id", "r_win_id")
    got = sorted((r.win_id, r.r_win_id) for r in out.collect())
    brute = (
        windows.crossJoin(right)
        .where(F.col("start_ts") <= F.col("r_end_ts"))
        .where(F.col("r_start_ts") <= F.col("end_ts"))
        .select("win_id", "r_win_id")
    )
    want = sorted((r.win_id, r.r_win_id) for r in brute.collect())
    assert got == want
    # windows 10 and 13 share MANY bins at width=60 — still exactly once
    assert len(got) == len(set(got))
    assert (10, 13) in got and (13, 10) in got


def test_binned_plans_have_no_nested_loop(spark, facts, windows):
    out = iv.bin_point_interval_join(facts, windows, "ts")
    s = plan_summary(out)
    assert not has_cartesian(out), s
    assert "BroadcastNestedLoopJoin" not in str(
        out._jdf.queryExecution().executedPlan()
    )


def test_gapfill_fills_gaps_and_forward_fills(spark):
    from cdc_kafka_project_spark.queries.temporal import gapfill_daily_revenue

    rows = gapfill_daily_revenue(spark, "/root/testdata/sf0.001").collect()
    by_key = {(r.o_orderpriority, r.day): r for r in rows}
    prios = {r.o_orderpriority for r in rows}
    days = sorted({r.day for r in rows})
    # dense spine: every (priority, day) combination present
    assert len(rows) == len(prios) * len(days)
    # gap rows are zero-filled but carry the last observed revenue
    gap = [r for r in rows if r.n_orders == 0 and r.ffill_revenue is not None]
    assert gap, "sf0.001 must contain at least one calendar gap"
    g = gap[0]
    di = days.index(g.day)
    prev_obs = next(
        by_key[(g.o_orderpriority, d)]
        for d in reversed(days[:di])
        if by_key[(g.o_orderpriority, d)].n_orders > 0
    )
    assert g.revenue == 0.0
    assert g.ffill_revenue == prev_obs.revenue


def test_shard_assignment_monotone_and_bounded(spark):
    """Shards are contiguous in doc order, start at 0 per source, and
    every shard except a source's last holds >= the target bytes once
    its boundary doc arrives (the planner's size contract)."""
    from cdc_kafka_project_spark.queries.scale_patterns import (
        shard_assignment_by_bytes,
    )

    rows = shard_assignment_by_bytes(spark, "/root/testdata/sf0.001").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        sids = [r.shard_id for r in rs]
        assert sids[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(sids, sids[1:])), src


def test_winsorized_mean_within_clamp_bounds(spark):
    from cdc_kafka_project_spark.queries.scale_patterns import (
        winsorized_price_stats,
    )

    for r in winsorized_price_stats(spark, "/root/testdata/sf0.001").collect():
        assert r.p05 <= r.winsorized_mean <= r.p95
        assert r.n_orders > 0


def test_corpus_source_report_totals(spark):
    from cdc_kafka_project_spark.queries.text_analysis import (
        corpus_source_report,
    )

    rows = corpus_source_report(spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.dup_rate < 1.0
        assert 0.0 <= r.en_share <= 1.0
