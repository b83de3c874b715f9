"""asof_join semantics on hand-computable fixtures: inclusive ties,
no-match NULLs, tolerance voiding, NULL-valued right rows carried as a
unit, and the one-shuffle plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators.asof import asof_join

L_SCHEMA = "k long, ts timestamp, lv string"
R_SCHEMA = "k long, ts timestamp, rv double"


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, _t(10), "a"),   # matches r@10 (inclusive on equality)
            (1, _t(15), "b"),   # matches r@12
            (1, _t(5), "c"),    # before any right row -> NULL
            (2, _t(30), "d"),   # other key matches its own stream only
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, _t(10), 1.0), (1, _t(12), 2.0), (2, _t(20), 9.0)], R_SCHEMA
    )
    got = {
        r.lv: (r.rv_asof, r.ts_asof)
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert got["a"] == (1.0, _t(10))
    assert got["b"] == (2.0, _t(12))
    assert got["c"] == (None, None)
    assert got["d"] == (9.0, _t(20))


def test_asof_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame([(1, _t(50), "x"), (1, _t(11), "y")], L_SCHEMA)
    right = spark.createDataFrame([(1, _t(10), 1.0)], R_SCHEMA)
    got = {
        r.lv: (r.rv_asof, r.ts_asof)
        for r in asof_join(
            left, right, ["k"], tolerance_seconds=5
        ).collect()
    }
    assert got["y"] == (1.0, _t(10))   # 1s old: within tolerance
    assert got["x"] == (None, None)    # 40s old: voided


def test_asof_null_right_value_carried_atomically(spark):
    """A right row whose value is NULL must still win the match (its
    struct is non-null) — per-column sweeps would leak the older 1.0."""
    left = spark.createDataFrame([(1, _t(20), "x")], L_SCHEMA)
    right = spark.createDataFrame([(1, _t(10), 1.0), (1, _t(15), None)], R_SCHEMA)
    row = asof_join(left, right, ["k"]).collect()[0]
    assert row.ts_asof == _t(15)
    assert row.rv_asof is None


def test_asof_single_shuffle_plan(spark):
    """The sweep must cost ONE key exchange over the union — no range
    join, no cartesian."""
    left = spark.range(0, 1000).selectExpr(
        "id % 7 AS k", "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts", "'L' AS lv"
    )
    right = spark.range(0, 500).selectExpr(
        "id % 7 AS k", "timestamp_micros(CAST(id * 2000000 AS LONG)) AS ts",
        "CAST(id AS DOUBLE) AS rv"
    )
    out = asof_join(left, right, ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]


def test_asof_forward_inclusive_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, _t(10), "a"),   # matches r@10 (inclusive)
            (1, _t(11), "b"),   # matches r@12 (next at-or-after)
            (1, _t(30), "c"),   # after all right rows -> NULL
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame([(1, _t(10), 1.0), (1, _t(12), 2.0)], R_SCHEMA)
    got = {
        r.lv: (r.rv_asof, r.ts_asof)
        for r in asof_join(left, right, ["k"], direction="forward").collect()
    }
    assert got["a"] == (1.0, _t(10))
    assert got["b"] == (2.0, _t(12))
    assert got["c"] == (None, None)
    # tolerance: r@12 is 1s ahead of b (ok at tol=5), 2s ahead of a@10
    got_tol = {
        r.lv: r.ts_asof
        for r in asof_join(
            left, right, ["k"], direction="forward", tolerance_seconds=1
        ).collect()
    }
    assert got_tol["a"] == _t(10)   # exact match, gap 0
    assert got_tol["b"] == _t(12)   # gap 1s == tolerance
    assert got_tol["c"] is None


def test_asof_rejects_unknown_direction(spark):
    left = spark.createDataFrame([(1, _t(1), "x")], L_SCHEMA)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="backward|forward|nearest"):
        asof_join(left, left.selectExpr("k", "ts", "1.0 AS rv"), ["k"],
                  direction="sideways")


def test_asof_nearest_picks_closer_side_ties_backward(spark):
    left = spark.createDataFrame(
        [
            (1, _t(10), "a"),   # r@8 gap 2 vs r@13 gap 3 -> backward
            (1, _t(12), "b"),   # r@13 gap 1 vs r@8 gap 4 -> forward
            (1, _t(18), "c"),   # r@13 gap 5 vs r@23 gap 5 -> tie: backward
            (2, _t(5), "d"),    # no rows for key 2 -> NULL
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(1, _t(8), 1.0), (1, _t(13), 2.0), (1, _t(23), 3.0)], R_SCHEMA
    )
    got = {
        r.lv: (r.rv_asof, r.ts_asof)
        for r in asof_join(left, right, ["k"], direction="nearest").collect()
    }
    assert got["a"] == (1.0, _t(8))
    assert got["b"] == (2.0, _t(13))
    assert got["c"] == (2.0, _t(13))  # tie broken backward, like pandas
    assert got["d"] == (None, None)
    # tolerance: gap 2 voided at tol=1
    got_tol = {
        r.lv: r.ts_asof
        for r in asof_join(
            left, right, ["k"], direction="nearest", tolerance_seconds=1
        ).collect()
    }
    assert got_tol["a"] is None and got_tol["b"] == _t(13)


def test_asof_nearest_null_payload_and_duplicate_left_rows(spark):
    """Regression (round-4 advice): the old join-based recombine of the
    two directional sweeps equi-joined on every left payload column, so
    a left row with a NULL payload vanished and duplicate left rows
    fanned out n^2. The single-pass form must keep strict row-for-row
    left-outer semantics: 3 left rows in -> 3 rows out."""
    left = spark.createDataFrame(
        [
            (1, _t(10), None),   # NULL payload must survive
            (1, _t(12), "dup"),  # exact duplicates must not fan out
            (1, _t(12), "dup"),
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame([(1, _t(11), 5.0)], R_SCHEMA)
    rows = asof_join(left, right, ["k"], direction="nearest").collect()
    assert len(rows) == 3
    by_lv = {}
    for r in rows:
        by_lv.setdefault(r.lv, []).append((r.rv_asof, r.ts_asof))
    assert by_lv[None] == [(5.0, _t(11))]
    assert by_lv["dup"] == [(5.0, _t(11)), (5.0, _t(11))]


def test_asof_nearest_single_shuffle_plan(spark):
    """Both directional sweeps must share ONE key exchange (two sorts
    over the same partitioning), with no join operator at all."""
    left = spark.range(0, 200).selectExpr(
        "id % 5 AS k", "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts",
        "'L' AS lv"
    )
    right = spark.range(0, 100).selectExpr(
        "id % 5 AS k", "timestamp_micros(CAST(id * 3000000 AS LONG)) AS ts",
        "CAST(id AS DOUBLE) AS rv"
    )
    out = asof_join(left, right, ["k"], direction="nearest")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_cogrouped_asof_matches_window_form_incl_empty_sides(spark):
    """The cogroup/merge_asof form agrees row-for-row with the
    tag-union-window operator, including keys present on only one
    side (left-outer survival, no phantom rows) and inclusive ties."""
    from cdc_kafka_project_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )

    left = spark.createDataFrame(
        [
            (1, _t(10), "a"),
            (1, _t(20), "b"),
            (2, _t(5), "c"),   # key with no right rows at all
            (3, _t(30), "d"),
        ],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            (1, _t(10), 1.0),   # exact tie with left (inclusive)
            (1, _t(15), 2.0),
            (3, _t(40), 9.0),   # only AFTER the left row -> no match
            (4, _t(1), 7.0),    # right-only key -> must not appear
        ],
        R_SCHEMA,
    )
    want = sorted(
        asof_join(
            left, right, ["k"], right_value_cols=["rv"], suffix="_r"
        ).collect(),
        key=lambda r: (r["k"], r["ts"]),
    )
    got = sorted(
        asof_join_cogrouped(
            left, right, ["k"], right_value_cols=["rv"], suffix="_r"
        ).collect(),
        key=lambda r: (r["k"], r["ts"]),
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_cogrouped_asof_null_keys_match_window_form(spark):
    """r16 (r15 advice item 3): Spark's window twin groups NULL keys
    together (null == null in partitionBy), so a null-key left row
    matches null-key right rows on ts alone. pandas merge_asof(by=...)
    never aligns null groups — the bucketed form must normalize them,
    or null-key rows silently lose their matches."""
    from cdc_kafka_project_spark.operators.asof import (
        asof_join,
        asof_join_cogrouped,
    )

    left = spark.createDataFrame(
        [(None, _t(10), "a"), (None, _t(30), "b"), (1, _t(10), "c")],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [(None, _t(5), 1.5), (None, _t(25), 2.5), (1, _t(9), 9.0)],
        R_SCHEMA,
    )
    want = sorted(
        asof_join(
            left, right, ["k"], right_value_cols=["rv"], suffix="_r"
        ).collect(),
        key=lambda r: (r["k"] is None, r["k"], r["ts"]),
    )
    got = sorted(
        asof_join_cogrouped(
            left, right, ["k"], right_value_cols=["rv"], suffix="_r"
        ).collect(),
        key=lambda r: (r["k"] is None, r["k"], r["ts"]),
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    # and the null-key rows really did match (not all-null fallthrough)
    by_ts = {r["ts"]: r for r in got if r["k"] is None}
    assert by_ts[_t(10)]["rv_r"] == 1.5
    assert by_ts[_t(30)]["rv_r"] == 2.5


def test_cogrouped_asof_survives_same_source_self_join(spark):
    """Left and right carved from ONE DataFrame (identical attribute
    ids) — the case where cogroup deduplicates shared columns unless
    the operator re-aliases the right side."""
    from cdc_kafka_project_spark.operators.asof import asof_join_cogrouped

    ev = spark.createDataFrame(
        [
            (1, _t(10), "click", 0.0),
            (1, _t(5), "purchase", 3.5),
            (1, _t(20), "purchase", 4.5),
        ],
        "k long, ts timestamp, kind string, v double",
    )
    left = ev.filter("kind = 'click'").select("k", "ts")
    right = ev.filter("kind = 'purchase'").select("k", "ts", "v")
    out = asof_join_cogrouped(
        left, right, ["k"], right_value_cols=["v"], suffix="_r"
    ).collect()
    assert len(out) == 1
    assert out[0]["v_r"] == 3.5 and out[0]["ts_r"] == _t(5)
