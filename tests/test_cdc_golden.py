"""The reference's golden 7-event CDC workload (FIXTURES.md §5;
airflow_dags/project2_dag.py:95-137) against the batch operators.

Expected routing: 3 of 5 inserts fail validation -> DLQ; Alice is
inserted, updated, then deleted; final replica = exactly Emma.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators import cdc
from cdc_kafka_project_spark.schemas import EMP_CDC_SCHEMA


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, 0, i)


def golden_rows():
    d = dt.date
    return [
        # emp_id, first, last, dob, city, salary, action, last_updated_at, seq
        (1, "Alice", "Johnson", d(2012, 4, 10), "San Francisco", 80000, "insert", _ts(1), 1),
        (2, "Emma", "Wood", d(2015, 7, 1), "Boston", 72000, "insert", _ts(2), 2),
        (3, "Too", "Low", d(2000, 1, 1), "LA", 50, "insert", _ts(3), 3),
        (4, "Too", "Old", d(1900, 1, 1), "San Jose", 50000, "insert", _ts(4), 4),
        (-100, "Wrong", "ID", d(2000, 1, 1), "Chicago", 45000, "insert", _ts(5), 5),
        (1, "Alice", "Johnson", d(2012, 4, 10), "San Francisco", 75000, "update", _ts(6), 6),
        (1, "Alice", "Johnson", d(2012, 4, 10), "San Francisco", 75000, "delete", _ts(7), 7),
    ]


@pytest.fixture()
def changelog(spark):
    return spark.createDataFrame(golden_rows(), EMP_CDC_SCHEMA)


def test_validation_split_routes_three_to_dlq(changelog):
    valid, dlq = cdc.validate_split(changelog, cdc.employee_invalid_predicate())
    dlq_rows = {r.emp_id for r in dlq.collect()}
    assert dlq_rows == {3, 4, -100}
    assert valid.count() == 4  # Alice ins/upd/del + Emma ins


def test_final_replica_is_exactly_emma(changelog):
    valid, _ = cdc.validate_split(changelog, cdc.employee_invalid_predicate())
    replica = cdc.apply_changes(valid)
    rows = replica.collect()
    assert len(rows) == 1
    emma = rows[0]
    assert (emma.emp_id, emma.first_name, emma.salary) == (2, "Emma", 72000)


def test_update_wins_before_delete(spark):
    """Drop the delete event: Alice must survive with the UPDATED salary."""
    rows = [r for r in golden_rows() if r[6] != "delete"]
    df = spark.createDataFrame(rows, EMP_CDC_SCHEMA)
    valid, _ = cdc.validate_split(df, cdc.employee_invalid_predicate())
    replica = cdc.apply_changes(valid)
    got = {r.emp_id: r.salary for r in replica.collect()}
    assert got == {1: 75000, 2: 72000}


def test_equal_timestamp_ties_break_by_seq(spark):
    """The reference breaks last_updated_at ties by log position
    (single partition); we encode it as the seq tiebreaker."""
    t = _ts(1)
    d = dt.date(2012, 4, 10)
    rows = [
        (1, "A", "A", d, "X", 10000, "insert", t, 1),
        (1, "A", "A", d, "Y", 20000, "update", t, 2),  # same ts, later seq
    ]
    df = spark.createDataFrame(rows, EMP_CDC_SCHEMA)
    replica = cdc.apply_changes(df)
    row = replica.collect()[0]
    assert (row.city, row.salary) == ("Y", 20000)


def test_replay_is_idempotent(spark, changelog):
    """Re-delivering the whole log (at-least-once) changes nothing —
    strictly stronger than the reference's ON CONFLICT paper-over."""
    doubled = changelog.unionByName(changelog)
    valid, _ = cdc.validate_split(doubled, cdc.employee_invalid_predicate())
    replica = cdc.apply_changes(valid)
    rows = replica.collect()
    assert len(rows) == 1 and rows[0].emp_id == 2


def test_actions_normalized_case_insensitively(spark):
    """consumer.py:44 lower-cases actions; so do we."""
    t = _ts(1)
    d = dt.date(2012, 4, 10)
    rows = [
        (1, "A", "A", d, "X", 10000, "INSERT", t, 1),
        (1, "A", "A", d, "X", 10000, "Delete", _ts(2), 2),
    ]
    df = spark.createDataFrame(rows, EMP_CDC_SCHEMA)
    assert cdc.apply_changes(df).count() == 0


def test_merge_upsert_equals_full_recompute(spark, changelog):
    """Incremental maintenance invariant: base-state + merge(new) ==
    apply(full log)."""
    valid, _ = cdc.validate_split(changelog, cdc.employee_invalid_predicate())
    old = valid.filter(F.col("seq") <= 2)
    new = valid.filter(F.col("seq") > 2)
    base = cdc.apply_changes(old)
    merged = cdc.merge_upsert(base, new)
    merged = merged.filter(F.lower("action") != "delete")
    full = cdc.apply_changes(valid)
    assert sorted(r.emp_id for r in merged.collect()) == sorted(
        r.emp_id for r in full.collect()
    )


def test_incremental_scan_watermark_exclusive(spark, changelog):
    out = cdc.incremental_scan(changelog, "2024-01-01 12:00:05")
    assert {r.seq for r in out.collect()} == {6, 7}


def test_compacted_log_yields_identical_replica(spark, changelog):
    """apply_changes(compact_log(log)) == apply_changes(log) — the
    compaction maintenance contract."""
    from cdc_kafka_project_spark.operators.cdc import apply_changes, compact_log

    full = apply_changes(changelog).orderBy("emp_id").collect()
    compacted = compact_log(changelog)
    # one row per key survives compaction
    assert compacted.groupBy("emp_id").count().filter("count > 1").count() == 0
    got = apply_changes(compacted).orderBy("emp_id").collect()
    assert got == full
    # tombstone-dropping pass removes deleted keys from the log itself
    no_tombstones = compact_log(changelog, retain_deletes=False)
    assert (
        no_tombstones.filter(F.lower("action") == "delete").count() == 0
    )


def test_snapshot_diff_emits_trigger_events(spark):
    """Trigger-less change capture: insert/update/delete classified per
    key, NULL<->value transitions count as changes, unchanged rows are
    silent, delete carries the OLD row image."""
    from cdc_kafka_project_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, "d", 40)],
        "id long, name string, val int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (4, "D", 40), (5, "e", 50)],
        "id long, name string, val int",
    )
    got = {r.id: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert set(got) == {2, 3, 4, 5}  # 1 unchanged -> silent
    assert got[2].action == "update" and got[2].val == 20  # NULL -> 20
    assert got[3].action == "delete" and got[3].name == "c"  # OLD image
    assert got[4].action == "update" and got[4].name == "D"
    assert got[5].action == "insert" and got[5].val == 50

    import pytest as _pt

    with _pt.raises(ValueError):
        snapshot_diff(old, new.select("id", "val", "name"), ["id"])


def test_snapshot_diff_null_keys(spark):
    """NULL key components must behave like values, not vanish: a
    NULL-key row present unchanged in both snapshots emits nothing; a
    NULL-key row only in old emits a delete with the OLD image (the
    old formulation joined with == and tested key-null-ness for
    presence, so such rows surfaced as spurious inserts)."""
    from cdc_kafka_project_spark.operators.cdc import snapshot_diff

    schema = "k1 int, k2 int, val string"
    old = spark.createDataFrame(
        [(1, None, "same"), (2, None, "gone"), (3, 3, "x")], schema
    )
    new = spark.createDataFrame(
        [(1, None, "same"), (3, 3, "x"), (None, 9, "born")], schema
    )
    got = {
        (r.k1, r.k2): r for r in snapshot_diff(old, new, ["k1", "k2"]).collect()
    }
    assert set(got) == {(2, None), (None, 9)}
    assert got[(2, None)].action == "delete"
    assert got[(2, None)].val == "gone"  # OLD image on delete
    assert got[(None, 9)].action == "insert"
    assert got[(None, 9)].val == "born"


def test_scd2_history_intervals_chain(spark):
    """Versions chain: valid_to of version i equals valid_from of
    version i+1, exactly one current version per key, count preserved."""
    from cdc_kafka_project_spark.operators.cdc import scd2_history

    rows = [
        (1, "2024-01-01 00:00:00", "insert", 10.0, 1),
        (1, "2024-01-02 00:00:00", "update", 20.0, 2),
        (1, "2024-01-03 00:00:00", "update", 30.0, 3),
        (2, "2024-01-05 00:00:00", "insert", 5.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, action string, value double, seq int"
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(
        df, key_cols=["user_id"], order_cols=["ts", "seq"], ts_col="ts"
    ).collect()
    assert len(hist) == 4
    by_key = {}
    for r in hist:
        by_key.setdefault(r.user_id, []).append(r)
    v1 = sorted(by_key[1], key=lambda r: r.ts)
    assert [r.is_current for r in v1] == [False, False, True]
    assert v1[0].valid_to_ts == v1[1].ts and v1[1].valid_to_ts == v1[2].ts
    assert v1[2].valid_to_ts is None
    (v2,) = by_key[2]
    assert v2.is_current and v2.valid_to_ts is None


def test_merge_agg_states_equals_full_recompute(spark):
    """Incremental refresh == full recompute, including keys that exist
    only in the base, only in the delta, and in both."""
    from cdc_kafka_project_spark.operators.cdc import merge_agg_states

    full = spark.createDataFrame(
        [(1, 10), (1, 5), (2, 7), (3, 1), (3, 2), (4, 9)],
        "k int, v long",
    )
    old = full.filter(F.col("v") % 2 == 1)   # arbitrary split
    new = full.filter(F.col("v") % 2 == 0)

    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    merged = {
        r.k: (r.n, r.s)
        for r in merge_agg_states(
            agg(old), agg(new), key_cols=["k"], sum_cols=["n", "s"]
        ).collect()
    }
    want = {r.k: (r.n, r.s) for r in agg(full).collect()}
    assert merged == want


def test_debezium_roundtrip_op_codes_and_delete_exclusion(spark):
    """The Debezium envelope query: op codes derive from rank/action,
    deleted keys drop out, and the JSON round trip is lossless on a
    frame whose exact expected replica is enumerable by hand."""
    from cdc_kafka_project_spark.queries.cdc_surface import (
        cdc_debezium_roundtrip,
    )
    from tests.conftest import SF_SMOKE

    out = {r["user_id"]: r for r in cdc_debezium_roundtrip(spark, SF_SMOKE).collect()}
    from cdc_kafka_project_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_user = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rows in by_user.items():
        last = rows[-1]
        if last["event_type"] == "error":
            assert uid not in out, f"deleted key {uid} survived"
            continue
        got = out[uid]
        assert got["last_op"] == ("c" if len(rows) == 1 else "u")
        assert got["last_type"] == last["event_type"]
        assert got["last_value"] == last["value"], "double not lossless"
    assert set(out) == {
        uid
        for uid, rows in by_user.items()
        if rows[-1]["event_type"] != "error"
    }


def test_changelog_schema_evolution_merges_and_applies(spark, tmp_path):
    """The change-log gains a column mid-stream (the Debezium
    schema-drift case): mergeSchema reads the mixed log as one frame,
    old events carry NULL for the new column, and latest-per-key apply
    produces a replica with the evolved schema — no rewrite of old log
    files."""
    path = str(tmp_path / "log")
    v1 = spark.createDataFrame(
        [(1, "insert", 100, _ts(1), 1), (2, "insert", 200, _ts(2), 2)],
        "emp_id long, action string, salary long, "
        "last_updated_at timestamp, seq long",
    )
    v1.coalesce(1).write.mode("append").parquet(path)
    v2 = spark.createDataFrame(
        [(1, "update", 150, _ts(3), 3, "Boston")],
        "emp_id long, action string, salary long, "
        "last_updated_at timestamp, seq long, city string",
    )
    v2.coalesce(1).write.mode("append").parquet(path)

    log = spark.read.option("mergeSchema", "true").parquet(path)
    assert "city" in log.columns
    replica = cdc.apply_changes(
        log,
        key_cols=["emp_id"],
        order_cols=["last_updated_at", "seq"],
        action_col="action",
        delete_action="delete",
    )
    rows = {r["emp_id"]: r for r in replica.collect()}
    assert rows[1]["salary"] == 150 and rows[1]["city"] == "Boston"
    assert rows[2]["salary"] == 200 and rows[2]["city"] is None  # pre-drift
