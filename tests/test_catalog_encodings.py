"""Contract test: ``load_table`` normalizes every ``events.ts`` encoding
the driver has shipped across rounds to a plain TIMESTAMP column.

Encodings seen so far:
* plain TIMESTAMP (tz-aware ``timestamp[us, tz=UTC]`` parquet);
* TIMESTAMP(NANOS) read as raw ns-since-epoch bigint (via the
  ``nanosAsLong`` escape hatch, session.py);
* naive ``timestamp[us]`` -> TIMESTAMP_NTZ in Spark 4.x (the round-3
  regeneration that broke ``unix_micros`` and crashed the bench).

Each encoding must load as ``timestamp`` with identical values, and the
timestamp-arithmetic consumer (``sessionize``) must run on all three.
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdc_kafka_project_spark.catalog import load_table

ROWS = [
    # (event_id, ts_us_since_epoch, user_id, event_type, value, props)
    (1, 1_700_000_000_000_000, 10, "view", 1.5, "{}"),
    (2, 1_700_000_600_000_000, 10, "click", 2.0, "{}"),  # +10 min: same session
    (3, 1_700_003_600_000_000, 10, "view", 0.5, "{}"),  # +50 min gap: new session
    (4, 1_700_000_100_000_000, 20, "purchase", 9.9, "{}"),
]


def _write_events(dir_path: str, ts_array: pa.Array) -> str:
    os.makedirs(dir_path, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dir_path, "events.parquet"))
    return dir_path


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    us = [r[1] for r in ROWS]
    base = tmp_path_factory.mktemp("events_encodings")
    dirs = {
        "timestamp_utc": _write_events(
            str(base / "tz"), pa.array(us, pa.timestamp("us", tz="UTC"))
        ),
        "timestamp_ntz": _write_events(
            str(base / "ntz"), pa.array(us, pa.timestamp("us"))
        ),
        "ns_bigint": _write_events(
            str(base / "ns"), pa.array([u * 1000 for u in us], pa.int64())
        ),
    }
    return dirs


@pytest.mark.parametrize("enc", ["timestamp_utc", "timestamp_ntz", "ns_bigint"])
def test_events_ts_normalized_to_timestamp(spark, encoded_dirs, enc):
    df = load_table(spark, encoded_dirs[enc], "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {
        r.event_id: r.ts for r in df.select("event_id", "ts").collect()
    }
    # UTC session tz: values identical across encodings.
    assert got[1] == datetime.datetime(2023, 11, 14, 22, 13, 20)
    assert got[3] == datetime.datetime(2023, 11, 14, 23, 13, 20)


@pytest.mark.parametrize("enc", ["timestamp_utc", "timestamp_ntz", "ns_bigint"])
def test_sessionize_runs_on_every_encoding(spark, encoded_dirs, enc):
    """sessionize does unix_micros() arithmetic — the call that raised
    AnalysisException on NTZ input before catalog normalization."""
    from cdc_kafka_project_spark.queries.relational import sessionize

    rows = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(spark, encoded_dirs[enc]).collect()
    }
    assert rows == {
        (10, 1): 1,
        (10, 2): 1,  # 10-min gap: same session
        (10, 3): 2,  # 50-min gap: new session
        (20, 4): 1,
    }
