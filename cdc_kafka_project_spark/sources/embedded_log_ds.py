"""Python DataSource (Spark 4 ``pyspark.sql.datasource``) for the
embedded topic log — a real custom connector, not a wrapper.

``streaming/embedded_kafka.py::EmbeddedLog`` gives the engine a
broker-substitute transport; this module turns it into a first-class
Spark source: ``spark.read.format("embedded_log")`` for batch and
``spark.readStream.format("embedded_log")`` for streaming, with honest
Kafka-like offset semantics:

* batch: one :class:`InputPartition` per *topic* partition — the scan
  parallelism is the topic's partition count, exactly like the real
  Kafka connector's 1:1 topic-partition → input-partition mapping;
* streaming: offsets are ``{partition: next_offset}`` dicts (the
  JSON-serializable shape the API checkpoints), ``latestOffset`` reads
  the topic's high-water marks from the write-side control plane, and
  each micro-batch reads the ``[start, end)`` offset slice per
  partition — so checkpoint restart resumes mid-log with no replay
  (effective exactly-once; strictly stronger than the reference
  consumer's post-hoc auto-commit, ``consumer.py:16``).

Workers read the partition's parquet slice directly via pyarrow
(executor-side; no driver collect, no Spark-session use inside the
reader, as the API requires). Reference parity: this is the engine's
stand-in for the Kafka source/sink pair (``producer.py:67-71``,
``consumer.py:21-37``) in environments without a broker or the
spark-sql-kafka jar.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

#: wire columns (the Kafka connector's shape minus the broker-assigned
#: timestamp, which the embedded log stamps non-deterministically)
WIRE_SCHEMA = "key binary, value binary, partition int, offset bigint"


@dataclass
class _Slice(InputPartition):
    """One topic-partition offset slice ``[start, end)``."""

    data_dir: str
    pid: int
    start: int
    end: int


def _scan_slice(s: _Slice):
    """Yield (key, value, partition, offset) tuples for one slice,
    reading the parquet log files with pyarrow (executor-side)."""
    import pyarrow.dataset as pads

    if not os.path.isdir(s.data_dir):
        return
    files = [
        os.path.join(s.data_dir, f)
        for f in sorted(os.listdir(s.data_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return
    dataset = pads.dataset(files, format="parquet")
    field = pads.field
    expr = (
        (field("partition") == s.pid)
        & (field("offset") >= s.start)
        & (field("offset") < s.end)
    )
    table = dataset.to_table(
        columns=["key", "value", "partition", "offset"], filter=expr
    )
    for batch in table.to_batches():
        keys = batch.column("key").to_pylist()
        vals = batch.column("value").to_pylist()
        pids = batch.column("partition").to_pylist()
        offs = batch.column("offset").to_pylist()
        yield from zip(keys, vals, pids, offs)


def _meta(root: str, topic: str) -> dict:
    with open(os.path.join(root, "topics", topic, "meta.json")) as f:
        return json.load(f)


def _data_dir(root: str, topic: str) -> str:
    return os.path.join(root, "topics", topic, "data")


class EmbeddedLogBatchReader(DataSourceReader):
    def __init__(self, root: str, topic: str) -> None:
        self.root, self.topic = root, topic

    def partitions(self):
        meta = _meta(self.root, self.topic)
        d = _data_dir(self.root, self.topic)
        return [
            _Slice(d, pid, 0, int(end))
            for pid, end in enumerate(meta["next_offsets"])
        ]

    def read(self, partition: _Slice):
        yield from _scan_slice(partition)


class EmbeddedLogStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, topic: str) -> None:
        self.root, self.topic = root, topic

    def _highwater(self) -> dict:
        meta = _meta(self.root, self.topic)
        return {str(pid): int(o) for pid, o in enumerate(meta["next_offsets"])}

    def initialOffset(self) -> dict:
        return {pid: 0 for pid in self._highwater()}

    def latestOffset(self) -> dict:
        return self._highwater()

    def partitions(self, start: dict, end: dict):
        d = _data_dir(self.root, self.topic)
        return [
            _Slice(d, int(pid), int(start.get(pid, 0)), int(end[pid]))
            for pid in sorted(end)
            if int(end[pid]) > int(start.get(pid, 0))
        ] or [_Slice(d, 0, 0, 0)]  # empty batch still needs >= 1 partition

    def read(self, partition: _Slice):
        yield from _scan_slice(partition)

    def commit(self, end: dict) -> None:
        # the engine checkpoint IS the committed state; nothing to do
        # source-side (contrast consumer.py:16's broker auto-commit)
        pass


class EmbeddedLogDataSource(DataSource):
    """``format("embedded_log")`` — options: ``root`` (transport root
    directory), ``topic``."""

    @classmethod
    def name(cls) -> str:
        return "embedded_log"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def _target(self) -> tuple[str, str]:
        try:
            root, topic = self.options["root"], self.options["topic"]
        except KeyError as e:
            raise ValueError(
                "embedded_log requires options root and topic"
            ) from e
        if not os.path.exists(os.path.join(root, "topics", topic, "meta.json")):
            raise ValueError(f"embedded_log topic does not exist: {topic}")
        return root, topic

    def reader(self, schema: StructType) -> EmbeddedLogBatchReader:
        return EmbeddedLogBatchReader(*self._target())

    def streamReader(self, schema: StructType) -> EmbeddedLogStreamReader:
        return EmbeddedLogStreamReader(*self._target())


def register(spark) -> None:
    """Idempotently register the data source with a session."""
    spark.dataSource.register(EmbeddedLogDataSource)
