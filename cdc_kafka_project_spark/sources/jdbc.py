"""JDBC sources: full-table and incremental (watermarked) scans.

SURVEY.md §2 #1: the reference's producer polls Postgres with
``SELECT ... FROM emp_cdc WHERE last_updated_at > :wm ORDER BY
last_updated_at`` (producer.py:30-35), tracking the high-water mark in
process memory (producer.py:15,74 — lost on restart).

Spark-first restatement: the predicate is *pushed into the database*
(Catalyst JDBC pushdown), partitioned reads parallelize the extract,
and the watermark is the caller's durable state (a checkpoint/offset
table), not an instance field. The global ORDER BY is dropped —
per-key ordering is restored downstream by cdc.latest_per_key
(SURVEY §2 #19), which is the only ordering the apply step needs; a
total sort of a 100 TB extract would be a pointless full shuffle.

No database ships in this container, so these builders are exercised
up to plan construction in tests (the same plans run against a live
JDBC URL unchanged).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
) -> DataFrame:
    """Full-table JDBC scan (#20's SELECT *), optionally partitioned.

    With (partition_column, lower/upper bound, num_partitions) the read
    issues one range query per partition — the difference between one
    connection dragging the whole table and a parallel extract.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def incremental_subquery(
    table: str,
    watermark_col: str,
    watermark_value: str,
    columns: list[str] | None = None,
) -> str:
    """The pushed-down dbtable subquery for an incremental scan —
    projection (#2) + watermark predicate (#3) evaluated in the source
    database, mirroring producer.py:30-35 minus the ORDER BY."""
    cols = ", ".join(columns) if columns else "*"
    # The watermark is interpolated into SQL shipped to the source
    # database. It is engine state (a timestamp/sequence high-water
    # mark), but it *originates from data*, so treat it as hostile:
    # reject anything beyond timestamp/number/ISO-date characters
    # rather than trusting quoting. (Spark's JDBC dbtable option offers
    # no bind parameters; validation is the defense.)
    if not re.fullmatch(r"[0-9A-Za-z_\-:. +]*", watermark_value):
        raise ValueError(
            f"watermark value contains characters outside the "
            f"timestamp/number alphabet: {watermark_value!r}"
        )
    return (
        f"(SELECT {cols} FROM {table} "
        f"WHERE {watermark_col} > '{watermark_value}') AS __incr"
    )


def jdbc_incremental_scan(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_col: str,
    watermark_value: str,
    columns: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental scan (#1-#3): only rows past the watermark, with the
    filter and projection pushed into the database via a dbtable
    subquery — the producer's exact semantics minus the fragile
    in-memory watermark and the global sort.
    """
    subquery = incremental_subquery(table, watermark_col, watermark_value, columns)
    return jdbc_table(spark, url, subquery, properties)
