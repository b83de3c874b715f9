"""File sources: schema'd CSV and parquet readers.

CSV is the reference's Project-1 ingest (`employees.csv`; header
`Employee ID,First Name,Last Name,Date of Birth,City`, pdf p.3) —
SURVEY.md §2 #22. Schema is mandatory: schema inference re-reads the
data and guesses types per run, both unacceptable at 100 TB (and the
reference's own schemas are declared DDL, never inferred).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def csv_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "PERMISSIVE",
    columns: dict[str, str] | None = None,
) -> DataFrame:
    """Schema'd CSV scan (#22).

    ``columns`` optionally renames source headers to engine column
    names (the reference's `Employee ID` -> `emp_id` reshape done by
    `Employee.from_line`, employee.py:4-13) — a metadata-only
    projection, free under Catalyst.

    PERMISSIVE mode nulls malformed fields instead of failing the scan;
    pair with a validation split (operators/cdc.validate_split) to
    route bad rows to a DLQ rather than dropping them silently (the
    upgrade over consumer.py:95-102).
    """
    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )
    if columns:
        df = df.withColumnsRenamed(columns)
    return df


def parquet_source(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Parquet scan; optional schema pins column types (projection and
    predicate pushdown reach the footer either way)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def jsonl_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema'd JSON-lines scan — the file form of the reference's Kafka
    message payloads (producer.py:62-65 writes exactly this shape, one
    JSON object per line/message).

    Schema mandatory for the same reason as CSV; PERMISSIVE mode plus
    ``columnNameOfCorruptRecord`` gives malformed lines a non-null
    ``_corrupt_record`` to route to a DLQ — never a silent drop
    (consumer.py:95-102's anti-pattern).
    """
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def orc_source(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC scan — the second columnar format warehouses hand an engine.
    Same contract as parquet_source: optional schema pin; predicate
    pushdown and column pruning reach the stripe footers natively."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def avro_source(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Avro scan — the wire format most Kafka CDC deployments pair with
    a schema registry. The Avro reader lives in the external
    ``spark-avro`` module (not bundled with pip pyspark); this wrapper
    raises a clear error when the jar is absent instead of Spark's
    opaque ClassNotFound chain. Gate, not a stub: with
    ``--packages org.apache.spark:spark-avro_2.13:<version>`` on a real
    cluster the same call just works."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format("avro").load(path)
    except Exception as e:
        # Only the specific missing-data-source failure means "jar
        # absent" — matching on just 'avro' would misdiagnose ordinary
        # errors (e.g. a missing path that itself contains 'avro').
        if "failed to find data source" in str(e).lower():
            raise NotImplementedError(
                "spark-avro module not on the classpath (pip pyspark ships "
                "without it); add org.apache.spark:spark-avro via "
                "spark.jars.packages to enable avro_source"
            ) from e
        raise
