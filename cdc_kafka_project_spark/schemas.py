"""Declared StructTypes for every table the engine touches.

Reference schemas re-expressed from the DDL in the reference repo
(``airflow_dags/project2_dag.py:25-43,81-90``) and the spec PDF
(Project-1 tables, pdf p.3-6); wire format from ``producer.py:51-65`` /
``employee.py:3-20``. Testdata schemas match the driver's parquet
footers (see FIXTURES.md §7). No schema inference anywhere — explicit
types so plans are stable and scans prune columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference surface: employee CDC pipeline
# ---------------------------------------------------------------------------

#: Source base table (project2_dag.py:25-32). LongType for emp_id — the
#: reference uses SERIAL/int4, but at 100 TB key space int32 overflows.
EMPLOYEE_SCHEMA = T.StructType(
    [
        T.StructField("emp_id", T.LongType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("dob", T.DateType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("salary", T.IntegerType(), True),
    ]
)

#: Change-log table emp_cdc (project2_dag.py:34-43): row image + action +
#: event time. ``seq`` is our addition — the reference gets a total order
#: for free from single-partition Kafka + ORDER BY last_updated_at
#: (producer.py:34); a parallel engine needs an explicit tiebreaker for
#: equal timestamps (log position / Kafka offset).
EMP_CDC_SCHEMA = T.StructType(
    list(EMPLOYEE_SCHEMA.fields)
    + [
        T.StructField("action", T.StringType(), False),
        T.StructField("last_updated_at", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), True),
    ]
)

#: Kafka message value (producer.py:51-65, employee.py:3-13): everything
#: JSON-scalar, dates/timestamps stringified (producer.py:56,63).
KAFKA_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("action_id", T.IntegerType(), True),
        T.StructField("emp_id", T.LongType(), True),
        T.StructField("emp_FN", T.StringType(), True),
        T.StructField("emp_LN", T.StringType(), True),
        T.StructField("emp_dob", T.StringType(), True),
        T.StructField("emp_city", T.StringType(), True),
        T.StructField("emp_salary", T.IntegerType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("last_updated_at", T.StringType(), True),
    ]
)

#: Project-1 batch ETL input (pdf p.3-5; employees.csv header).
EMPLOYEE_SALARIES_SCHEMA = T.StructType(
    [
        T.StructField("department", T.StringType(), True),
        T.StructField("department_division", T.StringType(), True),
        T.StructField("position_title", T.StringType(), True),
        T.StructField("hire_date", T.DateType(), True),
        T.StructField("salary", T.DecimalType(12, 2), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided synthetic tables (/root/testdata/sf*/..., FIXTURES.md §7)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),  # after ns->us conversion
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)

# ---------------------------------------------------------------------------
# Extension surface: multimodal media table (north-star; no testdata file —
# synthesized in tests). Binary payload + typed metadata, per the
# "opaque binary column" design.
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
            True,
        ),
    ]
)
