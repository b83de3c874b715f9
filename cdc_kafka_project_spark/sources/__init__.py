"""Source connectors (SURVEY.md §2 #1, #22, #27).

The reference ingests from exactly three places — a Postgres change-log
table polled incrementally (producer.py:30-35), a Kafka topic
(consumer.py:11-37; wrapped in streaming/kafka_io.py), and CSV files
(employees.csv, pdf p.3). Each maps to a declarative Spark reader here;
all of them return plain DataFrames so every downstream operator is
source-agnostic.
"""

from cdc_kafka_project_spark.sources.files import csv_source, parquet_source
from cdc_kafka_project_spark.sources.jdbc import jdbc_incremental_scan, jdbc_table

__all__ = [
    "csv_source",
    "parquet_source",
    "jdbc_incremental_scan",
    "jdbc_table",
]
