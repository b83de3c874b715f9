"""cdc_kafka_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference CDC pipeline (Yaliang105/cdc-kafka-project:
Postgres -> trigger change-log -> Kafka -> validate/DLQ -> keyed apply,
plus the spec PDF's batch ETL + running aggregation), built Spark-first:

* the change-log is a DataFrame (batch) / streaming DataFrame (Kafka);
* the replica is a view: latest-row-per-key via window dedup, not a
  row-at-a-time apply loop;
* validation/DLQ routing is a predicate split, two sinks off one scan;
* the running aggregation is a (streaming) groupBy.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs appear only where built-ins
cannot express the semantics (and then only Arrow-vectorized).
"""

__version__ = "0.1.0"

from cdc_kafka_project_spark.session import get_spark, configure_session

__all__ = ["get_spark", "configure_session", "__version__"]
