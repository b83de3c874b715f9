"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC-apply query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (+ north-star extensions) for the DuckDB correctness gate.
Implementations live in ``cdc_kafka_project_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_kafka_project_spark.registry import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full CDC apply (change-log -> replica view) on the
    sf0.001 events table. See queries/cdc_surface.py::cdc_replica."""
    return all_queries()["cdc_replica"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every oracle-checkable query."""
    return all_oracles()
