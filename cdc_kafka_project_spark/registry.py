"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 (plus the north-star
extensions) registers here as a named query:

* a callable ``(spark, sf_dir) -> DataFrame`` (the Spark implementation)
* optionally an ANSI-SQL oracle string for DuckDB (same tables as
  pre-registered views). Queries without an oracle get the driver's
  weaker rows-only check — reserved for genuinely non-SQL-expressible
  ops (MinHash banding, SimHash, LSH bucketing).

Parity rules (driver hash-compares values after sorting columns by
name):
* identical output column names on both sides (alias everything);
* no raw timestamp columns in outputs — format to string or cast to
  date (Spark session tz is pinned UTC to match DuckDB's naive ts);
* double aggregates go through exact DECIMAL sums (functions.dsum) and
  the oracle mirrors with CAST(SUM(CAST(x AS DECIMAL(25,2))) AS DOUBLE);
* DuckDB SUM(BIGINT) returns HUGEINT — oracles cast back to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: registration)."""
    from cdc_kafka_project_spark.queries import (  # noqa: F401
        cdc_surface,
        relational,
        relational_ext,
        scale_patterns,
        text_analysis,
        dedup,
        similarity,
        multimodal,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
