"""Live-JDBC (Postgres) smoke layer (round-13 verdict, "Next round" #5).

No database ships in the sandbox, so sources/jdbc.py is proven only up
to plan construction (the pushed-down dbtable subquery text). These
tests close the deployable-day-one gap: point ``SPARK_GRAFT_PG_URL`` at
a live Postgres (with the JDBC driver jar on the classpath, e.g.
``spark.jars.packages=org.postgresql:postgresql:<ver>``) and the full
write -> full scan -> incremental (watermarked, pushed-down) scan
round-trip runs; in this environment they SKIP loudly with the
activation recipe.

Run against a live database:

    SPARK_GRAFT_PG_URL='jdbc:postgresql://localhost:5432/db' \
    SPARK_GRAFT_PG_USER=postgres SPARK_GRAFT_PG_PASSWORD=... \
    python -m pytest tests/test_live_jdbc.py -v
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import Row

from cdc_kafka_project_spark.sources import jdbc

PG_URL = os.environ.get("SPARK_GRAFT_PG_URL")

pytestmark = pytest.mark.skipif(
    not PG_URL,
    reason=(
        "no live database configured — set SPARK_GRAFT_PG_URL="
        "jdbc:postgresql://host:port/db (plus SPARK_GRAFT_PG_USER/"
        "_PASSWORD and the JDBC driver jar on the classpath) to run "
        "the real JDBC round-trip; plan-construction tests cover the "
        "pushdown subquery in this environment"
    ),
)


def _props() -> dict[str, str]:
    props = {"driver": os.environ.get("SPARK_GRAFT_PG_DRIVER",
                                      "org.postgresql.Driver")}
    if os.environ.get("SPARK_GRAFT_PG_USER"):
        props["user"] = os.environ["SPARK_GRAFT_PG_USER"]
    if os.environ.get("SPARK_GRAFT_PG_PASSWORD"):
        props["password"] = os.environ["SPARK_GRAFT_PG_PASSWORD"]
    return props


@pytest.fixture()
def seeded_table(spark):
    """Create a disposable emp_cdc-shaped table (reference
    producer.py:30-35's poll target) via the JDBC writer, drop it after."""
    table = f"spark_graft_smoke_{uuid.uuid4().hex[:12]}"
    df = spark.createDataFrame(
        [
            Row(emp_id=i, name=f"emp-{i}",
                last_updated_at=f"2026-01-0{1 + i % 9} 00:00:00")
            for i in range(20)
        ]
    ).selectExpr("emp_id", "name", "cast(last_updated_at as timestamp) "
                 "as last_updated_at")
    writer = df.write.format("jdbc").option("url", PG_URL).option(
        "dbtable", table
    ).mode("overwrite")
    for k, v in _props().items():
        writer = writer.option(k, v)
    writer.save()
    yield table
    # best-effort drop through a 0-row overwrite is NOT a drop; use the
    # driver's connection via the JVM to actually remove the table
    try:
        jvm_props = spark._sc._jvm.java.util.Properties()
        for k, v in _props().items():
            jvm_props.setProperty(k, v)
        conn = spark._sc._jvm.java.sql.DriverManager.getConnection(
            PG_URL, jvm_props
        )
        conn.createStatement().execute(f"DROP TABLE IF EXISTS {table}")
        conn.close()
    except Exception:
        pass


def test_live_full_table_scan(spark, seeded_table):
    """jdbc_table full scan (SURVEY §2 #20) returns every seeded row."""
    got = jdbc.jdbc_table(spark, PG_URL, seeded_table, properties=_props())
    assert got.count() == 20
    assert set(got.columns) == {"emp_id", "name", "last_updated_at"}


def test_live_partitioned_scan_matches_single(spark, seeded_table):
    """A partitioned extract (one range query per partition) returns
    the same rows as the single-connection scan."""
    single = jdbc.jdbc_table(spark, PG_URL, seeded_table, properties=_props())
    parts = jdbc.jdbc_table(
        spark, PG_URL, seeded_table, properties=_props(),
        num_partitions=4, partition_column="emp_id",
        lower_bound=0, upper_bound=20,
    )
    assert parts.rdd.getNumPartitions() == 4
    assert sorted(r.emp_id for r in parts.collect()) == sorted(
        r.emp_id for r in single.collect()
    )


def test_live_incremental_scan_pushdown(spark, seeded_table):
    """jdbc_incremental_scan (SURVEY §2 #1-#3): the watermark predicate
    runs in the database — only rows past the high-water mark come
    back, with the projection applied source-side."""
    got = jdbc.jdbc_incremental_scan(
        spark, PG_URL, seeded_table,
        watermark_col="last_updated_at",
        watermark_value="2026-01-05 00:00:00",
        columns=["emp_id", "last_updated_at"],
        properties=_props(),
    )
    rows = got.collect()
    assert set(got.columns) == {"emp_id", "last_updated_at"}
    assert all(str(r.last_updated_at) > "2026-01-05 00:00:00" for r in rows)
    # seeded days cycle 01..09 over 20 rows -> days 06..09 qualify
    expected = [i for i in range(20) if 1 + i % 9 > 5]
    assert sorted(r.emp_id for r in rows) == expected
