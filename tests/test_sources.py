"""Source layer + Project-1 ETL (SURVEY §2 #1, #22-#26)."""

import datetime as dt

from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators import project1
from cdc_kafka_project_spark.sources import csv_source
from cdc_kafka_project_spark.sources.jdbc import incremental_subquery

#: employees.csv:1 header layout (reference), Project-1 columns added
CSV_HEADER = "Employee ID,First Name,Last Name,Date of Birth,Department,Salary,Hire Date"
CSV_ROWS = [
    "1,Alice,Smith,1990-01-01,ECC,1000.75,2015-03-01",
    "2,Bob,Jones,1985-05-05,CIT,2000.25,2012-07-15",
    "3,Carol,White,1992-09-09,EMS,1500.99,2009-01-01",   # hired < 2010: dropped
    "4,Dan,Black,1991-04-04,HR,9999.00,2018-01-01",      # dept not in list: dropped
    "5,Eve,Green,1993-12-12,ECC,500.50,2010-01-01",
    "6,Mallory,Gray,1994-02-02,CIT,not_a_number,2016-06-06",  # malformed salary
]

CSV_SCHEMA = (
    "emp_id int, first_name string, last_name string, dob date, "
    "department string, salary double, hire_date date"
)


def _write_csv(tmp_path):
    p = tmp_path / "salaries.csv"
    p.write_text("\n".join([CSV_HEADER, *CSV_ROWS]) + "\n")
    return str(p)


def test_csv_scan_schema_not_inferred(spark, tmp_path):
    df = csv_source(spark, _write_csv(tmp_path), CSV_SCHEMA)
    assert dict(df.dtypes) == {
        "emp_id": "int", "first_name": "string", "last_name": "string",
        "dob": "date", "department": "string", "salary": "double",
        "hire_date": "date",
    }
    assert df.count() == 6


def test_csv_permissive_nulls_malformed_fields(spark, tmp_path):
    df = csv_source(spark, _write_csv(tmp_path), CSV_SCHEMA)
    bad = df.filter(F.col("emp_id") == 6).collect()[0]
    assert bad.salary is None  # malformed -> NULL, scan never fails
    assert bad.first_name == "Mallory"  # other fields survive


def test_project1_etl_filters_and_floor(spark, tmp_path):
    df = csv_source(spark, _write_csv(tmp_path), CSV_SCHEMA)
    out = project1.salary_etl(df)
    got = {r.emp_id: r.salary for r in out.collect()}
    # 3 dropped (pre-2010), 4 dropped (dept), 6 dropped? no — 6 is CIT
    # 2016 but salary NULL: floor(NULL)=NULL, row kept (validation is a
    # separate concern)
    assert got == {1: 1000, 2: 2000, 5: 500, 6: None}


def test_project1_department_totals(spark, tmp_path):
    df = csv_source(spark, _write_csv(tmp_path), CSV_SCHEMA)
    out = project1.department_totals(project1.salary_etl(df))
    got = {r.department: r.total_salary for r in out.collect()}
    # sum skips NULLs (matches the reference consumer, which would have
    # crashed on the row and skipped it via its broad except)
    assert got == {"ECC": 1500, "CIT": 2000}


def test_csv_header_rename_map(spark, tmp_path):
    """The reference's positional Employee.from_line reshape
    (employee.py:4-13) as a declarative rename."""
    p = tmp_path / "ref.csv"
    p.write_text("Employee ID,First Name\n7,Grace\n")
    df = csv_source(
        spark, str(p), "`Employee ID` int, `First Name` string",
        columns={"Employee ID": "emp_id", "First Name": "emp_FN"},
    )
    assert df.columns == ["emp_id", "emp_FN"]
    assert df.collect()[0].emp_id == 7


def test_jdbc_incremental_subquery_pushdown_shape():
    q = incremental_subquery(
        "emp_cdc", "last_updated_at", "2000-01-01 00:00:00",
        columns=["emp_id", "action", "last_updated_at"],
    )
    assert q == (
        "(SELECT emp_id, action, last_updated_at FROM emp_cdc "
        "WHERE last_updated_at > '2000-01-01 00:00:00') AS __incr"
    )


def test_jdbc_incremental_subquery_rejects_hostile_watermark():
    """The watermark originates from data — anything outside the
    timestamp/number alphabet (quotes above all) must be rejected, not
    interpolated into SQL shipped to the source database."""
    import pytest

    for bad in ("2000-01-01' OR '1'='1", "x'; DROP TABLE emp_cdc; --", 'a"b'):
        with pytest.raises(ValueError):
            incremental_subquery("emp_cdc", "last_updated_at", bad)


def test_project1_plan_pushes_filters_to_csv_scan(spark, tmp_path):
    """The IN-list and year filters must reach the FileScan (Catalyst
    pushdown) — at 100 TB the difference between scanning 3
    departments' row groups and scanning everything."""
    df = csv_source(spark, _write_csv(tmp_path), CSV_SCHEMA)
    plan = project1.salary_etl(df)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "In(department" in plan


def test_jsonl_source_reads_and_routes_corrupt_lines(spark, tmp_path):
    """Well-formed lines parse to typed columns; a malformed line lands
    in _corrupt_record instead of killing the scan or vanishing."""
    from cdc_kafka_project_spark.sources.files import jsonl_source

    p = tmp_path / "msgs.jsonl"
    p.write_text(
        '{"emp_id": 1, "emp_FN": "Alice", "salary": 5000}\n'
        '{"emp_id": 2, "emp_FN": "Bob", "salary": 6000}\n'
        "{not json at all\n"
    )
    schema = (
        "emp_id long, emp_FN string, salary long, _corrupt_record string"
    )
    df = jsonl_source(spark, str(p), schema)
    rows = df.collect()
    good = {r.emp_id: r.emp_FN for r in rows if r._corrupt_record is None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == {1: "Alice", 2: "Bob"}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record


def test_orc_source_round_trip_with_pushdown(spark, tmp_path):
    """ORC: schema'd scan round-trips and filters push to the scan."""
    from cdc_kafka_project_spark.sources.files import orc_source

    path = str(tmp_path / "orc")
    spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(100)],
        "id int, name string, v double",
    ).write.orc(path)
    df = orc_source(spark, path, "id int, name string, v double")
    got = df.filter(F.col("id") >= 90).select("id").collect()
    assert sorted(r.id for r in got) == list(range(90, 100))
    plan = df.filter(F.col("id") >= 90)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(id,90)" in plan


def test_avro_source_gated_with_clear_error(spark, tmp_path):
    """Without the external spark-avro jar the wrapper must fail with
    an actionable message, not a ClassNotFound chain."""
    import pytest as _pytest

    from cdc_kafka_project_spark.sources.files import avro_source

    with _pytest.raises(NotImplementedError, match="spark-avro"):
        avro_source(spark, str(tmp_path / "nope"))
