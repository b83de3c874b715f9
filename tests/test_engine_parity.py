"""Pins for the three cross-engine float-conversion contracts.

The 10x/30x replica sweeps (LOCAL_SCALE_r08.md) surfaced three ways a
Spark expression and its DuckDB oracle can disagree on the SAME exact
value, each invisible at driver-gate row counts:

1. Spark's double->decimal cast and ROUND-on-double read the double's
   SHORTEST decimal repr (``BigDecimal.valueOf``); DuckDB rounds the
   exact binary value. Fix: products of 2dp money columns are computed
   in exact decimal (``functions.revenue_dec`` et al.) and all
   rounding uses the floor form (``functions.fround``).
2. DuckDB's direct DECIMAL->DOUBLE cast computes hugeint->double then
   /10^scale (two roundings) and drifts 1 ulp from the correctly
   rounded value once the scaled integer passes 2^53. Fix: oracle SQL
   routes decimal-sum casts through VARCHAR.

These tests pin each mechanism at unit level — on the literal values
observed to diverge — plus source-level guards so the slow paths
cannot be reintroduced silently.
"""

from __future__ import annotations

import pathlib
import re

import duckdb
import pytest
from pyspark.sql import functions as F

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "cdc_kafka_project_spark"

#: The decimal sum observed at the 10x replica (q1 sum_charge for the
#: R/O group): its scaled integer 27864155010941590 exceeds 2^53 and
#: sits exactly between two representable doubles' preimages, so
#: DuckDB's direct cast lands 1 ulp above the correctly-rounded value.
TIE_DECIMAL = "27864155010.941590"


def test_duckdb_varchar_route_is_correctly_rounded():
    con = duckdb.connect()
    direct, routed = con.execute(
        f"""SELECT CAST(CAST('{TIE_DECIMAL}' AS DECIMAL(38,6)) AS DOUBLE),
                   CAST(CAST(CAST('{TIE_DECIMAL}' AS DECIMAL(38,6))
                             AS VARCHAR) AS DOUBLE)"""
    ).fetchone()
    correct = float(TIE_DECIMAL)
    assert routed == correct
    # documents WHY the route exists: the direct cast really is off by
    # 1 ulp on this value (if DuckDB ever fixes it, this flips and the
    # routing becomes optional — update the oracles' comment, not the
    # route, which stays a bit-identity either way)
    assert direct != correct


def test_spark_decimal_to_double_is_correctly_rounded(spark):
    got = spark.sql(
        f"SELECT CAST(CAST('{TIE_DECIMAL}' AS DECIMAL(38,6)) AS DOUBLE) AS d"
    ).collect()[0].d
    assert got == float(TIE_DECIMAL)


def test_varchar_route_is_identity_below_2_53():
    # driver-gate-scale sums are far below 2^53 scaled units: the route
    # must change nothing there (so landing it could not move hashes)
    con = duckdb.connect()
    for v in ["0.000001", "-42.5", "123456.789012", "9007199.254740"]:
        direct, routed = con.execute(
            f"""SELECT CAST(CAST('{v}' AS DECIMAL(25,6)) AS DOUBLE),
                       CAST(CAST(CAST('{v}' AS DECIMAL(25,6))
                                 AS VARCHAR) AS DOUBLE)"""
        ).fetchone()
        assert direct == routed == float(v)


def test_fround_matches_duckdb_floor_form(spark):
    # values chosen near 4dp boundaries, including ones whose shortest
    # repr and binary value straddle the boundary (the F.round trap)
    vals = [0.03364999999999999, -0.03365000000000001, 0.98765, -0.5,
            0.00005, -0.00004999999999, 1.0, 0.76649999999999996]
    from cdc_kafka_project_spark.functions import fround

    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in sdf.select(fround(F.col("x"), 4).alias("y")).collect()]
    con = duckdb.connect()
    want = [
        con.execute("SELECT floor((?) * 1e4 + 0.5) / 1e4", [v]).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_fround_nonfinite_passthrough(spark):
    """NaN/Inf/NULL pass through fround untouched — Spark's F.floor on
    double returns LongType (NaN -> 0, +/-Inf -> Long.MAX/MIN) while
    DuckDB's floor keeps them as doubles; the when-guard keeps the two
    engines agreeing and stops a NaN (e.g. a zero-norm cosine) from
    silently becoming a plausible 0.0."""
    import math

    from cdc_kafka_project_spark.functions import fround

    sdf = spark.createDataFrame(
        [
            (1, float("nan")),
            (2, float("inf")),
            (3, float("-inf")),
            (4, None),
            (5, 1.23456),
        ],
        "id long, x double",
    )
    got = {
        r.id: r.y
        for r in sdf.select("id", fround(F.col("x"), 2).alias("y")).collect()
    }
    assert math.isnan(got[1])
    assert got[2] == float("inf")
    assert got[3] == float("-inf")
    assert got[4] is None
    assert got[5] == pytest.approx(1.23)
    # DuckDB's floor form makes the same choices
    con = duckdb.connect()
    dd = con.execute(
        "SELECT floor(CAST('NaN' AS DOUBLE) * 1e2 + 0.5) / 1e2,"
        " floor(CAST('Infinity' AS DOUBLE) * 1e2 + 0.5) / 1e2,"
        " floor(CAST(NULL AS DOUBLE) * 1e2 + 0.5) / 1e2"
    ).fetchone()
    assert math.isnan(dd[0]) and dd[1] == float("inf") and dd[2] is None


def test_revenue_dec_matches_oracle_expression(spark):
    # per-row parity of the exact-decimal revenue/charge expressions vs
    # the oracle SQL fragments, on 2dp fixtures INCLUDING values whose
    # double product's shortest repr disagrees with its binary rounding
    rows = [
        (52812.83, 0.05, 0.04),
        (0.01, 0.00, 0.00),
        (99999.99, 0.10, 0.08),
        (31415.93, 0.07, 0.02),
    ]
    from cdc_kafka_project_spark.functions import (
        CHARGE_DEC_SQL,
        REVENUE_DEC_SQL,
        charge_dec,
        revenue_dec,
    )

    sdf = spark.createDataFrame(
        rows, "l_extendedprice double, l_discount double, l_tax double"
    )
    got = [
        (str(r.r), str(r.c))
        for r in sdf.select(
            revenue_dec().alias("r"), charge_dec().alias("c")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = [
        (str(a), str(b))
        for a, b in con.execute(
            f"SELECT CAST({REVENUE_DEC_SQL} AS DECIMAL(25,6)),"
            f"       CAST({CHARGE_DEC_SQL} AS DECIMAL(25,6)) FROM t"
        ).fetchall()
    ]
    # compare at the common (25,6) scale both pipelines sum at
    got6 = [tuple(f"{float(x):.6f}" for x in g) for g in got]
    want6 = [tuple(f"{float(x):.6f}" for x in w) for w in want]
    assert got6 == want6


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_money_columns_are_2dp_at_every_sf(sf_dir):
    """The exact-decimal money pipeline (functions.revenue_dec et al.)
    is engine-unambiguous ONLY because the inputs are 2dp-valued: a 2dp
    double is ~1e-13 from its decimal value, far inside the 5e-3
    rounding half-step, so Spark's repr-reading cast and DuckDB's
    binary-rounding cast agree. A future generation with >2dp money
    would reopen the divergence — fail here, before the driver gate."""
    con = duckdb.connect()
    for tbl, cols in [
        ("lineitem", ["l_extendedprice", "l_discount", "l_tax"]),
        ("orders", ["o_totalprice"]),
        ("customer", ["c_acctbal"]),
        ("events", ["value"]),
    ]:
        for c in cols:
            (n,) = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/{tbl}.parquet')"
                f" WHERE {c} <> ROUND({c}, 2)"
            ).fetchone()
            assert n == 0, f"{sf_dir}/{tbl}.{c}: {n} non-2dp rows"
    # q17's AVG(l_quantity) is order-independent only because the
    # quantities are integral (exact double sums)
    (n,) = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/lineitem.parquet')"
        " WHERE l_quantity <> FLOOR(l_quantity)"
    ).fetchone()
    assert n == 0, f"{sf_dir}: {n} non-integral quantities"


def _source_files():
    for sub in ("queries", "operators", "streaming", "functions"):
        yield from (PKG / sub).glob("*.py")


def test_no_f_round_anywhere():
    """F.round on doubles is the shortest-repr trap — fround only."""
    hits = [
        f"{p.name}:{i+1}"
        for p in _source_files()
        for i, line in enumerate(p.read_text().splitlines())
        if "F.round(" in line
    ]
    assert hits == [], f"F.round reintroduced (use functions.fround): {hits}"


def _unrouted_decimal_sum_casts(src: str) -> list[int]:
    """Line numbers of CAST(SUM(..decimal..) ...) expressions cast to
    DOUBLE without the VARCHAR route. Two offender shapes: the direct
    CAST(SUM(..dec..) AS DOUBLE) carries AS DOUBLE inside the matched
    cast; the nested CAST(CAST(SUM(..) AS DECIMAL) AS DOUBLE) puts it
    just after it."""
    pat = re.compile(r"CAST\(\s*SUM\(", re.IGNORECASE)
    offenders = []
    for m in pat.finditer(src):
        j = m.start()
        k = j + src[j:].index("(") + 1
        depth = 1
        while depth:
            if src[k] == "(":
                depth += 1
            elif src[k] == ")":
                depth -= 1
            k += 1
        inner = src[j:k]
        tail = src[k : k + 40]
        routed = re.search(r"AS\s+(VARCHAR|STRING)\s*\)\s*$", inner)
        double_inside = re.search(r"AS\s+DOUBLE\s*\)\s*$", inner)
        double_after = re.match(r"\s*AS\s+DOUBLE", tail)
        if (
            not routed
            and (double_inside or double_after)
            and "DECIMAL" in inner
        ):
            offenders.append(src[:j].count(chr(10)) + 1)
    return offenders


def test_unrouted_cast_guard_catches_both_offender_shapes():
    """Self-test of the guard's matcher: both bad shapes flagged, the
    VARCHAR-routed shape not (a vacuous guard is worse than none)."""
    direct = "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)"
    nested = (
        "CAST(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DECIMAL(25,6))"
        " AS DOUBLE)"
    )
    routed = (
        "CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR)"
        " AS DOUBLE)"
    )
    assert _unrouted_decimal_sum_casts(direct) == [1]
    assert _unrouted_decimal_sum_casts(nested) == [1]
    assert _unrouted_decimal_sum_casts(routed) == []


def test_no_unrouted_decimal_sum_casts_in_oracles():
    """Every CAST(<SUM-containing decimal expr> AS DOUBLE) in oracle
    SQL must route through VARCHAR (DuckDB's direct cast double-rounds
    past 2^53 scaled units)."""
    offenders = []
    for p in (PKG / "queries").glob("*.py"):
        offenders += [
            f"{p.name}:{ln}"
            for ln in _unrouted_decimal_sum_casts(p.read_text())
        ]
    assert offenders == [], (
        "direct CAST(SUM(decimal) AS DOUBLE) in oracle SQL — route "
        f"through VARCHAR (see functions.dsum docstring): {offenders}"
    )


def test_no_unrouted_decimal_sum_casts_in_registered_oracles():
    """Registry-level twin of the source scan (round-8 advice): lint
    the ASSEMBLED oracle strings from all_oracles(), so an offender
    built by f-string interpolation (e.g. a shared *_SQL constant or a
    computed fragment) cannot slip past the file-level grep. The
    divergence this guards is invisible at driver scale — it appears
    only past ~9e9 scaled units, where bisecting is expensive."""
    from cdc_kafka_project_spark.registry import all_oracles

    offenders = [
        name
        for name, sql in all_oracles().items()
        if _unrouted_decimal_sum_casts(sql)
    ]
    assert offenders == [], (
        "direct CAST(SUM(decimal) AS DOUBLE) in assembled oracle SQL — "
        f"route through VARCHAR (functions.dsum docstring): {offenders}"
    )
