"""Z-order layout: multi-column file-skipping stats.

The claim under test: after zorder_write on (a, b), EVERY clustering
column's per-file min-max footprint is a fraction of its global range —
the property footer-stats pruning needs — which no single-column sort
can deliver for both columns at once.
"""

import glob
import math

import pyarrow.parquet as pq
import pytest

from cdc_kafka_project_spark.operators.layout import zorder_value, zorder_write


def _file_spans(path: str, col: str) -> list[float]:
    files = sorted(glob.glob(path + "/part-*.parquet"))
    stats = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        cmin, cmax = math.inf, -math.inf
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    cmin = min(cmin, c.statistics.min)
                    cmax = max(cmax, c.statistics.max)
        stats.append((cmin, cmax))
    lo = min(a for a, _ in stats)
    hi = max(b for _, b in stats)
    width = (hi - lo) or 1
    return [(b - a) / width for a, b in stats]


@pytest.fixture(scope="module")
def grid(spark):
    # a 64x64 grid of independent keys — the worst case for any
    # single-column sort (the other column spans everything)
    return spark.range(0, 4096).selectExpr(
        "id % 64 AS a", "CAST(id / 64 AS LONG) AS b", "id AS payload"
    )


def test_zorder_write_clusters_every_column(grid, tmp_path):
    zdir = str(tmp_path / "z")
    zorder_write(grid, zdir, ["a", "b"], n_files=16)
    spans_a = _file_spans(zdir, "a")
    spans_b = _file_spans(zdir, "b")
    assert len(spans_a) == 16
    # both columns clustered at once (ideal for 16 files is 0.25)
    assert sum(spans_a) / len(spans_a) < 0.6
    assert sum(spans_b) / len(spans_b) < 0.6
    # a plain single-column sort would leave the other column at ~1.0
    # per file; sanity-check the baseline so the assertion above means
    # something
    ndir = str(tmp_path / "naive")
    grid.repartitionByRange(16, "a").write.parquet(ndir)
    naive_b = _file_spans(ndir, "b")
    assert sum(naive_b) / len(naive_b) > 0.9


def test_zorder_value_bits_and_bounds(grid, spark):
    z = zorder_value(grid, ["a", "b"], bits_per_col=8)
    rows = z.selectExpr(
        "min(__z) AS zmin", "max(__z) AS zmax", "count(DISTINCT __z) AS nz"
    ).head()
    assert rows.zmin >= 0
    assert rows.zmax < 1 << 16
    assert rows.nz > 1000  # grid points spread over the curve
    with pytest.raises(ValueError):
        zorder_value(grid, ["a", "b"], bits_per_col=40)  # 80 bits > long


def test_zorder_constant_column_degrades_gracefully(spark, tmp_path):
    df = spark.range(0, 256).selectExpr("5 AS a", "id AS b")
    zdir = str(tmp_path / "zc")
    zorder_write(df, zdir, ["a", "b"], n_files=4)
    # constant column contributes code 0 everywhere; b still clusters
    spans_b = _file_spans(zdir, "b")
    assert sum(spans_b) / len(spans_b) < 0.5


def test_zorder_value_raises_on_empty_and_all_null(spark):
    """Undefined curve bounds must fail loudly, not TypeError inside
    the bit math (carried r2 advice)."""
    # a global agg returns one row even on empty input, so empty
    # surfaces as all-NULL bounds
    empty = spark.range(0).selectExpr("id AS a", "id AS b")
    with pytest.raises(ValueError, match="all-NULL"):
        zorder_value(empty, ["a", "b"], bits_per_col=8)
    all_null = spark.range(0, 10).selectExpr(
        "id AS a", "CAST(NULL AS LONG) AS b"
    )
    with pytest.raises(ValueError, match="all-NULL"):
        zorder_value(all_null, ["a", "b"], bits_per_col=8)


def test_compact_small_files_preserves_rows_and_reduces_files(spark, tmp_path):
    """20 tiny appends -> 1 compacted file; row set identical; footer
    stats stay selective when a sort column is given."""
    from cdc_kafka_project_spark.operators.layout import compact_small_files

    path = str(tmp_path / "log")
    for i in range(20):
        spark.createDataFrame(
            [(i * 10 + j, f"v{i}-{j}") for j in range(10)],
            "k long, v string",
        ).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path).collect()
    stats = compact_small_files(
        spark, path, target_file_mb=128, sort_within_by=["k"]
    )
    after = spark.read.parquet(path).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert stats["files_before"] == 20
    assert stats["files_after"] == 1
    import os

    assert not os.path.exists(path + ".compact-tmp")
    assert not os.path.exists(path + ".compact-old")
