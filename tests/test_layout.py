"""Z-order layout: parquet-footer pruning must beat a one-column sort
for multi-dimensional predicates — measured on real file stats, not
asserted from theory."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fluent_server_spark.operators.layout import with_zvalue, zorder_layout

N_FILES = 16


@pytest.fixture(scope="module")
def points(spark):
    # 20k points over a 100x100 grid, decorrelated dims
    return spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 100).cast("int").alias("x"),
        ((F.col("id") * 37 + 11) % 100).cast("int").alias("y"),
    )


def _file_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    out = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        rng: dict[str, tuple] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i in range(row_group.num_columns):
                col = row_group.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    cur = rng.get(name)
                    rng[name] = (
                        (min(cur[0], lo), max(cur[1], hi)) if cur else (lo, hi)
                    )
        out.append(rng)
    return out


def _files_touched(ranges, box: dict[str, tuple]) -> int:
    n = 0
    for rng in ranges:
        if all(rng[c][0] <= hi and rng[c][1] >= lo for c, (lo, hi) in box.items()):
            n += 1
    return n


def test_zorder_prunes_where_single_sort_cannot(spark, points, tmp_path):
    linear = str(tmp_path / "linear")
    zorder = str(tmp_path / "zorder")
    (
        points.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.parquet(linear)
    )
    zorder_layout(points, ["x", "y"], N_FILES).write.parquet(zorder)

    lin = _file_ranges(linear, ["x", "y"])
    zo = _file_ranges(zorder, ["x", "y"])
    assert len(lin) == len(zo) == N_FILES

    # the y-band query the x-sorted layout CANNOT prune (every x-file
    # spans the full y range) but z-order tiles can
    y_band = {"y": (40, 45)}
    lin_touched = _files_touched(lin, y_band)
    zo_touched = _files_touched(zo, y_band)
    assert lin_touched == N_FILES
    assert zo_touched <= N_FILES // 2, (lin_touched, zo_touched)

    # a 2-D box prunes on BOTH dims under z-order
    box = {"x": (10, 25), "y": (60, 75)}
    assert _files_touched(zo, box) < _files_touched(lin, box)

    # layout changes bytes-on-disk order only, never the data
    assert (
        spark.read.parquet(zorder).select("id").orderBy("id").collect()
        == points.select("id").orderBy("id").collect()
    )


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (255, 255), (255, 0)], "x int, y int")
    got = {
        (r["x"], r["y"]): r["zvalue"]
        for r in with_zvalue(df, ["x", "y"], bits=8).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(255, 255)] == (1 << 16) - 1  # all 16 interleaved bits set
    # x contributes the even bit positions (ci=0): 0b0101...01
    assert got[(255, 0)] == sum(1 << (2 * b) for b in range(8))


def test_constant_and_null_columns_stay_well_defined(spark):
    """A constant (or partially-null) clustered column must not null the
    z-value — it contributes bucket 0 everywhere and the other dims
    still discriminate."""
    df = spark.createDataFrame(
        [(1, 7.0, 0.0), (2, 7.0, 50.0), (3, None, 99.0)],
        "id int, x double, y double",
    )
    rows = {r["id"]: r["zvalue"] for r in with_zvalue(df, ["x", "y"], bits=4).collect()}
    assert all(v is not None for v in rows.values())
    assert rows[1] != rows[2]  # y still discriminates


def test_equal_depth_boundaries(spark):
    # skewed x: 99% of mass at x=0; equal-width buckets collapse, the
    # quantile boundaries still split the heavy region's files
    df = spark.range(10_000).select(
        F.when(F.col("id") % 100 == 0, F.col("id")).otherwise(0).cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("y"),
    )
    bounds = df.approxQuantile("x", [i / 16 for i in range(1, 16)], 0.01)
    z = with_zvalue(df, ["x", "y"], bits=4, boundaries={"x": bounds})
    assert z.select("zvalue").distinct().count() > 4  # not degenerate
