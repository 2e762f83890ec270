"""Z-order layout tests: Morton interleave correctness and the pruning
payoff — a 2-D box predicate must touch fewer files under z-order
clustering than under a linear single-key sort."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_cbioportal_workflows_spark.sources import (
    interleave_bits,
    with_zvalue,
    write_zordered,
)


def _morton_ref(x, y, bits):
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_matches_reference(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=3).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_ref(x, y, 3)


def test_interleave_rejects_overflow(spark):
    with pytest.raises(ValueError, match="bigint"):
        interleave_bits([F.lit(1)] * 4, bits=16)


def test_with_zvalue_locality(spark):
    # neighbors in (x, y) get close z-values: the curve preserves locality
    rows = [(i, float(i % 32), float(i // 32)) for i in range(1024)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    z = {
        (r["x"], r["y"]): r["_zval"]
        for r in with_zvalue(df, ["x", "y"], bits=5).collect()
    }
    assert len(set(z.values())) == len(z)  # distinct cells -> distinct z


def _files_touching_box(path, x_col, x_lo, x_hi, y_col, y_lo, y_hi):
    touched = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        fx_lo = min(
            md.row_group(i).column(_col_idx(md, x_col)).statistics.min
            for i in range(md.num_row_groups)
        )
        fx_hi = max(
            md.row_group(i).column(_col_idx(md, x_col)).statistics.max
            for i in range(md.num_row_groups)
        )
        fy_lo = min(
            md.row_group(i).column(_col_idx(md, y_col)).statistics.min
            for i in range(md.num_row_groups)
        )
        fy_hi = max(
            md.row_group(i).column(_col_idx(md, y_col)).statistics.max
            for i in range(md.num_row_groups)
        )
        if fx_lo <= x_hi and fx_hi >= x_lo and fy_lo <= y_hi and fy_hi >= y_lo:
            touched += 1
    return touched


def _col_idx(md, name):
    sch = md.schema
    for i in range(len(sch)):
        if sch.column(i).name == name:
            return i
    raise KeyError(name)


def test_zorder_prunes_boxes_better_than_linear_sort(spark, tmp_path):
    # uniform 64x64 grid; box query selects a small square in the middle
    rows = [(x * 64 + y, x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["x", "y"], bits=6, num_files=16)

    lpath = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, F.col("x"), F.col("y"))
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # the payoff dimension: a predicate on y ONLY. The linear layout
    # sorts by x first, so every file spans the full y range and no file
    # prunes; z-order gives y its own interleaved bits, so a y band maps
    # to a bounded set of curve segments.
    z_touch = _files_touching_box(zpath, "x", 0, 63, "y", 0, 7)
    l_touch = _files_touching_box(lpath, "x", 0, 63, "y", 0, 7)
    assert l_touch == 16  # leading-column sort cannot prune y
    assert z_touch < l_touch
    # on the leading column both layouts prune fine
    zx = _files_touching_box(zpath, "x", 0, 7, "y", 0, 63)
    lx = _files_touching_box(lpath, "x", 0, 7, "y", 0, 63)
    assert lx <= 4 and zx <= 8

    # correctness: the clustered copy still contains every row
    assert spark.read.parquet(zpath).count() == 64 * 64
