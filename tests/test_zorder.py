"""Z-order layout keys (functions/zorder, sources/layout.write_zordered).
Cross-engine parity: tools/extra_oracles.py::x_zorder."""

import glob
import random

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.zorder import (
    grid_cell,
    morton_key,
    spread_bits,
    zorder_key,
)


def _py_spread(x: int) -> int:
    out = 0
    for i in range(32):
        out |= ((x >> i) & 1) << (2 * i)
    return out


def _py_morton(x: int, y: int) -> int:
    return _py_spread(x) | (_py_spread(y) << 1)


def test_morton_matches_reference_bitmath(spark):
    rng = random.Random(3)
    cells = [
        (rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16))
        for _ in range(200)
    ] + [(0, 0), (65535, 65535), (1, 0), (0, 1)]
    df = spark.createDataFrame(cells, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y)


def test_grid_cell_clamps_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, -5.0), (1, 0.0), (2, 50.0), (3, 99.999), (4, 150.0), (5, None)],
        ["i", "v"],
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", grid_cell(F.col("v"), 0.0, 100.0, bits=4).alias("c")
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 8, 3: 15, 4: 15, 5: 0}


def test_bits_validation(spark):
    with pytest.raises(ValueError):
        morton_key(F.lit(0), F.lit(0), bits=32)


def test_zordered_layout_shrinks_file_bounding_boxes(spark, tmp_path):
    from qualityassurancetool_spark.sources.layout import write_zordered

    rng = random.Random(11)
    rows = [
        (i, rng.uniform(0.0, 100.0), rng.uniform(0.0, 100.0))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, ["id", "x", "y"])

    naive_dir = str(tmp_path / "naive")
    z_dir = str(tmp_path / "zed")
    # id-ordered baseline: each file sees the full 2-D extent
    df.repartitionByRange(8, "id").write.mode("overwrite").parquet(naive_dir)
    write_zordered(
        df, z_dir, "x", (0.0, 100.0), "y", (0.0, 100.0), n_files=8
    )

    def bbox_area_sum(d):
        total = 0.0
        files = glob.glob(f"{d}/part-*.parquet")
        assert len(files) >= 4
        for f in files:
            s = (
                spark.read.parquet(f)
                .agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y")
                )
                .collect()[0]
            )
            total += (s[1] - s[0]) * (s[3] - s[2])
        return total

    naive_area = bbox_area_sum(naive_dir)
    z_area = bbox_area_sum(z_dir)
    # schema untouched, all rows present
    assert sorted(spark.read.parquet(z_dir).columns) == ["id", "x", "y"]
    assert spark.read.parquet(z_dir).count() == 4000
    # each z file covers a compact rectangle: big locality win
    assert z_area < 0.5 * naive_area
