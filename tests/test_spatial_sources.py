"""Point-in-polygon and raster-lookup kernels (J5/J6): synthetic
geometry with known membership; priority ordering; grid clamping."""

from __future__ import annotations

import numpy as np

from qualityassurancetool_spark.sources.spatial import (
    RasterGrid,
    _ray_cast,
    assign_region,
    raster_lookup,
)

BOX = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
# concave "L" shape: the notch (x>5, y>5) is outside
ELL = [(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0), (5.0, 10.0), (0.0, 10.0)]


def test_ray_cast_box_and_concave():
    lons = np.array([5.0, 15.0, -1.0, 2.0, 7.0])
    lats = np.array([5.0, 5.0, 5.0, 8.0, 8.0])
    assert _ray_cast(lons, lats, np.array(BOX)).tolist() == [
        True, False, False, True, True,
    ]
    # concave: (7,8) sits in the notch -> outside; (2,8) in the leg -> inside
    assert _ray_cast(lons, lats, np.array(ELL)).tolist() == [
        False, False, False, True, False,
    ]


def test_assign_region_priority_first_match_wins(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 7.0, 7.0), (3, 20.0, 20.0)],
        "id bigint, `long` double, lat double",
    )
    # inner box listed first -> wins where both contain the point
    polys = [
        ("INNER", [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0)]),
        ("OUTER", BOX),
    ]
    got = {
        r["id"]: r["region"]
        for r in assign_region(df, polys, lat_col="lat", lon_col="long").collect()
    }
    assert got == {1: "INNER", 2: "OUTER", 3: None}


def test_raster_lookup_nearest_and_clamp(spark):
    vals = np.arange(12, dtype=float).reshape(3, 4)  # v[i][j] = 4i + j
    grid = RasterGrid(vals, lat0=0.0, lon0=0.0, dlat=1.0, dlon=1.0)
    df = spark.createDataFrame(
        [
            (1, 0.1, 0.1),    # cell (0,0) -> 0
            (2, 1.6, 2.4),    # (2,2) -> 10
            (3, -5.0, 9.0),   # clamped to (0,3) -> 3
            (4, 0.49, 0.51),  # rounds to (0,1) -> 1
        ],
        "id bigint, lat double, `long` double",
    )
    got = {
        r["id"]: r["elevation"] for r in raster_lookup(df, grid).collect()
    }
    assert got == {1: 0.0, 2: 10.0, 3: 3.0, 4: 1.0}


def test_region_expr_matches_kernel(spark):
    """The pure-Column ray cast and the numpy kernel are interchangeable
    physical strategies — identical output on a dense grid including a
    concave polygon and priority overlap."""
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.sources.spatial import region_expr

    polys = [
        ("ELL", ELL),
        ("BOX", BOX),
        ("FAR", [(100.0, 100.0), (110.0, 100.0), (110.0, 110.0), (100.0, 110.0)]),
    ]
    pts = [
        (i, -2.0 + (i % 40) * 0.35, -2.0 + (i // 40) * 0.35)
        for i in range(1600)
    ]
    df = spark.createDataFrame(pts, "id bigint, `long` double, lat double")
    via_expr = df.withColumn("region", region_expr(polys)).orderBy("id")
    expr_rows = [r["region"] for r in via_expr.collect()]

    # force the kernel path by inflating the vertex budget check: call the
    # kernel body directly through assign_region with a big synthetic set
    import qualityassurancetool_spark.sources.spatial as sp

    old = sp.REGION_EXPR_MAX_VERTICES
    sp.REGION_EXPR_MAX_VERTICES = 0
    try:
        via_kernel = assign_region(df, polys).orderBy("id")
        kernel_rows = [r["region"] for r in via_kernel.collect()]
    finally:
        sp.REGION_EXPR_MAX_VERTICES = old
    assert expr_rows == kernel_rows
    assert "ELL" in set(expr_rows) and "BOX" in set(expr_rows)


def test_raster_expr_matches_kernel(spark):
    """The pure-Column nearest-cell lookup and the numpy kernel are
    value-exact twins, including edge rounding and clamping."""
    import qualityassurancetool_spark.sources.spatial as sp

    rng = np.random.default_rng(3)
    vals = rng.normal(size=(20, 30)) * 100
    grid = RasterGrid(vals, lat0=-1.0, lon0=2.0, dlat=0.05, dlon=0.07)
    pts = [
        (i, -1.3 + (i % 50) * 0.03, 1.8 + (i // 50) * 0.06)
        for i in range(1500)
    ]
    df = spark.createDataFrame(pts, "id bigint, lat double, `long` double")
    via_expr = {
        r["id"]: r["elevation"] for r in raster_lookup(df, grid).collect()
    }
    old = sp.RASTER_EXPR_MAX_CELLS
    sp.RASTER_EXPR_MAX_CELLS = 0
    try:
        via_kernel = {
            r["id"]: r["elevation"] for r in raster_lookup(df, grid).collect()
        }
    finally:
        sp.RASTER_EXPR_MAX_CELLS = old
    assert via_expr == via_kernel  # exact doubles, no tolerance


def test_region_mask_parity_with_kernel(spark):
    """The rasterized land-mask path (round-10: VERDICT r9 item 4) is
    value-IDENTICAL to the exact kernel on a dense grid sweeping cell
    interiors, coastline-adjacent points, polygon overlap, and points
    outside the mask grid — conclusive cells label by lookup, boundary
    cells fall back to the same ray cast."""
    import math
    import random

    from qualityassurancetool_spark.sources.spatial import (
        RegionMask,
        assign_region,
        assign_region_masked,
        build_region_mask,
    )

    rng = random.Random(7)

    def star(cx, cy, n, base_r):
        r, out = base_r, []
        for i in range(n):
            a = 2.0 * math.pi * i / n
            r = min(
                max(r + rng.uniform(-0.15, 0.15) * base_r, 0.3 * base_r),
                1.7 * base_r,
            )
            out.append((cx + r * math.cos(a), cy + 0.5 * r * math.sin(a)))
        return out

    polys = [
        ("big", star(0.0, 0.0, 400, 8.0)),
        ("overlap", star(5.0, 1.0, 120, 4.0)),
        ("isle", star(14.0, -6.0, 40, 0.8)),
    ]
    # dense sweep + jittered coastline-hugging points + far-outside rows
    pts = [
        (i, -14.0 + (i % 80) * 0.4, -12.0 + (i // 80) * 0.35)
        for i in range(4000)
    ]
    pts += [
        (10_000 + i, rng.uniform(-13.0, 17.0), rng.uniform(-11.0, 9.0))
        for i in range(3000)
    ]
    pts += [(20_000, 500.0, 500.0), (20_001, float("nan"), 0.0)]
    df = spark.createDataFrame(pts, "id bigint, `long` double, lat double")

    mask = build_region_mask(polys, cell_deg=0.5)
    assert (mask.labels == RegionMask.BOUNDARY).any()
    assert (mask.labels >= 0).any()  # real conclusive interiors exist

    got = {
        r["id"]: r["region"]
        for r in assign_region_masked(df, polys, mask=mask).collect()
    }
    want = {
        r["id"]: r["region"]
        for r in assign_region(df, polys, strategy="kernel").collect()
    }
    assert got == want
    assert want[20_000] is None and want[20_001] is None
    assert len({v for v in want.values() if v}) == 3

    # the conclusive fast path must actually carry most points (the
    # 100 TB claim: boundary fraction ~ coastline x cell size)
    import numpy as np

    lons = np.array([p[1] for p in pts])
    lats = np.array([p[2] for p in pts])
    fin = np.isfinite(lons) & np.isfinite(lats)
    i = np.floor((lats[fin] - mask.lat0) / mask.step).astype(int)
    j = np.floor((lons[fin] - mask.lon0) / mask.step).astype(int)
    ok = (
        (i >= 0)
        & (i < mask.labels.shape[0])
        & (j >= 0)
        & (j < mask.labels.shape[1])
    )
    frac_edge = (
        mask.labels[i[ok], j[ok]] == RegionMask.BOUNDARY
    ).mean()
    assert frac_edge < 0.5

    # a mask built for a different polygon set is refused
    import pytest

    with pytest.raises(ValueError, match="different polygon set"):
        assign_region_masked(df, polys[:2], mask=mask)


def test_region_mask_degenerate_single_vertex_polygon(spark):
    """A zero-edge 'polygon' (single repeated vertex) rasterizes to an
    all-NONE mask instead of crashing, and the masked path still
    matches the kernel (both label nothing)."""
    from qualityassurancetool_spark.sources.spatial import (
        RegionMask,
        assign_region,
        assign_region_masked,
        build_region_mask,
    )

    polys = [("pt", [(1.0, 1.0)])]
    mask = build_region_mask(polys, cell_deg=0.5)
    assert (mask.labels == RegionMask.NONE).all()
    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (1, 5.0, 5.0)],
        "id bigint, `long` double, lat double",
    )
    got = {r["id"]: r["region"]
           for r in assign_region_masked(df, polys, mask=mask).collect()}
    want = {r["id"]: r["region"]
            for r in assign_region(df, polys, strategy="kernel").collect()}
    assert got == want == {0: None, 1: None}
