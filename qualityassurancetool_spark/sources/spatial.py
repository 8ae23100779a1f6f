"""Spatial sources: point-in-polygon region lookup (reference J5 —
``intersect_df_region`` / ``get_bool_natural_earth_land``,
``src/main.py:528-533,577-592``) and raster nearest-cell lookup
(reference J6 — ``get_bool_depth_above_treshold`` over the ETOPO grid,
``src/main.py:561-568,595-608``).

Scale design: polygon sets and raster grids are **driver-side small, fact
table huge** — so both are broadcast to executors once and evaluated
inside Arrow-batched ``mapInPandas`` kernels; the observations table never
shuffles.  A bounding-box prefilter skips polygons that cannot contain a
batch's points.  ``shapely`` is used when importable (prepared geometries);
otherwise a vectorized numpy ray-casting kernel — identical results for
simple polygons — keeps the container dependency-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # optional fast path; not present in this container
    import shapely  # noqa: F401

    _HAVE_SHAPELY = True
except Exception:  # pragma: no cover
    _HAVE_SHAPELY = False

# polygon set: list of (region_name, vertices[(lon, lat), ...]); first
# matching polygon wins (callers order by priority)
Polygons = list[tuple[str, list[tuple[float, float]]]]


def _ray_cast(lons: np.ndarray, lats: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: True where point strictly inside.
    ``verts`` is (n, 2) lon/lat, closed or open ring."""
    x, y = lons, lats
    inside = np.zeros(len(x), dtype=bool)
    v = verts
    if not np.array_equal(v[0], v[-1]):
        v = np.vstack([v, v[:1]])
    for i in range(len(v) - 1):
        x1, y1 = v[i]
        x2, y2 = v[i + 1]
        crosses = (y1 > y) != (y2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses & (x < xint)
    return inside


def region_expr(
    polygons: Polygons, lat_col: str = "lat", lon_col: str = "long"
):
    """Pure-Column point-in-polygon labeling: the same even-odd ray cast
    as the numpy kernel, folded over a literal edge array per polygon
    (bbox prefilter short-circuits).  First matching polygon wins.

    Identical arithmetic to :func:`_ray_cast` (IEEE doubles, same op
    order), so the two paths are interchangeable — pinned by a parity
    test.  Right-shaped for SMALL polygon sets: the whole lookup stays
    inside whole-stage codegen, no Arrow round-trip of the fact table.
    For coastline-scale vertex counts the broadcast kernel wins (the
    literal edge array would bloat every task's plan) —
    :func:`assign_region` dispatches on total vertex count.
    """
    from pyspark.sql import functions as F

    x = F.col(lon_col)
    y = F.col(lat_col)
    out = F.lit(None).cast("string")
    # build the WHEN chain back-to-front so the FIRST polygon wins
    for name, verts in reversed(polygons):
        v = np.asarray(verts, dtype=np.float64)
        if not np.array_equal(v[0], v[-1]):
            v = np.vstack([v, v[:1]])
        edges = F.array(
            *[
                F.struct(
                    F.lit(float(v[i][0])).alias("x1"),
                    F.lit(float(v[i][1])).alias("y1"),
                    F.lit(float(v[i + 1][0])).alias("x2"),
                    F.lit(float(v[i + 1][1])).alias("y2"),
                )
                for i in range(len(v) - 1)
            ]
        )

        def crossing(e):
            crosses = (e["y1"] > y) != (e["y2"] > y)
            xint = e["x1"] + (y - e["y1"]) * (e["x2"] - e["x1"]) / (
                e["y2"] - e["y1"]
            )
            # y1 == y2 ⇒ crosses is false and false & null = false, so the
            # div-by-zero null never reaches the accumulator
            return crosses & (x < xint)

        inside = F.aggregate(
            edges, F.lit(False), lambda acc, e: acc != crossing(e)
        )
        x0, x1_, y0, y1_ = (
            float(v[:, 0].min()),
            float(v[:, 0].max()),
            float(v[:, 1].min()),
            float(v[:, 1].max()),
        )
        bbox = (x >= x0) & (x <= x1_) & (y >= y0) & (y <= y1_)
        out = F.when(bbox & inside, F.lit(name)).otherwise(out)
    return out


# polygon sets with at most this many total vertices run as pure Column
# expressions; larger sets use the broadcast numpy kernel.  Measured
# (docs/SCALE.md round-9 region rehearsal, 1 M points): per-row Column
# cost grows LINEARLY with total vertices (the codegen'd edge fold has
# no bbox short-circuit — 1.0 s at 32 verts, 14 s at 4,096), while the
# kernel stays flat (~0.5 s) behind one Arrow toll; the column path
# only wins on frames small enough that Python worker startup
# dominates, and its real virtue is staying inside whole-stage codegen
# (no mapInPandas barrier mid-plan) for config-literal sets like the
# reference's MAINLAND polygons.  128 keeps those on the codegen path
# at <2x the kernel's fact-scale cost; anything bigger dispatches to
# the kernel.
REGION_EXPR_MAX_VERTICES = 128


def assign_region(
    df: DataFrame,
    polygons: Polygons,
    lat_col: str = "lat",
    lon_col: str = "long",
    out_col: str = "region",
    strategy: str = "auto",
) -> DataFrame:
    """Label each point with the first polygon containing it (else null).

    Two physical strategies, same results (parity-tested):

    - small polygon sets (≤ ``REGION_EXPR_MAX_VERTICES`` total vertices)
      → :func:`region_expr`, pure whole-stage-codegen Columns — no
      Python, no Arrow round-trip of the fact table;
    - larger sets → broadcast numpy ray-cast kernel over Arrow batches
      (per-polygon bbox prefilter bounds the work per batch).

    ``strategy`` pins a path explicitly (``"column"`` / ``"kernel"``;
    default ``"auto"`` dispatches on total vertex count).  The measured
    crossover behind the auto threshold is in ``docs/SCALE.md`` —
    per-row Column cost grows linearly with TOTAL vertex count (no
    bbox short-circuit survives codegen), while the kernel pays a flat
    Arrow toll then scales with the bbox-filtered vertex subset.
    """
    if strategy not in ("auto", "column", "kernel"):
        raise ValueError(f"unknown strategy {strategy!r}")
    n_vertices = sum(len(verts) for _, verts in polygons)
    if strategy == "column" or (
        strategy == "auto" and n_vertices <= REGION_EXPR_MAX_VERTICES
    ):
        return df.withColumn(
            out_col, region_expr(polygons, lat_col, lon_col)
        )
    polys = [
        (name, np.asarray(verts, dtype=np.float64)) for name, verts in polygons
    ]
    bboxes = [
        (v[:, 0].min(), v[:, 0].max(), v[:, 1].min(), v[:, 1].max())
        for _, v in polys
    ]
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType(), True)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lons = pdf[lon_col].to_numpy(dtype=np.float64)
            lats = pdf[lat_col].to_numpy(dtype=np.float64)
            region = np.full(len(pdf), None, dtype=object)
            unset = np.ones(len(pdf), dtype=bool)
            for (name, verts), (x0, x1, y0, y1) in zip(polys, bboxes):
                cand = (
                    unset
                    & (lons >= x0)
                    & (lons <= x1)
                    & (lats >= y0)
                    & (lats <= y1)
                )
                if not cand.any():
                    continue
                hit = np.zeros(len(pdf), dtype=bool)
                hit[cand] = _ray_cast(lons[cand], lats[cand], verts)
                region[hit] = name
                unset &= ~hit
            out = pdf.copy()
            out[out_col] = region
            yield out

    return df.mapInPandas(kernel, schema=schema)


class RasterGrid:
    """Uniform lat/lon grid with values, broadcast-friendly (plain numpy).

    Nearest-cell index = ``floor((coord - origin)/step + 0.5)`` clamped to
    the grid — the ``find_nearest_idx`` analog
    (``src/aums_data_request.py:204-209``), exact and engine-portable.
    """

    def __init__(
        self,
        values: np.ndarray,  # shape (n_lat, n_lon)
        lat0: float,
        lon0: float,
        dlat: float,
        dlon: float,
    ):
        self.values = np.asarray(values, dtype=np.float64)
        self.lat0, self.lon0 = float(lat0), float(lon0)
        self.dlat, self.dlon = float(dlat), float(dlon)

    def lookup(self, lats: np.ndarray, lons: np.ndarray) -> np.ndarray:
        i = np.floor((lats - self.lat0) / self.dlat + 0.5).astype(np.int64)
        j = np.floor((lons - self.lon0) / self.dlon + 0.5).astype(np.int64)
        i = np.clip(i, 0, self.values.shape[0] - 1)
        j = np.clip(j, 0, self.values.shape[1] - 1)
        return self.values[i, j]


# grids with at most this many cells ride the plan as ONE flattened
# array literal and index with element_at — pure whole-stage-codegen, no
# Python stage.  The threshold is small because element_at on an array
# LITERAL costs linear-in-array-size PER ROW (measured: 2500 cells →
# ~11 µs/row, 34x the 64-cell cost — the codegen'd literal is
# re-materialized per access), so beyond a few hundred cells the
# Arrow-batched numpy kernel wins (0.36 s vs 1.23 s at 2500 cells x
# 100k rows) despite its fixed worker cost.  Unlike region_expr and the
# IVF centroid literals — where every row must touch every element
# anyway — a raster lookup reads ONE cell, so the literal's linear cost
# is pure waste.
RASTER_EXPR_MAX_CELLS = 512


def raster_expr(
    grid: RasterGrid, lat_col: str = "lat", lon_col: str = "long"
) -> Column:
    """Nearest-cell raster value as a pure Column expression.

    Identical IEEE-double arithmetic to :meth:`RasterGrid.lookup`
    (``floor((coord-origin)/step + 0.5)``, clamped), so the two physical
    strategies are value-exact twins (parity-tested)."""
    from pyspark.sql import functions as F

    n_lat, n_lon = grid.values.shape
    i = F.floor((F.col(lat_col) - grid.lat0) / grid.dlat + 0.5).cast("long")
    j = F.floor((F.col(lon_col) - grid.lon0) / grid.dlon + 0.5).cast("long")
    i = F.least(F.greatest(i, F.lit(0)), F.lit(int(n_lat - 1)))
    j = F.least(F.greatest(j, F.lit(0)), F.lit(int(n_lon - 1)))
    flat = [float(v) for v in grid.values.ravel()]
    return F.element_at(F.lit(flat), (i * n_lon + j + 1).cast("int"))


def raster_lookup(
    df: DataFrame,
    grid: RasterGrid,
    lat_col: str = "lat",
    lon_col: str = "long",
    out_col: str = "elevation",
) -> DataFrame:
    """Attach the nearest-cell raster value per point.

    Small grids (≤ ``RASTER_EXPR_MAX_CELLS``) → :func:`raster_expr`,
    pure Columns; larger (real ETOPO-scale) → broadcast numpy kernel
    over Arrow batches (the fact table never moves either way)."""
    if grid.values.size <= RASTER_EXPR_MAX_CELLS:
        return df.withColumn(out_col, raster_expr(grid, lat_col, lon_col))
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = grid.lookup(
                pdf[lat_col].to_numpy(dtype=np.float64),
                pdf[lon_col].to_numpy(dtype=np.float64),
            )
            yield out

    return df.mapInPandas(kernel, schema=schema)
