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


def _ray_cast(
    lons: np.ndarray, lats: np.ndarray, verts: np.ndarray,
    edge_chunk: int = 512,
) -> np.ndarray:
    """Vectorized even-odd ray casting: True where point strictly inside.
    ``verts`` is (n, 2) lon/lat, closed or open ring.

    Edges are processed in CHUNKED 2-D broadcasts, not a per-edge
    Python loop: at coastline vertex counts the loop's ~interpreter
    cost per edge is a fixed floor PER BATCH that dwarfs the per-point
    arithmetic (measured round 10: the 540k-vertex kernel spent its
    wall in 540k Python iterations per Arrow batch, so filtering
    points — the land-mask fast path — saved nothing).  XOR over edges
    is the parity of the crossing count, which is order-independent,
    so the chunked sum-mod-2 is bit-identical to the sequential fold;
    per-chunk scratch is (edge_chunk × points) doubles, ~40 MB at the
    default Arrow batch size."""
    x, y = lons, lats
    v = verts
    if not np.array_equal(v[0], v[-1]):
        v = np.vstack([v, v[:1]])
    x1, y1 = v[:-1, 0], v[:-1, 1]
    x2, y2 = v[1:, 0], v[1:, 1]
    count = np.zeros(len(x), dtype=np.int64)
    for c0 in range(0, len(x1), edge_chunk):
        sl = slice(c0, c0 + edge_chunk)
        a1 = y1[sl][:, None]
        crosses = (a1 > y) != (y2[sl][:, None] > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[sl][:, None] + (y - a1) * (
                (x2[sl] - x1[sl])[:, None]
            ) / ((y2[sl] - y1[sl])[:, None])
        count += (crosses & (x < xint)).sum(axis=0)
    return (count % 2).astype(bool)


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
            out = pdf.copy()
            out[out_col] = _classify_points(lons, lats, polys, bboxes)
            yield out

    return df.mapInPandas(kernel, schema=schema)


def _classify_points(lons, lats, polys, bboxes) -> np.ndarray:
    """First-match point-in-polygon labels (object array of names/None)
    — the exact ray-cast loop shared by the broadcast kernel and the
    mask path's boundary-cell fallback (one implementation, one
    arithmetic)."""
    region = np.full(len(lons), None, dtype=object)
    unset = np.ones(len(lons), dtype=bool)
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
        hit = np.zeros(len(lons), dtype=bool)
        hit[cand] = _ray_cast(lons[cand], lats[cand], verts)
        region[hit] = name
        unset &= ~hit
    return region


class RegionMask:
    """Rasterized land mask: a cell grid over the polygon set's hull
    where every NON-boundary cell is CONCLUSIVE — no polygon edge
    crosses it, so polygon membership (of every polygon, hence the
    first-match label) is constant over the whole cell and equals its
    center's label.  Cells any edge touches are marked ``BOUNDARY`` and
    points there fall back to the exact ray cast, so the mask path is
    value-EXACT everywhere, not a tolerance trade — the coastline-error
    contract is "boundary cells pay the kernel price", and the boundary
    fraction ∝ coastline length × cell size.

    Built ONCE driver-side (:func:`build_region_mask` — scanline parity
    fill with the ray cast's own crossing arithmetic, plus a
    conservative edge walk for the boundary set) and broadcast like the
    raster grids: int16 labels, ~2 bytes/cell.

    Reference anchor: the 100 TB accelerator named for the reference's
    ``get_bool_natural_earth_land`` hot path
    (``src/main.py:577-592``); docs/SCALE.md prices the bare kernel at
    ~7,000 core-hours per 10^12 points — the mask shifts the bulk to a
    ~30 ns array lookup."""

    BOUNDARY = -2
    NONE = -1

    __slots__ = ("labels", "names", "lat0", "lon0", "step")

    def __init__(self, labels, names, lat0, lon0, step):
        self.labels = labels          # (n_lat, n_lon) int16
        self.names = list(names)
        self.lat0, self.lon0 = float(lat0), float(lon0)
        self.step = float(step)


def build_region_mask(
    polygons: Polygons, cell_deg: float = 0.25,
    max_cells: int = 64_000_000,
) -> RegionMask:
    """Rasterize a polygon set into a :class:`RegionMask` (driver-side,
    one-time, ~O(vertices × edge-length/cell + rows × crossings)).

    Boundary marking is CONSERVATIVE (samples each edge at step/2 and
    marks the 3×3 cell neighborhood): extra boundary cells only send
    more points to the exact fallback, never produce a wrong label.
    Interior fill is a per-row scanline parity count using the ray
    cast's own x-intersection formula, evaluated at cell centers —
    bit-identical membership to :func:`_ray_cast` at those centers."""
    step = float(cell_deg)
    if step <= 0:
        raise ValueError(f"cell_deg must be > 0, got {cell_deg}")
    polys = [
        (name, np.asarray(verts, dtype=np.float64))
        for name, verts in polygons
    ]
    if not polys:
        raise ValueError("empty polygon set")
    lo_x = min(v[:, 0].min() for _, v in polys) - step
    hi_x = max(v[:, 0].max() for _, v in polys) + step
    lo_y = min(v[:, 1].min() for _, v in polys) - step
    hi_y = max(v[:, 1].max() for _, v in polys) + step
    n_lon = int(np.ceil((hi_x - lo_x) / step)) + 1
    n_lat = int(np.ceil((hi_y - lo_y) / step)) + 1
    if n_lat * n_lon > max_cells:
        raise ValueError(
            f"mask would need {n_lat * n_lon} cells at cell_deg="
            f"{cell_deg} (max {max_cells}); raise cell_deg"
        )
    if len(polys) >= 2**15 - 2:
        raise ValueError("int16 mask supports < 32766 polygons")
    labels = np.full((n_lat, n_lon), RegionMask.NONE, dtype=np.int16)

    # interior fill, REVERSED priority so the first polygon wins by
    # overwriting: scanline parity at cell-center latitudes
    centers_x = lo_x + (np.arange(n_lon) + 0.5) * step
    centers_y = lo_y + (np.arange(n_lat) + 0.5) * step
    for pi in range(len(polys) - 1, -1, -1):
        _name, v = polys[pi]
        if not np.array_equal(v[0], v[-1]):
            v = np.vstack([v, v[:1]])
        x1, y1 = v[:-1, 0], v[:-1, 1]
        x2, y2 = v[1:, 0], v[1:, 1]
        i_lo = max(int(np.floor((v[:, 1].min() - lo_y) / step)), 0)
        i_hi = min(int(np.floor((v[:, 1].max() - lo_y) / step)), n_lat - 1)
        j_lo = max(int(np.floor((v[:, 0].min() - lo_x) / step)), 0)
        j_hi = min(int(np.floor((v[:, 0].max() - lo_x) / step)), n_lon - 1)
        for i in range(i_lo, i_hi + 1):
            y = centers_y[i]
            crosses = (y1 > y) != (y2 > y)
            if not crosses.any():
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1[crosses] + (y - y1[crosses]) * (
                    x2[crosses] - x1[crosses]
                ) / (y2[crosses] - y1[crosses])
            # inside iff an ODD number of crossings lie to the RIGHT —
            # the ray cast's x < xint predicate, counted via sorted
            # positions
            xs = np.sort(xint)
            row_x = centers_x[j_lo : j_hi + 1]
            n_right = len(xs) - np.searchsorted(xs, row_x, side="right")
            inside = (n_right % 2).astype(bool)
            seg = labels[i, j_lo : j_hi + 1]
            seg[inside] = pi
            labels[i, j_lo : j_hi + 1] = seg

    # conservative boundary walk: sample every edge at step/2, mark the
    # 3x3 neighborhood of each sample's cell.  Vectorized over ALL
    # edges at once, iterating the SAMPLE index (a per-edge Python loop
    # is a 540k-iteration interpreter floor — the same trap the ray
    # cast had); edges shorter than their sample budget just repeat
    # their endpoint, so the sample set matches the per-edge linspace.
    ae, be = [], []
    for _name, v in polys:
        if not np.array_equal(v[0], v[-1]):
            v = np.vstack([v, v[:1]])
        ae.append(v[:-1])
        be.append(v[1:])
    a = np.concatenate(ae)
    b = np.concatenate(be)
    if not len(a):  # degenerate set (single-vertex "polygons"): no
        return RegionMask(  # edges, no interiors — an all-NONE mask
            labels, [name for name, _ in polys], lo_y, lo_x, step
        )
    seg_len = np.hypot(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1])
    n_samp = np.maximum((seg_len / (step / 2)).astype(np.int64) + 2, 2)
    denom = (n_samp - 1).astype(np.float64)
    for k in range(int(n_samp.max())):
        # only edges that still HAVE a k-th sample: without the mask,
        # one long edge (a hull ring at a fine cell size) makes every
        # iteration touch all edges — O(edges × max_samples) instead
        # of O(Σ samples) (review finding, round 10)
        act = n_samp > k
        if k > 0 and not act.any():
            break
        aa, bb = a[act], b[act]
        t = k / denom[act]
        sx = aa[:, 0] + t * (bb[:, 0] - aa[:, 0])
        sy = aa[:, 1] + t * (bb[:, 1] - aa[:, 1])
        ci = np.floor((sy - lo_y) / step).astype(np.int64)
        cj = np.floor((sx - lo_x) / step).astype(np.int64)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                ii = np.clip(ci + di, 0, n_lat - 1)
                jj = np.clip(cj + dj, 0, n_lon - 1)
                labels[ii, jj] = RegionMask.BOUNDARY

    return RegionMask(
        labels, [name for name, _ in polys], lo_y, lo_x, step
    )


def assign_region_masked(
    df: DataFrame,
    polygons: Polygons,
    mask: RegionMask | None = None,
    cell_deg: float = 0.25,
    lat_col: str = "lat",
    lon_col: str = "long",
    out_col: str = "region",
) -> DataFrame:
    """:func:`assign_region` behind a rasterized land mask: conclusive
    cells label with one int16 array lookup; only boundary-cell points
    (∝ coastline × cell size) pay the exact ray cast.  Results are
    value-IDENTICAL to :func:`assign_region` (parity-tested — the
    fallback runs the same `_classify_points`).  Points outside the
    mask grid are outside every polygon's padded bbox, which is exactly
    the kernel's bbox-prefilter miss → None.

    Pass a prebuilt ``mask`` to amortize rasterization across calls
    (the 100 TB shape: build once, broadcast ~2 bytes/cell with the
    closure, reuse every batch)."""
    if mask is None:
        mask = build_region_mask(polygons, cell_deg)
    polys = [
        (name, np.asarray(verts, dtype=np.float64))
        for name, verts in polygons
    ]
    if [n for n, _ in polys] != mask.names:
        raise ValueError(
            "mask was built for a different polygon set (names differ)"
        )
    bboxes = [
        (v[:, 0].min(), v[:, 0].max(), v[:, 1].min(), v[:, 1].max())
        for _, v in polys
    ]
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.StringType(), True)]
    )
    names_arr = np.array(mask.names, dtype=object)
    grid, lat0, lon0, step = mask.labels, mask.lat0, mask.lon0, mask.step
    n_lat, n_lon = grid.shape

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lons = pdf[lon_col].to_numpy(dtype=np.float64)
            lats = pdf[lat_col].to_numpy(dtype=np.float64)
            region = np.full(len(pdf), None, dtype=object)
            finite = np.isfinite(lons) & np.isfinite(lats)
            i = np.full(len(pdf), -1, dtype=np.int64)
            j = np.full(len(pdf), -1, dtype=np.int64)
            i[finite] = np.floor((lats[finite] - lat0) / step).astype(
                np.int64
            )
            j[finite] = np.floor((lons[finite] - lon0) / step).astype(
                np.int64
            )
            in_grid = (
                finite & (i >= 0) & (i < n_lat) & (j >= 0) & (j < n_lon)
            )
            lab = np.full(len(pdf), RegionMask.NONE, dtype=np.int16)
            lab[in_grid] = grid[i[in_grid], j[in_grid]]
            hit = lab >= 0
            region[hit] = names_arr[lab[hit]]
            edge = lab == RegionMask.BOUNDARY
            if edge.any():
                region[edge] = _classify_points(
                    lons[edge], lats[edge], polys, bboxes
                )
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
