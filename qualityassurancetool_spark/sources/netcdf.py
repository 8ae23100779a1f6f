"""Pure-stdlib NetCDF *classic* reader (CDF-1 / CDF-2) feeding
:class:`~qualityassurancetool_spark.sources.spatial.RasterGrid`.

Closes the S7 gap (reference downloads + reads the ETOPO bathymetry grid,
``/root/reference/src/main.py:560,595`` via ``get_elev_netcdf``): the
reference consumes a ``.nc`` raster through xarray; this module parses the
on-disk classic format directly — same dependency-free approach as the
ESRI ``.shp``/``.dbf`` parser in ``polygon_files.py`` — so the raster
source works in any executor image without netCDF4/xarray installed.

Format reference: the NetCDF classic file format specification (public,
Unidata).  Header = magic ``CDF\\x01``/``CDF\\x02`` + numrecs + dim list +
global attributes + variable list; data regions are big-endian row-major
slabs at per-variable ``begin`` offsets (64-bit offsets in CDF-2).

Scale shape: the grid file is read ONCE on the driver (rasters that fit a
broadcast — the ETOPO 1-arcmin global grid is ~450 MB as float32, the
reference's cropped window far smaller), then broadcast through
``raster_lookup`` — the fact table never moves.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .spatial import RasterGrid

_ABSENT = 0
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type → (numpy dtype (big-endian), element size)
_NC_TYPES = {
    1: (np.dtype(">i1"), 1),  # NC_BYTE
    2: (np.dtype("S1"), 1),  # NC_CHAR
    3: (np.dtype(">i2"), 2),  # NC_SHORT
    4: (np.dtype(">i4"), 4),  # NC_INT
    5: (np.dtype(">f4"), 4),  # NC_FLOAT
    6: (np.dtype(">f8"), 8),  # NC_DOUBLE
}


@dataclass
class NCVariable:
    name: str
    dims: tuple[str, ...]
    shape: tuple[int, ...]
    nc_type: int
    attrs: dict
    data: np.ndarray  # native-endian, row-major

    def scaled(self) -> np.ndarray:
        """Apply CF ``scale_factor``/``add_offset`` and map
        ``_FillValue``/``missing_value`` to NaN (float output)."""
        a = self.data
        fill = self.attrs.get("_FillValue", self.attrs.get("missing_value"))
        scale = self.attrs.get("scale_factor")
        offset = self.attrs.get("add_offset")
        out = a.astype(np.float64)
        if fill is not None:
            f = np.asarray(fill).ravel()
            if len(f):
                out[a == np.asarray(fill).ravel()[0]] = np.nan
        if scale is not None:
            out = out * float(np.asarray(scale).ravel()[0])
        if offset is not None:
            out = out + float(np.asarray(offset).ravel()[0])
        return out


@dataclass
class NCFile:
    dimensions: dict[str, int]
    attrs: dict
    variables: dict[str, NCVariable] = field(default_factory=dict)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF file")
        self.pos += n
        return b

    def u4(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def u8(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]

    def name(self) -> str:
        n = self.u4()
        s = self.take(n).decode("utf-8")
        pad = (4 - n % 4) % 4
        self.take(pad)
        return s

    def values(self, nc_type: int, nelems: int):
        dt, size = _NC_TYPES[nc_type]
        raw = self.take(nelems * size)
        pad = (4 - (nelems * size) % 4) % 4
        self.take(pad)
        if nc_type == 2:  # NC_CHAR attribute → python str
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt).astype(dt.newbyteorder("="))
        return arr

    def att_list(self) -> dict:
        tag = self.u4()
        n = self.u4()
        if tag == _ABSENT:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag {tag:#x}")
        out = {}
        for _ in range(n):
            nm = self.name()
            t = self.u4()
            ne = self.u4()
            out[nm] = self.values(t, ne)
        return out


def read_netcdf_classic(path: str) -> NCFile:
    """Parse a CDF-1 or CDF-2 file fully into memory.

    Supports all six classic types, fixed-size AND record variables
    (record slabs are de-interleaved into full arrays).  No HDF5-backed
    NetCDF-4 — the reference's ETOPO grid ships as classic."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    magic = r.take(3)
    if magic != b"CDF":
        raise ValueError("not a NetCDF classic file (bad magic)")
    version = r.take(1)[0]
    if version not in (1, 2):
        raise ValueError(f"unsupported NetCDF version byte {version}")
    offset_word = r.u8 if version == 2 else r.u4
    numrecs = r.u4()  # 0xFFFFFFFF = STREAMING; treat as 0 records known

    # dimensions (order matters: vars refer to them by index)
    tag = r.u4()
    ndims = r.u4()
    dim_names: list[str] = []
    dim_sizes: list[int] = []
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            dim_names.append(r.name())
            dim_sizes.append(r.u4())
    elif tag != _ABSENT:
        raise ValueError(f"bad dimension-list tag {tag:#x}")
    rec_dim = dim_sizes.index(0) if 0 in dim_sizes else None

    gatts = r.att_list()

    tag = r.u4()
    nvars = r.u4()
    if tag not in (_NC_VARIABLE, _ABSENT):
        raise ValueError(f"bad variable-list tag {tag:#x}")

    nc = NCFile(
        dimensions={
            n: (numrecs if s == 0 and numrecs != 0xFFFFFFFF else s)
            for n, s in zip(dim_names, dim_sizes)
        },
        attrs=gatts,
    )
    if tag == _ABSENT:
        return nc

    # pass 1: headers
    headers = []
    for _ in range(nvars):
        nm = r.name()
        nd = r.u4()
        dimids = [r.u4() for _ in range(nd)]
        vatts = r.att_list()
        t = r.u4()
        vsize = r.u4()  # padded size (one record's worth for record vars)
        begin = offset_word()
        headers.append((nm, dimids, vatts, t, vsize, begin))

    rec_vars = [h for h in headers if h[1] and h[1][0] == rec_dim]
    # recsize = sum of per-record padded vsizes; a single record var is
    # NOT padded per the spec
    recsize = sum(h[4] for h in rec_vars)

    for nm, dimids, vatts, t, vsize, begin in headers:
        dt, elem = _NC_TYPES[t]
        is_rec = bool(dimids) and dimids[0] == rec_dim
        shape_fixed = tuple(
            dim_sizes[d] for d in (dimids[1:] if is_rec else dimids)
        )
        n_fixed = int(np.prod(shape_fixed, dtype=np.int64)) if shape_fixed else 1
        if not is_rec:
            raw = buf[begin : begin + n_fixed * elem]
            arr = np.frombuffer(raw, dtype=dt)[:n_fixed].reshape(shape_fixed)
        else:
            nrec = 0 if numrecs == 0xFFFFFFFF else numrecs
            step = vsize if len(rec_vars) > 1 else n_fixed * elem
            if len(rec_vars) == 1:
                # single record variable: records are contiguous
                raw = buf[begin : begin + nrec * n_fixed * elem]
                arr = np.frombuffer(raw, dtype=dt)[: nrec * n_fixed]
            else:
                parts = []
                for k in range(nrec):
                    off = begin + k * recsize
                    parts.append(
                        np.frombuffer(
                            buf[off : off + n_fixed * elem], dtype=dt
                        )[:n_fixed]
                    )
                arr = (
                    np.concatenate(parts)
                    if parts
                    else np.empty(0, dtype=dt)
                )
            arr = arr.reshape((nrec,) + shape_fixed)
            del step
        arr = arr.astype(dt.newbyteorder("=")) if t != 2 else arr
        dims = tuple(dim_names[d] for d in dimids)
        nc.variables[nm] = NCVariable(
            name=nm,
            dims=dims,
            shape=arr.shape,
            nc_type=t,
            attrs=vatts,
            data=arr,
        )
    return nc


def _uniform_step(coord: np.ndarray, what: str) -> float:
    if len(coord) < 2:
        raise ValueError(f"{what} axis needs >= 2 points")
    steps = np.diff(coord.astype(np.float64))
    step = float(steps[0])
    if step == 0 or not np.allclose(steps, step, rtol=1e-6, atol=0):
        raise ValueError(f"{what} axis is not uniformly spaced")
    return step


def raster_grid_from_netcdf(
    path: str,
    var: str,
    lat_var: str | None = None,
    lon_var: str | None = None,
) -> RasterGrid:
    """Read a 2-D (lat, lon) variable from a classic ``.nc`` file into a
    :class:`RasterGrid` (CF scale/offset/fill applied).

    Coordinate variables default to the data variable's own dimension
    names (the CF convention the ETOPO grid follows).  Descending axes
    are handled by :class:`RasterGrid`'s signed-step arithmetic — no
    flipping needed."""
    nc = read_netcdf_classic(path)
    if var not in nc.variables:
        raise KeyError(f"variable {var!r} not in file ({list(nc.variables)})")
    v = nc.variables[var]
    if len(v.shape) != 2:
        raise ValueError(f"{var!r} is {len(v.shape)}-D, need 2-D (lat, lon)")
    lat_name = lat_var or v.dims[0]
    lon_name = lon_var or v.dims[1]
    for cname in (lat_name, lon_name):
        if cname not in nc.variables:
            raise KeyError(f"coordinate variable {cname!r} not in file")
    lats = nc.variables[lat_name].scaled()
    lons = nc.variables[lon_name].scaled()
    if v.shape != (len(lats), len(lons)):
        raise ValueError(
            f"{var!r} shape {v.shape} != (len({lat_name}), len({lon_name}))"
            f" = ({len(lats)}, {len(lons)})"
        )
    return RasterGrid(
        values=v.scaled(),
        lat0=float(lats[0]),
        lon0=float(lons[0]),
        dlat=_uniform_step(lats, lat_name),
        dlon=_uniform_step(lons, lon_name),
    )
