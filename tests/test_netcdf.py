"""NetCDF-classic reader (S7): in-test byte-level writer builds tiny
CDF-1/CDF-2 fixtures; the parser's output is pinned to the numpy arrays
the writer encoded, and the end-to-end path (``.nc`` file →
``raster_grid_from_netcdf`` → ``raster_lookup``) matches a pure-numpy
nearest-cell oracle.  Reference parity: ETOPO ``.nc`` ingestion at
``src/main.py:560,595``."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from qualityassurancetool_spark.sources.netcdf import (
    NCVariable,
    raster_grid_from_netcdf,
    read_netcdf_classic,
)
from qualityassurancetool_spark.sources.spatial import raster_lookup

_TYPE_OF_DTYPE = {"i1": 1, "i2": 3, "i4": 4, "f4": 5, "f8": 6}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _attr_values(v) -> bytes:
    if isinstance(v, str):
        raw = v.encode()
        return struct.pack(">II", 2, len(raw)) + _pad4(raw)
    arr = np.atleast_1d(np.asarray(v))
    t = _TYPE_OF_DTYPE[arr.dtype.str[1:]]
    be = arr.astype(arr.dtype.newbyteorder(">"))
    return struct.pack(">II", t, len(arr)) + _pad4(be.tobytes())


def _att_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)
    out = struct.pack(">II", 0x0C, len(attrs))
    for k, v in attrs.items():
        out += _name(k) + _attr_values(v)
    return out


def write_nc(path, dims, variables, version=1, gatts=None):
    """Minimal classic writer for fixtures.  ``dims`` = [(name, size)],
    ``variables`` = [(name, dim_ids, np_array, attrs)] (fixed-size only)."""
    header = b"CDF" + bytes([version]) + struct.pack(">I", 0)  # numrecs=0
    header += struct.pack(">II", 0x0A, len(dims))
    for n, s in dims:
        header += _name(n) + struct.pack(">I", s)
    header += _att_list(gatts or {})
    header += struct.pack(">II", 0x0B, len(variables))

    # layout: compute begins after a first pass over header size
    blobs, metas = [], []
    for n, dimids, arr, attrs in variables:
        t = _TYPE_OF_DTYPE[arr.dtype.str[1:]]
        be = arr.astype(arr.dtype.newbyteorder(">"))
        blob = _pad4(be.tobytes())
        meta = _name(n) + struct.pack(">I", len(dimids))
        meta += b"".join(struct.pack(">I", d) for d in dimids)
        meta += _att_list(attrs) + struct.pack(">II", t, len(blob))
        metas.append(meta)
        blobs.append(blob)
    off_w = ">Q" if version == 2 else ">I"
    off_sz = 8 if version == 2 else 4
    begin0 = len(header) + sum(len(m) + off_sz for m in metas)
    begins, pos = [], begin0
    for b in blobs:
        begins.append(pos)
        pos += len(b)
    body = b"".join(
        m + struct.pack(off_w, bg) for m, bg in zip(metas, begins)
    )
    with open(path, "wb") as f:
        f.write(header + body + b"".join(blobs))


LATS = np.array([50.0, 50.5, 51.0, 51.5], dtype=np.float64)
LONS = np.array([2.0, 2.25, 2.5, 2.75, 3.0], dtype=np.float64)
# raw int16 grid with scale/offset + one fill cell
RAW = np.arange(20, dtype=np.int16).reshape(4, 5) - 7
RAW[2, 3] = -999


def _write_fixture(path, version=1):
    write_nc(
        path,
        dims=[("lat", 4), ("lon", 5)],
        variables=[
            ("lat", [0], LATS, {"units": "degrees_north"}),
            ("lon", [1], LONS, {"units": "degrees_east"}),
            (
                "elevation",
                [0, 1],
                RAW,
                {
                    "scale_factor": np.array([0.5]),
                    "add_offset": np.array([100.0]),
                    "_FillValue": np.array([-999], dtype=np.int16),
                },
            ),
        ],
        version=version,
        gatts={"title": "tiny test grid"},
    )


def _expected_values():
    out = RAW.astype(np.float64)
    out[RAW == -999] = np.nan
    return out * 0.5 + 100.0


@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip_parse(tmp_path, version):
    p = str(tmp_path / f"grid_v{version}.nc")
    _write_fixture(p, version=version)
    nc = read_netcdf_classic(p)
    assert nc.dimensions == {"lat": 4, "lon": 5}
    assert nc.attrs["title"] == "tiny test grid"
    v = nc.variables["elevation"]
    assert isinstance(v, NCVariable)
    assert v.dims == ("lat", "lon") and v.shape == (4, 5)
    np.testing.assert_array_equal(v.data, RAW)
    np.testing.assert_allclose(
        v.scaled(), _expected_values(), equal_nan=True
    )
    np.testing.assert_array_equal(nc.variables["lat"].data, LATS)
    assert nc.variables["lon"].attrs["units"] == "degrees_east"


def test_raster_grid_from_netcdf(tmp_path):
    p = str(tmp_path / "grid.nc")
    _write_fixture(p)
    g = raster_grid_from_netcdf(p, "elevation")
    assert (g.lat0, g.lon0) == (50.0, 2.0)
    assert (g.dlat, g.dlon) == (0.5, 0.25)
    np.testing.assert_allclose(
        g.values, _expected_values(), equal_nan=True
    )


def test_descending_axis(tmp_path):
    p = str(tmp_path / "desc.nc")
    write_nc(
        p,
        dims=[("lat", 4), ("lon", 5)],
        variables=[
            ("lat", [0], LATS[::-1].copy(), {}),
            ("lon", [1], LONS, {}),
            ("z", [0, 1], RAW[::-1].astype(np.float64), {}),
        ],
    )
    g = raster_grid_from_netcdf(p, "z")
    assert g.dlat == -0.5
    # same nearest-cell answers as the ascending grid (fill row kept raw)
    asc = RAW.astype(np.float64)
    np.testing.assert_allclose(
        g.lookup(np.array([50.6, 51.5]), np.array([2.3, 3.0])),
        [asc[1, 1], asc[3, 4]],
    )


def test_error_paths(tmp_path):
    p = str(tmp_path / "bad.nc")
    with open(p, "wb") as f:
        f.write(b"NOPE")
    with pytest.raises(ValueError, match="magic"):
        read_netcdf_classic(p)
    p2 = str(tmp_path / "g.nc")
    _write_fixture(p2)
    with pytest.raises(KeyError):
        raster_grid_from_netcdf(p2, "nope")
    # non-uniform axis rejected
    p3 = str(tmp_path / "nonuni.nc")
    write_nc(
        p3,
        dims=[("lat", 3), ("lon", 5)],
        variables=[
            ("lat", [0], np.array([0.0, 1.0, 5.0]), {}),
            ("lon", [1], LONS, {}),
            ("z", [0, 1], np.zeros((3, 5)), {}),
        ],
    )
    with pytest.raises(ValueError, match="uniformly spaced"):
        raster_grid_from_netcdf(p3, "z")


def test_nc_to_raster_lookup_spark(spark, tmp_path):
    """End-to-end: .nc file → RasterGrid → raster_lookup matches the
    numpy nearest-cell oracle (pure-Column path for this small grid)."""
    p = str(tmp_path / "grid.nc")
    _write_fixture(p)
    g = raster_grid_from_netcdf(p, "elevation")
    pts = [
        (1, 50.1, 2.05),
        (2, 50.74, 2.4),
        (3, 51.5, 3.0),
        (4, 49.0, 1.0),   # clamps to corner
        (5, 60.0, 9.0),   # clamps to opposite corner
    ]
    df = spark.createDataFrame(pts, ["id", "lat", "long"])
    got = {
        r["id"]: r["elevation"]
        for r in raster_lookup(df, g).collect()
    }
    exp = g.lookup(
        np.array([la for _, la, _ in pts]),
        np.array([lo for _, _, lo in pts]),
    )
    for (i, _, _), e in zip(pts, exp):
        if np.isnan(e):
            assert got[i] is None or np.isnan(got[i])
        else:
            assert got[i] == pytest.approx(e)


def test_record_variables_deinterleave(tmp_path):
    """Record (unlimited-dim) variables: two interleaved record vars are
    de-interleaved into full arrays; a single record var reads its
    contiguous layout.  Element sizes are multiples of 4 so the classic
    format's per-record padding is a no-op in both layouts."""
    nrec = 3
    tvals = np.array([100, 200, 300], dtype=np.int32)
    gvals = np.arange(nrec * 5, dtype=np.float64).reshape(nrec, 5)

    def header_and_meta(variables, numrecs):
        header = b"CDF\x01" + struct.pack(">I", numrecs)
        header += struct.pack(">II", 0x0A, 2)
        header += _name("time") + struct.pack(">I", 0)   # record dim
        header += _name("lon") + struct.pack(">I", 5)
        header += _att_list({})
        header += struct.pack(">II", 0x0B, len(variables))
        metas, vsizes = [], []
        for n, dimids, arr in variables:
            t = _TYPE_OF_DTYPE[arr.dtype.str[1:]]
            per_rec = arr[0:1].nbytes if dimids and dimids[0] == 0 else arr.nbytes
            vsize = per_rec + ((4 - per_rec % 4) % 4)
            meta = _name(n) + struct.pack(">I", len(dimids))
            meta += b"".join(struct.pack(">I", d) for d in dimids)
            meta += _att_list({}) + struct.pack(">II", t, vsize)
            metas.append(meta)
            vsizes.append(vsize)
        return header, metas, vsizes

    # --- two record vars: records interleave with stride = recsize
    variables = [("t", [0], tvals), ("grid2", [0, 1], gvals)]
    header, metas, vsizes = header_and_meta(variables, nrec)
    begin0 = len(header) + sum(len(m) + 4 for m in metas)
    begins = [begin0, begin0 + vsizes[0]]
    body = b"".join(
        m + struct.pack(">I", b) for m, b in zip(metas, begins)
    )
    records = b""
    for k in range(nrec):
        records += tvals[k : k + 1].astype(">i4").tobytes()
        records += gvals[k].astype(">f8").tobytes()
    p = str(tmp_path / "rec2.nc")
    with open(p, "wb") as f:
        f.write(header + body + records)
    nc = read_netcdf_classic(p)
    assert nc.dimensions["time"] == nrec
    np.testing.assert_array_equal(nc.variables["t"].data, tvals)
    assert nc.variables["grid2"].shape == (nrec, 5)
    np.testing.assert_array_equal(nc.variables["grid2"].data, gvals)

    # --- single record var: contiguous record layout
    variables = [("grid2", [0, 1], gvals)]
    header, metas, vsizes = header_and_meta(variables, nrec)
    begin0 = len(header) + len(metas[0]) + 4
    body = metas[0] + struct.pack(">I", begin0)
    p1 = str(tmp_path / "rec1.nc")
    with open(p1, "wb") as f:
        f.write(header + body + gvals.astype(">f8").tobytes())
    nc1 = read_netcdf_classic(p1)
    np.testing.assert_array_equal(nc1.variables["grid2"].data, gvals)
