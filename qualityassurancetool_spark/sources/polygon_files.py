"""Polygon-file ingestion for the region lookup (reference S6: land/region
polygons loaded from real files — shapefile via geopandas at
``src/main.py:577`` — then used by ``intersect_df_region``).

This module closes the loop without native geo dependencies: every loader
returns the same ``Polygons`` structure (``list[(name, [(lon, lat), ...])]``)
that :func:`qualityassurancetool_spark.sources.spatial.assign_region`
broadcasts, so swapping the synthetic polygon set for a real file is a
one-line change.  Supported formats, all parsed with the stdlib:

- **GeoJSON** (``FeatureCollection`` / ``Feature`` / bare geometry) —
  Polygon and MultiPolygon, exterior rings;
- **WKT** (``POLYGON ((...))`` / ``MULTIPOLYGON (((...)))``);
- **WKB** (hex or bytes; little/big endian; plain or EWKB with SRID) —
  the interchange format a PostGIS ``ST_AsBinary`` export produces;
- **ESRI shapefile** (``.shp`` type 5 Polygon records; names from the
  sibling ``.dbf``'s first text field when present).

Interior rings (holes) are dropped: the broadcast ray-cast kernel models
regions as simple rings, matching the reference's coastline usage.  At
scale these files are driver-side metadata (coastlines are a few MB);
parsing on the driver and broadcasting is the right shape — the fact
table never moves.
"""

from __future__ import annotations

import json
import os
import re
import struct

Ring = list[tuple[float, float]]
Polygons = list[tuple[str, Ring]]


# ---------------------------------------------------------------- GeoJSON

def polygons_from_geojson(
    src: str | dict, name_property: str = "name"
) -> Polygons:
    """Parse GeoJSON (path or already-loaded dict) into the Polygons shape.

    Every Polygon contributes its exterior ring; a MultiPolygon yields one
    entry per part (same name) so first-match-wins ordering still applies.
    Unnamed features fall back to ``feature_<i>``.
    """
    if isinstance(src, str):
        with open(src) as fh:
            obj = json.load(fh)
    else:
        obj = src

    feats: list[tuple[str, dict]] = []
    t = obj.get("type")
    if t == "FeatureCollection":
        for i, f in enumerate(obj.get("features", [])):
            nm = (f.get("properties") or {}).get(name_property) or f"feature_{i}"
            feats.append((str(nm), f.get("geometry") or {}))
    elif t == "Feature":
        nm = (obj.get("properties") or {}).get(name_property) or "feature_0"
        feats.append((str(nm), obj.get("geometry") or {}))
    else:  # bare geometry
        feats.append(("feature_0", obj))

    out: Polygons = []
    for name, geom in feats:
        gt = geom.get("type")
        if gt == "Polygon":
            rings = [geom["coordinates"][0]]
        elif gt == "MultiPolygon":
            rings = [part[0] for part in geom["coordinates"]]
        else:
            continue
        for ring in rings:
            out.append((name, [(float(x), float(y)) for x, y, *_ in ring]))
    return out


# ---------------------------------------------------------------- WKT

_WKT_RING = re.compile(r"\(([^()]+)\)")


def _parse_wkt_ring(body: str) -> Ring:
    pts = []
    for pair in body.split(","):
        xy = pair.split()
        pts.append((float(xy[0]), float(xy[1])))
    return pts


def polygons_from_wkt(items: list[tuple[str, str]]) -> Polygons:
    """``[(name, wkt)]`` → Polygons.  POLYGON takes its exterior ring;
    MULTIPOLYGON yields one entry per part."""
    out: Polygons = []
    for name, wkt in items:
        head = wkt.strip().upper()
        if head.startswith("MULTIPOLYGON"):
            # parts are ((ext, hole...), (ext, ...)); the exterior ring is
            # the first ring of each part, i.e. the ring opened by "(("
            part_bodies = re.findall(r"\(\(\s*([^()]+?)\s*\)", wkt)
            for body in part_bodies:
                out.append((name, _parse_wkt_ring(body)))
        elif head.startswith("POLYGON"):
            rings = _WKT_RING.findall(wkt)
            if rings:
                out.append((name, _parse_wkt_ring(rings[0])))
        else:
            raise ValueError(f"unsupported WKT geometry for {name!r}: {wkt[:40]}")
    return out


# ---------------------------------------------------------------- WKB

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6
_EWKB_SRID_FLAG = 0x20000000
_WKB_Z_FLAG = 0x80000000
_WKB_M_FLAG = 0x40000000


def _read_wkb_polygon(buf: memoryview, off: int) -> tuple[list[Ring], int]:
    """Parse one WKB Polygon starting at ``off`` (at its endian byte).
    Returns (rings, new_offset)."""
    endian = "<" if buf[off] == 1 else ">"
    off += 1
    (gtype,) = struct.unpack_from(f"{endian}I", buf, off)
    off += 4
    ndims = 2
    if gtype & _WKB_Z_FLAG:
        ndims += 1
    if gtype & _WKB_M_FLAG:
        ndims += 1
    if gtype & _EWKB_SRID_FLAG:
        off += 4  # skip SRID
    base = gtype & 0xFFFF
    # ISO WKB encodes Z/M as +1000/+2000 on the base type
    if base > 1000:
        extra, base = divmod(base, 1000)
        ndims = 2 + (1 if extra in (1, 2) else 2 if extra == 3 else 0)
    if base != _WKB_POLYGON:
        raise ValueError(f"expected WKB Polygon, got type {base}")
    (nrings,) = struct.unpack_from(f"{endian}I", buf, off)
    off += 4
    rings: list[Ring] = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from(f"{endian}I", buf, off)
        off += 4
        coords = struct.unpack_from(f"{endian}{npts * ndims}d", buf, off)
        off += 8 * npts * ndims
        rings.append(
            [
                (coords[i * ndims], coords[i * ndims + 1])
                for i in range(npts)
            ]
        )
    return rings, off


def polygons_from_wkb(items: list[tuple[str, bytes | str]]) -> Polygons:
    """``[(name, wkb)]`` (bytes or hex string) → Polygons.  Accepts
    Polygon and MultiPolygon, little or big endian, plain WKB or EWKB
    (PostGIS ``ST_AsBinary`` / ``ST_AsEWKB``)."""
    out: Polygons = []
    for name, wkb in items:
        raw = bytes.fromhex(wkb) if isinstance(wkb, str) else bytes(wkb)
        buf = memoryview(raw)
        endian = "<" if buf[0] == 1 else ">"
        (gtype,) = struct.unpack_from(f"{endian}I", buf, 1)
        base = gtype & 0xFFFF
        if base > 1000:
            base = base % 1000
        if base == _WKB_POLYGON:
            rings, _ = _read_wkb_polygon(buf, 0)
            if rings:
                out.append((name, rings[0]))
        elif base == _WKB_MULTIPOLYGON:
            off = 5
            if gtype & _EWKB_SRID_FLAG:
                off += 4
            (nparts,) = struct.unpack_from(f"{endian}I", buf, off)
            off += 4
            for _ in range(nparts):
                rings, off = _read_wkb_polygon(buf, off)
                if rings:
                    out.append((name, rings[0]))
        else:
            raise ValueError(f"unsupported WKB type {base} for {name!r}")
    return out


# ---------------------------------------------------------------- shapefile

def _dbf_names(dbf_path: str) -> list[str]:
    """First character-typed field of each .dbf record (dBASE III layout:
    32-byte header, 32-byte field descriptors until 0x0D)."""
    with open(dbf_path, "rb") as fh:
        data = fh.read()
    n_records = struct.unpack_from("<I", data, 4)[0]
    header_size = struct.unpack_from("<H", data, 8)[0]
    record_size = struct.unpack_from("<H", data, 10)[0]
    fields = []
    off = 32
    while off < header_size - 1 and data[off] != 0x0D:
        fname = data[off:off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fields.append((fname, ftype, flen))
        off += 32
    char_off, char_len = None, None
    pos = 1  # first byte of each record is the deletion flag
    for fname, ftype, flen in fields:
        if ftype == "C" and char_off is None:
            char_off, char_len = pos, flen
        pos += flen
    names = []
    for i in range(n_records):
        rec = data[header_size + i * record_size:][:record_size]
        if char_off is None or len(rec) < char_off + (char_len or 0):
            names.append(f"shape_{i}")
        else:
            names.append(
                rec[char_off:char_off + char_len]
                .decode("ascii", "replace")
                .strip()
                or f"shape_{i}"
            )
    return names


def polygons_from_shapefile(shp_path: str) -> Polygons:
    """Minimal ESRI ``.shp`` reader (public spec): type-5 Polygon records,
    exterior ring per part (exterior rings wind clockwise in the spec;
    all parts are kept — first-match-wins handles overlap).  Names come
    from the sibling ``.dbf``'s first character field when it exists."""
    with open(shp_path, "rb") as fh:
        data = fh.read()
    file_len = struct.unpack_from(">I", data, 24)[0] * 2  # 16-bit words
    shape_type = struct.unpack_from("<I", data, 32)[0]
    if shape_type not in (0, 5):
        raise ValueError(f"not a polygon shapefile (type {shape_type})")

    dbf = os.path.splitext(shp_path)[0] + ".dbf"
    names = _dbf_names(dbf) if os.path.exists(dbf) else []

    out: Polygons = []
    off = 100
    rec_i = 0
    while off < file_len:
        content_len = struct.unpack_from(">I", data, off + 4)[0] * 2
        body = off + 8
        stype = struct.unpack_from("<I", data, body)[0]
        if stype == 5:
            nparts, npoints = struct.unpack_from("<II", data, body + 36)
            parts = struct.unpack_from(f"<{nparts}I", data, body + 44)
            pts_off = body + 44 + 4 * nparts
            coords = struct.unpack_from(f"<{2 * npoints}d", data, pts_off)
            name = names[rec_i] if rec_i < len(names) else f"shape_{rec_i}"
            bounds = list(parts) + [npoints]
            for p in range(nparts):
                ring = [
                    (coords[2 * k], coords[2 * k + 1])
                    for k in range(bounds[p], bounds[p + 1])
                ]
                # holes wind counter-clockwise in the spec; keep exteriors
                if _signed_area(ring) <= 0 or nparts == 1:
                    out.append((name, ring))
        off = body + content_len
        rec_i += 1
    return out


def _signed_area(ring: Ring) -> float:
    """Shoelace area: negative = clockwise = shapefile exterior ring."""
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


# ---------------------------------------------------------------- dispatch

def load_polygons(path: str, name_property: str = "name") -> Polygons:
    """Load polygons from a file by extension: ``.geojson``/``.json`` →
    GeoJSON; ``.wkt`` (``name<TAB>WKT`` lines) → WKT; ``.wkb`` (``name
    <TAB>hex`` lines) → WKB; ``.shp`` → shapefile."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".geojson", ".json"):
        return polygons_from_geojson(path, name_property)
    if ext == ".wkt":
        with open(path) as fh:
            items = [
                tuple(line.rstrip("\n").split("\t", 1))
                for line in fh
                if line.strip()
            ]
        return polygons_from_wkt(items)  # type: ignore[arg-type]
    if ext == ".wkb":
        with open(path) as fh:
            items = [
                tuple(line.rstrip("\n").split("\t", 1))
                for line in fh
                if line.strip()
            ]
        return polygons_from_wkb(items)  # type: ignore[arg-type]
    if ext == ".shp":
        return polygons_from_shapefile(path)
    raise ValueError(f"unsupported polygon file extension: {ext}")


# ---------------------------------------------------------------- live JDBC

def load_polygons_jdbc(
    spark,
    url: str,
    table: str | None = None,
    geom_col: str = "geom_wkb",
    name_col: str = "name",
    *,
    query: str | None = None,
    driver: str | None = None,
    properties: dict | None = None,
) -> Polygons:
    """Region polygons from a LIVE database over ``spark.read.jdbc`` —
    the strict S5 seam: the reference queries SeaVox sea-region
    polygons from a live PostGIS with credentials from the environment
    (``/root/reference/src/main.py:528-533``; the DB logic lives in its
    unvendored ``searegion_detection`` package).  A user with only DB
    access — no file export — loads regions here and everything
    downstream is unchanged.

    The geometry column must arrive as WKB/EWKB (binary or hex): for
    PostGIS pass ``query="SELECT name, ST_AsBinary(geom) AS geom_wkb
    FROM seavox_areas"`` so geometry serializes server-side; any DB
    already storing WKB blobs works with plain ``table=``.  Rows with
    NULL geometry are skipped.

    Scale shape: region polygons are driver-side metadata (a few MB for
    world coastlines) — collected ONCE through the JDBC reader, parsed
    by the same :func:`polygons_from_wkb` decoder as file ingestion,
    then broadcast by ``assign_region``; the fact table never moves and
    the database is read exactly once, not per-partition.
    """
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) q" if query else table)
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (properties or {}).items():
        reader = reader.option(k, str(v))
    rows = reader.load().select(name_col, geom_col).collect()
    items = [
        (str(r[name_col]), r[geom_col])
        for r in rows
        if r[geom_col] is not None
    ]
    return polygons_from_wkb(items)
