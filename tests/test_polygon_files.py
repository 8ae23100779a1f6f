"""Polygon-file loaders (S6): every format must produce the same Polygons
structure and the same assign_region output as the literal polygon set."""

from __future__ import annotations

import json
import struct

import pytest

from qualityassurancetool_spark.sources.polygon_files import (
    load_polygons,
    polygons_from_geojson,
    polygons_from_shapefile,
    polygons_from_wkb,
    polygons_from_wkt,
)
from qualityassurancetool_spark.sources.spatial import assign_region

# two disjoint squares: MAINLAND (0..10) and ISLAND (20..30)
MAINLAND = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
ISLAND = [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0), (20.0, 20.0)]
LITERAL = [("MAINLAND", MAINLAND), ("ISLAND", ISLAND)]


def _ring_wkt(ring):
    return ", ".join(f"{x} {y}" for x, y in ring)


def _wkb_polygon(ring, endian="<"):
    code = 1 if endian == "<" else 0
    buf = struct.pack("B", code) + struct.pack(f"{endian}I", 3)
    buf += struct.pack(f"{endian}I", 1)  # one ring
    buf += struct.pack(f"{endian}I", len(ring))
    for x, y in ring:
        buf += struct.pack(f"{endian}2d", x, y)
    return buf


def _write_shapefile(path, polys):
    """Minimal type-5 .shp + .dbf writer (test fixture; public spec)."""
    records = b""
    for i, (_name, ring) in enumerate(polys):
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        # shapefile exteriors wind clockwise; reverse the CCW test rings
        cw = list(reversed(ring))
        content = struct.pack("<I", 5)
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<II", 1, len(cw))
        content += struct.pack("<I", 0)
        for x, y in cw:
            content += struct.pack("<2d", x, y)
        records += struct.pack(">II", i + 1, len(content) // 2) + content
    header = struct.pack(">I", 9994) + b"\x00" * 20
    header += struct.pack(">I", (100 + len(records)) // 2)
    header += struct.pack("<II", 1000, 5)
    header += struct.pack("<8d", 0, 0, 30, 30, 0, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(header + records)
    # sibling dbf with one 16-char NAME field
    dbf = path[: -len(".shp")] + ".dbf"
    n = len(polys)
    field = b"NAME\x00\x00\x00\x00\x00\x00\x00" + b"C" + b"\x00" * 4 + bytes([16]) + b"\x00" * 15
    hdr = struct.pack("<BBBBIHH", 3, 24, 1, 1, n, 32 + 32 + 1, 1 + 16)
    hdr += b"\x00" * 20 + field + b"\x0d"
    body = b"".join(
        b" " + name.encode().ljust(16)[:16] for name, _ in polys
    )
    with open(dbf, "wb") as fh:
        fh.write(hdr + body + b"\x1a")


@pytest.fixture()
def points(spark):
    rows = [
        (1, 5.0, 5.0),     # MAINLAND
        (2, 25.0, 25.0),   # ISLAND
        (3, 50.0, 50.0),   # neither
    ]
    return spark.createDataFrame(rows, "iot_id long, long double, lat double")


def _regions(df, polys):
    out = assign_region(df, polys).collect()
    return {r["iot_id"]: r["region"] for r in out}


EXPECT = {1: "MAINLAND", 2: "ISLAND", 3: None}


def test_geojson_loader(spark, points, tmp_path):
    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": name},
                "geometry": {"type": "Polygon", "coordinates": [ring]},
            }
            for name, ring in LITERAL
        ],
    }
    p = tmp_path / "regions.geojson"
    p.write_text(json.dumps(gj))
    polys = load_polygons(str(p))
    assert [n for n, _ in polys] == ["MAINLAND", "ISLAND"]
    assert _regions(points, polys) == EXPECT


def test_geojson_multipolygon(spark, points):
    gj = {
        "type": "Feature",
        "properties": {"name": "BOTH"},
        "geometry": {
            "type": "MultiPolygon",
            "coordinates": [[MAINLAND], [ISLAND]],
        },
    }
    polys = polygons_from_geojson(gj)
    assert len(polys) == 2 and all(n == "BOTH" for n, _ in polys)
    got = _regions(points, polys)
    assert got == {1: "BOTH", 2: "BOTH", 3: None}


def test_wkt_loader(spark, points, tmp_path):
    lines = [
        f"MAINLAND\tPOLYGON (({_ring_wkt(MAINLAND)}))",
        f"ISLAND\tPOLYGON (({_ring_wkt(ISLAND)}))",
    ]
    p = tmp_path / "regions.wkt"
    p.write_text("\n".join(lines))
    assert _regions(points, load_polygons(str(p))) == EXPECT
    # multipolygon: exterior of each part
    mp = polygons_from_wkt(
        [("BOTH", f"MULTIPOLYGON ((({_ring_wkt(MAINLAND)})), "
                  f"(({_ring_wkt(ISLAND)})))")]
    )
    assert len(mp) == 2


def test_wkb_loader_both_endians(spark, points, tmp_path):
    items = [
        ("MAINLAND", _wkb_polygon(MAINLAND, "<").hex()),
        ("ISLAND", _wkb_polygon(ISLAND, ">").hex()),
    ]
    assert _regions(points, polygons_from_wkb(items)) == EXPECT
    p = tmp_path / "regions.wkb"
    p.write_text("\n".join(f"{n}\t{h}" for n, h in items))
    assert _regions(points, load_polygons(str(p))) == EXPECT


def test_wkb_ewkb_srid_and_multipolygon(spark, points):
    # EWKB: SRID flag + 4-byte SRID after the type word
    ring = MAINLAND
    buf = struct.pack("B", 1) + struct.pack("<I", 3 | 0x20000000)
    buf += struct.pack("<I", 4326)
    buf += struct.pack("<I", 1) + struct.pack("<I", len(ring))
    for x, y in ring:
        buf += struct.pack("<2d", x, y)
    polys = polygons_from_wkb([("MAINLAND", buf)])
    assert polys[0][0] == "MAINLAND" and len(polys[0][1]) == len(ring)
    # MultiPolygon wrapping two Polygon bodies
    mp = struct.pack("B", 1) + struct.pack("<I", 6) + struct.pack("<I", 2)
    mp += _wkb_polygon(MAINLAND, "<") + _wkb_polygon(ISLAND, "<")
    polys = polygons_from_wkb([("BOTH", mp)])
    assert len(polys) == 2
    assert _regions(points, polys) == {1: "BOTH", 2: "BOTH", 3: None}


def test_config_accepts_polygon_file_path(spark, points, tmp_path):
    from qualityassurancetool_spark.config import QCConfig

    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": name},
                "geometry": {"type": "Polygon", "coordinates": [ring]},
            }
            for name, ring in LITERAL
        ],
    }
    p = tmp_path / "regions.geojson"
    p.write_text(json.dumps(gj))
    cfg = QCConfig.from_dict({"QC": [], "region_polygons": str(p)})
    assert _regions(points, cfg.region_polygons) == EXPECT


def test_shapefile_loader(spark, points, tmp_path):
    shp = str(tmp_path / "regions.shp")
    _write_shapefile(shp, LITERAL)
    polys = polygons_from_shapefile(shp)
    assert [n for n, _ in polys] == ["MAINLAND", "ISLAND"]
    assert _regions(points, polys) == EXPECT
    assert _regions(points, load_polygons(shp)) == EXPECT
