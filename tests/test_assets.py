"""Remote asset download + cache (sources/assets): the engine's
equivalent of the reference's get_ne_10m_shp / get_elev_netcdf
(/root/reference/src/main.py:560,577,595) — in-process HTTP server with
failure injection; parsers (shapefile, NetCDF) unchanged downstream."""

import hashlib
import io
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

import test_netcdf
import test_polygon_files
from qualityassurancetool_spark.sources.assets import (
    fetch_cached,
    get_etopo_netcdf,
    get_natural_earth_land,
)
from qualityassurancetool_spark.sources.http_client import HttpError


class _FileServer(BaseHTTPRequestHandler):
    """Serves ``server.files[path]`` bytes with per-path failure
    injection: ``truncate[path] = n`` makes the next n responses
    advertise the full Content-Length but send half the body (the
    interrupted-download case); ``fail503[path] = n`` 503s n times."""

    def do_GET(self):  # noqa: N802 (stdlib API name)
        srv = self.server
        srv.hits[self.path] = srv.hits.get(self.path, 0) + 1
        if self.path not in srv.files:
            self.send_error(404)
            return
        if srv.fail503.get(self.path, 0) > 0:
            srv.fail503[self.path] -= 1
            self.send_error(503)
            return
        body = srv.files[self.path]
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if srv.truncate.get(self.path, 0) > 0:
            srv.truncate[self.path] -= 1
            self.wfile.write(body[: len(body) // 2])
            self.wfile.flush()
            self.connection.close()
            return
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FileServer)
    srv.files, srv.hits, srv.truncate, srv.fail503 = {}, {}, {}, {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.server_address[1]}{path}"


def test_fetch_then_cache_hit(server, tmp_path):
    server.files["/a.bin"] = b"x" * 4096
    p1 = fetch_cached(_url(server, "/a.bin"), str(tmp_path))
    assert open(p1, "rb").read() == b"x" * 4096
    p2 = fetch_cached(_url(server, "/a.bin"), str(tmp_path))
    assert p2 == p1
    assert server.hits["/a.bin"] == 1  # second call never hit the network


def test_interrupted_download_retries_to_success(server, tmp_path):
    body = bytes(range(256)) * 64
    server.files["/b.bin"] = body
    server.truncate["/b.bin"] = 2  # two short reads, then a clean send
    sleeps = []
    p = fetch_cached(
        _url(server, "/b.bin"), str(tmp_path), sleep=sleeps.append
    )
    assert open(p, "rb").read() == body
    assert server.hits["/b.bin"] == 3
    assert sleeps == [0.5, 1.0]  # exponential backoff between tries
    assert not (tmp_path / "b.bin.part").exists()


def test_503_retries_then_succeeds(server, tmp_path):
    server.files["/c.bin"] = b"ok"
    server.fail503["/c.bin"] = 1
    p = fetch_cached(_url(server, "/c.bin"), str(tmp_path), sleep=lambda s: None)
    assert open(p, "rb").read() == b"ok"
    assert server.hits["/c.bin"] == 2


def test_404_fails_fast_no_retry(server, tmp_path):
    with pytest.raises(HttpError) as ei:
        fetch_cached(_url(server, "/missing"), str(tmp_path), sleep=lambda s: None)
    assert ei.value.status == 404
    assert server.hits["/missing"] == 1


def test_checksum_validates_and_refetches_stale_cache(server, tmp_path):
    body = b"fresh-bytes"
    good = hashlib.sha256(body).hexdigest()
    server.files["/d.bin"] = body
    # plant a stale cache entry: checksum mismatch → refetch, not reuse
    (tmp_path / "d.bin").write_bytes(b"stale")
    p = fetch_cached(_url(server, "/d.bin"), str(tmp_path), sha256=good)
    assert open(p, "rb").read() == body
    assert server.hits["/d.bin"] == 1
    # persistent mismatch → retries exhausted → HttpError
    with pytest.raises(HttpError):
        fetch_cached(
            _url(server, "/d.bin"),
            str(tmp_path / "other"),
            sha256="0" * 64,
            retries=1,
            sleep=lambda s: None,
        )


def test_natural_earth_zip_roundtrip(server, tmp_path, spark):
    """Zip → extract → the UNCHANGED shapefile parser → assign_region:
    the full get_ne_10m_shp-equivalent path."""
    from pyspark.sql import functions as F  # noqa: F401

    from qualityassurancetool_spark.sources.polygon_files import (
        polygons_from_shapefile,
    )
    from qualityassurancetool_spark.sources.spatial import assign_region

    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
    shp_dir = tmp_path / "build"
    shp_dir.mkdir()
    test_polygon_files._write_shapefile(
        str(shp_dir / "ne_10m_land.shp"), [("LAND", tri)]
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for ext in (".shp", ".dbf"):
            zf.write(
                str(shp_dir / f"ne_10m_land{ext}"), f"ne_10m_land{ext}"
            )
    server.files["/ne_10m_land.zip"] = buf.getvalue()
    cache = tmp_path / "cache"
    shp = get_natural_earth_land(str(cache), _url(server, "/ne_10m_land.zip"))
    assert shp.endswith("ne_10m_land.shp")
    polys = polygons_from_shapefile(shp)
    assert [n for n, _ in polys] == ["LAND"]
    pts = spark.createDataFrame(
        [(0, 2.0, 2.0), (1, 20.0, 20.0)], ["pid", "long", "lat"]
    )
    got = {
        (r["pid"], r["region"])
        for r in assign_region(pts, polys).collect()
    }
    assert got == {(0, "LAND"), (1, None)}
    # second call: pure cache hit, no network
    get_natural_earth_land(str(cache), _url(server, "/ne_10m_land.zip"))
    assert server.hits["/ne_10m_land.zip"] == 1


def test_etopo_netcdf_roundtrip(server, tmp_path):
    """NetCDF fetch → the UNCHANGED pure-stdlib CDF parser (the
    get_elev_netcdf-equivalent path)."""
    from qualityassurancetool_spark.sources.netcdf import read_netcdf_classic

    nc_path = tmp_path / "build.nc"
    test_netcdf._write_fixture(str(nc_path))
    server.files["/etopo.nc"] = nc_path.read_bytes()
    p = get_etopo_netcdf(
        str(tmp_path / "cache"), _url(server, "/etopo.nc"),
        filename="etopo.nc",
    )
    ds = read_netcdf_classic(p)
    assert ds.variables  # parses to a non-empty dataset


def test_config_remote_polygon_url(server, tmp_path, monkeypatch, spark):
    """region_polygons: https://... in the QC config downloads once
    through fetch_cached (QAT_ASSET_CACHE) and parses with the normal
    file loaders — the reference's download-into-resources/ behavior
    lifted to the config surface."""
    from qualityassurancetool_spark.config import QCConfig

    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
    wkb = test_polygon_files._wkb_polygon(tri)
    server.files["/land.wkb"] = f"LAND\t{wkb.hex()}\n".encode()
    monkeypatch.setenv("QAT_ASSET_CACHE", str(tmp_path / "cache"))
    cfg_dict = {"QC": [], "region_polygons": _url(server, "/land.wkb")}
    cfg = QCConfig.from_dict(cfg_dict)
    assert [n for n, _ in cfg.region_polygons] == ["LAND"]
    QCConfig.from_dict(cfg_dict)  # second parse: cache hit
    assert server.hits["/land.wkb"] == 1
