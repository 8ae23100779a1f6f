"""Remote asset download + cache (Natural Earth land polygons, ETOPO
bathymetry) — the reference downloads both into a local ``resources/``
folder on first use and reuses the cached copy afterwards
(``/root/reference/src/main.py:560,577,595`` via its unvendored
``pandassta`` helpers ``get_ne_10m_shp`` / ``get_elev_netcdf``).

This module is the engine's equivalent: a stdlib ``fetch_cached`` with
the same retry/backoff policy as :mod:`.http_client` (connection
errors, 429, 5xx retry with exponential backoff; other 4xx fail fast),
atomic ``.part``-then-rename placement so an interrupted download can
never be mistaken for a cached asset, and optional sha256 / size
validation.  Two thin wrappers fetch the two reference assets and hand
them straight to the existing parsers (``polygons_from_shapefile``,
``sources.netcdf``) — the parsers are unchanged; only acquisition is
new.

Scale shape: assets are driver-side metadata (coastlines ≈ a few MB,
one ETOPO tile likewise).  They are fetched ONCE on the driver, parsed
once, and broadcast — executors never touch the network.
"""

from __future__ import annotations

import hashlib
import os
import time
import urllib.error
import urllib.request
import zipfile
from collections.abc import Callable

from qualityassurancetool_spark.sources.http_client import HttpError

# public canonical asset URLs, overridable at every call site (pinned
# here so offline/test environments inject their own server)
NE_10M_LAND_URL = (
    "https://naciscdn.org/naturalearth/10m/physical/ne_10m_land.zip"
)
ETOPO_URL = (
    "https://www.ngdc.noaa.gov/thredds/fileServer/global/ETOPO2022/"
    "30s/30s_surface_elev_netcdf/ETOPO_2022_v1_30s_N90W180_surface.nc"
)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch_cached(
    url: str,
    cache_dir: str,
    filename: str | None = None,
    *,
    sha256: str | None = None,
    retries: int = 4,
    backoff: float = 0.5,
    timeout: float = 60.0,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """Download ``url`` into ``cache_dir`` once; return the local path.

    Cache hit: the target file exists (and matches ``sha256`` when
    given) → returned with NO network traffic, like the reference's
    skip-if-present ``resources/`` layout.  Otherwise the body streams
    to ``<name>.part`` and is atomically renamed into place only after
    it passes Content-Length and checksum validation — a crash or
    truncated transfer leaves a ``.part`` file that the next call
    overwrites, never a corrupt cache entry.

    Retry policy matches :func:`.http_client.request_json`: connection
    errors / timeouts / 429 / 5xx retry with ``backoff * 2**attempt``
    waits; other 4xx raise :class:`HttpError` immediately.  A
    short-read (body shorter than Content-Length — the interrupted
    download case) counts as a retryable failure.
    """
    name = filename or os.path.basename(url.split("?", 1)[0])
    if not name:
        raise ValueError(f"cannot derive a filename from {url!r}")
    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(cache_dir, name)
    if os.path.exists(dest):
        if sha256 is None or _sha256(dest) == sha256:
            return dest
        os.remove(dest)  # stale/corrupt cache entry: refetch

    part = dest + ".part"
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            req = urllib.request.Request(url)
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                expected = resp.headers.get("Content-Length")
                n = 0
                with open(part, "wb") as out:
                    for chunk in iter(lambda: resp.read(1 << 20), b""):
                        out.write(chunk)
                        n += len(chunk)
            if expected is not None and n != int(expected):
                raise OSError(
                    f"short read: {n} of {expected} bytes from {url}"
                )
            if sha256 is not None and _sha256(part) != sha256:
                raise OSError(f"sha256 mismatch for {url}")
            os.replace(part, dest)
            return dest
        except urllib.error.HTTPError as e:
            if e.code == 429 or 500 <= e.code < 600:
                last = e
            else:
                raise HttpError(
                    f"GET {url} -> HTTP {e.code}", status=e.code
                ) from e
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            last = e
        if attempt < retries:
            sleep(backoff * (2**attempt))
    raise HttpError(f"GET {url} failed after {retries + 1} attempts: {last!r}")


def get_natural_earth_land(
    cache_dir: str,
    url: str = NE_10M_LAND_URL,
    *,
    sha256: str | None = None,
    **fetch_kw,
) -> str:
    """Path to the cached ``ne_10m_land.shp`` (reference
    ``get_ne_10m_shp``): fetches the Natural Earth zip once, extracts
    the shapefile members next to it, returns the ``.shp`` path for
    :func:`..sources.polygon_files.polygons_from_shapefile`.  A bare
    ``.shp`` URL (test servers, mirrors) is cached as-is."""
    path = fetch_cached(url, cache_dir, sha256=sha256, **fetch_kw)
    if not path.endswith(".zip"):
        return path
    with zipfile.ZipFile(path) as zf:
        shp = None
        for m in zf.namelist():
            # flatten: members land directly in cache_dir like the
            # reference's resources/ layout
            base = os.path.basename(m)
            if not base or base.startswith("."):
                continue
            target = os.path.join(cache_dir, base)
            if not os.path.exists(target):
                # same atomic .part-then-rename contract as the
                # download itself: a crash mid-extract must never leave
                # a truncated member that skip-if-exists would reuse
                with zf.open(m) as src, open(target + ".part", "wb") as out:
                    out.write(src.read())
                os.replace(target + ".part", target)
            if base.endswith(".shp"):
                shp = target
    if shp is None:
        raise HttpError(f"no .shp member inside {url}")
    return shp


def get_etopo_netcdf(
    cache_dir: str,
    url: str = ETOPO_URL,
    *,
    sha256: str | None = None,
    **fetch_kw,
) -> str:
    """Path to the cached ETOPO bathymetry NetCDF (reference
    ``get_elev_netcdf``) for the pure-stdlib reader in
    :mod:`..sources.netcdf`."""
    return fetch_cached(url, cache_dir, sha256=sha256, **fetch_kw)
