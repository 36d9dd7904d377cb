"""CRS transforms without pyproj/GDAL, as vectorized numpy:

- WGS84 ↔ UTM (Snyder 1987 transverse-mercator series, the standard
  public formulas — USGS PP 1395, eqs 8-9..8-17 / 8-18..8-25;
  sub-mm in-zone).
- WGS84 ↔ Web Mercator EPSG:3857 (the closed-form spherical
  projection on the WGS84 semi-major axis — EPSG guidance note 7-2,
  "Popular Visualisation Pseudo-Mercator"; exact, no series).
- Geographic EPSG:4326 is the hub: any supported pair composes
  src→geographic→dst, so UTM↔UTM, UTM↔3857, 3857↔4326 etc. all work.

Codes outside this set (anything needing a datum shift grid) raise a
clear ValueError — a silent wrong-datum transform is worse than none.

The reference aligns vector layers to the raster CRS before any
spatial op (georip/geoprocessing/utils.py:425-427 `to_crs`,
georip/datasets/utils.py:249-251). The fixtures' CRSs are UTM zones
(EPSG:326xx); 3857/4326 cover the web-tile and plain-lon/lat inputs
a user brings from outside the fixtures.

All functions are array-in/array-out numpy (used from Arrow-batched
pandas UDFs in operators/geom_udfs.py) — no per-row Python.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
_FE = 500000.0

_M1 = 1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256
_M2 = 3 * _E2 / 8 + 3 * _E2 ** 2 / 32 + 45 * _E2 ** 3 / 1024
_M3 = 15 * _E2 ** 2 / 256 + 45 * _E2 ** 3 / 1024
_M4 = 35 * _E2 ** 3 / 3072


def parse_epsg_utm(crs: str) -> tuple[int, bool]:
    """'EPSG:326xx'/'EPSG:327xx' → (zone, is_north). Raises on
    non-UTM codes (only UTM is implementable without a datum grid)."""
    code = int(str(crs).upper().replace("EPSG:", ""))
    if 32601 <= code <= 32660:
        return code - 32600, True
    if 32701 <= code <= 32760:
        return code - 32700, False
    raise ValueError(f"unsupported CRS for dependency-free transform: {crs}")


def _central_meridian(zone: int) -> float:
    return np.deg2rad(-183.0 + 6.0 * zone)


def geographic_to_utm(lon_deg, lat_deg, zone: int, north: bool = True):
    """(lon, lat) degrees → (easting, northing) metres in the zone."""
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lam0 = _central_meridian(zone)
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    n = _A / np.sqrt(1 - _E2 * sin_p ** 2)
    t = tan_p ** 2
    c = _EP2 * cos_p ** 2
    a_ = (lam - lam0) * cos_p
    m = _A * (_M1 * phi - _M2 * np.sin(2 * phi) + _M3 * np.sin(4 * phi)
              - _M4 * np.sin(6 * phi))
    x = _FE + _K0 * n * (
        a_ + (1 - t + c) * a_ ** 3 / 6
        + (5 - 18 * t + t ** 2 + 72 * c - 58 * _EP2) * a_ ** 5 / 120
    )
    y = _K0 * (
        m + n * tan_p * (
            a_ ** 2 / 2 + (5 - t + 9 * c + 4 * c ** 2) * a_ ** 4 / 24
            + (61 - 58 * t + t ** 2 + 600 * c - 330 * _EP2) * a_ ** 6 / 720
        )
    )
    if not north:
        y = y + 10000000.0
    return x, y


def utm_to_geographic(x, y, zone: int, north: bool = True):
    """(easting, northing) metres → (lon, lat) degrees."""
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64)
    if not north:
        y = y - 10000000.0
    m = y / _K0
    mu = m / (_A * _M1)
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1 ** 2
    t1 = tan1 ** 2
    n1 = _A / np.sqrt(1 - _E2 * sin1 ** 2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1 ** 2) ** 1.5
    d = x / (n1 * _K0)
    phi = phi1 - (n1 * tan1 / r1) * (
        d ** 2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * _EP2) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * _EP2 - 3 * c1 ** 2)
        * d ** 6 / 720
    )
    lam = _central_meridian(zone) + (
        d - (1 + 2 * t1 + c1) * d ** 3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * _EP2 + 24 * t1 ** 2)
        * d ** 5 / 120
    ) / cos1
    return np.rad2deg(lam), np.rad2deg(phi)


# Web Mercator (EPSG:3857): spherical formulas on the WGS84
# semi-major axis. Valid for |lat| < ~85.051129° (the square web-tile
# bound); beyond it y diverges, matching the projection's definition.
_R_MERC = _A


def geographic_to_webmercator(lon_deg, lat_deg):
    """(lon, lat) degrees → EPSG:3857 metres."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    x = _R_MERC * np.deg2rad(lon)
    y = _R_MERC * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def webmercator_to_geographic(x, y):
    """EPSG:3857 metres → (lon, lat) degrees."""
    lon = np.rad2deg(np.asarray(x, dtype=np.float64) / _R_MERC)
    lat = np.rad2deg(
        2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _R_MERC))
        - np.pi / 2.0
    )
    return lon, lat


def _epsg_code(crs: str) -> int:
    s = str(crs).upper().strip()
    if s in ("WGS84", "CRS84", "OGC:CRS84"):
        return 4326
    try:
        return int(s.replace("EPSG:", ""))
    except ValueError:
        raise ValueError(
            f"unsupported CRS for dependency-free transform: {crs} "
            "(supported: EPSG:4326, EPSG:3857, UTM EPSG:326xx/327xx)"
        ) from None


def _to_geographic(x, y, code: int, crs: str):
    if code == 4326:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if code == 3857:
        return webmercator_to_geographic(x, y)
    z, n = parse_epsg_utm(crs)
    return utm_to_geographic(x, y, z, n)


def _from_geographic(lon, lat, code: int, crs: str):
    if code == 4326:
        return lon, lat
    if code == 3857:
        return geographic_to_webmercator(lon, lat)
    z, n = parse_epsg_utm(crs)
    return geographic_to_utm(lon, lat, z, n)


def transform_xy(x, y, src_crs: str, dst_crs: str):
    """Transform point arrays between any two supported CRSs
    (EPSG:4326, EPSG:3857, UTM EPSG:326xx/327xx), composing through
    geographic as the hub. Identity short-circuits."""
    if str(src_crs) == str(dst_crs):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    cs, cd = _epsg_code(src_crs), _epsg_code(dst_crs)
    if cs == cd:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = _to_geographic(x, y, cs, src_crs)
    return _from_geographic(lon, lat, cd, dst_crs)
