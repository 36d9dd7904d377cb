"""CRS transforms without pyproj/GDAL: WGS84 ↔ UTM as vectorized
numpy (Snyder 1987 transverse-mercator series, the standard public
formulas — USGS PP 1395, eqs 8-9..8-17 / 8-18..8-25).

The reference aligns vector layers to the raster CRS before any
spatial op (georip/geoprocessing/utils.py:425-427 `to_crs`,
georip/datasets/utils.py:249-251). The fixtures' CRSs are UTM zones
(EPSG:326xx), so zone↔zone and zone↔geographic transforms cover the
reference's behavior; accuracy of the series is sub-mm within a
zone's normal extent.

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


def transform_xy(x, y, src_crs: str, dst_crs: str):
    """Transform point arrays between two UTM CRSs (or identity)."""
    if str(src_crs) == str(dst_crs):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    sz, sn = parse_epsg_utm(src_crs)
    dz, dn = parse_epsg_utm(dst_crs)
    lon, lat = utm_to_geographic(x, y, sz, sn)
    return geographic_to_utm(lon, lat, dz, dn)
