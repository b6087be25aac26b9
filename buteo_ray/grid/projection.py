"""Map projections from scratch (no pyproj in this environment): WGS84
lon/lat ↔ Web-Mercator (EPSG:3857) and ↔ UTM (transverse Mercator),
plus the reference's auto-UTM-zone picker
(``/root/reference/buteo/utils/utils_projection.py:593-929``,
``_get_utm_epsg_from_latlng``).

Formulas are the standard published ones (Snyder, "Map Projections — A
Working Manual", USGS 1987; public domain): spherical Web-Mercator and
the series-expansion transverse Mercator used by UTM. Accuracy of the
UTM forward/inverse pair is sub-millimeter within a zone — verified by
round-trip tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996  # UTM scale factor

WEB_MERCATOR_MAX_LAT = 85.051128779806604


def lonlat_to_mercator(lon, lat) -> Tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → EPSG:3857 (spherical formulas; lat clamped to the
    Web-Mercator domain)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64),
                  -WEB_MERCATOR_MAX_LAT, WEB_MERCATOR_MAX_LAT)
    x = _A * np.radians(lon)
    y = _A * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def mercator_to_lonlat(x, y) -> Tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _A)
    lat = np.degrees(2 * np.arctan(np.exp(y / _A)) - np.pi / 2)
    return lon, lat


def utm_zone_from_latlng(lat, lon) -> np.ndarray:
    """UTM zone number 1-60 (reference ``_get_utm_epsg_from_latlng``
    semantics: zone = floor((lon+180)/6)+1, clipped)."""
    lon = np.asarray(lon, dtype=np.float64)
    return np.clip(np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1, 1, 60)


def utm_epsg_from_latlng(lat, lon) -> np.ndarray:
    """EPSG code: 326xx north, 327xx south."""
    lat = np.asarray(lat, dtype=np.float64)
    zone = utm_zone_from_latlng(lat, lon)
    return np.where(lat >= 0, 32600 + zone, 32700 + zone)


def lonlat_to_utm(lon, lat, zone: int, south: bool = None) -> Tuple[np.ndarray, np.ndarray]:
    """Forward transverse Mercator (Snyder eq. 8-9..8-15).

    ``south``: the CRS hemisphere designator. None (default) applies the
    10,000,000 m false northing per-point by latitude sign; True forces
    it for every point (EPSG:327xx semantics — an equator-straddling
    dataset in a south zone must not mix offsets); False never applies it.
    """
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon0 = np.radians(-183.0 + 6.0 * zone)

    n = _A / np.sqrt(1 - _E2 * np.sin(lat) ** 2)
    t = np.tan(lat) ** 2
    c = _EP2 * np.cos(lat) ** 2
    a = np.cos(lat) * (lon - lon0)

    m = _A * (
        (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256) * lat
        - (3 * _E2 / 8 + 3 * _E2**2 / 32 + 45 * _E2**3 / 1024) * np.sin(2 * lat)
        + (15 * _E2**2 / 256 + 45 * _E2**3 / 1024) * np.sin(4 * lat)
        - (35 * _E2**3 / 3072) * np.sin(6 * lat)
    )

    easting = _K0 * n * (
        a + (1 - t + c) * a**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a**5 / 120
    ) + 500000.0
    northing = _K0 * (
        m + n * np.tan(lat) * (
            a**2 / 2 + (5 - t + 9 * c + 4 * c**2) * a**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a**6 / 720
        )
    )
    if south is None:
        northing = np.where(np.degrees(lat) < 0, northing + 10000000.0, northing)
    elif south:
        northing = northing + 10000000.0
    return easting, northing


def utm_to_lonlat(easting, northing, zone: int, south: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse transverse Mercator (Snyder eq. 8-18..8-25)."""
    x = np.asarray(easting, dtype=np.float64) - 500000.0
    y = np.asarray(northing, dtype=np.float64)
    if south:
        y = y - 10000000.0
    lon0 = np.radians(-183.0 + 6.0 * zone)

    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))

    lat1 = mu + (
        (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )

    n1 = _A / np.sqrt(1 - _E2 * np.sin(lat1) ** 2)
    t1 = np.tan(lat1) ** 2
    c1 = _EP2 * np.cos(lat1) ** 2
    r1 = _A * (1 - _E2) / (1 - _E2 * np.sin(lat1) ** 2) ** 1.5
    d = x / (n1 * _K0)

    lat = lat1 - (n1 * np.tan(lat1) / r1) * (
        d**2 / 2 - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2) * d**6 / 720
    )
    lon = lon0 + (
        d - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
    ) / np.cos(lat1)
    return np.degrees(lon), np.degrees(lat)


def reproject_points(x, y, src: str, dst: str) -> Tuple[np.ndarray, np.ndarray]:
    """Named-CRS point transform. Supported: 'EPSG:4326', 'EPSG:3857',
    'UTM:<zone>[S]'. The reference's ``reproject_bbox``/``_reproject_point``
    capability (``utils_projection.py:593-929``) without GDAL."""
    def _to_lonlat(x, y, crs):
        if crs == "EPSG:4326":
            return np.asarray(x, np.float64), np.asarray(y, np.float64)
        if crs == "EPSG:3857":
            return mercator_to_lonlat(x, y)
        if crs.startswith("UTM:"):
            z = crs[4:]
            # Undesignated zones use the NORTH convention in BOTH
            # directions (negative northings south of the equator) — a
            # per-point false northing on the forward leg would make the
            # inverse ambiguous and break round trips across the equator.
            south = z.endswith("S")
            return utm_to_lonlat(x, y, int(z.rstrip("NS")), south)
        raise ValueError(f"unsupported CRS {crs}")

    def _from_lonlat(lon, lat, crs):
        if crs == "EPSG:4326":
            return lon, lat
        if crs == "EPSG:3857":
            return lonlat_to_mercator(lon, lat)
        if crs.startswith("UTM:"):
            z = crs[4:]
            # Hemisphere comes from the CRS designator, not point latitude
            # (an equator-straddling dataset must use ONE false northing);
            # undesignated → north convention, matching _to_lonlat.
            south = z.endswith("S")
            return lonlat_to_utm(lon, lat, int(z.rstrip("NS")), south=south)
        raise ValueError(f"unsupported CRS {crs}")

    lon, lat = _to_lonlat(x, y, src)
    return _from_lonlat(lon, lat, dst)


def reproject_bbox(bbox_ogr, src: str, dst: str, densify: int = 21):
    """Reproject an OGR bbox by transforming a densified boundary and
    taking the hull (reference ``reproject_bbox`` semantics)."""
    x_min, x_max, y_min, y_max = (float(v) for v in bbox_ogr)
    xs = np.linspace(x_min, x_max, densify)
    ys = np.linspace(y_min, y_max, densify)
    bx = np.concatenate([xs, xs, np.full(densify, x_min), np.full(densify, x_max)])
    by = np.concatenate([np.full(densify, y_min), np.full(densify, y_max), ys, ys])
    tx, ty = reproject_points(bx, by, src, dst)
    return [float(tx.min()), float(tx.max()), float(ty.min()), float(ty.max())]
