"""Slippy-map (XYZ) tiling kernels — closed-form, vectorized.

Re-derives the reference's tile math from the public slippy-map
formulas (the reference delegates to ``smopy.deg2num`` /
``smopy.num2deg``; see /root/reference/geokit/core/srs.py:225-247 and
geom.py:131-241). Golden-tested against the reference suite's tile
indices (test/test_03_geom.py:76-96) and tile envelopes
(test_03_geom.py:31-72).
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import EARTH_R

_ORIGIN = math.pi * EARTH_R  # 20037508.34... (web-mercator half-world)


def deg2num(lat, lon, zoom: int):
    """lon/lat (deg, EPSG:4326) -> integer slippy tile (xi, yi).

    Identical formula to smopy.deg2num (public):
      xi = floor((lon+180)/360 * 2^z)
      yi = floor((1 - asinh(tan(lat_rad))/pi)/2 * 2^z)
    Vectorized over numpy arrays; scalars return python ints.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = 1 << zoom
    lat_rad = np.radians(lat)
    xi = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    yi = np.floor(
        (1.0 - np.arcsinh(np.tan(lat_rad)) / math.pi) / 2.0 * n
    ).astype(np.int64)
    if xi.ndim == 0:
        return int(xi), int(yi)
    return xi, yi


def num2deg(xi, yi, zoom: int):
    """Tile corner (xi, yi may be fractional) -> (lat, lon) degrees."""
    xi = np.asarray(xi, dtype=np.float64)
    yi = np.asarray(yi, dtype=np.float64)
    n = 1 << zoom
    lon = xi / n * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(math.pi * (1.0 - 2.0 * yi / n))))
    if lon.ndim == 0:
        return float(lat), float(lon)
    return lat, lon


def merc_forward(lon, lat):
    """EPSG:4326 -> EPSG:3857 (spherical web mercator), vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = EARTH_R * np.radians(lon)
    y = EARTH_R * np.arcsinh(np.tan(np.radians(lat)))
    return x, y


def merc_inverse(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_R)
    lat = np.degrees(np.arctan(np.sinh(y / EARTH_R)))
    return lon, lat


def tile_bounds_3857(xi: int, yi: int, zoom: int):
    """Tile -> (xmin, ymin, xmax, ymax) in EPSG:3857.

    Matches the reference's geom.tile (geom.py:131-160): corners from
    num2deg reprojected to 3857. Closed form: the web-mercator world is
    [-pi*R, pi*R]^2 split into 2^z x 2^z tiles, y axis flipped.
    """
    n = 1 << zoom
    w = 2.0 * _ORIGIN / n
    xmin = -_ORIGIN + xi * w
    xmax = -_ORIGIN + (xi + 1) * w
    ymax = _ORIGIN - yi * w
    ymin = _ORIGIN - (yi + 1) * w
    return xmin, ymin, xmax, ymax


def _rings_3857(verts_lonlat):
    """Normalize a polygon parameter (ring or ring list) to open
    4326 rings + their EPSG:3857 projections."""
    from .pip import as_rings

    rings, rings_m = [], []
    for ring in as_rings(verts_lonlat):
        v = [(float(x), float(y)) for x, y in ring]
        if v[0] == v[-1]:
            v = v[:-1]
        mx, my = merc_forward(
            np.array([p[0] for p in v]), np.array([p[1] for p in v])
        )
        rings.append(v)
        rings_m.append(list(zip(mx.tolist(), my.tolist())))
    return rings, rings_m


def _clip_rings_box(rings_3857, box):
    """Per-ring Sutherland-Hodgman clip; returns (pieces, net_area)
    where pieces = [outer_piece, hole_piece, ...] (empty clips
    dropped) and net_area = |outer ∩ box| - sum |hole ∩ box| (holes
    are nested inside the outer, so the difference is the true
    region-tile intersection area)."""
    from .pip import clip_poly_box, poly_area

    out = clip_poly_box(rings_3857[0], box)
    if len(out) < 3:
        return [], 0.0
    net = poly_area(out)
    if net <= 0.0:
        return [], 0.0
    pieces = [out]
    for hole in rings_3857[1:]:
        hc = clip_poly_box(hole, box)
        if len(hc) >= 3:
            a = poly_area(hc)
            if a > 0.0:
                pieces.append(hc)
                net -= a
    return pieces, net


def sub_tiles(verts_lonlat, zoom: int, check_intersect: bool = True):
    """Tiles covering a polygon (reference geom.subTiles, geom.py:195-241).

    verts_lonlat: [(lon, lat), ...] ring (open or closed) or a ring
    list [outer, hole, ...] — tiles fully inside a hole are excluded
    (net intersection area = 0), matching the reference's any-geometry
    contract. Yields (xi, yi, zoom) in the reference's iteration order
    (xi-major, then yi).
    """
    rings, rings_m = _rings_3857(verts_lonlat)
    lons = [v[0] for v in rings[0]]
    lats = [v[1] for v in rings[0]]
    tl_xi, tl_yi = deg2num(max(lats), min(lons), zoom)
    br_xi, br_yi = deg2num(min(lats), max(lons), zoom)

    for xi in range(tl_xi, br_xi + 1):
        for yi in range(tl_yi, br_yi + 1):
            if check_intersect:
                box = tile_bounds_3857(xi, yi, zoom)
                _, net = _clip_rings_box(rings_m, box)
                if net <= 0.0:
                    continue
            yield (xi, yi, zoom)


def tileize(verts_lonlat, zoom: int):
    """Split a polygon into per-tile intersections in EPSG:3857
    (reference geom.tileize, geom.py:244-251). Yields
    ((xi, yi, zoom), clipped_verts_3857) for a single ring; for a ring
    list [outer, hole, ...] the piece is itself a ring list
    [outer_piece, hole_piece, ...] whose net (outer - holes) areas sum
    to the donut's 3857 area."""
    rings, rings_m = _rings_3857(verts_lonlat)
    single = len(rings) == 1
    for xi, yi, z in sub_tiles(rings[0], zoom, check_intersect=False):
        box = tile_bounds_3857(xi, yi, z)
        pieces, net = _clip_rings_box(rings_m, box)
        if pieces and net > 0.0:
            yield (xi, yi, z), (pieces[0] if single else pieces)
