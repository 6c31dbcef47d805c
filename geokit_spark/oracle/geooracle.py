"""Golden-constant DuckDB oracles for operators whose semantics are
not SQL-expressible (SURVEY §7 hard parts): slippy sub-tiling, polygon
clipping, cross-tile connected components, contour statistics.

These queries depend only on the literal fixture polygons and the
closed-form synthetic rasters — never on the scale factor — so their
expected outputs are constants. Each generator below derives those
constants with an INDEPENDENTLY WRITTEN driver-side implementation
(fresh clipping / PIP / flood-fill code, not the engine kernels) and
emits them as a VALUES table; the driver then hash-compares the
distributed engine result against it at any sf. contours is the one
exception: its golden reuses kernels.contours on the full matrix (the
kernel itself is pinned by hand-case pytest goldens), so the oracle
verifies the tiling / halo-exchange / aggregation machinery.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import RASTER_H, RASTER_W
from .sqlgen import d


# ---------------------------------------------------------------------------
# fresh geometry helpers (independent of kernels.pip)


def _ring(verts):
    v = [(float(x), float(y)) for x, y in verts]
    if len(v) > 1 and v[0] == v[-1]:
        v = v[:-1]
    return v


def _shoelace(v) -> float:
    if len(v) < 3:
        return 0.0
    s = 0.0
    for i in range(len(v)):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % len(v)]
        s += x0 * y1 - x1 * y0
    return abs(s) / 2.0


def _halfplane_clip(v, a, b, c):
    """Clip ring v to the half-plane a*x + b*y <= c."""
    out = []
    n = len(v)
    for i in range(n):
        (x0, y0), (x1, y1) = v[i], v[(i + 1) % n]
        d0 = a * x0 + b * y0 - c
        d1 = a * x1 + b * y1 - c
        if d0 <= 0:
            out.append((x0, y0))
            if d1 > 0:
                t = d0 / (d0 - d1)
                out.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0)))
        elif d1 <= 0:
            t = d0 / (d0 - d1)
            out.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0)))
    return out


def clip_box_fresh(verts, box):
    """Polygon ∩ axis-aligned box via four half-plane clips."""
    xmin, ymin, xmax, ymax = box
    v = _ring(verts)
    for a, b, c in (
        (-1.0, 0.0, -xmin),  # x >= xmin
        (1.0, 0.0, xmax),    # x <= xmax
        (0.0, -1.0, -ymin),  # y >= ymin
        (0.0, 1.0, ymax),    # y <= ymax
    ):
        if not v:
            return []
        v = _halfplane_clip(v, a, b, c)
    return v


# ---------------------------------------------------------------------------
# subtiles_zones golden


def _deg2num_fresh(lat: float, lon: float, zoom: int):
    n = 1 << zoom
    xi = math.floor((lon + 180.0) / 360.0 * n)
    yi = math.floor(
        (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2.0 * n
    )
    return int(xi), int(yi)


def _merc_fresh(lon: float, lat: float):
    from ..constants import EARTH_R

    return (
        EARTH_R * math.radians(lon),
        EARTH_R * math.asinh(math.tan(math.radians(lat))),
    )


def subtiles_rows(zoom: int = 15) -> list[tuple[int, int]]:
    """(zone_id, n_tiles): slippy tiles at `zoom` genuinely intersected
    by each zone polygon (positive clip area in EPSG:3857)."""
    from ..constants import EARTH_R
    from ..fixtures import ZONES

    origin = math.pi * EARTH_R
    n = 1 << zoom
    w = 2.0 * origin / n
    rows = []
    for z in ZONES:
        verts = _ring(z["verts"])
        lons = [v[0] for v in verts]
        lats = [v[1] for v in verts]
        tl = _deg2num_fresh(max(lats), min(lons), zoom)
        br = _deg2num_fresh(min(lats), max(lons), zoom)
        verts_3857 = [_merc_fresh(x, y) for x, y in verts]
        count = 0
        for xi in range(tl[0], br[0] + 1):
            for yi in range(tl[1], br[1] + 1):
                box = (
                    -origin + xi * w,
                    origin - (yi + 1) * w,
                    -origin + (xi + 1) * w,
                    origin - yi * w,
                )
                clipped = clip_box_fresh(verts_3857, box)
                if len(clipped) >= 3 and _shoelace(clipped) > 0.0:
                    count += 1
        rows.append((int(z["zone_id"]), count))
    return rows


def subtiles_sql(zoom: int = 15) -> str:
    vals = ",".join(f"({z},{c})" for z, c in subtiles_rows(zoom))
    return f"""
WITH golden(zone_id, n_tiles) AS (VALUES {vals})
SELECT CAST(zone_id AS INT) AS zone_id, CAST(n_tiles AS INT) AS n_tiles
FROM golden
"""


# ---------------------------------------------------------------------------
# extract_clip golden


def extract_clip_rows(clip_box, min_share: float = 0.001):
    """(zone_id, area_share, year_scaled) via the fresh half-plane
    clipper. area_share/year_scaled floats are computed here exactly
    as the engine defines them (clip area / full area; year * share) —
    per-row arithmetic, no distributed reduction, so the doubles are
    stable constants."""
    from ..fixtures import ZONES

    rows = []
    for z in ZONES:
        verts = _ring(z["verts"])
        full = _shoelace(verts)
        clipped = clip_box_fresh(verts, clip_box)
        a = _shoelace(clipped) if len(clipped) >= 3 else 0.0
        share = a / full if full > 0 else 0.0
        if share < min_share:
            continue
        rows.append((int(z["zone_id"]), share, z["year"] * share))
    return rows


def extract_clip_sql(clip_box, min_share: float = 0.001) -> str:
    vals = ",".join(
        f"({z},{d(s)},{d(y)})" for z, s, y in extract_clip_rows(clip_box, min_share)
    )
    return f"""
WITH golden(zone_id, area_share, year_scaled) AS (VALUES {vals})
SELECT CAST(zone_id AS INT) AS zone_id, area_share, year_scaled FROM golden
"""


# ---------------------------------------------------------------------------
# connected_components golden (independent block-level flood fill)


def components_rows():
    """(value, n_components, n_pixels, max_component) for the clc
    raster. The clc field is constant on 8x8 pixel blocks, so pixel
    4-connectivity components are exactly block-grid components x 64
    pixels — an independent route that never touches tiles or seams."""
    from ..kernels.raster_fields import clc_value

    bw, bh = RASTER_W // 8, RASTER_H // 8
    bx, by = np.meshgrid(np.arange(bw), np.arange(bh), indexing="ij")
    # block value: clc at the block's top-left pixel
    val = clc_value(bx.ravel() * 8, by.ravel() * 8).reshape(bw, bh)
    seen = np.zeros((bw, bh), dtype=bool)
    comps: list[tuple[int, int]] = []  # (value, n_blocks)
    for sx in range(bw):
        for sy in range(bh):
            if seen[sx, sy]:
                continue
            v = int(val[sx, sy])
            stack = [(sx, sy)]
            seen[sx, sy] = True
            n = 0
            while stack:
                cx, cy = stack.pop()
                n += 1
                for nx, ny in ((cx - 1, cy), (cx + 1, cy), (cx, cy - 1), (cx, cy + 1)):
                    if 0 <= nx < bw and 0 <= ny < bh and not seen[nx, ny] and int(val[nx, ny]) == v:
                        seen[nx, ny] = True
                        stack.append((nx, ny))
            comps.append((v, n * 64))
    agg: dict[int, list[int]] = {}
    for v, npix in comps:
        agg.setdefault(v, []).append(npix)
    return [
        (float(v), len(sizes), int(sum(sizes)), int(max(sizes)))
        for v, sizes in sorted(agg.items())
    ]


def components_sql() -> str:
    vals = ",".join(
        f"({d(v)},{nc},{np_},{mx})" for v, nc, np_, mx in components_rows()
    )
    return f"""
WITH golden(value, n_components, n_pixels, max_component) AS (VALUES {vals})
SELECT value, CAST(n_components AS BIGINT) AS n_components,
       CAST(n_pixels AS BIGINT) AS n_pixels,
       CAST(max_component AS BIGINT) AS max_component
FROM golden
"""


# ---------------------------------------------------------------------------
# contours golden (full-matrix application of the pinned kernel)


def contours_rows(levels):
    from ..kernels.contours import contour_stats_per_level_q
    from ..kernels.raster_fields import elev_value

    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H), indexing="xy")
    m = elev_value(ix, iy).astype(np.float64)
    return contour_stats_per_level_q(m, levels)


def contours_sql(levels) -> str:
    vals = ",".join(
        f"({d(lv)},{n},{d(q / 1048576.0)})" for lv, n, q in contours_rows(levels)
    )
    return f"""
WITH golden(level, n_segments, total_length) AS (VALUES {vals})
SELECT level, CAST(n_segments AS BIGINT) AS n_segments, total_length
FROM golden
"""


# ---------------------------------------------------------------------------
# fresh scalar ellipsoidal LAEA (EPSG method 1027, GN7-2 oblique case)
# — independent of kernels.srs (math-module scalars, no numpy)

_A = 6378137.0
_F_ = 1.0 / 298.257222101
_E2 = _F_ * (2.0 - _F_)
_E = math.sqrt(_E2)


def _q_scalar(phi: float) -> float:
    s = math.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * math.log((1.0 - _E * s) / (1.0 + _E * s))
    )


def laea_forward_fresh(lon: float, lat: float,
                       lat0: float = 52.0, lon0: float = 10.0,
                       fe: float = 4321000.0, fn: float = 3210000.0):
    qp = _q_scalar(math.pi / 2.0)
    phi0 = math.radians(lat0)
    beta0 = math.asin(_q_scalar(phi0) / qp)
    rq = _A * math.sqrt(qp / 2.0)
    dd = _A * (
        math.cos(phi0) / math.sqrt(1.0 - _E2 * math.sin(phi0) ** 2)
    ) / (rq * math.cos(beta0))
    beta = math.asin(_q_scalar(math.radians(lat)) / qp)
    lam = math.radians(lon - lon0)
    b = rq * math.sqrt(
        2.0
        / (
            1.0
            + math.sin(beta0) * math.sin(beta)
            + math.cos(beta0) * math.cos(beta) * math.cos(lam)
        )
    )
    e = fe + b * dd * math.cos(beta) * math.sin(lam)
    n = fn + (b / dd) * (
        math.cos(beta0) * math.sin(beta)
        - math.sin(beta0) * math.cos(beta) * math.cos(lam)
    )
    return e, n


def srs_transform_rows(zones) -> list[tuple]:
    """Golden rows (zone_id, e3035_q, n3035_q, x3857_q, y3857_q),
    coordinates floor-quantized to 0.1 mm (x1e4) — absorbs the <=2 ULP
    libm-vs-numpy drift while staying deterministic."""
    out = []
    for z in zones:
        xs = [float(v[0]) for v in z["verts"]]
        ys = [float(v[1]) for v in z["verts"]]
        cx = (((xs[0] + xs[1]) + xs[2]) + xs[3]) / 4.0
        cy = (((ys[0] + ys[1]) + ys[2]) + ys[3]) / 4.0
        e, n = laea_forward_fresh(cx, cy)
        mx, my = _merc_fresh(cx, cy)
        out.append(
            (
                z["zone_id"],
                math.floor(e * 10000.0),
                math.floor(n * 10000.0),
                math.floor(mx * 10000.0),
                math.floor(my * 10000.0),
            )
        )
    return out


def lcc_forward_fresh(
    lon: float, lat: float,
    lat0: float, lon0: float, lat1: float, lat2: float,
    fe: float, fn: float,
):
    """Independently written scalar LCC 2SP (EPSG method 9802, GRS80)
    — math.* only, no shared code with kernels.srs.lcc_forward."""
    a = 6378137.0
    rf = 298.257222101
    f = 1.0 / rf
    e2 = 2.0 * f - f * f
    ec = math.sqrt(e2)

    def m(phi):
        return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)

    def t(phi):
        es = ec * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - es) / (1.0 + es)
        ) ** (ec / 2.0)

    p0, p1, p2 = (math.radians(v) for v in (lat0, lat1, lat2))
    n = (math.log(m(p1)) - math.log(m(p2))) / (
        math.log(t(p1)) - math.log(t(p2))
    )
    big_f = m(p1) / (n * t(p1) ** n)
    r0 = a * big_f * t(p0) ** n
    r = a * big_f * t(math.radians(lat)) ** n
    th = n * math.radians(lon - lon0)
    return fe + r * math.sin(th), fn + r0 - r * math.cos(th)


def srs_transform_lcc_rows(zones) -> list[tuple]:
    """Golden rows (zone_id, e2154_q, n2154_q, e3034_q, n3034_q),
    floor-quantized to 0.1 mm like srs_transform_rows."""
    out = []
    for z in zones:
        xs = [float(v[0]) for v in z["verts"]]
        ys = [float(v[1]) for v in z["verts"]]
        cx = (((xs[0] + xs[1]) + xs[2]) + xs[3]) / 4.0
        cy = (((ys[0] + ys[1]) + ys[2]) + ys[3]) / 4.0
        e1, n1 = lcc_forward_fresh(
            cx, cy, 46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0
        )
        e3, n3 = lcc_forward_fresh(
            cx, cy, 52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0
        )
        out.append(
            (
                z["zone_id"],
                math.floor(e1 * 10000.0),
                math.floor(n1 * 10000.0),
                math.floor(e3 * 10000.0),
                math.floor(n3 * 10000.0),
            )
        )
    return out


def srs_transform_lcc_sql(zones) -> str:
    rows = ",".join(
        f"({zid},{e1},{n1},{e3},{n3})"
        for zid, e1, n1, e3, n3 in srs_transform_lcc_rows(zones)
    )
    return f"""
WITH golden(zone_id, e2154_q, n2154_q, e3034_q, n3034_q) AS (VALUES {rows})
SELECT CAST(zone_id AS INT) AS zone_id,
       CAST(e2154_q AS BIGINT) AS e2154_q,
       CAST(n2154_q AS BIGINT) AS n2154_q,
       CAST(e3034_q AS BIGINT) AS e3034_q,
       CAST(n3034_q AS BIGINT) AS n3034_q
FROM golden
"""


def omerc_forward_fresh(
    lon: float, lat: float,
    latc: float, lonc: float, alphac: float, gammac: float,
    k0: float, fe: float, fn: float, variant_b: bool,
):
    """Independently written scalar Hotine oblique Mercator (EPSG
    methods 9812/9815, GRS80) — math.* only, no shared code with
    kernels.srs.omerc_forward (that path is numpy-vectorized with
    cached constants; this one recomputes everything inline from the
    GN7-2 published equations)."""
    a = 6378137.0
    rf = 298.257222101
    f = 1.0 / rf
    e2 = 2.0 * f - f * f
    ec = math.sqrt(e2)

    def t_of(phi):
        es = ec * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) * (
            (1.0 + es) / (1.0 - es)
        ) ** (ec / 2.0)

    pc = math.radians(latc)
    al = math.radians(alphac)
    ga = math.radians(gammac)
    bb = math.sqrt(1.0 + e2 * math.cos(pc) ** 4 / (1.0 - e2))
    aa = a * bb * k0 * math.sqrt(1.0 - e2) / (
        1.0 - e2 * math.sin(pc) ** 2
    )
    dd = bb * math.sqrt(1.0 - e2) / (
        math.cos(pc) * math.sqrt(1.0 - e2 * math.sin(pc) ** 2)
    )
    d2 = dd * dd if dd > 1.0 else 1.0
    sgn = 1.0 if latc >= 0.0 else -1.0
    ff = dd + math.sqrt(d2 - 1.0) * sgn
    hh = ff * t_of(pc) ** bb
    gg = (ff - 1.0 / ff) / 2.0
    g0 = math.asin(math.sin(al) / dd)
    l0 = math.radians(lonc) - math.asin(gg * math.tan(g0)) / bb
    tt = t_of(math.radians(lat))
    qq = hh / tt**bb
    ss = (qq - 1.0 / qq) / 2.0
    big_t = (qq + 1.0 / qq) / 2.0
    dl = bb * (math.radians(lon) - l0)
    vv = math.sin(dl)
    uu = (-vv * math.cos(g0) + ss * math.sin(g0)) / big_t
    v = aa * math.log((1.0 - uu) / (1.0 + uu)) / (2.0 * bb)
    u = aa * math.atan2(
        ss * math.cos(g0) + vv * math.sin(g0), math.cos(dl)
    ) / bb
    if variant_b:
        u -= (aa / bb) * math.atan2(
            sgn * math.sqrt(d2 - 1.0), abs(math.cos(al))
        )
    return (
        fe + v * math.cos(ga) + u * math.sin(ga),
        fn + u * math.cos(ga) - v * math.sin(ga),
    )


# ad-hoc Hotine grids centered over the zones fixture (50.7N 6.2E):
# a variant-B strip at azimuth 35 and a variant-A strip at azimuth
# -25 — the two code paths under the driver gate on data-local points
OMERC_B_PARAMS = (50.7, 6.2, 35.0, 35.0, 0.9996, 100000.0, 50000.0)
OMERC_A_PARAMS = (50.7, 6.2, -25.0, -25.0, 1.0, 0.0, 0.0)


def srs_transform_omerc_rows(zones) -> list[tuple]:
    """Golden rows (zone_id, eb_q, nb_q, ea_q, na_q): zone centroids
    through both ad-hoc Hotine grids, floor-quantized to 0.1 mm
    (x1e4) like the other srs_transform goldens."""
    out = []
    for z in zones:
        xs = [float(v[0]) for v in z["verts"]]
        ys = [float(v[1]) for v in z["verts"]]
        cx = (((xs[0] + xs[1]) + xs[2]) + xs[3]) / 4.0
        cy = (((ys[0] + ys[1]) + ys[2]) + ys[3]) / 4.0
        latc, lonc, al, ga, k0, fe, fn = OMERC_B_PARAMS
        eb, nb = omerc_forward_fresh(
            cx, cy, latc, lonc, al, ga, k0, fe, fn, variant_b=True
        )
        latc, lonc, al, ga, k0, fe, fn = OMERC_A_PARAMS
        ea, na = omerc_forward_fresh(
            cx, cy, latc, lonc, al, ga, k0, fe, fn, variant_b=False
        )
        out.append(
            (
                z["zone_id"],
                math.floor(eb * 10000.0),
                math.floor(nb * 10000.0),
                math.floor(ea * 10000.0),
                math.floor(na * 10000.0),
            )
        )
    return out


def srs_transform_omerc_sql(zones) -> str:
    rows = ",".join(
        f"({zid},{eb},{nb},{ea},{na})"
        for zid, eb, nb, ea, na in srs_transform_omerc_rows(zones)
    )
    return f"""
WITH golden(zone_id, eb_q, nb_q, ea_q, na_q) AS (VALUES {rows})
SELECT CAST(zone_id AS INT) AS zone_id,
       CAST(eb_q AS BIGINT) AS eb_q,
       CAST(nb_q AS BIGINT) AS nb_q,
       CAST(ea_q AS BIGINT) AS ea_q,
       CAST(na_q AS BIGINT) AS na_q
FROM golden
"""


def eqc_forward_fresh(lon: float, lat: float):
    """Independently written scalar equidistant cylindrical
    (EPSG:4087, WGS84, standard parallel 0) — math.* only, expression
    trees mirrored against kernels.srs.eqc_forward (same Krüger
    rectifying-series formulation typed fresh; this box's numpy
    float64 trig resolves to the same libm, and the 0.1 mm floor
    quantization absorbs residual ULPs like the LAEA/LCC goldens)."""
    a = 6378137.0
    rf = 298.257223563
    f = 1.0 / rf
    n3 = f / (2.0 - f)
    tm_a = a / (1.0 + n3) * (
        1.0 + n3**2 / 4.0 + n3**4 / 64.0 + n3**6 / 256.0
    )
    alpha = [
        n3 / 2.0 - 2.0 * n3**2 / 3.0 + 5.0 * n3**3 / 16.0
        + 41.0 * n3**4 / 180.0 - 127.0 * n3**5 / 288.0
        + 7891.0 * n3**6 / 37800.0,
        13.0 * n3**2 / 48.0 - 3.0 * n3**3 / 5.0 + 557.0 * n3**4 / 1440.0
        + 281.0 * n3**5 / 630.0 - 1983433.0 * n3**6 / 1935360.0,
        61.0 * n3**3 / 240.0 - 103.0 * n3**4 / 140.0
        + 15061.0 * n3**5 / 26880.0 + 167603.0 * n3**6 / 181440.0,
        49561.0 * n3**4 / 161280.0 - 179.0 * n3**5 / 168.0
        + 6601661.0 * n3**6 / 7257600.0,
        34729.0 * n3**5 / 80640.0 - 3418889.0 * n3**6 / 1995840.0,
        212378941.0 * n3**6 / 319334400.0,
    ]
    phi = math.radians(lat)
    sphi = math.sin(phi)
    cn = 2.0 * math.sqrt(n3) / (1.0 + n3)
    t = math.sinh(math.atanh(sphi) - cn * math.atanh(cn * sphi))
    xi_p = math.atan2(t, math.cos(0.0))
    xi = xi_p
    for j, aj in enumerate(alpha, start=1):
        xi = xi + aj * math.sin(2.0 * j * xi_p) * math.cosh(0.0)
    return a * math.radians(lon), tm_a * xi


def aea_forward_fresh(lon: float, lat: float):
    """Independently written scalar Albers (EPSG:5070 Conus Albers,
    GRS80) — math.* only, no shared code with kernels.srs."""
    a = 6378137.0
    rf = 298.257222101
    f = 1.0 / rf
    e2 = 2.0 * f - f * f
    ec = math.sqrt(e2)

    def q_of(latd):
        s = math.sin(math.radians(latd))
        es = ec * s
        return (1.0 - e2) * (
            s / (1.0 - e2 * s * s)
            - (1.0 / (2.0 * ec)) * math.log((1.0 - es) / (1.0 + es))
        )

    def m_of(latd):
        p = math.radians(latd)
        return math.cos(p) / math.sqrt(1.0 - e2 * math.sin(p) ** 2)

    lat1, lat2, lat0, lon0 = 29.5, 45.5, 23.0, -96.0
    m1, q1 = m_of(lat1), q_of(lat1)
    n = (m1 * m1 - m_of(lat2) ** 2) / (q_of(lat2) - q1)
    big_c = m1 * m1 + n * q1
    rho0 = a * math.sqrt(big_c - n * q_of(lat0)) / n
    rho = a * math.sqrt(big_c - n * q_of(lat)) / n
    theta = n * math.radians(lon - lon0)
    return rho * math.sin(theta), rho0 - rho * math.cos(theta)


def moll_forward_fresh(lon: float, lat: float):
    """Independently written scalar Mollweide (ESRI:54009, radius-a
    convention) — the theta Newton mirrors kernels.srs.moll_forward's
    fixed 20 guarded rounds tree-for-tree so the fixpoint lands on
    the identical float64."""
    a = 6378137.0
    phi = math.radians(lat)
    pol = abs(abs(phi) - math.pi / 2.0) < 1e-12
    rhs = math.pi * math.sin(phi)
    th = phi
    for _ in range(20):
        d = 2.0 + 2.0 * math.cos(2.0 * th)
        if pol or d < 1e-14:
            step = 0.0
        else:
            step = (2.0 * th + math.sin(2.0 * th) - rhs) / max(d, 1e-14)
        th = th - step
    sq2 = math.sqrt(2.0)
    x = (2.0 * sq2 / math.pi) * a * math.radians(lon) * math.cos(th)
    return x, sq2 * a * math.sin(th)


def sinu_forward_fresh(lon: float, lat: float):
    """Independently written scalar MODIS sinusoidal (authalic sphere
    R = 6371007.181) — math.* only."""
    big_r = 6371007.181
    phi = math.radians(lat)
    return (
        big_r * math.radians(lon) * math.cos(phi),
        big_r * phi,
    )


def srs_transform_world_rows(zones) -> list[tuple]:
    """Golden rows (zone_id, eqx_q, eqy_q, abx_q, aby_q, mox_q,
    moy_q, six_q, siy_q): zone centroids through EPSG:4087
    (equidistant cylindrical), EPSG:5070 (Conus Albers), ESRI:54009
    (Mollweide) and the MODIS sinusoidal grid, floor-quantized to
    0.1 mm (x1e4)."""
    out = []
    for z in zones:
        xs = [float(v[0]) for v in z["verts"]]
        ys = [float(v[1]) for v in z["verts"]]
        cx = (((xs[0] + xs[1]) + xs[2]) + xs[3]) / 4.0
        cy = (((ys[0] + ys[1]) + ys[2]) + ys[3]) / 4.0
        ex, ey = eqc_forward_fresh(cx, cy)
        ax, ay = aea_forward_fresh(cx, cy)
        mx, my = moll_forward_fresh(cx, cy)
        sx, sy = sinu_forward_fresh(cx, cy)
        out.append(
            (
                z["zone_id"],
                math.floor(ex * 10000.0),
                math.floor(ey * 10000.0),
                math.floor(ax * 10000.0),
                math.floor(ay * 10000.0),
                math.floor(mx * 10000.0),
                math.floor(my * 10000.0),
                math.floor(sx * 10000.0),
                math.floor(sy * 10000.0),
            )
        )
    return out


def srs_transform_world_sql(zones) -> str:
    rows = ",".join(
        "(" + ",".join(str(v) for v in r) + ")"
        for r in srs_transform_world_rows(zones)
    )
    return f"""
WITH golden(zone_id, eqx_q, eqy_q, abx_q, aby_q, mox_q, moy_q,
            six_q, siy_q)
  AS (VALUES {rows})
SELECT CAST(zone_id AS INT) AS zone_id,
       CAST(eqx_q AS BIGINT) AS eqx_q,
       CAST(eqy_q AS BIGINT) AS eqy_q,
       CAST(abx_q AS BIGINT) AS abx_q,
       CAST(aby_q AS BIGINT) AS aby_q,
       CAST(mox_q AS BIGINT) AS mox_q,
       CAST(moy_q AS BIGINT) AS moy_q,
       CAST(six_q AS BIGINT) AS six_q,
       CAST(siy_q AS BIGINT) AS siy_q
FROM golden
"""


def srs_transform_sql(zones) -> str:
    rows = ",".join(
        f"({zid},{e},{n},{x},{y})"
        for zid, e, n, x, y in srs_transform_rows(zones)
    )
    return f"""
WITH golden(zone_id, e3035_q, n3035_q, x3857_q, y3857_q) AS (VALUES {rows})
SELECT CAST(zone_id AS INT) AS zone_id,
       CAST(e3035_q AS BIGINT) AS e3035_q,
       CAST(n3035_q AS BIGINT) AS n3035_q,
       CAST(x3857_q AS BIGINT) AS x3857_q,
       CAST(y3857_q AS BIGINT) AS y3857_q
FROM golden
"""


# ---------------------------------------------------------------------------
# polygonize golden: independent flood fill + edge counting + Euler
# characteristic for ring counts (never touches tiles/seams/tracing)


def polygonize_rows(v=None):
    """(value, n, nh, nv, area_px, n_rings) per 4-connected component
    of a banded raster (default v = floor(elev/200); pass any (H, W)
    float matrix to golden-check other bandings — contour_polygons
    uses the edge-count banding). nh/nv = horizontal/vertical unit
    boundary edges; n_rings = 1 + holes with holes from the Euler
    characteristic h = 1 - V + E - F of the cell complex."""
    from ..kernels.raster_fields import elev_value

    iy, ix = np.meshgrid(
        np.arange(RASTER_H, dtype=np.int64),
        np.arange(RASTER_W, dtype=np.int64),
        indexing="ij",
    )
    if v is None:
        v = np.floor(elev_value(ix, iy).astype(np.float64) / 200.0)
    h_, w_ = v.shape
    lab = -np.ones((h_, w_), dtype=np.int64)
    nxt = 0
    for sy in range(h_):
        for sx in range(w_):
            if lab[sy, sx] >= 0:
                continue
            val = v[sy, sx]
            stack = [(sy, sx)]
            lab[sy, sx] = nxt
            while stack:
                cy, cx = stack.pop()
                for ny, nx in ((cy - 1, cx), (cy + 1, cx),
                               (cy, cx - 1), (cy, cx + 1)):
                    if (0 <= ny < h_ and 0 <= nx < w_
                            and lab[ny, nx] < 0 and v[ny, nx] == val):
                        lab[ny, nx] = nxt
                        stack.append((ny, nx))
            nxt += 1

    flat = lab.ravel()
    n = np.bincount(flat, minlength=nxt)
    first = np.full(nxt, -1, dtype=np.int64)
    first[flat[::-1]] = np.arange(flat.size - 1, -1, -1)
    vals = v.ravel()[first]

    # horizontal boundary edges (between vertically-adjacent cells +
    # raster top/bottom borders)
    nh = np.zeros(nxt, dtype=np.int64)
    diff = lab[1:, :] != lab[:-1, :]
    nh += np.bincount(lab[:-1, :][diff], minlength=nxt)
    nh += np.bincount(lab[1:, :][diff], minlength=nxt)
    nh += np.bincount(lab[0, :], minlength=nxt)
    nh += np.bincount(lab[-1, :], minlength=nxt)
    nv = np.zeros(nxt, dtype=np.int64)
    diff = lab[:, 1:] != lab[:, :-1]
    nv += np.bincount(lab[:, :-1][diff], minlength=nxt)
    nv += np.bincount(lab[:, 1:][diff], minlength=nxt)
    nv += np.bincount(lab[:, 0], minlength=nxt)
    nv += np.bincount(lab[:, -1], minlength=nxt)

    # Euler: F=n; E = 4n - shared; V = distinct corners per component
    shared = np.zeros(nxt, dtype=np.int64)
    same = lab[1:, :] == lab[:-1, :]
    shared += np.bincount(lab[:-1, :][same], minlength=nxt)
    same = lab[:, 1:] == lab[:, :-1]
    shared += np.bincount(lab[:, :-1][same], minlength=nxt)
    e_cnt = 4 * n - shared
    corners = []
    for dy in (0, 1):
        for dx in (0, 1):
            key = ((ix + dx) << 32) | (iy + dy)
            corners.append(
                np.stack([flat, key.ravel()], axis=1)
            )
    allc = np.concatenate(corners)
    uniq = np.unique(allc, axis=0)
    v_cnt = np.bincount(uniq[:, 0], minlength=nxt)
    holes = 1 - v_cnt + e_cnt - n
    return [
        (float(vals[i]), int(n[i]), int(nh[i]), int(nv[i]),
         float(n[i]), int(1 + holes[i]))
        for i in range(nxt)
    ]


def polygonize_sql() -> str:
    rows = ",".join(
        f"({d(v)},{n},{nh},{nv},{d(apx)},{nr})"
        for v, n, nh, nv, apx, nr in polygonize_rows()
    )
    return f"""
WITH golden(value, n, nh, nv, area_px, n_rings) AS (VALUES {rows})
SELECT value, CAST(n AS BIGINT) AS n, CAST(nh AS BIGINT) AS nh,
       CAST(nv AS BIGINT) AS nv, area_px, CAST(n_rings AS INT) AS n_rings
FROM golden
"""


# ---------------------------------------------------------------------------
# geometry scalar ops golden: fresh half-plane-based convex clip +
# scalar perimeter / DP (independent of kernels.geom_ops)


def _clip_by_convex_fresh(subject, clip):
    """Clip `subject` by convex `clip` using the half-plane clipper."""
    v = _ring(subject)
    c = _ring(clip)
    if _shoelace_signed(c) < 0.0:
        c = c[::-1]
    n = len(c)
    for i in range(n):
        if not v:
            return []
        (x0, y0), (x1, y1) = c[i], c[(i + 1) % n]
        # inside == left of edge: (x1-x0)*(y-y0) - (y1-y0)*(x-x0) >= 0
        # as a*x + b*y <= cc with a = (y1-y0), b = -(x1-x0)
        a = y1 - y0
        b = -(x1 - x0)
        cc = a * x0 + b * y0
        v = _halfplane_clip(v, a, b, cc)
    return v


def _shoelace_signed(v) -> float:
    s = 0.0
    for i in range(len(v)):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % len(v)]
        s += x0 * y1 - x1 * y0
    return s / 2.0


def _perimeter_fresh(verts) -> float:
    v = _ring(verts)
    total = 0.0
    for i in range(len(v)):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % len(v)]
        dx, dy = x1 - x0, y1 - y0
        total = total + math.sqrt(dx * dx + dy * dy)
    return total


def geom_ops_rows(region_verts, zones, q: float = 1e10):
    """(zone_id, perim_q, isect_q, rdiff_q, n_simplified) — perimeter
    of the zone ring, area(region ∩ zone), area(region) - isect, and
    the Douglas-Peucker vertex count of the midpoint-densified zone
    (collinear midpoints must all drop). floor-quantized at `q`."""
    out = []
    region_area = abs(_shoelace_signed(_ring(region_verts)))
    for z in zones:
        verts = _ring(z["verts"])
        clipped = _clip_by_convex_fresh(region_verts, verts)
        isect = abs(_shoelace_signed(clipped)) if len(clipped) >= 3 else 0.0
        perim = _perimeter_fresh(verts)
        # densify with midpoints -> DP at any tol > 0 restores 4 verts
        n_simp = 4
        out.append(
            (
                int(z["zone_id"]),
                math.floor(perim * q),
                math.floor(isect * q),
                math.floor((region_area - isect) * q),
                n_simp,
            )
        )
    return out


def geom_ops_sql(region_verts, zones) -> str:
    rows = ",".join(
        f"({zid},{p},{i},{dd},{ns})"
        for zid, p, i, dd, ns in geom_ops_rows(region_verts, zones)
    )
    return f"""
WITH golden(zone_id, perim_q, isect_q, rdiff_q, n_simplified) AS (VALUES {rows})
SELECT CAST(zone_id AS INT) AS zone_id,
       CAST(perim_q AS BIGINT) AS perim_q,
       CAST(isect_q AS BIGINT) AS isect_q,
       CAST(rdiff_q AS BIGINT) AS rdiff_q,
       CAST(n_simplified AS INT) AS n_simplified
FROM golden
"""


# ---------------------------------------------------------------------------
# contour polylines golden: full-matrix segments (pinned kernel) +
# an independently written BFS linker (the engine links with
# union-find over distributed per-tile segments)


def contour_lines_rows(levels):
    from ..kernels.contours import LENGTH_Q, contour_segments
    from ..kernels.raster_fields import elev_value

    ix, iy = np.meshgrid(
        np.arange(RASTER_W), np.arange(RASTER_H), indexing="xy"
    )
    m = elev_value(ix, iy).astype(np.float64)
    out = []
    for lv in levels:
        _, _, arr = contour_segments(m, float(lv))
        if len(arr) == 0:
            continue
        lengths = np.hypot(arr[:, 2] - arr[:, 0], arr[:, 3] - arr[:, 1])
        lq = np.floor(lengths * LENGTH_Q + 0.5).astype(np.int64)
        # adjacency: endpoint -> segment ids
        adj: dict[tuple, list[int]] = {}
        for i, (x0, y0, x1, y1) in enumerate(arr):
            adj.setdefault((x0, y0), []).append(i)
            adj.setdefault((x1, y1), []).append(i)
        seen = [False] * len(arr)
        for i in range(len(arr)):
            if seen[i]:
                continue
            queue = [i]
            seen[i] = True
            members = []
            while queue:
                j = queue.pop()
                members.append(j)
                x0, y0, x1, y1 = arr[j]
                for pt in ((x0, y0), (x1, y1)):
                    for k in adj[pt]:
                        if not seen[k]:
                            seen[k] = True
                            queue.append(k)
            pts: dict[tuple, int] = {}
            for j in members:
                x0, y0, x1, y1 = arr[j]
                for pt in ((x0, y0), (x1, y1)):
                    pts[pt] = pts.get(pt, 0) + 1
            closed = all(d % 2 == 0 for d in pts.values())
            out.append(
                (
                    float(lv),
                    len(members),
                    len(pts),
                    bool(closed),
                    float(int(lq[[*members]].sum())) / float(LENGTH_Q),
                )
            )
    return out


def contour_lines_sql(levels) -> str:
    vals = ",".join(
        f"({d(lv)},{ns},{np_},{str(cl).upper()},{d(ln)})"
        for lv, ns, np_, cl, ln in contour_lines_rows(levels)
    )
    return f"""
WITH golden(level, n_segs, n_points, closed, length) AS (VALUES {vals})
SELECT level, CAST(n_segs AS BIGINT) AS n_segs,
       CAST(n_points AS BIGINT) AS n_points,
       CAST(closed AS BOOLEAN) AS closed, length
FROM golden
"""


# ---------------------------------------------------------------------------
# sieve golden: independent full-matrix flood fill + the documented
# deterministic merge contract (smallest-first by (size, canonical
# pixel id); absorb into largest neighbor, smallest canonical id wins
# size ties) — the engine derives components from tiles + seams, this
# never touches either


def sieve_rows(min_size: int):
    from ..kernels.raster_fields import elev_value

    iy, ix = np.meshgrid(
        np.arange(RASTER_H, dtype=np.int64),
        np.arange(RASTER_W, dtype=np.int64),
        indexing="ij",
    )
    v = np.floor(elev_value(ix, iy).astype(np.float64) / 200.0)
    h_, w_ = v.shape
    lab = -np.ones((h_, w_), dtype=np.int64)
    nxt = 0
    canon = []
    for sy in range(h_):
        for sx in range(w_):
            if lab[sy, sx] >= 0:
                continue
            val = v[sy, sx]
            canon.append((sy << 32) | sx)
            stack = [(sy, sx)]
            lab[sy, sx] = nxt
            while stack:
                cy, cx = stack.pop()
                for ny, nx in ((cy - 1, cx), (cy + 1, cx),
                               (cy, cx - 1), (cy, cx + 1)):
                    if (0 <= ny < h_ and 0 <= nx < w_
                            and lab[ny, nx] < 0 and v[ny, nx] == val):
                        lab[ny, nx] = nxt
                        stack.append((ny, nx))
            nxt += 1

    flat = lab.ravel()
    size = {i: int(c) for i, c in enumerate(np.bincount(flat, minlength=nxt))}
    first = np.full(nxt, -1, dtype=np.int64)
    first[flat[::-1]] = np.arange(flat.size - 1, -1, -1)
    value = {i: float(v.ravel()[first[i]]) for i in range(nxt)}
    pix_id = {i: int(canon[i]) for i in range(nxt)}

    nbrs: dict[int, set[int]] = {i: set() for i in range(nxt)}
    for a, b in ((lab[1:, :], lab[:-1, :]), (lab[:, 1:], lab[:, :-1])):
        diff = a != b
        for x, y in zip(a[diff].tolist(), b[diff].tolist()):
            nbrs[x].add(y)
            nbrs[y].add(x)

    merged_into: dict[int, int] = {}

    def resolve(r: int) -> int:
        while r in merged_into:
            r = merged_into[r]
        return r

    for root in sorted(size, key=lambda r: (size[r], pix_id[r])):
        if size[root] >= min_size:
            continue
        cand = {resolve(nb) for nb in nbrs.get(root, ())} - {root}
        if not cand:
            continue
        target = max(cand, key=lambda r: (size[r], -pix_id[r]))
        size[target] += size[root]
        nbrs.setdefault(target, set()).update(
            resolve(nb) for nb in nbrs.get(root, ()) if resolve(nb) != target
        )
        merged_into[root] = target
        size[root] = 0

    out: dict[float, int] = {}
    for root, n in size.items():
        if n > 0:
            val = value[resolve(root)]
            out[val] = out.get(val, 0) + n
    return sorted(out.items())


def sieve_sql(min_size: int) -> str:
    vals = ",".join(f"({d(val)},{n})" for val, n in sieve_rows(min_size))
    return f"""
WITH golden(value, n_pixels) AS (VALUES {vals})
SELECT value, CAST(n_pixels AS BIGINT) AS n_pixels FROM golden
"""


# ---------------------------------------------------------------------------
# extract_clip_concave golden: exact-rational BOUNDARY-INTEGRAL
# intersection area (Green's theorem) — a completely different
# algorithm from the engine's ear-clip + Sutherland-Hodgman
# (kernels.clip_general); both run in exact Fractions, so they must
# produce the identical rational and hence the identical float64.


def _fr_ring(verts):
    from fractions import Fraction

    v = [(Fraction(float(x)), Fraction(float(y))) for x, y in verts]
    if len(v) > 1 and v[0] == v[-1]:
        v = v[:-1]
    return v


def _fr_signed2(v):
    from fractions import Fraction

    s = Fraction(0)
    for i in range(len(v)):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % len(v)]
        s += x0 * y1 - x1 * y0
    return s


def _fr_point_in(p, poly) -> bool:
    """Exact even-odd ray cast (upward ray). General-position inputs:
    the midpoints tested never lie ON an edge of the other polygon."""
    px, py = p
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xc = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xc:
                inside = not inside
    return inside


def _fr_edge_cut_params(a, b, other):
    """Sorted parameters t in (0,1) where segment a->b properly
    crosses an edge of `other` (exact Cramer solve)."""
    from fractions import Fraction

    rx = b[0] - a[0]
    ry = b[1] - a[1]
    ts = []
    n = len(other)
    for i in range(n):
        c = other[i]
        dq = other[(i + 1) % n]
        sx = dq[0] - c[0]
        sy = dq[1] - c[1]
        den = rx * sy - ry * sx
        if den == 0:
            continue  # parallel (collinear overlap excluded by fixture)
        qpx = c[0] - a[0]
        qpy = c[1] - a[1]
        t = (qpx * sy - qpy * sx) / den
        u = (qpx * ry - qpy * rx) / den
        if Fraction(0) < t < Fraction(1) and Fraction(0) < u < Fraction(1):
            ts.append(t)
    return sorted(set(ts))


def intersection_area_boundary_fr(p_verts, q_verts):
    """Exact |P ∩ Q| via Green's theorem over the intersection's
    boundary: sub-segments of ∂P strictly inside Q plus sub-segments
    of ∂Q strictly inside P, both CCW, each contributing
    x0*y1 - x1*y0 to twice the area."""
    from fractions import Fraction

    P = _fr_ring(p_verts)
    Q = _fr_ring(q_verts)
    if _fr_signed2(P) < 0:
        P = P[::-1]
    if _fr_signed2(Q) < 0:
        Q = Q[::-1]
    total = Fraction(0)
    for poly, other in ((P, Q), (Q, P)):
        n = len(poly)
        for i in range(n):
            a = poly[i]
            b = poly[(i + 1) % n]
            cuts = (
                [Fraction(0)] + _fr_edge_cut_params(a, b, other)
                + [Fraction(1)]
            )
            for t0, t1 in zip(cuts[:-1], cuts[1:]):
                tm = (t0 + t1) / 2
                mid = (a[0] + (b[0] - a[0]) * tm, a[1] + (b[1] - a[1]) * tm)
                if _fr_point_in(mid, other):
                    x0 = a[0] + (b[0] - a[0]) * t0
                    y0 = a[1] + (b[1] - a[1]) * t0
                    x1 = a[0] + (b[0] - a[0]) * t1
                    y1 = a[1] + (b[1] - a[1]) * t1
                    total += x0 * y1 - x1 * y0
    return total / 2


def extract_clip_concave_rows(clip_verts, min_share: float = 0.001):
    """(zone_id, area_share, year_scaled) against a CONCAVE clip
    region, shares from the exact boundary-integral area divided by
    the exact full area, rounded once to float64."""
    from ..fixtures import ZONES

    rows = []
    for z in ZONES:
        subj = _fr_ring(z["verts"])
        full2 = _fr_signed2(subj)
        if full2 < 0:
            full2 = -full2
        if full2 == 0:
            continue
        inter = intersection_area_boundary_fr(z["verts"], clip_verts)
        share = float(inter * 2 / full2)
        if share < min_share:
            continue
        rows.append((int(z["zone_id"]), share, z["year"] * share))
    return rows


def extract_clip_concave_sql(clip_verts, min_share: float = 0.001) -> str:
    vals = ",".join(
        f"({z},{d(s)},{d(y)})"
        for z, s, y in extract_clip_concave_rows(clip_verts, min_share)
    )
    return f"""
WITH golden(zone_id, area_share, year_scaled) AS (VALUES {vals})
SELECT CAST(zone_id AS INT) AS zone_id, area_share, year_scaled FROM golden
"""


def extract_clip_holes_rows(clip_rings, min_share: float = 0.001):
    """(zone_id, area_share, year_scaled) against a clip region WITH
    HOLES ([outer, hole, ...]): share = (|z ∩ outer| - sum |z ∩ hole|)
    / |z|, every term via the INDEPENDENT exact boundary-integral
    algorithm (the engine uses ear-clip + S-H decomposition — equal
    rationals -> identical float64)."""
    from ..fixtures import ZONES

    rows = []
    for z in ZONES:
        subj = _fr_ring(z["verts"])
        full2 = _fr_signed2(subj)
        if full2 < 0:
            full2 = -full2
        if full2 == 0:
            continue
        inter = intersection_area_boundary_fr(z["verts"], clip_rings[0])
        for hole in clip_rings[1:]:
            inter -= intersection_area_boundary_fr(z["verts"], hole)
        share = float(inter * 2 / full2)
        if share < min_share:
            continue
        rows.append((int(z["zone_id"]), share, z["year"] * share))
    return rows


def extract_clip_holes_sql(clip_rings, min_share: float = 0.001) -> str:
    vals = ",".join(
        f"({z},{d(s)},{d(y)})"
        for z, s, y in extract_clip_holes_rows(clip_rings, min_share)
    )
    return f"""
WITH golden(zone_id, area_share, year_scaled) AS (VALUES {vals})
SELECT CAST(zone_id AS INT) AS zone_id, area_share, year_scaled FROM golden
"""


# ---------------------------------------------------------------------------
# union_geom golden: exact-rational SLAB-DECOMPOSITION union area — a
# completely different algorithm from the engine's boundary-subsegment
# union (kernels.union_geom): split the x-axis at every vertex and
# every pairwise edge intersection; inside a slab the union of
# per-polygon y-intervals changes linearly (no topology change), so
# slab area = (union interval length at the slab midline) x width,
# exactly. Both run in exact Fractions -> identical rational ->
# identical float64.


def union_area_slab_fr(regions_verts):
    from fractions import Fraction

    regions = []
    for verts in regions_verts:
        regions.append(_fr_ring(verts))
    # slab boundaries: all vertex x's + all pairwise edge-intersection x's
    xs = set()
    edges = []  # (region_idx, a, b)
    for ri, ring in enumerate(regions):
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            xs.add(a[0])
            edges.append((ri, a, b))
    for i in range(len(edges)):
        ri, a, b = edges[i]
        rx, ry = b[0] - a[0], b[1] - a[1]
        for j in range(i + 1, len(edges)):
            rj, c, q = edges[j]
            if rj == ri:
                continue
            sx, sy = q[0] - c[0], q[1] - c[1]
            den = rx * sy - ry * sx
            if den == 0:
                continue
            qpx, qpy = c[0] - a[0], c[1] - a[1]
            t = (qpx * sy - qpy * sx) / den
            u = (qpx * ry - qpy * rx) / den
            if 0 < t < 1 and 0 < u < 1:
                xs.add(a[0] + rx * t)
    xs = sorted(xs)
    total = Fraction(0)
    for x0, x1 in zip(xs[:-1], xs[1:]):
        if x0 == x1:
            continue
        xm = (x0 + x1) / 2
        # per-region crossing ys at x=xm -> even-odd intervals
        intervals = []
        for ring in regions:
            ys = []
            n = len(ring)
            for i in range(n):
                a, b = ring[i], ring[(i + 1) % n]
                if (a[0] > xm) != (b[0] > xm):
                    ys.append(
                        a[1] + (b[1] - a[1]) * (xm - a[0]) / (b[0] - a[0])
                    )
            ys.sort()
            intervals.extend(zip(ys[0::2], ys[1::2]))
        if not intervals:
            continue
        # measure of the union of intervals
        intervals.sort()
        length = Fraction(0)
        cur_lo, cur_hi = intervals[0]
        for lo, hi in intervals[1:]:
            if lo > cur_hi:
                length += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        length += cur_hi - cur_lo
        total += length * (x1 - x0)
    return total


def union_geom_sql(regions_verts) -> str:
    area = float(union_area_slab_fr(regions_verts))
    return f"""
SELECT {d(area)} AS union_area
"""


def contour_polygons_rows(levels):
    """Golden for the reference contours(polygonize=True) banding:
    band(v) = number of contour edges <= v (matching the engine's
    sum of v >= edge JVM terms), then the same independent flood
    fill + Euler ring counts as polygonize_rows."""
    from ..kernels.raster_fields import elev_value

    iy, ix = np.meshgrid(
        np.arange(RASTER_H, dtype=np.int64),
        np.arange(RASTER_W, dtype=np.int64),
        indexing="ij",
    )
    elev = elev_value(ix, iy).astype(np.float64)
    band = np.zeros_like(elev)
    for lv in levels:
        band += (elev >= float(lv)).astype(np.float64)
    return polygonize_rows(band)


def contour_polygons_sql(levels) -> str:
    rows = ",".join(
        f"({d(v)},{n},{nh},{nv},{d(apx)},{nr})"
        for v, n, nh, nv, apx, nr in contour_polygons_rows(levels)
    )
    return f"""
WITH golden(value, n, nh, nv, area_px, n_rings) AS (VALUES {rows})
SELECT value, CAST(n AS BIGINT) AS n, CAST(nh AS BIGINT) AS nh,
       CAST(nv AS BIGINT) AS nv, area_px, CAST(n_rings AS INT) AS n_rings
FROM golden
"""
