"""SRS kernels + DataFrame transforms (reference srs.py parity).

Pinned by the published EPSG Guidance Note 7-2 worked example for the
ellipsoidal LAEA oblique aspect (ETRS89-LAEA): 50N 5E ->
E 3962799.45, N 2999718.85.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.kernels.srs import (
    EPSG3035, EPSG3857, EPSG4326, SRS, centered_laea, laea_forward,
    laea_inverse, load_srs, xy_transform,
)


def test_epsg_worked_example():
    e, n = laea_forward(5.0, 50.0, EPSG3035)
    assert abs(float(e) - 3962799.45) < 0.01
    assert abs(float(n) - 2999718.85) < 0.01


def test_laea_roundtrip_grid():
    lons, lats = np.meshgrid(np.linspace(-10, 30, 21), np.linspace(35, 70, 15))
    e, n = laea_forward(lons, lats)
    lo, la = laea_inverse(e, n)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-7  # series truncation ~1e-8 deg


def test_centered_laea_is_zero_at_center():
    srs = centered_laea(6.1, 50.8)
    e, n = laea_forward(6.1, 50.8, srs)
    assert abs(float(e)) < 1e-6 and abs(float(n)) < 1e-6
    # equal-area: a small square keeps its area under recentering
    for ring_srs in (srs, EPSG3035):
        vx = np.array([6.0, 6.2, 6.2, 6.0])
        vy = np.array([50.7, 50.7, 50.9, 50.9])
        ex, ny = laea_forward(vx, vy, ring_srs)
        area = 0.5 * abs(
            np.dot(ex, np.roll(ny, -1)) - np.dot(ny, np.roll(ex, -1))
        )
        assert area == pytest.approx(3.13e8, rel=0.01)  # ~313 km^2


def test_load_srs_sources():
    assert load_srs(4326) is EPSG4326
    assert load_srs("EPSG:3857") is EPSG3857
    assert load_srs("latlon") is EPSG4326
    assert load_srs("europe_m") is EPSG3035
    assert load_srs(EPSG3035) is EPSG3035
    assert load_srs(None) is None
    # 32632 (UTM 32N) became supported in round 3; a non-UTM unknown
    # code must still raise
    assert load_srs(32632).kind == "tmerc"
    with pytest.raises(ValueError):
        load_srs(29901)
    with pytest.raises(ValueError):
        load_srs("not-a-srs")
    with pytest.raises(TypeError):
        load_srs(3.5)


def test_xy_transform_routes_via_4326():
    x, y = xy_transform(5.0, 50.0, 4326, 3857)
    lon, lat = xy_transform(x, y, 3857, 4326)
    assert float(lon) == pytest.approx(5.0, abs=1e-12)
    assert float(lat) == pytest.approx(50.0, abs=1e-12)
    e, n = xy_transform(x, y, 3857, 3035)
    e2, n2 = laea_forward(5.0, 50.0)
    assert float(e) == pytest.approx(float(e2), abs=1e-6)
    assert float(n) == pytest.approx(float(n2), abs=1e-6)


def test_transform_cols_matches_kernel(spark):
    from geokit_spark.functions.geo import transform_cols
    from geokit_spark.operators.mutate import zones_feature_df

    z = zones_feature_df(spark).select(
        "zone_id",
        ((F.col("xs")[0] + F.col("xs")[1] + F.col("xs")[2] + F.col("xs")[3])
         / 4.0).alias("cx"),
        ((F.col("ys")[0] + F.col("ys")[1] + F.col("ys")[2] + F.col("ys")[3])
         / 4.0).alias("cy"),
    )
    out = transform_cols(z, 4326, 3035, x="cx", y="cy").toPandas()
    e, n = laea_forward(out["cx"].to_numpy(), out["cy"].to_numpy())
    assert np.allclose(out["x"].to_numpy(), e, atol=1e-9)
    assert np.allclose(out["y"].to_numpy(), n, atol=1e-9)


def test_transform_geoms_wkb_polygon(spark):
    from geokit_spark.kernels.wkb import parse_wkb, polygon_wkb
    from geokit_spark.operators.wkbops import transform_geoms

    verts = fixtures.ZONES[0]["verts"]
    df = spark.createDataFrame(
        [(0, bytearray(polygon_wkb(verts)))], "zone_id int, geom binary"
    )
    out = transform_geoms(df, 4326, 3035).toPandas()
    kind, ring = parse_wkb(bytes(out["geom_t"].iloc[0]))
    assert kind == "polygon"
    vx = np.array([v[0] for v in verts])
    vy = np.array([v[1] for v in verts])
    e, n = laea_forward(vx, vy)
    assert np.allclose(ring[:-1, 0], e, atol=1e-9)
    assert np.allclose(ring[:-1, 1], n, atol=1e-9)


def test_utm_roundtrip_and_scale():
    """Transverse Mercator (UTM) Krüger series: roundtrip at machine
    precision across the zone and beyond, exact central-meridian
    easting, k0=0.9996 central scale via numeric meridian derivative,
    southern false northing."""
    import math

    import numpy as np

    from geokit_spark.kernels.srs import (
        load_srs, tmerc_forward, tmerc_inverse, utm_zone_for,
    )

    z31 = load_srs(32631)
    assert z31.kind == "tmerc" and z31.lon0 == 3.0 and z31.k0 == 0.9996
    lons = np.linspace(0.5, 5.5, 7)
    lats = np.linspace(-84, 84, 13)
    L, P = np.meshgrid(lons, lats)
    e, n = tmerc_forward(L.ravel(), P.ravel(), z31)
    lo, la = tmerc_inverse(e, n, z31)
    assert np.abs(lo - L.ravel()).max() < 1e-12
    assert np.abs(la - P.ravel()).max() < 1e-12
    # central meridian maps to FE exactly; symmetric about it
    e0, _ = tmerc_forward(3.0, 45.0, z31)
    assert float(e0) == 500000.0
    e1, n1 = tmerc_forward(5.0, 45.0, z31)
    e2, n2 = tmerc_forward(1.0, 45.0, z31)
    assert float(e1) - 500000.0 == -(float(e2) - 500000.0)
    assert float(n1) == float(n2)
    # central scale == k0
    _, na = tmerc_forward(3.0, 45.0, z31)
    _, nb = tmerc_forward(3.0, 45.0001, z31)
    a, rf = 6378137.0, 298.257222101
    f = 1 / rf
    e2c = 2 * f - f * f
    phi = math.radians(45.00005)
    M = a * (1 - e2c) / (1 - e2c * math.sin(phi) ** 2) ** 1.5
    scale = (float(nb) - float(na)) / (math.radians(0.0001) * M)
    assert abs(scale - 0.9996) < 1e-7
    # south zone: false northing 10,000 km, equator -> FN
    s32 = load_srs(32732)
    _, ns = tmerc_forward(9.0, 0.0, s32)
    assert float(ns) == 10000000.0
    # zone resolver
    assert utm_zone_for(5.0, 45.0).name == "EPSG:32631"
    assert utm_zone_for(9.1, -10.0).name == "EPSG:32732"


def test_utm_in_generic_transform():
    """xy_transform routes UTM through the 4326 pivot like every other
    family; cross-family roundtrip 3035 -> UTM32 -> 3035 closes to
    sub-mm."""
    from geokit_spark.kernels.srs import xy_transform

    e, n = xy_transform([4021000.0], [3052000.0], 3035, 32632)
    back_x, back_y = xy_transform(e, n, 32632, 3035)
    assert abs(float(back_x[0]) - 4021000.0) < 1e-3
    assert abs(float(back_y[0]) - 3052000.0) < 1e-3


def test_etrs89_utm_25832():
    """EPSG:25832 (ETRS89 / UTM 32N, GRS80): central-meridian easting
    is exactly the false easting; the northing there equals
    k0 x the GRS80 meridian arc (independent numerical integral of
    M(phi) = a(1-e^2)/(1-e^2 sin^2 phi)^(3/2)); round trip closes; and
    the math coincides with the engine's 326xx path (same ellipsoid
    constants)."""
    import numpy as np

    from geokit_spark.kernels.srs import (
        E2,
        GRS80_A,
        load_srs,
        xy_transform,
    )

    s = load_srs(25832)
    assert s.lon0 == 9.0 and s.k0 == 0.9996 and s.false_e == 500000.0

    lat = 52.0
    e, n = xy_transform(np.array([9.0]), np.array([lat]), 4326, s)
    assert abs(float(e[0]) - 500000.0) < 1e-6
    phi = np.linspace(0.0, np.radians(lat), 2_000_001)
    m = GRS80_A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5
    arc = float(getattr(np, "trapezoid", getattr(np, "trapz", None))(m, phi))
    assert abs(float(n[0]) - 0.9996 * arc) < 2e-3, (float(n[0]), 0.9996 * arc)

    lons = np.array([6.1, 9.0, 11.9, 7.7])
    lats = np.array([47.3, 52.0, 54.9, 50.1])
    ee, nn = xy_transform(lons, lats, 4326, s)
    e32, n32 = xy_transform(lons, lats, 4326, load_srs(32632))
    assert np.allclose(ee, e32, atol=0) and np.allclose(nn, n32, atol=0)
    lon_b, lat_b = xy_transform(ee, nn, s, 4326)
    assert np.allclose(lon_b, lons, atol=1e-9)
    assert np.allclose(lat_b, lats, atol=1e-9)


def test_load_srs_unknown_code_lists_supported_set():
    import pytest

    from geokit_spark.kernels.srs import load_srs

    # 28992 (Dutch RD New) resolves since round 6 and 54009 (World
    # Mollweide) since round 7; 54030 (Robinson — a tabulated
    # compromise projection with no closed form) remains outside the
    # set and must raise with the supported list
    assert load_srs(28992).kind == "sterea"
    assert load_srs(54009).kind == "moll"
    with pytest.raises(ValueError, match="from_params"):
        load_srs(54030)


def test_lcc_2sp_lambert93_and_etrs89():
    """EPSG:2154 / 3034 (LCC 2SP, GRS80). Invariants: the natural
    origin maps exactly onto the false origin; the scale factor along
    each STANDARD PARALLEL is 1 (projected arc == a*m(lat_i)*dlambda,
    the defining property of 2SP); round trips close."""
    import numpy as np

    from geokit_spark.kernels.srs import (
        E2,
        GRS80_A,
        load_srs,
        xy_transform,
    )

    for code, origin in ((2154, (3.0, 46.5)), (3034, (10.0, 52.0))):
        s = load_srs(code)
        e, n = xy_transform(
            np.array([origin[0]]), np.array([origin[1]]), 4326, s
        )
        assert abs(float(e[0]) - s.false_e) < 1e-6
        assert abs(float(n[0]) - s.false_n) < 1e-6
        for lat_sp in (s.lat1, s.lat2):
            dlam = 1e-4
            lons = np.array([origin[0], origin[0] + dlam])
            lats = np.array([lat_sp, lat_sp])
            ee, nn = xy_transform(lons, lats, 4326, s)
            proj = float(np.hypot(ee[1] - ee[0], nn[1] - nn[0]))
            phi = np.radians(lat_sp)
            m = float(
                np.cos(phi) / np.sqrt(1.0 - E2 * np.sin(phi) ** 2)
            )
            true_arc = GRS80_A * m * np.radians(dlam)
            assert abs(proj / true_arc - 1.0) < 1e-9, (code, lat_sp)
        lons = np.array([-1.2, 2.35, 7.9, 4.4])
        lats = np.array([42.5, 48.86, 49.9, 46.0])
        ee, nn = xy_transform(lons, lats, 4326, s)
        lon_b, lat_b = xy_transform(ee, nn, s, 4326)
        assert np.allclose(lon_b, lons, atol=1e-9)
        assert np.allclose(lat_b, lats, atol=1e-9)


def test_epsg27700_osgb_worked_example():
    """British National Grid (TM on Airy 1830, EPSG method 9807): the
    published OS 'A guide to coordinate systems in Great Britain'
    worked example — 52°39'27.2531"N 1°43'4.5177"E ->
    E 651409.903, N 313177.270 (datum-internal, so it pins the
    projection math independently of the Helmert bridge)."""
    from geokit_spark.kernels.srs import load_srs, tmerc_forward, tmerc_inverse

    s = load_srs(27700)
    assert s.ellps == "airy" and s.k0 == 0.9996012717
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = tmerc_forward([lon], [lat], s)
    assert abs(e[0] - 651409.903) < 2e-3
    assert abs(n[0] - 313177.270) < 2e-3
    lo, la = tmerc_inverse(e, n, s)
    assert abs(lo[0] - lon) < 1e-12 and abs(la[0] - lat) < 1e-12


def test_epsg27700_helmert_datum_bridge():
    """4326 -> 27700 applies the OSGB36 7-parameter Helmert: the
    transform round-trips to ~1e-8 deg and differs from the
    datum-blind projection by the expected ~100 m."""
    from geokit_spark.kernels.srs import load_srs, tmerc_forward, xy_transform

    lon, lat = -0.1278, 51.5074  # London
    x, y = xy_transform([lon], [lat], 4326, 27700)
    # BNG places central London near (530000, 180000)
    assert abs(x[0] - 530000) < 1500 and abs(y[0] - 180000) < 1500
    bx, by = xy_transform(x, y, 27700, 4326)
    assert abs(bx[0] - lon) < 1e-7 and abs(by[0] - lat) < 1e-7
    # ignoring the datum shift is a ~50-120 m error — the bridge is
    # doing real work
    e2, n2 = tmerc_forward([lon], [lat], load_srs(27700))
    assert 30 < abs(e2[0] - x[0]) < 300
    assert 30 < abs(n2[0] - y[0]) < 300


def test_parameterized_registry_roundtrips():
    """Every parameterized national grid round-trips 4326 -> code ->
    4326 at float precision, and from_params validates its inputs."""
    import pytest

    from geokit_spark.kernels.srs import from_params, load_srs, xy_transform

    cases = {
        2193: (173.5, -41.2),  # NZTM2000
        2180: (19.5, 52.2),  # Poland CS92
        26910: (-122.4, 37.77),  # NAD83 / UTM 10N
        3945: (3.2, 45.1),  # RGF93 / CC45
        27700: (-2.5, 53.0),  # British National Grid (Helmert)
    }
    for code, (lon, lat) in cases.items():
        x, y = xy_transform([lon], [lat], 4326, code)
        bx, by = xy_transform(x, y, code, 4326)
        assert abs(bx[0] - lon) < 1e-7, code
        assert abs(by[0] - lat) < 1e-7, code
    # geographic aliases resolve to latlon
    assert load_srs(4258).is_geographic and load_srs(4269).is_geographic
    # CC zone parameters follow the published pattern
    cc45 = load_srs(3945)
    assert (cc45.lat0, cc45.lat1, cc45.lat2) == (45.0, 44.25, 45.75)
    assert cc45.false_n == 1200000.0 + 3 * 1000000.0
    # from_params validation
    # sterea became a supported method in round 6; omerc, aea and
    # moll in round 7; compromise world projections (Robinson) stay
    # outside the closed-form set
    assert from_params("sterea", 52.0, 5.0, ellps="bessel").kind == "sterea"
    assert from_params("omerc", 4.0, 115.0, lat1=53.0).kind == "omercb"
    assert from_params("aea", 23.0, -96.0, lat1=29.5, lat2=45.5).kind == "aea"
    with pytest.raises(ValueError, match="projection method"):
        from_params("robin")
    with pytest.raises(ValueError, match="ellipsoid"):
        from_params("tmerc", ellps="nope")
    with pytest.raises(ValueError, match="towgs84"):
        from_params("tmerc", towgs84=(1.0, 2.0))
    with pytest.raises(ValueError, match="GRS80"):
        from_params("laea", ellps="airy")


def test_grs80_parity_after_parameterization():
    """The Ellipsoid('GRS80') constants must equal the module-level
    GRS80 constants bit-for-bit — the oracle rows (srs_transform,
    srs_transform_lcc) pin transform output hashes on them."""
    from geokit_spark.kernels import srs as S

    ell = S.Ellipsoid("GRS80")
    assert ell.a == S.GRS80_A
    assert ell.e2 == S.E2 and ell.e1 == S.E1
    # UTM northing/easting identical through the parameterized path
    e, n = S.tmerc_forward([6.083], [50.775], S.load_srs(32632))
    e2, n2 = S.xy_transform([6.083], [50.775], 4326, 32632)
    assert e[0] == e2[0] and n[0] == n2[0]


def test_polar_stereographic_gn72_worked_examples():
    """EPSG GN7-2 §1.3.7.2/3 worked examples pin both variants:
    variant B (standard parallel) via WGS84 / Australian Antarctic
    Polar Stereographic (EPSG:3032), variant A (pole scale k0) via
    WGS84 / UPS North (EPSG:5041)."""
    from geokit_spark.kernels import srs as S

    e, n = S.stere_forward([120.0], [-75.0], S.load_srs(3032))
    assert abs(e[0] - 7255380.79) < 0.01
    assert abs(n[0] - 7053389.56) < 0.01
    e, n = S.stere_forward([44.0], [73.0], S.load_srs(5041))
    assert abs(e[0] - 3320416.75) < 0.01
    assert abs(n[0] - 632668.43) < 0.01


def test_polar_stereographic_variant_consistency():
    """Variant B's derived pole scale must reproduce variant A: UPS's
    k0 = 0.994 corresponds to a standard parallel of ~81.114528
    (published UPS property); building the same grid from that lat_ts
    gives the same grid coordinates to sub-mm."""
    import numpy as np

    from geokit_spark.kernels import srs as S

    ups = S.load_srs(5041)
    # solve lat_ts for k0 = 0.994 by bisection on the derived scale
    lo, hi = 70.0, 90.0
    for _ in range(60):
        mid = (lo + hi) / 2.0
        k = S._stere_consts(
            S.from_params("stere", 90.0, 0.0, lat1=mid, ellps="WGS84")
        )[2]
        lo, hi = (mid, hi) if k < 0.994 else (lo, mid)
    assert abs(mid - 81.114528) < 1e-3
    vb = S.from_params(
        "stere", 90.0, 0.0, 2000000.0, 2000000.0, lat1=mid, ellps="WGS84"
    )
    lons = np.array([44.0, -120.0, 0.0])
    lats = np.array([73.0, 85.0, 64.0])
    ea, na = S.stere_forward(lons, lats, ups)
    eb, nb = S.stere_forward(lons, lats, vb)
    assert np.abs(ea - eb).max() < 1e-3
    assert np.abs(na - nb).max() < 1e-3


def test_polar_stereographic_roundtrip_both_poles():
    import numpy as np

    from geokit_spark.kernels import srs as S

    rng = np.random.default_rng(7)
    for code, lo_lat, hi_lat in ((3413, 55.0, 90.0), (3031, -90.0, -55.0)):
        srs = S.load_srs(code)
        lons = rng.uniform(-180.0, 180.0, 500)
        lats = rng.uniform(lo_lat, hi_lat, 500)
        x, y = S.stere_forward(lons, lats, srs)
        lon2, lat2 = S.stere_inverse(x, y, srs)
        dlon = np.abs((lon2 - lons + 180.0) % 360.0 - 180.0)
        assert dlon.max() < 1e-9
        assert np.abs(lat2 - lats).max() < 1e-9
    # the pole itself maps to the false origin and back
    s = S.load_srs(3413)
    x, y = S.stere_forward([10.0], [90.0], s)
    assert abs(x[0] - s.false_e) < 1e-6 and abs(y[0] - s.false_n) < 1e-6
    lon, lat = S.stere_inverse(x, y, s)
    assert abs(lat[0] - 90.0) < 1e-12


def test_polar_stereographic_in_generic_transform():
    import numpy as np

    from geokit_spark.kernels import srs as S

    x, y = S.xy_transform([-45.0, 100.0], [70.0, 80.0], 4326, 3413)
    lon, lat = S.xy_transform(x, y, 3413, 4326)
    assert np.abs(lon - np.array([-45.0, 100.0])).max() < 1e-9
    assert np.abs(lat - np.array([70.0, 80.0])).max() < 1e-9
    # registry parameters
    s = S.load_srs(3413)
    assert (s.kind, s.lat0, s.lon0, s.lat1) == ("stere", 90.0, -45.0, 70.0)
    assert S.load_srs(3031).lat1 == -71.0


def test_polar_stereographic_from_params_validation():
    import pytest as _pytest

    from geokit_spark.kernels import srs as S

    with _pytest.raises(ValueError, match="POLAR"):
        S.from_params("stere", 52.0, 10.0, lat1=52.0, ellps="WGS84")
    with _pytest.raises(ValueError, match="hemisphere"):
        S.from_params("stere", 90.0, 0.0, lat1=-70.0, ellps="WGS84")


def test_ellipsoidal_mercator_gn72_worked_example():
    """EPSG GN7-2 §1.3.3 Mercator (variant A) worked example:
    Makassar / NEIEZ (EPSG:3002, Bessel 1841, k0 = 0.997)."""
    from geokit_spark.kernels import srs as S

    s = S.load_srs(3002)
    e, n = S.merc1sp_forward([120.0], [-3.0], s)
    assert abs(e[0] - 5009726.58) < 0.01
    assert abs(n[0] - 569150.82) < 0.01
    lon, lat = S.merc1sp_inverse(e, n, s)
    assert abs(lon[0] - 120.0) < 1e-9 and abs(lat[0] + 3.0) < 1e-9


def test_world_mercator_3395():
    """EPSG:3395 pinned three independent ways: the equivalent
    isometric-latitude formulation a*(asinh(tan phi) - e*atanh(e sin
    phi)) (different code path, same math), exact roundtrips across
    the usable band, and x-agreement with spherical web-mercator on
    the equator (where the ellipsoidal and spherical forms coincide
    in easting)."""
    import numpy as np

    from geokit_spark.kernels import srs as S

    w = S.load_srs(3395)
    assert (w.kind, w.ellps, w.k0) == ("merc", "WGS84", 1.0)
    ell = S.Ellipsoid("WGS84")
    phis = np.radians(np.array([0.0, 12.5, 53.0, -74.0, 84.9]))
    y_alt = ell.a * (
        np.arcsinh(np.tan(phis))
        - ell.e1 * np.arctanh(ell.e1 * np.sin(phis))
    )
    _, y = S.merc1sp_forward(np.zeros(5), np.degrees(phis), w)
    assert np.abs(y - y_alt).max() < 1e-6
    rng = np.random.default_rng(3)
    lons = rng.uniform(-180.0, 180.0, 500)
    lats = rng.uniform(-85.0, 85.0, 500)
    x, yy = S.merc1sp_forward(lons, lats, w)
    lo, la = S.merc1sp_inverse(x, yy, w)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9
    x_sph, _ = S.xy_transform([10.0], [0.0], 4326, 3857)
    x_ell, _ = S.xy_transform([10.0], [0.0], 4326, 3395)
    assert abs(x_sph[0] - x_ell[0]) < 1e-6
    # ...and off the equator they genuinely differ (ellipsoidal vs
    # spherical northing) — the families must not be conflated
    _, y_sph = S.xy_transform([0.0], [45.0], 4326, 3857)
    _, y_ell = S.xy_transform([0.0], [45.0], 4326, 3395)
    assert abs(y_sph[0] - y_ell[0]) > 10000


def test_mercator_from_params_validation():
    import pytest as _pytest

    from geokit_spark.kernels import srs as S

    with _pytest.raises(ValueError, match="equator"):
        S.from_params("merc", 10.0, 0.0, ellps="WGS84")
    # variant B: k0 derived from the standard parallel
    vb = S.from_params("merc", 0.0, 51.0, lat1=42.0, ellps="krass")
    ell, k0 = S._merc_k0(vb)
    import math

    exp = math.cos(math.radians(42.0)) / math.sqrt(
        1.0 - ell.e2 * math.sin(math.radians(42.0)) ** 2
    )
    assert abs(k0 - exp) < 1e-15


def test_oblique_stereographic_rd_new():
    """EPSG GN7-2 §1.3.7.1 oblique ("double") stereographic worked
    example: Amersfoort / RD New (EPSG:28992, Bessel 1841):
    53N 6E -> E 196105.283, N 557057.739."""
    import numpy as np

    from geokit_spark.kernels import srs as S

    s = S.load_srs(28992)
    assert (s.kind, s.ellps) == ("sterea", "bessel")
    e, n = S.sterea_forward([6.0], [53.0], s)
    assert abs(e[0] - 196105.283) < 0.01
    assert abs(n[0] - 557057.739) < 0.01
    # projection origin maps to the false origin
    e0, n0 = S.sterea_forward([s.lon0], [s.lat0], s)
    assert abs(e0[0] - s.false_e) < 1e-6 and abs(n0[0] - s.false_n) < 1e-6
    # roundtrip across the Dutch territory
    rng = np.random.default_rng(5)
    lons = rng.uniform(3.0, 7.5, 500)
    lats = rng.uniform(50.5, 54.0, 500)
    x, y = S.sterea_forward(lons, lats, s)
    lo, la = S.sterea_inverse(x, y, s)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9
    # central scale k0 at the origin via a numeric north derivative
    # (conformal: scale is isotropic), against the published 0.9999079
    _, na = S.sterea_forward([s.lon0], [s.lat0], s)
    _, nb = S.sterea_forward([s.lon0], [s.lat0 + 1e-4], s)
    import math

    ell = S.Ellipsoid("bessel")
    phi = math.radians(s.lat0 + 5e-5)
    m = ell.a * (1 - ell.e2) / (1 - ell.e2 * math.sin(phi) ** 2) ** 1.5
    scale = (nb[0] - na[0]) / (math.radians(1e-4) * m)
    assert abs(scale - 0.9999079) < 1e-6
    # the Amersfoort datum bridge engages in the generic transform:
    # RD -> WGS84 of the origin must differ from the no-Helmert
    # inverse by ~100 m (the Amersfoort shift), not be identical
    lon_w, lat_w = S.xy_transform([s.false_e], [s.false_n], 28992, 4326)
    dlat = abs(lat_w[0] - s.lat0) * 111000.0
    assert 10.0 < dlat < 300.0


def test_sterea_from_params_validation():
    import pytest as _pytest

    from geokit_spark.kernels import srs as S

    with _pytest.raises(ValueError, match="polar"):
        S.from_params("sterea", 90.0, 0.0, ellps="WGS84")


# ---------------------------------------------------------------------------
# Hotine oblique Mercator (EPSG methods 9812 variant A / 9815 variant B)


def test_omerc_gn72_worked_example():
    """EPSG GN7-2 §1.3.6 Hotine oblique Mercator (variant B) worked
    example: Timbalai 1948 / RSO Borneo (m), EPSG:29873, Everest
    1830 (1967 Definition). 5°23'14.1129"N 115°48'19.8196"E ->
    E 679245.73, N 596562.78."""
    from geokit_spark.kernels import srs as S

    s = S.load_srs(29873)
    assert (s.kind, s.ellps) == ("omercb", "evrstSS")
    lat = 5.0 + 23.0 / 60.0 + 14.1129 / 3600.0
    lon = 115.0 + 48.0 / 60.0 + 19.8196 / 3600.0
    e, n = S.omerc_forward([lon], [lat], s)
    assert abs(e[0] - 679245.73) < 0.005
    assert abs(n[0] - 596562.78) < 0.005
    lo, la = S.omerc_inverse(e, n, s)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


def test_omerc_variant_b_centre_maps_to_false_origin():
    """Variant B's uc equals the variant-A u at the projection centre
    (the derivation in _omerc_consts), so (phi_c, lambda_c) must land
    EXACTLY on (Ec, Nc) — the strongest internal-consistency pin of
    the gamma0/lambda0/uc wiring, independent of the worked example."""
    from geokit_spark.kernels import srs as S

    for code in (29873, 3376):
        s = S.load_srs(code)
        e, n = S.omerc_forward([s.lon0], [s.lat0], s)
        assert abs(e[0] - s.false_e) < 1e-6
        assert abs(n[0] - s.false_n) < 1e-6


def test_omerc_variant_a_equals_b_with_derived_offsets():
    """E_B = E_A + (Ec - uc sin(gamma_c)), N_B = N_A + (Nc -
    uc cos(gamma_c)): running the variant-A code path with those
    derived false offsets must reproduce the variant-B grid
    bit-for-bit (same constants, one extra subtraction)."""
    import numpy as np

    from geokit_spark.kernels import srs as S

    b = S.load_srs(29873)
    _, _, _, _, _, _, uc, sg, cg = S._omerc_consts(
        b.ellps, b.lat0, b.lon0, b.lat1, b.lat2, b.k0
    )
    a = S.from_params(
        "omerca", b.lat0, b.lon0,
        b.false_e - uc * sg, b.false_n - uc * cg,
        k0=b.k0, lat1=b.lat1, lat2=b.lat2, ellps=b.ellps,
    )
    rng = np.random.default_rng(7)
    lons = rng.uniform(109.0, 119.0, 200)
    lats = rng.uniform(0.5, 7.5, 200)
    eb, nb = S.omerc_forward(lons, lats, b)
    ea, na = S.omerc_forward(lons, lats, a)
    assert np.abs(eb - ea).max() < 1e-7
    assert np.abs(nb - na).max() < 1e-7


def test_omerc_michigan_variant_a():
    """EPSG:3078 (NAD83 / Michigan Oblique Mercator, method 9812,
    GRS80, westward-rotated azimuth 337°15'20"). No GN7-2 worked
    example exists for this grid, so it is pinned by projection
    INVARIANTS: exact roundtrip closure across the state, and the
    local scale at the projection centre equal to k0 = 0.9996 in
    every direction (conformality + defining scale of the initial
    line), measured by finite differences against the ellipsoidal
    meridian/parallel arc lengths."""
    import math

    import numpy as np

    from geokit_spark.kernels import srs as S

    s = S.load_srs(3078)
    assert s.kind == "omerca"
    rng = np.random.default_rng(11)
    lons = rng.uniform(-90.5, -82.0, 300)
    lats = rng.uniform(41.5, 48.5, 300)
    x, y = S.omerc_forward(lons, lats, s)
    lo, la = S.omerc_inverse(x, y, s)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9

    ell = S.Ellipsoid("GRS80")
    phi = math.radians(s.lat0)
    d = 1e-6  # degrees
    # along the meridian
    e0, n0 = S.omerc_forward([s.lon0], [s.lat0 - d / 2.0], s)
    e1, n1 = S.omerc_forward([s.lon0], [s.lat0 + d / 2.0], s)
    m = ell.a * (1 - ell.e2) / (1 - ell.e2 * math.sin(phi) ** 2) ** 1.5
    k_mer = math.hypot(e1[0] - e0[0], n1[0] - n0[0]) / (
        math.radians(d) * m
    )
    # along the parallel
    e2_, n2_ = S.omerc_forward([s.lon0 - d / 2.0], [s.lat0], s)
    e3_, n3_ = S.omerc_forward([s.lon0 + d / 2.0], [s.lat0], s)
    nu = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) ** 2)
    k_par = math.hypot(e3_[0] - e2_[0], n3_[0] - n2_[0]) / (
        math.radians(d) * nu * math.cos(phi)
    )
    assert abs(k_mer - 0.9996) < 1e-6
    assert abs(k_par - 0.9996) < 1e-6


def test_omerc_in_generic_transform_with_datum_bridge():
    """29873 (Timbalai 1948) engages the published 3-parameter
    Helmert inside xy_transform; 3376 (GDM2000, GRS80) must NOT —
    and the two grids, which share every projection parameter except
    datum and false origin, must disagree by roughly the Borneo
    datum shift, not by zero and not by kilometers."""
    import numpy as np

    from geokit_spark.kernels import srs as S

    lon, lat = np.array([115.5]), np.array([5.0])
    x_t, y_t = S.xy_transform(lon, lat, 4326, 29873)
    x_g, y_g = S.xy_transform(lon, lat, 4326, 3376)
    lon2, lat2 = S.xy_transform(x_t, y_t, 29873, 4326)
    # 1e-7 deg ~ 1 cm: the ECEF<->geodetic Helmert bridge iteration
    # tolerance, not the projection's (which closes at 1e-9 above)
    assert abs(lon2[0] - 115.5) < 1e-7 and abs(lat2[0] - 5.0) < 1e-7
    shift = np.hypot(
        (x_t[0] - S.load_srs(29873).false_e) - x_g[0],
        (y_t[0] - S.load_srs(29873).false_n) - y_g[0],
    )
    assert 100.0 < shift < 1500.0


def test_omerc_from_params_validation():
    import pytest as _pytest

    from geokit_spark.kernels import srs as S

    # gamma_c defaults to alpha_c
    s = S.from_params("omerc", 4.0, 115.0, lat1=53.0, ellps="WGS84")
    assert s.lat2 == 53.0
    with _pytest.raises(ValueError, match="0 < |lat0| < 90"):
        S.from_params("omerc", 0.0, 115.0, lat1=53.0)
    with _pytest.raises(ValueError, match="cos"):
        S.from_params("omerc", 4.0, 115.0, lat1=115.0)


# ---------------------------------------------------------------------------
# Albers equal-area conic (EPSG method 9822) + Mollweide


def test_albers_equal_area_invariant_and_parallels():
    """EPSG:5070 (NAD83 / Conus Albers) pinned by the projection's
    DEFINING invariants rather than a remembered worked example:
    (1) the finite-difference Jacobian determinant equals the
    ellipsoidal area element M(phi) N(phi) cos(phi) everywhere
    (equal-area, relative 1e-6 at h=1e-7 deg); (2) the scale along
    both STANDARD PARALLELS is exactly 1 (projected arc ==
    N(phi_i) cos(phi_i) dlambda); (3) roundtrips close at float
    precision across CONUS; (4) the false origin sits at
    (lat0, lon0)."""
    import math

    import numpy as np

    from geokit_spark.kernels import srs as S

    s = S.load_srs(5070)
    assert s.kind == "aea"
    ell = S.Ellipsoid("GRS80")
    rng = np.random.default_rng(3)
    lons = rng.uniform(-124.0, -67.0, 300)
    lats = rng.uniform(25.0, 49.0, 300)
    x, y = S.aea_forward(lons, lats, s)
    lo, la = S.aea_inverse(x, y, s)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9

    h = 1e-7
    exf, nyf = S.aea_forward(lons + h / 2, lats, s)
    exb, nyb = S.aea_forward(lons - h / 2, lats, s)
    eyf, nyf2 = S.aea_forward(lons, lats + h / 2, s)
    eyb, nyb2 = S.aea_forward(lons, lats - h / 2, s)
    dlam = math.radians(h)
    j11 = (exf - exb) / dlam
    j21 = (nyf - nyb) / dlam
    j12 = (eyf - eyb) / dlam
    j22 = (nyf2 - nyb2) / dlam
    det = np.abs(j11 * j22 - j12 * j21)
    phi = np.radians(lats)
    sin2 = np.sin(phi) ** 2
    big_m = ell.a * (1 - ell.e2) / (1 - ell.e2 * sin2) ** 1.5
    big_n = ell.a / np.sqrt(1 - ell.e2 * sin2)
    area_elem = big_m * big_n * np.cos(phi)
    assert np.abs(det / area_elem - 1.0).max() < 1e-5

    # wider step here: at h=1e-7 deg the ~1 cm projected arc is
    # swamped by float cancellation against the ~1e6 m eastings
    hp = 1e-4
    for sp in (29.5, 45.5):
        e0, n0 = S.aea_forward([-96.0 - hp / 2], [sp], s)
        e1, n1 = S.aea_forward([-96.0 + hp / 2], [sp], s)
        nu = ell.a / math.sqrt(1 - ell.e2 * math.sin(math.radians(sp)) ** 2)
        k = math.hypot(e1[0] - e0[0], n1[0] - n0[0]) / (
            math.radians(hp) * nu * math.cos(math.radians(sp))
        )
        assert abs(k - 1.0) < 1e-8, sp

    e, n = S.aea_forward([s.lon0], [s.lat0], s)
    assert abs(e[0] - s.false_e) < 1e-6 and abs(n[0] - s.false_n) < 1e-6
    # southern-hemisphere cone (GDA94 Australian Albers) round-trips
    au = S.load_srs(3577)
    x, y = S.aea_forward([133.0, 116.0], [-25.0, -32.0], au)
    lo, la = S.aea_inverse(x, y, au)
    assert np.abs(lo - np.array([133.0, 116.0])).max() < 1e-9
    assert np.abs(la - np.array([-25.0, -32.0])).max() < 1e-9


def test_mollweide_54009():
    """World Mollweide pinned by its closed-form frame: the equator-
    origin maps to (0,0); the poles to (0, +-sqrt(2) a); the map is
    2 sqrt(2) a wide at the equator and exactly twice as wide as
    tall; the SPHERICAL area element a^2 cos(phi) is reproduced by
    the finite-difference Jacobian (the defining equal-area property
    on the PROJ radius-a convention); roundtrips close."""
    import math

    import numpy as np

    from geokit_spark.kernels import srs as S

    s = S.load_srs(54009)
    a = S.Ellipsoid("WGS84").a
    sq2 = math.sqrt(2.0)
    x, y = S.moll_forward([0.0, 180.0, 0.0, 0.0], [0.0, 0.0, 90.0, -90.0], s)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    assert abs(x[1] - 2.0 * sq2 * a / np.pi * np.pi) < 1e-6  # 2*sqrt(2)*a
    assert abs(y[2] - sq2 * a) < 1e-6
    assert abs(y[3] + sq2 * a) < 1e-6
    assert abs(x[2]) < 1e-6 and abs(x[3]) < 1e-6

    rng = np.random.default_rng(5)
    lons = rng.uniform(-179.0, 179.0, 400)
    lats = rng.uniform(-88.0, 88.0, 400)
    x, y = S.moll_forward(lons, lats, s)
    lo, la = S.moll_inverse(x, y, s)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9

    h = 1e-6
    dlam = math.radians(h)
    exf, _n1 = S.moll_forward(lons + h / 2, lats, s)
    exb, _n2 = S.moll_forward(lons - h / 2, lats, s)
    eyf, nyf = S.moll_forward(lons, lats + h / 2, s)
    eyb, nyb = S.moll_forward(lons, lats - h / 2, s)
    det = np.abs(
        ((exf - exb) / dlam) * ((nyf - nyb) / dlam)
        - ((eyf - eyb) / dlam) * ((_n1 - _n2) / dlam)
    )
    area_elem = a * a * np.cos(np.radians(lats))
    assert np.abs(det / area_elem - 1.0).max() < 1e-4

    # generic-transform wiring
    x, y = S.xy_transform([10.0], [50.0], 4326, 54009)
    lo, la = S.xy_transform(x, y, 54009, 4326)
    assert abs(lo[0] - 10.0) < 1e-9 and abs(la[0] - 50.0) < 1e-9


def test_albers_inverse_near_pole():
    """Regression (round-7 review): the Snyder Newton iteration
    stalls near the poles from the naive spherical start — 8e-4 deg
    off at 89.9999 — and diverges AT the pole. Fixed by the authalic-
    latitude series start + the |q| >= q_polar special case; the
    whole band must now close to 1e-8 deg (the last ~10 cm around
    the exact pole snaps to it by design)."""
    import numpy as np

    from geokit_spark.kernels import srs as S

    s = S.load_srs(5070)
    lats = np.array([90.0, 89.99999, 89.9999, 89.999, 89.99,
                     -90.0, -89.9999, -89.999])
    x, y = S.aea_forward(np.full_like(lats, -96.0), lats, s)
    _, la = S.aea_inverse(x, y, s)
    # 5e-8 deg ~ 5 mm: the asin(q/q_polar) float conditioning floor
    # in the last arcsecond before the pole
    assert np.abs(la - lats).max() < 5e-8


def test_equidistant_cylindrical_4087():
    """EPSG:4087 (World Equidistant Cylindrical, method 1028) pinned
    by closed-form/independent invariants: x at the antimeridian is
    EXACTLY a*pi (the shared half-circumference constant); y equals
    the true meridian arc (independent 2M-point numeric integral of
    M(phi), < 1e-8 m); roundtrips close at machine precision; a
    standard-parallel variant has unit scale along that parallel and
    unit scale along EVERY meridian (the defining equidistance)."""
    import math

    import numpy as np

    from geokit_spark.kernels import srs as S

    s = S.load_srs(4087)
    assert s.kind == "eqc"
    x, y = S.eqc_forward([180.0, 0.0], [0.0, 0.0], s)
    assert x[0] == 6378137.0 * math.pi
    assert y[1] == 0.0

    _, y52 = S.eqc_forward([0.0], [52.0], s)
    ell = S.Ellipsoid("WGS84")
    phi = np.linspace(0.0, np.radians(52.0), 2_000_001)
    m = ell.a * (1 - ell.e2) / (1 - ell.e2 * np.sin(phi) ** 2) ** 1.5
    trap = getattr(np, "trapezoid", getattr(np, "trapz", None))
    assert abs(y52[0] - float(trap(m, phi))) < 1e-7

    rng = np.random.default_rng(9)
    lons = rng.uniform(-179.0, 179.0, 500)
    lats = rng.uniform(-89.0, 89.0, 500)
    x, y = S.eqc_forward(lons, lats, s)
    lo, la = S.eqc_inverse(x, y, s)
    assert np.abs(lo - lons).max() < 1e-11
    assert np.abs(la - lats).max() < 1e-11

    # standard-parallel variant: unit scale on the parallel and on
    # every meridian (equidistance) by finite differences
    sp = S.from_params("eqc", 0.0, 10.0, lat1=60.0, ellps="WGS84")
    h = 1e-4
    phi1 = math.radians(60.0)
    nu1c = ell.a * math.cos(phi1) / math.sqrt(
        1 - ell.e2 * math.sin(phi1) ** 2
    )
    x0, _ = S.eqc_forward([20.0 - h / 2], [60.0], sp)
    x1, _ = S.eqc_forward([20.0 + h / 2], [60.0], sp)
    assert abs((x1[0] - x0[0]) / (math.radians(h) * nu1c) - 1.0) < 1e-9
    for lat in (-45.0, 0.0, 33.0, 75.0):
        _, ya = S.eqc_forward([20.0], [lat - h / 2], sp)
        _, yb = S.eqc_forward([20.0], [lat + h / 2], sp)
        mm = ell.a * (1 - ell.e2) / (
            1 - ell.e2 * math.sin(math.radians(lat)) ** 2
        ) ** 1.5
        assert abs((yb[0] - ya[0]) / (math.radians(h) * mm) - 1.0) < 1e-7
    # generic-transform wiring + deprecated alias
    x, y = S.xy_transform([10.0], [50.0], 4326, 4087)
    lo, la = S.xy_transform(x, y, 4087, 4326)
    assert abs(lo[0] - 10.0) < 1e-9 and abs(la[0] - 50.0) < 1e-9
    assert S.load_srs(32662).kind == "eqc"


def test_sinusoidal_54008_and_modis():
    """Sinusoidal (Sanson-Flamsteed): ESRI:54008 (radius = a) and the
    MODIS land grid ('modis_sinu', authalic sphere R = 6371007.181).
    Pinned by the grid's closed-form frame: x(+-180, 0) = +-pi R (the
    published MODIS grid half-width 20015109.356 m), y strictly
    linear in latitude (R per radian), the finite-difference Jacobian
    equal to the spherical area element R^2 cos(phi) everywhere
    (equal-area), and machine-precision roundtrips."""
    import math

    import numpy as np

    from geokit_spark.kernels import srs as S

    m = S.load_srs("modis_sinu")
    assert (m.kind, m.ellps) == ("sinu", "sphere_modis")
    big_r = S.Ellipsoid("sphere_modis").a
    assert big_r == 6371007.181
    x, y = S.sinu_forward([-180.0, 180.0, 0.0], [0.0, 0.0, 50.0], m)
    assert x[0] == -math.pi * big_r and x[1] == math.pi * big_r
    assert abs(x[0] + 20015109.3558) < 1e-3  # published grid half-width
    assert y[2] == big_r * math.radians(50.0)

    rng = np.random.default_rng(13)
    lons = rng.uniform(-179.0, 179.0, 300)
    lats = rng.uniform(-85.0, 85.0, 300)
    h = 1e-6
    dlam = math.radians(h)
    x1, y1 = S.sinu_forward(lons + h / 2, lats, m)
    x0, y0 = S.sinu_forward(lons - h / 2, lats, m)
    x3, y3 = S.sinu_forward(lons, lats + h / 2, m)
    x2, y2 = S.sinu_forward(lons, lats - h / 2, m)
    det = np.abs(
        ((x1 - x0) / dlam) * ((y3 - y2) / dlam)
        - ((x3 - x2) / dlam) * ((y1 - y0) / dlam)
    )
    elem = big_r * big_r * np.cos(np.radians(lats))
    assert np.abs(det / elem - 1.0).max() < 1e-6

    lo, la = S.sinu_inverse(*S.sinu_forward(lons, lats, m), m)
    assert np.abs(lo - lons).max() < 1e-11
    assert np.abs(la - lats).max() < 1e-11

    # ESRI:54008 (radius = a) + generic-transform wiring
    s8 = S.load_srs(54008)
    assert s8.kind == "sinu" and S.Ellipsoid(s8.ellps).a == 6378137.0
    xx, yy = S.xy_transform([10.0], [50.0], 4326, 54008)
    lo, la = S.xy_transform(xx, yy, 54008, 4326)
    assert abs(lo[0] - 10.0) < 1e-9 and abs(la[0] - 50.0) < 1e-9
    # spherical ellipsoid degrades every shared series gracefully
    assert S.Ellipsoid("sphere_modis").e2 == 0.0
