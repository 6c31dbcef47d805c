"""interpolateValues cubic-spline + user-func hook (reference
raster.py:1241-1297; func hook :1176-1199)."""

import numpy as np
from pyspark.sql import functions as F

from geokit_spark.functions.geo import with_geocode
from geokit_spark.operators import extract_values as ev
from geokit_spark.sources import tiles as tilesrc


def _pts(spark, docs, n=200):
    return with_geocode(docs.select("doc_id").limit(n))


def test_cubic_matches_numpy_reference(spark, docs):
    """Bicubic at points must equal a straight numpy Catmull-Rom
    evaluation over the full matrix."""
    from geokit_spark.constants import (
        PIX_DX, PIX_DY, RASTER_H, RASTER_W, XMIN, YMAX,
    )
    from geokit_spark.kernels.raster_fields import elev_value

    pts = _pts(spark, docs)
    got = (
        ev.interpolate_cubic(pts, tilesrc.raster_table(spark, "elev"))
        .toPandas()
        .set_index("doc_id")["elev_cubic"]
    )
    pdf = pts.toPandas()
    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    full = elev_value(ix, iy).astype(np.float64)

    def cubic1d(fm1, f0, f1, f2, u):
        return f0 + 0.5 * u * (
            f1 - fm1 + u * (2.0 * fm1 - 5.0 * f0 + 4.0 * f1 - f2
                            + u * (3.0 * (f0 - f1) + f2 - fm1))
        )

    for r in pdf.itertuples():
        gx = (r.lon - XMIN) / PIX_DX - 0.5
        gy = (YMAX - r.lat) / PIX_DY - 0.5
        ixb = int(np.clip(np.floor(gx), 1, RASTER_W - 3))
        iyb = int(np.clip(np.floor(gy), 1, RASTER_H - 3))
        fx, fy = gx - ixb, gy - iyb
        rows = [
            cubic1d(*(full[iyb + dy, ixb - 1 : ixb + 3]), fx)
            for dy in (-1, 0, 1, 2)
        ]
        exp = cubic1d(rows[0], rows[1], rows[2], rows[3], fy)
        assert np.isclose(got[r.doc_id], exp, rtol=1e-12), r.doc_id


def test_cubic_reproduces_integer_values_at_centers(spark):
    """At pixel centers the cubic weights collapse to ~the pixel value
    (u≈0 up to the float rounding of the center coordinate)."""
    import pandas as pd

    from geokit_spark.constants import PIX_DX, PIX_DY, XMIN, YMAX
    from geokit_spark.kernels.raster_fields import elev_value

    idx = [(10, 10), (100, 37), (300, 471)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(idx)),
            "lon": [XMIN + (i + 0.5) * PIX_DX for i, _ in idx],
            "lat": [YMAX - (j + 0.5) * PIX_DY for _, j in idx],
        }
    )
    pts = spark.createDataFrame(pdf)
    got = (
        ev.interpolate_cubic(pts, tilesrc.raster_table(spark, "elev"))
        .toPandas()
        .set_index("doc_id")["elev_cubic"]
    )
    for k, (i, j) in enumerate(idx):
        assert np.isclose(got[k], float(elev_value(i, j)), rtol=1e-9)


def test_interpolate_func_mean_matches_average3(spark, docs):
    """A user func computing the 3x3 window mean must reproduce the
    built-in average3 mode — the reference's interpolateValues
    mode='func' contract."""
    pts = _pts(spark, docs, n=100)
    tiles = tilesrc.raster_table(spark, "elev")
    via_func = (
        ev.interpolate_func(
            pts, tiles, lambda w, xo, yo: float(w.sum()) / 9.0, window=1,
            out_name="v",
        )
        .toPandas()
        .set_index("doc_id")["v"]
    )
    builtin = (
        ev.interpolate_average3(pts, tiles)
        .toPandas()
        .set_index("doc_id")["elev_avg3"]
    )
    assert np.allclose(via_func.sort_index(), builtin.sort_index(), rtol=1e-12)


def test_interpolate_func_uses_offsets(spark, docs):
    """The hook must pass sub-pixel offsets (reference xOff/yOff)."""
    pts = _pts(spark, docs, n=50)
    tiles = tilesrc.raster_table(spark, "elev")
    got = ev.interpolate_func(
        pts, tiles, lambda w, xo, yo: xo + 10.0 * yo, window=1, out_name="v"
    ).toPandas()
    assert ((got["v"] >= 0) & (got["v"] <= 11.0)).all()
    assert got["v"].nunique() > 40  # offsets genuinely vary per point