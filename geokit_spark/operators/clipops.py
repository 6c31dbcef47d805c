"""extractAndClipFeatures: spatial theta-join + clip transform
(reference /root/reference/geokit/core/vector.py:738-947; clip loop
:916-931, attribute scaling :940-941).

Each feature intersecting the clip window is clipped (Sutherland-
Hodgman — exact for the reference's box/convex windows; general
concave clipping is the documented hard part, SURVEY §7.3), its
areaShare = clipped_area / full_area computed, numeric attributes
scaled by areaShare, and slivers below min_share dropped.

Runs as one Arrow-batched pandas stage over the feature table; the
clip window is a broadcast constant (at scale: one window per
partition key via a small join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.pip import clip_poly_box, poly_area
from .mutate import zones_feature_df


def extract_and_clip_zones(
    spark: SparkSession,
    clip_box: tuple[float, float, float, float],
    min_share: float = 0.001,
) -> DataFrame:
    """(zone_id, year_scaled, area_share) for zones intersecting the
    clip box; numeric attribute `year` scaled by areaShare like the
    reference scales numeric fields (vector.py:940-941)."""

    def processor(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in pdf.itertuples():
            verts = list(zip(r.xs, r.ys))
            full = poly_area(verts)
            clipped = clip_poly_box(verts, clip_box)
            a = poly_area(clipped) if len(clipped) >= 3 else 0.0
            share = a / full if full > 0 else 0.0
            if share < min_share:
                continue
            out.append(
                {
                    "zone_id": r.zone_id,
                    "area_share": share,
                    "year_scaled": r.year * share,
                }
            )
        return pd.DataFrame(
            out, columns=["zone_id", "area_share", "year_scaled"]
        )

    def fn(batches):
        for pdf in batches:
            yield processor(pdf)

    return zones_feature_df(spark).mapInPandas(
        fn, schema="zone_id int, area_share double, year_scaled double"
    )


def extract_and_clip_zones_general(
    spark: SparkSession,
    clip_verts: list[tuple[float, float]],
    min_share: float = 0.001,
) -> DataFrame:
    """extractAndClipFeatures against an ARBITRARY simple (possibly
    CONCAVE) clip region — the reference clips with any region
    geometry (vector.py:916-931); the convex-window restriction of
    extract_and_clip_zones is lifted by the exact-rational ear-clip +
    Sutherland-Hodgman kernel (kernels.clip_general). clip_verts may
    be a single ring or a ring list [outer, hole, ...] (donut clip
    regions, reference geom.py:261-345). Same output contract:
    (zone_id, area_share, year_scaled), slivers below min_share
    dropped."""
    from ..kernels.clip_general import area_share_general
    from ..kernels.pip import as_rings

    cv = [
        [(float(x), float(y)) for x, y in ring]
        for ring in as_rings(clip_verts)
    ]

    def fn(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                share = area_share_general(list(zip(r.xs, r.ys)), cv)
                if share < min_share:
                    continue
                out.append(
                    {
                        "zone_id": r.zone_id,
                        "area_share": share,
                        "year_scaled": r.year * share,
                    }
                )
            yield pd.DataFrame(
                out, columns=["zone_id", "area_share", "year_scaled"]
            )

    return zones_feature_df(spark).mapInPandas(
        fn, schema="zone_id int, area_share double, year_scaled double"
    )
