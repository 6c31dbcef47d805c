"""Union as GEOMETRY — the reference's pairwise union tree
(`flatten`, /root/reference/geokit/core/geom.py:871-913) as a
two-level Spark reduction:

  stage 1 (distributed): zones grouped by zone_id % n_groups; one
      applyInPandas task per group runs the N-way exact boundary
      union (kernels.union_geom) and emits the partial region with
      EXACT RATIONAL vertices (JSON "num/den" pairs) — floats at the
      stage boundary would silently break the exactness contract;
  stage 2 (tree root): one task unions the partial regions and emits
      the final multipolygon row.

Set-associativity makes the result independent of the grouping —
the treeReduce shape of the reference's union tree. The verified
output is the exact union area (vs the independent slab-decomposition
oracle); ring structure (outers CCW / holes CW) ships as WKB.
"""

from __future__ import annotations

import json
from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..kernels.union_geom import (
    _normalize_region,
    signed_area2,
    union_regions,
)
from ..kernels.wkb import multipolygon_wkb
from .mutate import zones_feature_df


def _region_to_json(region) -> str:
    return json.dumps(
        [
            [[str(x), str(y)] for x, y in ring]
            for ring in region
        ]
    )


def _region_from_json(s: str):
    return [
        [(Fraction(x), Fraction(y)) for x, y in ring]
        for ring in json.loads(s)
    ]


def union_zones_geometry(
    spark: SparkSession, zones=None, n_groups: int = 8, fan_in: int = 8
) -> DataFrame:
    """(union_area, n_rings, n_outer, n_holes, wkb) of the union of
    all zone polygons.

    Tree shape: log-depth — merge levels of at most fan_in partial
    regions each (grp // fan_in regrouping) run until <= fan_in
    partials remain, then one root task assembles rings + WKB. No
    single task ever unions more than fan_in partial regions (the
    merge fn raises otherwise), so a continental union is
    ceil(log_fan_in(n_groups)) rounds of bounded tasks instead of one
    task over every partial. Set associativity of the exact-rational
    union makes the result independent of the tree shape."""
    zones = zones if zones is not None else fixtures.ZONES
    if fan_in < 2:
        raise ValueError("fan_in must be >= 2")
    # CONTIGUOUS id blocks: zone ids are laid out row-major on the
    # fixture grid, so block grouping gives spatially coherent
    # partial regions — the kernel's bbox pruning then skips almost
    # every cross-band test. Any grouping yields the same union (set
    # associativity); this one is just fastest.
    blk = (len(zones) + n_groups - 1) // n_groups
    feats = zones_feature_df(spark, zones).withColumn(
        "grp", F.floor(F.col("zone_id") / F.lit(blk))
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = [list(zip(r.xs, r.ys)) for r in pdf.itertuples()]
        region = union_regions(_normalize_region(polys))
        return pd.DataFrame(
            [{"grp": int(pdf["grp"].iloc[0]),
              "region": _region_to_json(region)}]
        )

    partials = feats.groupBy("grp").applyInPandas(
        partial, schema="grp int, region string"
    )

    def merge_level(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > fan_in:
            raise ValueError(
                f"union merge task got {len(pdf)} partials > fan_in="
                f"{fan_in} — log-depth bound violated"
            )
        regions = [_region_from_json(s) for s in pdf["region"]]
        region = union_regions(regions)
        return pd.DataFrame(
            [{"grp": int(pdf["grp"].iloc[0]), "region": _region_to_json(region)}]
        )

    # log-depth reduce: each level shrinks the partial count by fan_in
    remaining = n_groups
    while remaining > fan_in:
        partials = (
            partials.withColumn(
                "grp", F.floor(F.col("grp") / F.lit(fan_in)).cast("int")
            )
            .groupBy("grp")
            .applyInPandas(merge_level, schema="grp int, region string")
        )
        remaining = (remaining + fan_in - 1) // fan_in

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > fan_in:
            raise ValueError(
                f"union root task got {len(pdf)} partials > fan_in={fan_in}"
            )
        regions = [_region_from_json(s) for s in pdf["region"]]
        rings = union_regions(regions)
        area = sum((signed_area2(r) for r in rings), Fraction(0)) / 2
        outers = [r for r in rings if signed_area2(r) > 0]
        holes = [r for r in rings if signed_area2(r) < 0]
        # assign each hole to the smallest outer containing its first
        # vertex (exact even-odd test on that single ring)
        def in_ring(p, ring):
            inside = False
            n = len(ring)
            for i in range(n):
                a, b = ring[i], ring[(i + 1) % n]
                if (a[1] > p[1]) != (b[1] > p[1]):
                    xc = (b[0] - a[0]) * (p[1] - a[1]) / (b[1] - a[1]) + a[0]
                    if p[0] < xc:
                        inside = not inside
            return inside

        polys = [[o] for o in sorted(outers, key=signed_area2)]
        for h in holes:
            for rings_of_poly in polys:  # smallest containing outer first
                if in_ring(h[0], rings_of_poly[0]):
                    rings_of_poly.append(h)
                    break
            else:
                raise ValueError("hole not contained in any outer ring")
        wkb = multipolygon_wkb(
            [
                [[(float(x), float(y)) for x, y in ring] for ring in poly]
                for poly in polys
            ]
        )
        return pd.DataFrame(
            [
                {
                    "union_area": float(area),
                    "n_rings": len(rings),
                    "n_outer": len(outers),
                    "n_holes": len(holes),
                    "wkb": wkb,
                }
            ]
        )

    return (
        partials.withColumn("one", F.lit(1))
        .groupBy("one")
        .applyInPandas(
            final,
            schema=(
                "union_area double, n_rings int, n_outer int, "
                "n_holes int, wkb binary"
            ),
        )
        .drop("one")
        .select("union_area", "n_rings", "n_outer", "n_holes", "wkb")
    )
