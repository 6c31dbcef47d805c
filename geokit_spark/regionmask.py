"""RegionMask — the reference's central convenience object
(regionmask.py:60-536 construction, :1006-1583 indicate*, :1776-1891
workflow) re-expressed as a THIN wrapper over the engine's distributed
operators. Construction is driver-side (a polygon + the raster grid);
every method returns a DataFrame produced by the corresponding
distributed operator, so the wrapper adds no execution path of its
own.

The reference's RegionMask carries (extent, pixel size, mask array);
this engine's analog carries (verts, srs) and derives masks on demand
— the mask is never materialized driver-side (the reference warns its
country-scale masks exhaust memory, regionmask.py:344-348; here the
mask is a distributed tile table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures
from .constants import PIX_DX, PIX_DY
from .kernels.srs import load_srs, xy_transform


class RegionMask:
    """A region polygon bound to the engine's raster grid.

    make(spark, verts) — from a vertex ring (any supported SRS via
    srs=; stored in EPSG:4326 like the reference's default workflow).
    """

    def __init__(self, spark: SparkSession, verts, srs=4326):
        from .kernels.pip import as_rings

        self.spark = spark
        s = load_srs(srs)
        rings = []
        for ring in as_rings(verts):
            v = [(float(x), float(y)) for x, y in ring]
            if len(v) > 1 and v[0] == v[-1]:
                v = v[:-1]
            if s is not None and s.kind != "latlon":
                xs, ys = xy_transform(
                    [p[0] for p in v], [p[1] for p in v], s, 4326
                )
                v = list(zip(xs.tolist(), ys.tolist()))
            rings.append(v)
        # verts keeps the single-ring contract for outer-only consumers
        # (tileize/buffer/area/...); rings carries holes for the
        # mask/zonal/filter family
        self.rings = rings
        self.verts = rings[0]

    # --- construction helpers (reference RegionMask.fromGeom/fromVector)

    @classmethod
    def from_wkb(cls, spark: SparkSession, buf: bytes, srs=4326):
        from .kernels.wkb import parse_wkb

        kind, payload = parse_wkb(bytes(buf))
        if kind != "polygon":
            raise ValueError("RegionMask needs a polygon")
        # pass rings through unchanged: __init__ strips the closing
        # vertex only when first == last, so an unclosed WKB ring does
        # not silently lose a real vertex. Interior rings (holes) are
        # kept — the mask/zonal/filter family honors them; outer-only
        # ops (tileize/buffer/area) raise.
        rings = payload if isinstance(payload, list) else [payload]
        return cls(spark, [[(x, y) for x, y in r] for r in rings], srs)

    @classmethod
    def fixture_region(cls, spark: SparkSession):
        return cls(spark, fixtures.REGION_VERTS)

    def _as_zone(self) -> list[dict]:
        # ring list passes through: zonal_partials / indicate are
        # rings-aware (even-odd over all rings)
        return [{"zone_id": 0, "verts": self.rings}]

    # --- mask / area (regionmask.py:504-536)

    def mask_stats(self, tiles: DataFrame) -> DataFrame:
        """(n_pix, area): rasterized-mask pixel count + geo area."""
        from .operators.zonal import zonal_partials

        p = zonal_partials(tiles, zones=self._as_zone())
        return p.groupBy("zone_id").agg(F.sum("n").alias("n_pix")).select(
            F.col("n_pix"),
            (F.col("n_pix").cast("double") * F.lit(PIX_DX) * F.lit(PIX_DY))
            .alias("area"),
        )

    # --- zonal / indicate workflow (regionmask.py:1006-1583)

    def raster_stats(self, tiles: DataFrame) -> DataFrame:
        """rasterStats over the region (full describe surface)."""
        from .operators.zonal import zonal_stats

        return zonal_stats(tiles, zones=self._as_zone())

    def indicate_values(self, tiles: DataFrame, value: str) -> DataFrame:
        """indicateValues: DSL classify -> fraction inside the region."""
        from .operators.indicate import indicate_values

        return indicate_values(tiles, value, zones=self._as_zone())

    def indicate_features(
        self, tiles: DataFrame, designate: str, buffer_dist: float = 0.0,
        zones=None,
    ) -> DataFrame:
        """indicateFeatures with the optional geometry-buffer method."""
        from .operators.indicate import indicate_features

        return indicate_features(
            tiles, designate, region_verts=self.rings,
            buffer_dist=buffer_dist, zones=zones,
        )

    # --- spatial joins (vector.py extractFeatures with geom=)

    def filter_points(self, pts: DataFrame) -> DataFrame:
        """Semi-join: rows of pts (lon/lat) inside the region."""
        from .operators.spatial_join import points_in_polygon

        return points_in_polygon(self.spark, pts, self.rings)

    # --- tiling (regionmask.py subTiles / subRegions; rings-aware —
    # tiles fully inside a hole are excluded, donut pieces carry their
    # hole clips, reference tiles any region regionmask.py:1641-1662)

    def sub_tiles(self, zoom: int):
        from .kernels.tiling import sub_tiles

        return list(sub_tiles(self.rings, zoom))

    def tileize(self, zoom: int):
        from .kernels.tiling import tileize

        return tileize(self.rings, zoom)

    # --- geometry derivatives

    def buffer(
        self, dist: float, arc_segments: int = 8, method: str = "safe"
    ) -> "RegionMask":
        """Buffered copy (regionmask.py:1126 buffer option; reference
        buffers arbitrary geometries regionmask.py:1409-1440): growing
        grows the outer ring and shrinks the holes, shrinking the
        reverse (kernels.buffer.buffer_rings; topology changes raise)."""
        from .kernels.buffer import buffer_rings

        out = buffer_rings(self.rings, dist, arc_segments, method=method)
        if not out:
            raise ValueError("RegionMask.buffer: region collapsed")
        return RegionMask(self.spark, out)

    def area_4326(self) -> float:
        """Shoelace area of the polygon itself (degrees^2)."""
        from .kernels.geom_ops import signed_area

        # outer area minus hole areas (proper nesting assumed)
        return abs(signed_area(self.rings[0])) - sum(
            abs(signed_area(r)) for r in self.rings[1:]
        )
