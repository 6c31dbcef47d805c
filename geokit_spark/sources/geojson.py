"""GeoJSON serialization (reference createGeoJson,
/root/reference/geokit/core/vector.py:1276-1385).

Features are assembled JVM-side with to_json over structs — the
geometry coordinates ride as array<array<array<double>>> (ring list),
so the sink is a plain DataFrame write of one JSON string per feature
plus a driver-side FeatureCollection wrapper for small outputs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mutate import zones_feature_df


def zones_geojson_features(spark: SparkSession) -> DataFrame:
    """(zone_id, feature_json) — one GeoJSON Feature per zone."""
    zf = zones_feature_df(spark)
    # closed ring: append first vertex
    ring = F.transform(
        F.sequence(F.lit(0), F.size("xs")),  # 0..n inclusive -> n+1 points
        lambda i: F.array(
            F.element_at("xs", (i % F.size("xs")) + 1),
            F.element_at("ys", (i % F.size("ys")) + 1),
        ),
    )
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.col("zone_id"), F.col("site_code"), F.col("year"), F.col("designate")
        ).alias("properties"),
        F.struct(
            F.lit("Polygon").alias("type"),
            F.array(ring).alias("coordinates"),
        ).alias("geometry"),
    )
    return zf.select("zone_id", F.to_json(feature).alias("feature_json"))


def feature_collection(df: DataFrame, json_col: str = "feature_json") -> str:
    """Driver-side FeatureCollection assembly (small outputs only —
    large sinks write line-delimited features instead)."""
    feats = [r[json_col] for r in df.select(json_col).collect()]
    return '{"type":"FeatureCollection","features":[' + ",".join(feats) + "]}"


def zones_topojson(spark: SparkSession, quantization: int = 100_000) -> str:
    """TopoJSON document for the zones table — the topo=True path of
    the reference createGeoJson (vector.py:1276-1385), object name
    "primary" like the reference's topojson.conversion call. Driver-
    side small-output contract (the reference iterates an in-memory
    geometry list too); see kernels.topojson for the arc topology."""
    from ..kernels.topojson import topojson_document

    zf = zones_feature_df(spark).collect()
    features = [
        {
            "rings": [list(zip(r["xs"], r["ys"]))],
            "properties": {
                "zone_id": r["zone_id"],
                "site_code": r["site_code"],
                "year": r["year"],
                "designate": r["designate"],
            },
        }
        for r in zf
    ]
    return topojson_document(features, quantization)


def write_geojson_lines(df: DataFrame, path: str, json_col: str = "feature_json"):
    """Distributed GeoJSON sink: one Feature per line (newline-
    delimited GeoJSON, the standard big-data interchange). Unlike
    feature_collection (driver-side, small outputs only), this writes
    from the executors — the 100 TB path."""
    df.select(F.col(json_col).alias("value")).write.mode("overwrite").text(path)


def read_geojson_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read a newline-delimited GeoJSON feature file back to
    (feature_json string) rows."""
    return spark.read.text(path).select(F.col("value").alias("feature_json"))
