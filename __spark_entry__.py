"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 over
the driver's parquet tables; ``oracle_sql()`` gives the bit-identical
DuckDB SQL (see geokit_spark.oracle.sqlgen for the parity rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.constants import GRID_N
from geokit_spark.functions.geo import cell_cols, grid_cell_cols, with_geocode
from geokit_spark.operators import spatial_join
from geokit_spark.oracle import sqlgen


# ---------------------------------------------------------------------------
# queries


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_geocode_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geocode + cell indexing — pure JVM arithmetic, no UDF.
    (reference: srs.tileIndexAt srs.py:225-247 / rasterCellNo
    raster.py:2560-2673 as the cell-index primitive)"""
    d = with_geocode(_docs(spark, sf_dir).select("doc_id"))
    cx, cy = cell_cols(F.col("lon"), F.col("lat"))
    gx, gy = grid_cell_cols(F.col("lon"), F.col("lat"))
    return d.select(
        "doc_id",
        F.col("lon"),
        F.col("lat"),
        cx.alias("cell_x"),
        cy.alias("cell_y"),
        gx.alias("grid_x"),
        gy.alias("grid_y"),
    )


def q_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiling throughput stage: docs per cell (slippy-analog index)."""
    d = with_geocode(_docs(spark, sf_dir).select("doc_id"))
    cx, cy = cell_cols(F.col("lon"), F.col("lat"))
    return (
        d.select(cx.alias("cell_x"), cy.alias("cell_y"))
        .groupBy("cell_x", "cell_y")
        .agg(F.count("*").alias("n_docs"))
    )


def q_pip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial semi-join vs the region polygon, per-lang counts
    (reference countFeatures/extractFeatures(geom=...),
    vector.py:172-202,458-588)."""
    inside = spatial_join.docs_in_region(spark, _docs(spark, sf_dir))
    return inside.groupBy("lang").agg(F.count("*").alias("n_docs"))


def q_pip_zones_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner spatial join docs x zones -> docs per zone (flagship;
    reference sjoin semantics, vector.py:1851-1901)."""
    pairs = spatial_join.docs_join_zones(spark, _docs(spark, sf_dir))
    return pairs.groupBy("zone_id").agg(F.count("*").alias("n_docs"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: count geocoded pages per zone at sf0.001."""
    return q_pip_zones_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "geocode_cells": q_geocode_cells,
        "cell_counts": q_cell_counts,
        "pip_region": q_pip_region,
        "pip_zones_join": q_pip_zones_join,
    }


# ---------------------------------------------------------------------------
# oracles


def _o_geocode_cells() -> str:
    cx, cy = sqlgen.cell_exprs()
    gx, gy = sqlgen.grid_cell_exprs()
    return f"""
WITH {sqlgen.geocode_cte()}
SELECT doc_id, lon, lat, {cx} AS cell_x, {cy} AS cell_y,
       {gx} AS grid_x, {gy} AS grid_y
FROM geo
"""


def _o_cell_counts() -> str:
    cx, cy = sqlgen.cell_exprs()
    return f"""
WITH {sqlgen.geocode_cte()}
SELECT {cx} AS cell_x, {cy} AS cell_y, COUNT(*) AS n_docs
FROM geo GROUP BY 1, 2
"""


def _o_pip_region() -> str:
    cross = sqlgen.pip_crossings_expr("g.lon", "g.lat")
    return f"""
WITH {sqlgen.geocode_cte()},
edges(x1, y1, x2, y2) AS (VALUES {fixtures.sql_region_edges_values()}),
hits AS (
  SELECT g.doc_id
  FROM geo g CROSS JOIN edges
  GROUP BY g.doc_id
  HAVING SUM({cross}) % 2 = 1
)
SELECT d.lang, COUNT(*) AS n_docs
FROM documents d JOIN hits USING (doc_id)
GROUP BY d.lang
"""


def _o_pip_zones_join() -> str:
    cross = sqlgen.pip_crossings_expr("g.lon", "g.lat")
    return f"""
WITH {sqlgen.geocode_cte()},
zedges(zone_id, x1, y1, x2, y2) AS (VALUES {fixtures.sql_zone_edges_values()}),
zbox(zone_id, bxmin, bymin, bxmax, bymax) AS (
  SELECT zone_id, MIN(LEAST(x1, x2)), MIN(LEAST(y1, y2)),
         MAX(GREATEST(x1, x2)), MAX(GREATEST(y1, y2))
  FROM zedges GROUP BY zone_id
),
cand AS (
  SELECT g.doc_id, g.lon, g.lat, z.zone_id
  FROM geo g JOIN zbox z
    ON g.lon >= z.bxmin AND g.lon <= z.bxmax
   AND g.lat >= z.bymin AND g.lat <= z.bymax
),
hits AS (
  SELECT c.doc_id, c.zone_id
  FROM cand c JOIN zedges e USING (zone_id)
  GROUP BY c.doc_id, c.zone_id, c.lon, c.lat
  HAVING SUM({sqlgen.pip_crossings_expr("c.lon", "c.lat", "e.x1", "e.y1", "e.x2", "e.y2")}) % 2 = 1
)
SELECT zone_id, COUNT(*) AS n_docs FROM hits GROUP BY zone_id
"""


def oracle_sql() -> dict[str, str]:
    return {
        "geocode_cells": _o_geocode_cells(),
        "cell_counts": _o_cell_counts(),
        "pip_region": _o_pip_region(),
        "pip_zones_join": _o_pip_zones_join(),
    }
