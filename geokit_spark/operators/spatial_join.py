"""Two-phase spatial joins: cell-equijoin prefilter + exact refine.

Physical shape (the scale story):

  pages ──geocode──► cell_id (pure JVM arithmetic, codegen)
        ⋈ broadcast{cell_id → polygon candidates}      (hash join, no shuffle)
        ──refine──► exact ray-casting PIP, Arrow-batched pandas UDF,
                    applied ONLY to boundary-cell rows

At 1000 executors the broadcast side stays tiny (cells × candidate
ids); the pages side never shuffles for a semi-join. Skewed hot cells
are irrelevant here (map-side work only); they matter for groupBy
stages, where AQE + salting handle them (see operators.knn and bench).

Semantics mirror the reference's extractFeatures(geom=...) /
countFeatures spatial semi-join (vector.py:172-202, 290-455) and the
applyGeopandasMethod("sjoin") general join (vector.py:1851-1901).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fixtures
from ..constants import JOIN_GRID_N, XMIN, XSPAN, YMIN, YSPAN
from ..functions.geo import join_cell_id, with_geocode
from ..kernels.cells import (
    BOUNDARY,
    IN,
    classify_covering_cells,
    classify_subcells,
)
from ..kernels.pip import points_in_poly

# adaptive resolution refinement (north rule): boundary cells of the
# coarse join grid are re-classified at REFINE x finer resolution, so
# the exact-PIP UDF only sees the fine boundary band
REFINE = 8
FINE_N = JOIN_GRID_N * REFINE

# ---------------------------------------------------------------------------
# region (single polygon) semi-join


@F.pandas_udf(T.BooleanType())
def _in_region_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    inside = points_in_poly(
        lon.to_numpy(np.float64), lat.to_numpy(np.float64), fixtures.REGION_VERTS
    )
    return pd.Series(inside)


_REGION_CELL_CACHE: dict[int, pd.DataFrame] = {}


def docs_in_region(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Semi-join: documents whose geocoded point lies in the region
    polygon. Interior-cell rows bypass the exact test entirely."""
    if JOIN_GRID_N not in _REGION_CELL_CACHE:
        arr = np.asarray(
            classify_covering_cells(fixtures.REGION_VERTS, JOIN_GRID_N),
            dtype=np.int64,
        )
        _REGION_CELL_CACHE[JOIN_GRID_N] = pd.DataFrame(
            {"cell_id": arr[:, 0], "cell_class": arr[:, 1].astype(np.int32)}
        )
    cell_df = spark.createDataFrame(_REGION_CELL_CACHE[JOIN_GRID_N])

    pts = with_geocode(docs).withColumn(
        "cell_id", join_cell_id(F.col("lon"), F.col("lat"))
    )
    joined = pts.join(F.broadcast(cell_df), "cell_id", "inner")
    interior = joined.filter(F.col("cell_class") == IN)
    boundary = joined.filter(F.col("cell_class") == BOUNDARY).filter(
        _in_region_udf(F.col("lon"), F.col("lat"))
    )
    return interior.unionByName(boundary).drop("cell_class")


# ---------------------------------------------------------------------------
# zones (many polygons) inner join


def _zone_polys() -> dict[int, list[tuple[float, float]]]:
    return {z["zone_id"]: z["verts"] for z in fixtures.ZONES}


@F.pandas_udf(T.BooleanType())
def _in_zone_udf(lon: pd.Series, lat: pd.Series, zone_id: pd.Series) -> pd.Series:
    polys = _zone_polys()
    px = lon.to_numpy(np.float64)
    py = lat.to_numpy(np.float64)
    zid = zone_id.to_numpy(np.int64)
    out = np.zeros(len(px), dtype=bool)
    for z in np.unique(zid):
        m = zid == z
        out[m] = points_in_poly(px[m], py[m], polys[int(z)])
    return pd.Series(out)


_ZONE_CAND_CACHE: dict[int, pd.DataFrame] = {}


def _zone_candidates_pdf() -> pd.DataFrame:
    """Driver-side candidate map build, memoized per grid resolution
    (the classification is pure function of the fixture constants)."""
    if JOIN_GRID_N not in _ZONE_CAND_CACHE:
        frames = []
        for z in fixtures.ZONES:
            pairs = classify_covering_cells(z["verts"], JOIN_GRID_N)
            if pairs:
                arr = np.asarray(pairs, dtype=np.int64)
                frames.append(
                    pd.DataFrame(
                        {
                            "cell_id": arr[:, 0],
                            "zone_id": np.int32(z["zone_id"]),
                            "cell_class": arr[:, 1].astype(np.int32),
                        }
                    )
                )
        _ZONE_CAND_CACHE[JOIN_GRID_N] = pd.concat(frames, ignore_index=True)
    return _ZONE_CAND_CACHE[JOIN_GRID_N]


def zone_candidates_df(spark: SparkSession) -> DataFrame:
    """Exploded (cell_id, zone_id, cell_class) map: the broadcast
    prefilter side. Cells fully outside a zone are dropped at build
    time; interior cells carry class IN so matching rows skip the
    exact test entirely (analog of the reference's per-source envelope
    pruning, extent.py:718-795, strengthened by cell classification)."""
    return spark.createDataFrame(_zone_candidates_pdf())  # Arrow path


def _zone_fine_pdf() -> pd.DataFrame:
    """Level-2 refinement map: boundary coarse cells re-classified at
    FINE_N (north rule: adaptive resolution refinement). Memoized."""
    key = (JOIN_GRID_N, REFINE)
    if key not in _ZONE_CAND_CACHE:
        coarse = _zone_candidates_pdf()
        frames = []
        for z in fixtures.ZONES:
            zb = coarse[
                (coarse.zone_id == z["zone_id"])
                & (coarse.cell_class == BOUNDARY)
            ]
            fine = classify_subcells(
                z["verts"], zb["cell_id"].tolist(), JOIN_GRID_N, REFINE
            )
            if fine:
                arr = np.asarray(fine, dtype=np.int64)
                frames.append(
                    pd.DataFrame(
                        {
                            "fine_id": arr[:, 0],
                            "zone_id": np.int32(z["zone_id"]),
                            "fine_class": arr[:, 1].astype(np.int32),
                        }
                    )
                )
        _ZONE_CAND_CACHE[key] = pd.concat(frames, ignore_index=True)
    return _ZONE_CAND_CACHE[key]


def _fine_cell_col():
    fx = F.floor((F.col("lon") - F.lit(XMIN)) * F.lit(FINE_N / XSPAN))
    fy = F.floor((F.col("lat") - F.lit(YMIN)) * F.lit(FINE_N / YSPAN))
    fx = F.least(F.greatest(fx, F.lit(0)), F.lit(FINE_N - 1))
    fy = F.least(F.greatest(fy, F.lit(0)), F.lit(FINE_N - 1))
    return fx * F.lit(FINE_N) + fy


def docs_join_zones(
    spark: SparkSession, docs: DataFrame, refine: bool = False
) -> DataFrame:
    """Inner spatial join: (doc, zone) pairs where the doc's point is
    inside the zone polygon. One doc may match several overlapping
    zones (the fixtures overlap by construction). Only boundary-cell
    candidates reach the Python refine; interior-cell candidates are
    accepted JVM-side.

    refine=True adds the level-2 adaptive resolution split (north
    rule): boundary rows re-key at FINE_N against a refinement map, so
    only the thin fine band hits the UDF. Measured trade-off on this
    box: the extra broadcast join + third union branch costs more than
    the UDF it saves for these 4-vertex zones (ray-casting 4 edges is
    ~as cheap as the join) — it pays off when polygons are complex
    enough that exact PIP dominates (100+-vertex coastlines etc.)."""
    cand = zone_candidates_df(spark)
    pts = with_geocode(docs).withColumn(
        "cell_id", join_cell_id(F.col("lon"), F.col("lat"))
    )
    pairs = pts.join(F.broadcast(cand), "cell_id", "inner")
    interior = pairs.filter(F.col("cell_class") == IN).drop("cell_class")

    if not refine:
        boundary = (
            pairs.filter(F.col("cell_class") == BOUNDARY)
            .drop("cell_class")
            .filter(_in_zone_udf(F.col("lon"), F.col("lat"), F.col("zone_id")))
        )
        return interior.unionByName(boundary)

    fine_map = spark.createDataFrame(_zone_fine_pdf())
    bnd = (
        pairs.filter(F.col("cell_class") == BOUNDARY)
        .drop("cell_class")
        .withColumn("fine_id", _fine_cell_col())
        .join(F.broadcast(fine_map), ["fine_id", "zone_id"], "left")
    )
    fine_in = bnd.filter(F.col("fine_class") == IN).drop("fine_id", "fine_class")
    exact = (
        bnd.filter(F.col("fine_class") == BOUNDARY)
        .filter(_in_zone_udf(F.col("lon"), F.col("lat"), F.col("zone_id")))
        .drop("fine_id", "fine_class")
    )
    return interior.unionByName(fine_in).unionByName(exact)
