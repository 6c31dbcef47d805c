"""DuckDB oracle SQL generators.

Each helper emits ANSI SQL whose expression tree matches the Spark
column expressions in ``functions.geo`` operation-for-operation, so
both engines produce bit-identical doubles. Conventions:

* every fractional literal is emitted via ``repr`` (round-trips the
  exact double) and wrapped in CAST(... AS DOUBLE) where DuckDB would
  otherwise infer DECIMAL;
* only +,-,*,/,floor,%,CASE appear in compared expressions.
"""

from __future__ import annotations

from ..constants import (
    CELL_N,
    GRID_INV_X,
    GRID_INV_Y,
    GRID_N,
    HOT_CX,
    HOT_CY,
    HOT_HALF,
    HOT_MOD,
    LCG_A,
    LCG_C,
    LCG_M,
    PIX_DX,
    PIX_DY,
    RASTER_H,
    RASTER_W,
    XMIN,
    XSPAN,
    YMAX,
    YMIN,
    YSPAN,
)


def d(x: float) -> str:
    """Exact double literal for SQL. The string route is mandatory:
    DuckDB parses bare numeric literals as DECIMAL and the
    DECIMAL->DOUBLE cast double-rounds (observed 1-ULP error on
    17-digit literals); CAST('<repr>' AS DOUBLE) uses strtod, which is
    correctly rounded."""
    return f"CAST('{x!r}' AS DOUBLE)"


def geocode_cte(source: str = "documents") -> str:
    """CTE `geo` with (doc_id, lon, lat) for every row of `source`.
    Mirrors functions.geo.geocode_cols."""
    um = d(float(LCG_M))
    return f"""
geo AS (
  SELECT doc_id,
    CASE WHEN doc_id % {HOT_MOD} = 0
      THEN {d(HOT_CX)} + (CAST(h1 AS DOUBLE) / {um} - CAST(0.5 AS DOUBLE)) * {d(2.0 * HOT_HALF)}
      ELSE {d(XMIN)} + CAST(h1 AS DOUBLE) / {um} * {d(XSPAN)} END AS lon,
    CASE WHEN doc_id % {HOT_MOD} = 0
      THEN {d(HOT_CY)} + (CAST(h2 AS DOUBLE) / {um} - CAST(0.5 AS DOUBLE)) * {d(2.0 * HOT_HALF)}
      ELSE {d(YMIN)} + CAST(h2 AS DOUBLE) / {um} * {d(YSPAN)} END AS lat
  FROM (
    SELECT doc_id, h1, (h1 * {LCG_A} + {LCG_C}) % {LCG_M} AS h2
    FROM (
      SELECT doc_id, (doc_id * {LCG_A} + {LCG_C}) % {LCG_M} AS h1
      FROM {source}
    )
  )
)"""


def grid_cell_exprs(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    cx = (
        f"CAST(LEAST(GREATEST(FLOOR(({lon} - {d(XMIN)}) * {d(GRID_INV_X)}), 0), {GRID_N - 1}) AS INT)"
    )
    cy = (
        f"CAST(LEAST(GREATEST(FLOOR(({lat} - {d(YMIN)}) * {d(GRID_INV_Y)}), 0), {GRID_N - 1}) AS INT)"
    )
    return cx, cy


def cell_exprs(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    cx = f"CAST(FLOOR(({lon} + CAST(180.0 AS DOUBLE)) / CAST(360.0 AS DOUBLE) * {d(float(CELL_N))}) AS INT)"
    cy = f"CAST(FLOOR((CAST(90.0 AS DOUBLE) - {lat}) / CAST(180.0 AS DOUBLE) * {d(float(CELL_N))}) AS INT)"
    return cx, cy


def pip_crossings_expr(
    px: str, py: str, x1: str = "x1", y1: str = "y1", x2: str = "x2", y2: str = "y2"
) -> str:
    """One edge's ray-crossing indicator (0/1). The expression tree is
    identical to kernels.pip.points_in_poly: an upward ray from the
    point crosses edge (x1,y1)-(x2,y2) iff the edge straddles py and
    px is left of the crossing x. Horizontal edges never cross."""
    return (
        f"CASE WHEN {y1} <> {y2} AND (({y1} > {py}) <> ({y2} > {py})) "
        f"AND {px} < ({x2} - {x1}) * ({py} - {y1}) / ({y2} - {y1}) + {x1} "
        f"THEN 1 ELSE 0 END"
    )


def pixel_grid_cte(name: str = "pix", w: int = RASTER_W, h: int = RASTER_H) -> str:
    """CTE enumerating the raster pixel grid with center coords +
    integer-valued fields (mirrors kernels.raster_fields)."""
    return f"""
{name} AS (
  SELECT ix, iy,
    {d(XMIN)} + (CAST(ix AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {d(PIX_DX)} AS px,
    {d(YMAX)} - (CAST(iy AS DOUBLE) + CAST(0.5 AS DOUBLE)) * {d(PIX_DY)} AS py,
    1 + ((ix // 8) * 37 + (iy // 8) * 61) % 44 AS clc,
    100 + ix + 2 * iy + (ix * iy) % 97 AS elev
  FROM (SELECT CAST(range AS BIGINT) AS ix FROM range({w})),
       (SELECT CAST(range AS BIGINT) AS iy FROM range({h}))
)"""


def raster_cell_exprs(lon: str = "lon", lat: str = "lat") -> tuple[str, str]:
    """Point -> pixel index (reference rasterCellNo, raster.py:2652-2665);
    out-of-bounds handling is done by the caller."""
    ix = f"CAST(FLOOR(({lon} - {d(XMIN)}) / {d(PIX_DX)}) AS BIGINT)"
    iy = f"CAST(FLOOR(({d(YMAX)} - {lat}) / {d(PIX_DY)}) AS BIGINT)"
    return ix, iy


def clc_expr(ix: str, iy: str) -> str:
    return f"1 + (({ix} // 8) * 37 + ({iy} // 8) * 61) % 44"


def elev_expr(ix: str, iy: str) -> str:
    return f"100 + {ix} + 2 * {iy} + ({ix} * {iy}) % 97"
