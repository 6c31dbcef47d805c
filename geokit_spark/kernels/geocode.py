"""Deterministic geocoder: doc_id -> (lon, lat).

Pure int64 LCG + exact power-of-two division so the Spark column
expressions (functions.geo.geocode_cols), this numpy kernel, and the
DuckDB oracle SQL are bit-identical. 80% of docs uniform over the
bbox, 20% (doc_id % 5 == 0) in a small hot-spot square — the skew
cluster the salting/refinement machinery must handle (north rule).
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    HOT_CX,
    HOT_CY,
    HOT_HALF,
    HOT_MOD,
    LCG_A,
    LCG_C,
    LCG_M,
    XMIN,
    XSPAN,
    YMIN,
    YSPAN,
)


def geocode(doc_id: np.ndarray):
    """doc_id int64 array -> (lon, lat) float64 arrays."""
    d = np.asarray(doc_id, dtype=np.int64)
    h1 = (d * LCG_A + LCG_C) % LCG_M
    h2 = (h1 * LCG_A + LCG_C) % LCG_M
    u1 = h1.astype(np.float64) / float(LCG_M)
    u2 = h2.astype(np.float64) / float(LCG_M)
    hot = (d % HOT_MOD) == 0
    lon = np.where(hot, HOT_CX + (u1 - 0.5) * (2.0 * HOT_HALF), XMIN + u1 * XSPAN)
    lat = np.where(hot, HOT_CY + (u2 - 0.5) * (2.0 * HOT_HALF), YMIN + u2 * YSPAN)
    return lon, lat
