"""Size-aware join-side hints.

A forced F.broadcast() on a side whose size is data-dependent is a
100-TB OOM: every executor materializes the build side. The safe
pattern (introduced for the raster tile join, reused by the dedup
boilerplate join) is to add the hint only when Catalyst's OWN size
estimate fits under spark.sql.autoBroadcastJoinThreshold, and
otherwise leave the plan unhinted so the planner / AQE picks the
strategy from the RUNTIME size."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_THRESHOLD = 10 * 1024 * 1024


def size_aware_broadcast(df: DataFrame) -> DataFrame:
    """Return df with a broadcast hint iff Catalyst's size estimate for
    it fits under spark.sql.autoBroadcastJoinThreshold. Aggregated /
    filtered subtrees usually carry a huge inherited estimate, so they
    come back unhinted — AQE still broadcasts them at runtime when the
    materialized stage turns out small."""
    spark = df.sparkSession
    try:
        raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        thresh = int(
            spark._jvm.org.apache.spark.network.util.JavaUtils
            .byteStringAsBytes(raw)
        )
    except Exception:
        thresh = _DEFAULT_THRESHOLD
    if thresh <= 0:
        return df
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats()
            .sizeInBytes().toString()
        )
    except Exception:
        return df
    return F.broadcast(df) if size <= thresh else df
