"""Vector-table sources/sinks + info (reference createVector
vector.py:952-1273, vectorInfo vector.py:205-256, listLayers
vector.py:261-283, extractFeature vector.py:591-685).

A 'vector layer' is a parquet directory of the feature-table layout
(attributes + vertex coordinate arrays). Writers partition by a
spatial key so later scans prune (the Iceberg layout analog —
partition values stand in for cell-id bucketing)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_vector(df: DataFrame, path: str, partition_col: str | None = None):
    """Persist a feature table (createVector analog). Partitioning by
    a cell/zone key gives scan pruning on read."""
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path)


def load_vector(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def list_layers(root: str) -> list[str]:
    """Enumerate layers (sub-directories) of a vector store root."""
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith("_")
    )


def vector_info(df: DataFrame, xs_col: str = "xs", ys_col: str = "ys") -> dict:
    """Layer summary: count, attribute names, bounds (vectorInfo
    analog) — one aggregation pass."""
    row = df.select(
        F.count("*").alias("n"),
        F.min(F.array_min(xs_col)).alias("xmin"),
        F.min(F.array_min(ys_col)).alias("ymin"),
        F.max(F.array_max(xs_col)).alias("xmax"),
        F.max(F.array_max(ys_col)).alias("ymax"),
    ).collect()[0]
    attrs = [c for c in df.columns if c not in (xs_col, ys_col)]
    return {
        "count": row["n"],
        "attributes": attrs,
        "bounds": (row["xmin"], row["ymin"], row["xmax"], row["ymax"]),
    }


def extract_feature(df: DataFrame, where) -> dict:
    """Exactly-one semantics (reference extractFeature,
    vector.py:591-685): error when the filter matches != 1 feature."""
    rows = df.filter(where).limit(2).collect()
    if len(rows) != 1:
        raise ValueError(
            f"extract_feature expects exactly one match, got {'>1' if len(rows) > 1 else 0}"
        )
    return rows[0].asDict()


def create_vector_zordered(
    df, path: str, x_col: str = "cell_x", y_col: str = "cell_y",
    n_files: int | None = None,
):
    """Persist a cell-keyed table SORTED BY MORTON CODE — the layout
    that makes engine-side min/max stats prune 2-D range scans
    (SURVEY §4 'write sorted by Morton(cell)'): range-repartition on
    the Morton key + sortWithinPartitions, so each output file holds a
    contiguous Z-curve run = a compact spatial region. n_files pins
    the file count (default: let AQE size the range exchange)."""
    from pyspark.sql import functions as F

    from ..functions.geo import morton_col

    keyed = df.withColumn("morton", morton_col(F.col(x_col), F.col(y_col)))
    if n_files:
        keyed = keyed.repartitionByRange(n_files, "morton")
    else:
        keyed = keyed.repartitionByRange("morton")
    keyed.sortWithinPartitions("morton").write.mode("overwrite").parquet(path)
