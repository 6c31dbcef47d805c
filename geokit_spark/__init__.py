"""geokit_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reproduces the query semantics of FZJ-IEK3-VSA/geokit (reference at
/root/reference, studied read-only) over a Common-Crawl-style web-page
table, re-expressed Spark-first:

* slippy-map / grid cell indexing (`kernels.tiling`, `functions.geo`)
* two-phase spatial joins: cell-equijoin prefilter + exact vectorized
  ray-casting refinement (`operators.spatial_join`)
* kNN via cell-ring expansion (`operators.knn`)
* raster<->vector: rasterize, extract-values, interpolation, zonal
  statistics, value-DSL classification (`operators/*`)
* training-data ops: dedup (exact/minhash/simhash), similarity search,
  text quality (`operators.dedup`, `operators.similarity`,
  `functions.text`)
* per-partition lineage + idempotent resume (`plans.lineage`)

Everything hot-path is either built-in pyspark.sql.functions (JVM,
whole-stage codegen) or Arrow-vectorized pandas UDFs — never per-row
Python.
"""

__version__ = "0.1.0"
