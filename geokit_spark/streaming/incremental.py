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


def stream_cell_counts_stateful(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, out_path: str
):
    """Custom stateful operator via applyInPandasWithState: running
    per-cell document counts with explicit state across micro-batches
    (the task's custom-stateful-streaming pattern). Unlike the
    groupBy-complete version, state is engine-managed per key and only
    updated keys are emitted per batch (update semantics — the shape
    that scales to unbounded key spaces)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    pts = with_geocode(src)
    cx, cy = cell_cols(F.col("lon"), F.col("lat"))
    keyed = pts.select(cx.alias("cell_x"), cy.alias("cell_y"))

    def update(key, pdfs, state: GroupState):
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        total = (state.get[0] if state.exists else 0) + n_new
        state.update((total,))
        yield pd.DataFrame(
            {"cell_x": [key[0]], "cell_y": [key[1]], "n_docs": [total]}
        )

    out = keyed.groupBy("cell_x", "cell_y").applyInPandasWithState(
        update,
        outputStructType="cell_x int, cell_y int, n_docs long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # foreachBatch parquet sink: the memory sink cannot recover from a
    # checkpoint in update mode; appending micro-batch outputs (with
    # the batch id) is also the lineage-friendly pattern — the latest
    # batch per key is the current state
    out_dir = out_path

    def write_batch(bdf, batch_id: int):
        bdf.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        out.writeStream.outputMode("update")
        .foreachBatch(write_batch)
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


def stream_dedup_exact(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string",
):
    """Streaming EXACT dedup over an append-only document feed: each
    micro-batch keeps only first-seen content (md5 of text), state
    held by Spark's native streaming dropDuplicates — the declarative
    form of the dedup pipeline's streaming front door. availableNow +
    checkpoint make re-runs idempotent (resume mid-feed without
    re-emitting already-seen content).

    Note: without a watermark the sketch state grows with distinct
    content — at 100 TB pair it with the daily-window watermark
    variant (dropDuplicatesWithinWatermark) once the feed carries
    event time."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .json(src_dir)
    )
    deduped = stream.withColumn("text_md5", F.md5("text")).dropDuplicates(
        ["text_md5"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_watermarked(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string, ts timestamp",
    watermark: str = "1 day",
):
    """Streaming exact dedup with BOUNDED state: documents carry an
    event time and duplicates are only suppressed within the watermark
    horizon (dropDuplicatesWithinWatermark) — the 100 TB shape where
    unbounded first-seen state is impossible. State size is bounded by
    the distinct content arriving within one watermark window; content
    recurring after the horizon is re-emitted (documented contract).
    availableNow + checkpoint keep re-runs idempotent like
    stream_dedup_exact."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .json(src_dir)
    )
    deduped = (
        stream.withColumn("text_md5", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
