"""Structured-Streaming ingestion (extension beyond the reference, which
is strictly batch — SURVEY.md §2.9).

Two shapes:

- stream_geocode_to_snapshots: micro-batch ingestion of image+caption
  parquet drops → per-batch geocode (stream-static broadcast join
  against the gazetteer) → per-cell density deltas appended to a
  SnapshotTable via foreachBatch. foreachBatch is the idiomatic way to
  reuse the exact batch operators (incl. multi-stage aggregation) under
  a streaming trigger, and gives exactly-once sinks through the
  snapshot manifest (batch_id recorded per commit).

- windowed_event_counts: a genuine watermarked event-time aggregation
  (tumbling window + late-data bound) for stream tables like ``events``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_geocode_spark.operators import geocode as G
from batch_geocode_spark.operators import tiles as T
from batch_geocode_spark.snapshots import SnapshotTable, write_snapshotted

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def stream_geocode_to_snapshots(
    spark: SparkSession,
    input_dir: str,
    gazetteer: DataFrame,
    table: SnapshotTable,
    checkpoint_dir: str,
    res: int = 9,
    available_now: bool = True,
):
    """Stream image parquet drops → geocode → cell density → snapshot.

    Each micro-batch runs the full batch pipeline (broadcast join, vet,
    composite-best, cell encode, density) and appends a density delta
    keyed by (cell, batch_id); readers aggregate deltas with
    ``read_density``. Restart safety = streaming checkpoint (source
    offsets) + snapshot manifest (committed output)."""
    stream = spark.readStream.schema(IMAGES_SCHEMA).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _, best = G.geocode_images(batch_df, gazetteer)
        delta = T.cell_density(best, res=res).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        write_snapshotted(
            delta,
            table,
            key_col="cell",
            n_buckets=8,
            group_size=8,
            job_id=f"stream-batch-{batch_id}",
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_density(spark: SparkSession, table: SnapshotTable) -> DataFrame:
    """Aggregate streamed density deltas to current per-cell totals."""
    return table.read(spark).groupBy("cell").agg(F.sum("n_images").alias("n_images"))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on a streaming OR batch
    DataFrame (same plan; late rows beyond the watermark are dropped in
    streaming mode)."""
    # watermarks require TIMESTAMP (not NTZ); session TZ is UTC so the
    # cast is value-preserving
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
