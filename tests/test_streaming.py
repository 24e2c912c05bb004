"""Structured-Streaming ingestion: micro-batched geocode+tile equals the
batch run; watermarked window agg equals the batch group-by."""

import os

import pytest
from pyspark.sql import functions as F

from batch_geocode_spark import datagen, streaming
from batch_geocode_spark.operators import geocode as G
from batch_geocode_spark.operators import tiles as T
from batch_geocode_spark.snapshots import SnapshotTable


def test_stream_geocode_matches_batch(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("stream_in"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    table = SnapshotTable(str(tmp_path_factory.mktemp("snap")))

    images = datagen.images_to_spark(spark, 200, with_bytes=False)
    # two drops → at least two files for the file-stream source
    images.filter(F.col("image_id") < "img000000000100").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    images.filter(F.col("image_id") >= "img000000000100").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    gaz = datagen.gazetteer_to_spark(spark)
    q = streaming.stream_geocode_to_snapshots(
        spark, in_dir, gaz, table, ckpt, res=9, available_now=True
    )
    q.awaitTermination(300)

    got = (
        streaming.read_density(spark, table)
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    _, best = G.geocode_images(images, gaz)
    want = (
        T.cell_density(best, res=9)
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert got["cell"].tolist() == want["cell"].tolist()
    assert got["n_images"].tolist() == want["n_images"].tolist()
    # snapshot lineage recorded per micro-batch
    assert len(table.history()) >= 1


def test_windowed_event_counts_batch_equivalence(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    got = streaming.windowed_event_counts(ev).toPandas()
    want = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("string").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
    )
    g = got.set_index(["window_start", "event_type"])["n_events"].sort_index()
    w = want.set_index(["window_start", "event_type"])["n_events"].sort_index()
    assert g.equals(w)


def test_windowed_event_counts_streaming_mode(spark, sf_dir, tmp_path_factory):
    """Run the SAME op as a real stream (file source, availableNow) and
    compare with the batch result."""
    in_dir = str(tmp_path_factory.mktemp("ev_in"))
    ckpt = str(tmp_path_factory.mktemp("ev_ckpt"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.coalesce(2).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(ev.schema).parquet(in_dir)
    out = streaming.windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("win_counts").toPandas()
    want = streaming.windowed_event_counts(ev).toPandas()
    g = got.set_index(["window_start", "event_type"])["n_events"].sort_index()
    w = want.set_index(["window_start", "event_type"])["n_events"].sort_index()
    assert g.equals(w)
