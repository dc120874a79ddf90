"""Watermarked windowed aggregation over an event stream.

The streaming form of q_events_windowed: tumbling 1-hour windows with a
late-data watermark. Append mode emits a window only once its watermark
passes — the standard shape for incremental corpus/telemetry rollups
feeding the model-build aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    # watermarks require TIMESTAMP (with zone); parquet NTZ columns cast
    # losslessly under the UTC session timezone
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def start_windowed_event_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Parquet event stream -> append-mode windowed counts (availableNow)."""
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream, window, watermark)
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
