"""Watermarked windowed streaming aggregation over the events table."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.streaming.windowed import (
    start_windowed_event_stream,
)


def test_windowed_event_stream(spark, tmp_path):
    in_dir = str(tmp_path / "events")
    out = str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(in_dir)

    q = start_windowed_event_stream(spark, in_dir, out, ck)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    n = got.count()
    assert n > 0
    # append mode withholds windows the watermark has not passed: the
    # final windows near max(ts) stay open, so strictly fewer windows
    # than the batch aggregation emits
    batch_n = ev.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
    assert n < batch_n
    # emitted rows agree with the batch aggregation for closed windows
    batch = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_batch")
    ).select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n_batch",
    )
    joined = got.join(batch, ["window_start", "event_type"], "inner")
    assert joined.count() == n
    assert joined.filter("n <> n_batch").count() == 0
