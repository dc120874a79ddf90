"""Streaming exact deduplication — the stream form of
operators/dedup.exact_dedup (engine addition; the reference has no
streaming surface, SURVEY.md §2.12).

A document stream deduplicates on its content hash with
``dropDuplicatesWithinWatermark``: the dedup state store holds one entry
per distinct hash and EVICTS entries older than the watermark, so state
is bounded by the watermark horizon, not the stream's lifetime — the
only state-bounding choice that survives an unbounded 10^12-doc stream.
Within the horizon the semantics match the batch operator at group
level: exactly one representative per content hash is emitted and later
micro-batches' copies are dropped against the state store. WITHIN one
micro-batch the retained representative is arbitrary (Spark gives no
ordering guarantee inside a batch) — callers needing the min-id winner
run the batch exact_dedup over the deduped output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_content_hash(
    df: DataFrame, text_col: str = "text", out_col: str = "content_hash"
) -> DataFrame:
    """md5 of the raw text — identical to the batch exact_dedup key."""
    return df.withColumn(out_col, F.md5(F.col(text_col)))


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """streaming documents(doc_id, ts, text) -> first-arrival rows only.

    State: one row per distinct content_hash inside the watermark
    horizon (late duplicates beyond it would re-emit — the documented
    watermark trade-off, same as every watermarked streaming operator).
    """
    return (
        with_content_hash(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def start_dedup_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id string, ts timestamp, text string",
    watermark: str = "10 minutes",
):
    """File-source form: parquet in, first-arrival parquet out,
    availableNow (drains what exists, then stops; re-invoking resumes
    from the checkpoint offsets)."""
    stream = spark.readStream.schema(schema).parquet(in_dir)
    deduped = dedup_stream(stream, watermark=watermark)
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
